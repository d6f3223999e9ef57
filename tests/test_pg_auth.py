"""PostgresAuth against a stubbed wire-protocol Postgres server.

The reference authorized uploads with an asyncpg users-table lookup that
failed closed on every error path (embedding_gen.py:282-309). This build's
PostgresAuth speaks the v3 wire protocol directly (serving/pgwire.py); the
stub server here implements the backend half — startup, cleartext or MD5
password auth, and the extended-query round — so the full client path is
exercised without a real Postgres.
"""

import asyncio
import base64
import hashlib
import hmac
import struct

import pytest

from sqe_tpu.serving.auth import PostgresAuth
from sqe_tpu.serving.pgwire import SSL_REQUEST_CODE, md5_password

USERS = {
    "alice": ("alice", "alice@example.com"),
    "noemail": ("noemail", ""),
    "nullmail": ("nullmail", None),
}


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _msg(mtype: bytes, payload: bytes) -> bytes:
    return mtype + struct.pack("!I", len(payload) + 4) + payload


async def _read_msg(reader):
    head = await reader.readexactly(5)
    mtype = head[:1]
    (length,) = struct.unpack("!I", head[1:])
    return mtype, await reader.readexactly(length - 4)


class StubPG:
    """Just enough backend protocol for one auth check per connection."""

    def __init__(self, auth: str = "cleartext", password: str = "sekrit",
                 query_error: bool = False):
        self.auth = auth
        self.password = password
        self.query_error = query_error
        self.server = None
        self.port = None
        self.seen_queries = []
        self.seen_params = []
        self.saw_ssl_request = False
        self.bad_server_sig = False

    async def start(self):
        self.server = await asyncio.start_server(self._handle, "127.0.0.1", 0)
        self.port = self.server.sockets[0].getsockname()[1]

    async def stop(self):
        self.server.close()
        await self.server.wait_closed()

    async def _handle(self, reader, writer):
        try:
            await self._session(reader, writer)
        except (asyncio.IncompleteReadError, ConnectionError):
            pass
        finally:
            writer.close()

    async def _session(self, reader, writer):
        # Startup message (no type byte) — possibly preceded by an
        # SSLRequest (the client's default ssl=prefer), declined with 'N'
        # like a TLS-less server.
        (length,) = struct.unpack("!I", await reader.readexactly(4))
        body = await reader.readexactly(length - 4)
        (proto,) = struct.unpack("!I", body[:4])
        if proto == SSL_REQUEST_CODE:
            self.saw_ssl_request = True
            writer.write(b"N")
            await writer.drain()
            (length,) = struct.unpack("!I", await reader.readexactly(4))
            body = await reader.readexactly(length - 4)
            (proto,) = struct.unpack("!I", body[:4])
        assert proto == 196608
        kv = body[4:].split(b"\x00")
        params = dict(zip(kv[0::2], kv[1::2]))
        user = params.get(b"user", b"").decode()

        salt = b"\x01\x02\x03\x04"
        if self.auth == "cleartext":
            writer.write(_msg(b"R", struct.pack("!I", 3)))
            await writer.drain()
            mtype, payload = await _read_msg(reader)
            assert mtype == b"p"
            if payload.rstrip(b"\x00").decode() != self.password:
                writer.write(_msg(b"E", b"SFATAL\x00M" + _cstr(
                    "password authentication failed")))
                await writer.drain()
                return
        elif self.auth == "md5":
            writer.write(_msg(b"R", struct.pack("!I", 5) + salt))
            await writer.drain()
            mtype, payload = await _read_msg(reader)
            assert mtype == b"p"
            expect = md5_password(user, self.password, salt)
            if payload.rstrip(b"\x00") != expect:
                writer.write(_msg(b"E", b"SFATAL\x00M" + _cstr(
                    "password authentication failed")))
                await writer.drain()
                return
        elif self.auth == "scram":
            # Server half of SCRAM-SHA-256 (RFC 7677): PostgreSQL's
            # default auth since v14 — verifies proof AND sends v= so the
            # client's mutual-auth check runs.
            writer.write(_msg(b"R", struct.pack("!I", 10)
                              + _cstr("SCRAM-SHA-256") + b"\x00"))
            await writer.drain()
            mtype, payload = await _read_msg(reader)
            assert mtype == b"p"
            mech_end = payload.index(b"\x00")
            assert payload[:mech_end] == b"SCRAM-SHA-256"
            (ln,) = struct.unpack("!I", payload[mech_end + 1: mech_end + 5])
            client_first = payload[mech_end + 5: mech_end + 5 + ln].decode()
            assert client_first.startswith("n,,")
            bare = client_first[3:]
            client_nonce = dict(kv.split("=", 1)
                                for kv in bare.split(","))["r"]
            server_nonce = client_nonce + "SRVNONCE"
            s_salt, iters = base64.b64encode(b"saltsalt").decode(), 4096
            server_first = f"r={server_nonce},s={s_salt},i={iters}"
            writer.write(_msg(b"R", struct.pack("!I", 11)
                              + server_first.encode()))
            await writer.drain()
            mtype, payload = await _read_msg(reader)
            assert mtype == b"p"
            attrs = dict(kv.split("=", 1)
                         for kv in payload.decode().split(","))
            assert attrs["c"] == base64.b64encode(b"n,,").decode()
            assert attrs["r"] == server_nonce
            salted = hashlib.pbkdf2_hmac("sha256", self.password.encode(),
                                         b"saltsalt", iters)
            client_key = hmac.new(salted, b"Client Key",
                                  hashlib.sha256).digest()
            stored = hashlib.sha256(client_key).digest()
            without_proof = f"c={attrs['c']},r={attrs['r']}"
            auth_msg = ",".join((bare, server_first, without_proof)).encode()
            sig = hmac.new(stored, auth_msg, hashlib.sha256).digest()
            proof = base64.b64decode(attrs["p"])
            recovered = bytes(a ^ b for a, b in zip(proof, sig))
            if hashlib.sha256(recovered).digest() != stored:
                writer.write(_msg(b"E", b"SFATAL\x00M" + _cstr(
                    "password authentication failed")))
                await writer.drain()
                return
            server_key = hmac.new(salted, b"Server Key",
                                  hashlib.sha256).digest()
            digest = hmac.new(server_key, auth_msg, hashlib.sha256).digest()
            if self.bad_server_sig:
                digest = digest[::-1]
            v = base64.b64encode(digest).decode()
            writer.write(_msg(b"R", struct.pack("!I", 12)
                              + f"v={v}".encode()))
            await writer.drain()
        writer.write(_msg(b"R", struct.pack("!I", 0)))           # AuthOk
        writer.write(_msg(b"S", _cstr("server_version") + _cstr("16.0")))
        writer.write(_msg(b"K", struct.pack("!II", 1234, 5678)))
        writer.write(_msg(b"Z", b"I"))                           # ReadyForQuery
        await writer.drain()

        # Extended query round: Parse, Bind, Execute, Sync.
        query, bind_params = None, []
        while True:
            mtype, payload = await _read_msg(reader)
            if mtype == b"P":
                end = payload.index(b"\x00")
                q_end = payload.index(b"\x00", end + 1)
                query = payload[end + 1: q_end].decode()
                self.seen_queries.append(query)
            elif mtype == b"B":
                off = payload.index(b"\x00") + 1
                off = payload.index(b"\x00", off) + 1
                (nfmt,) = struct.unpack("!H", payload[off: off + 2])
                off += 2 + 2 * nfmt
                (nparams,) = struct.unpack("!H", payload[off: off + 2])
                off += 2
                for _ in range(nparams):
                    (ln,) = struct.unpack("!i", payload[off: off + 4])
                    off += 4
                    bind_params.append(payload[off: off + ln].decode())
                    off += ln
                self.seen_params.append(list(bind_params))
            elif mtype == b"S":
                break
            elif mtype == b"X":
                return

        if self.query_error:
            writer.write(_msg(b"E", b"SERROR\x00M" + _cstr(
                'relation "users" does not exist')))
            writer.write(_msg(b"Z", b"I"))
            await writer.drain()
            return

        writer.write(_msg(b"1", b""))                            # ParseComplete
        writer.write(_msg(b"2", b""))                            # BindComplete
        row = USERS.get(bind_params[0]) if bind_params else None
        ntuples = 0
        if row is not None:
            cols = b""
            for c in row:
                if c is None:
                    cols += struct.pack("!i", -1)
                else:
                    raw = c.encode()
                    cols += struct.pack("!I", len(raw)) + raw
            writer.write(_msg(b"D", struct.pack("!H", len(row)) + cols))
            ntuples = 1
        writer.write(_msg(b"C", _cstr(f"SELECT {ntuples}")))
        writer.write(_msg(b"Z", b"I"))
        await writer.drain()
        # Client sends Terminate; connection closes either way.
        try:
            await _read_msg(reader)
        except (asyncio.IncompleteReadError, ConnectionError):
            pass


def _auth_for(stub: StubPG, password: str = "sekrit") -> PostgresAuth:
    return PostgresAuth("127.0.0.1", port=stub.port, database="app",
                        user="svc", password=password, timeout_s=3.0)


def _run(coro):
    return asyncio.run(coro)


@pytest.mark.parametrize("auth_kind", ["cleartext", "md5", "scram"])
def test_known_user_authorized(auth_kind):
    async def go():
        stub = StubPG(auth=auth_kind)
        await stub.start()
        try:
            return await _auth_for(stub)("alice"), stub
        finally:
            await stub.stop()

    ok, stub = _run(go())
    assert ok is True
    # Parameterized, never interpolated (embedding_gen.py:296-304 parity).
    assert stub.seen_queries == [PostgresAuth.QUERY]
    assert stub.seen_params == [["alice"]]
    # The client offered TLS before startup (ssl=prefer default).
    assert stub.saw_ssl_request


def test_scram_wrong_password_fails_closed():
    async def go():
        stub = StubPG(auth="scram")
        await stub.start()
        try:
            return await _auth_for(stub, password="wrong")("alice")
        finally:
            await stub.stop()

    assert _run(go()) is False


def test_scram_tampered_server_signature_fails_closed():
    """Mutual auth: a server that validates the proof but returns a bogus
    v= signature (it does not actually hold ServerKey) is rejected."""

    async def go():
        stub = StubPG(auth="scram")
        stub.bad_server_sig = True
        await stub.start()
        try:
            return await _auth_for(stub)("alice")
        finally:
            await stub.stop()

    assert _run(go()) is False


def test_unknown_user_denied():
    async def go():
        stub = StubPG()
        await stub.start()
        try:
            return await _auth_for(stub)("mallory")
        finally:
            await stub.stop()

    assert _run(go()) is False


def test_empty_and_null_email_denied():
    """Reference parity: row must have BOTH id and email non-empty
    (embedding_gen.py:297-304 checks every column's strip())."""
    async def go():
        stub = StubPG()
        await stub.start()
        try:
            a = _auth_for(stub)
            return await a("noemail"), await a("nullmail"), await a("  ")
        finally:
            await stub.stop()

    assert _run(go()) == (False, False, False)


def test_wrong_password_fails_closed():
    async def go():
        stub = StubPG(auth="md5")
        await stub.start()
        try:
            return await _auth_for(stub, password="wrong")("alice")
        finally:
            await stub.stop()

    assert _run(go()) is False


def test_query_error_fails_closed():
    async def go():
        stub = StubPG(query_error=True)
        await stub.start()
        try:
            return await _auth_for(stub)("alice")
        finally:
            await stub.stop()

    assert _run(go()) is False


def test_unreachable_server_fails_closed():
    auth = PostgresAuth("127.0.0.1", port=1, timeout_s=0.5)
    assert _run(auth("alice")) is False


def test_injection_attempt_travels_as_data():
    """A hostile id rides in a Bind parameter, not in the SQL text."""
    async def go():
        stub = StubPG()
        await stub.start()
        try:
            ok = await _auth_for(stub)("x'; DROP TABLE users; --")
            return ok, stub
        finally:
            await stub.stop()

    ok, stub = _run(go())
    assert ok is False
    assert stub.seen_queries == [PostgresAuth.QUERY]       # SQL unchanged
    assert stub.seen_params == [["x'; DROP TABLE users; --"]]
