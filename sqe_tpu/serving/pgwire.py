"""Minimal async PostgreSQL wire-protocol (v3) client.

The reference authorized uploads with an asyncpg lookup against a ``users``
table (embedding_gen.py:264-309). This build has no SQL driver dependency,
so the Postgres capability is implemented at the wire level: a small
from-scratch protocol-3.0 client speaking exactly the subset that
authorization needs — startup, cleartext/MD5 password auth, and one
parameterized extended-query round (Parse/Bind/Execute/Sync), text format.

Parameters travel out-of-band in Bind messages (never interpolated into
SQL), preserving the reference's no-injection-surface property
(embedding_gen.py:296-304). Every failure mode — connect, auth, query,
protocol desync — raises ``PGError``; the auth hook above this maps any
raise to "deny" (fail closed).

Protocol framing per the PostgreSQL Frontend/Backend Protocol docs:
message = type byte + int32 length (includes itself) + payload; the
startup message alone omits the type byte.
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import hmac
import os
import ssl as ssl_mod
import struct
import unicodedata
from typing import List, Optional, Tuple

PROTOCOL_V3 = 196608  # (3 << 16) | 0
SSL_REQUEST_CODE = 80877103  # (1234 << 16) | 5679

AUTH_OK = 0
AUTH_CLEARTEXT = 3
AUTH_MD5 = 5
AUTH_SASL = 10            # AuthenticationSASL (mechanism negotiation)
AUTH_SASL_CONTINUE = 11   # server-first-message
AUTH_SASL_FINAL = 12      # server-final-message (v= signature)

_AUTH_NAMES = {0: "ok", 2: "kerberos-v5", 3: "cleartext", 5: "md5",
               7: "gss", 8: "gss-continue", 9: "sspi", 10: "sasl",
               11: "sasl-continue", 12: "sasl-final"}


class PGError(Exception):
    """Any connection/auth/query failure (callers fail closed on it)."""


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def md5_password(user: str, password: str, salt: bytes) -> bytes:
    """PG MD5 auth response: 'md5' + hex(md5(hex(md5(password+user)) + salt))."""
    inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
    outer = hashlib.md5(inner.encode() + salt).hexdigest()
    return b"md5" + outer.encode()


def _saslprep(password: str) -> bytes:
    """Minimal SASLprep (RFC 4013): NFKC normalization, space mapping,
    control/unassigned characters rejected. ASCII passwords (the common
    case) pass through byte-identical to asyncpg's full implementation."""
    if password.isascii():
        if any(ord(c) < 0x20 or ord(c) == 0x7F for c in password):
            raise PGError("prohibited control character in password")
        return password.encode("utf-8")
    mapped = "".join(" " if unicodedata.category(c) == "Zs" else c
                     for c in password)
    out = unicodedata.normalize("NFKC", mapped)
    if any(unicodedata.category(c) in ("Cc", "Cf", "Cn") for c in out):
        raise PGError("prohibited character in password")
    return out.encode("utf-8")


class ScramSha256:
    """Client side of SCRAM-SHA-256 (RFC 5802 over SHA-256, RFC 7677) —
    the PostgreSQL >= 10 default (``password_encryption=scram-sha-256``
    since v14). Channel binding is not offered (gs2 header ``n,,``): this
    client authenticates over plaintext or server-unauthenticated TLS, so
    SCRAM-SHA-256-PLUS is never selected. Round-4 advisor finding: without
    this, PostgresAuth fail-closed against every modern default server."""

    MECHANISM = "SCRAM-SHA-256"
    _GS2 = "n,,"

    def __init__(self, user: str, password: str,
                 nonce: Optional[str] = None):
        # Per RFC 5802 PG ignores the SCRAM username (it uses the startup
        # user), so n= stays empty like libpq sends it.
        self._password = _saslprep(password)
        self._nonce = nonce or base64.b64encode(os.urandom(18)).decode()
        self._client_first_bare = f"n=,r={self._nonce}"
        self._auth_message: Optional[bytes] = None
        self._server_key: Optional[bytes] = None

    def client_first(self) -> bytes:
        return (self._GS2 + self._client_first_bare).encode()

    def client_final(self, server_first: bytes) -> bytes:
        """Consume server-first (r=,s=,i=), return client-final with proof."""
        text = server_first.decode("utf-8")
        attrs = dict(kv.split("=", 1) for kv in text.split(","))
        server_nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        if not server_nonce.startswith(self._nonce):
            raise PGError("scram: server nonce does not extend client nonce")
        salted = hashlib.pbkdf2_hmac(
            "sha256", self._password, base64.b64decode(salt_b64), iters)
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        self._server_key = hmac.new(salted, b"Server Key",
                                    hashlib.sha256).digest()
        channel = base64.b64encode(self._GS2.encode()).decode()  # "biws"
        without_proof = f"c={channel},r={server_nonce}"
        self._auth_message = ",".join(
            (self._client_first_bare, text, without_proof)).encode()
        sig = hmac.new(stored_key, self._auth_message,
                       hashlib.sha256).digest()
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        return (without_proof
                + ",p=" + base64.b64encode(proof).decode()).encode()

    def verify_server_final(self, server_final: bytes) -> None:
        """Check v= (mutual auth): the server proved it holds ServerKey."""
        text = server_final.decode("utf-8")
        attrs = dict(kv.split("=", 1) for kv in text.split(","))
        if "e" in attrs:
            raise PGError(f"scram: server error {attrs['e']}")
        expect = hmac.new(self._server_key, self._auth_message,
                          hashlib.sha256).digest()
        if not hmac.compare_digest(base64.b64decode(attrs["v"]), expect):
            raise PGError("scram: server signature mismatch")


class PGWireClient:
    """One connection, one extended-query at a time. Not a pool — the auth
    hook opens per check, exactly like the reference's per-check
    ``asyncpg.connect`` (embedding_gen.py:264-279)."""

    def __init__(self, timeout_s: float = 5.0, ssl: str = "prefer"):
        # ``ssl``: "disable" (never negotiate), "prefer" (SSLRequest, fall
        # back to plaintext on server 'N' — libpq's default), "require"
        # (fail if the server declines). TLS here ENCRYPTS the stream
        # (credentials no longer travel cleartext — round-4 advisor
        # finding) but does not verify the server certificate, matching
        # libpq sslmode=require semantics.
        assert ssl in ("disable", "prefer", "require")
        self.timeout_s = timeout_s
        self.ssl_mode = ssl
        self.tls_active = False
        self._reader: Optional[asyncio.StreamReader] = None
        self._writer: Optional[asyncio.StreamWriter] = None

    async def connect(self, host: str, port: int, user: str,
                      password: str, database: str) -> None:
        try:
            self._reader, self._writer = await asyncio.wait_for(
                asyncio.open_connection(host, port), self.timeout_s)
        except Exception as exc:
            raise PGError(f"connect to {host}:{port} failed: {exc}") from exc
        if self.ssl_mode != "disable":
            await self._negotiate_ssl(host)
        params = _cstr("user") + _cstr(user) + _cstr("database") + \
            _cstr(database) + b"\x00"
        body = struct.pack("!I", PROTOCOL_V3) + params
        self._writer.write(struct.pack("!I", len(body) + 4) + body)
        await self._drain()
        await self._authenticate(user, password)

    async def _negotiate_ssl(self, host: str) -> None:
        """SSLRequest (8-byte message, code 80877103): server answers one
        raw byte — 'S' upgrade to TLS, 'N' stay plaintext."""
        assert self._writer is not None and self._reader is not None
        self._writer.write(struct.pack("!II", 8, SSL_REQUEST_CODE))
        await self._drain()
        try:
            answer = await asyncio.wait_for(
                self._reader.readexactly(1), self.timeout_s)
        except Exception as exc:
            raise PGError(f"ssl negotiation failed: {exc}") from exc
        if answer == b"S":
            ctx = ssl_mod.SSLContext(ssl_mod.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False
            ctx.verify_mode = ssl_mod.CERT_NONE
            try:
                await asyncio.wait_for(
                    self._writer.start_tls(ctx, server_hostname=host),
                    self.timeout_s)
            except Exception as exc:
                raise PGError(f"tls handshake failed: {exc}") from exc
            self.tls_active = True
        elif answer == b"N":
            if self.ssl_mode == "require":
                raise PGError("server declined SSL but ssl=require")
        else:
            raise PGError(f"unexpected SSLRequest answer {answer!r}")

    async def _drain(self) -> None:
        assert self._writer is not None
        try:
            await asyncio.wait_for(self._writer.drain(), self.timeout_s)
        except Exception as exc:
            raise PGError(f"write failed: {exc}") from exc

    async def _recv(self) -> Tuple[bytes, bytes]:
        """Read one backend message -> (type byte, payload)."""
        assert self._reader is not None
        try:
            head = await asyncio.wait_for(
                self._reader.readexactly(5), self.timeout_s)
        except Exception as exc:
            raise PGError(f"read failed: {exc}") from exc
        mtype, length = head[:1], struct.unpack("!I", head[1:])[0]
        if length < 4 or length > 1 << 24:
            raise PGError(f"bad message length {length}")
        try:
            payload = await asyncio.wait_for(
                self._reader.readexactly(length - 4), self.timeout_s)
        except Exception as exc:
            raise PGError(f"read failed: {exc}") from exc
        return mtype, payload

    def _send(self, mtype: bytes, payload: bytes) -> None:
        assert self._writer is not None
        self._writer.write(mtype + struct.pack("!I", len(payload) + 4)
                           + payload)

    @staticmethod
    def _error_text(payload: bytes) -> str:
        # ErrorResponse: sequence of (field-type byte, cstring), 0-terminated.
        fields = {}
        i = 0
        while i < len(payload) and payload[i: i + 1] != b"\x00":
            code = payload[i: i + 1]
            end = payload.index(b"\x00", i + 1)
            fields[code] = payload[i + 1: end].decode("utf-8", "replace")
            i = end + 1
        return fields.get(b"M", "unknown server error")

    async def _authenticate(self, user: str, password: str) -> None:
        scram: Optional[ScramSha256] = None
        while True:
            mtype, payload = await self._recv()
            if mtype == b"E":
                raise PGError(f"server error: {self._error_text(payload)}")
            if mtype == b"R":
                code = struct.unpack("!I", payload[:4])[0]
                if code == AUTH_OK:
                    break
                if code == AUTH_CLEARTEXT:
                    self._send(b"p", _cstr(password))
                elif code == AUTH_MD5:
                    salt = payload[4:8]
                    self._send(b"p",
                               md5_password(user, password, salt) + b"\x00")
                elif code == AUTH_SASL:
                    # Mechanism list: cstrings, empty-terminated. We offer
                    # SCRAM-SHA-256 (never -PLUS: no channel binding).
                    mechs = [m.decode() for m in
                             payload[4:].split(b"\x00") if m]
                    if ScramSha256.MECHANISM not in mechs:
                        raise PGError(
                            f"no shared SASL mechanism (server: {mechs})")
                    scram = ScramSha256(user, password)
                    first = scram.client_first()
                    self._send(b"p", _cstr(ScramSha256.MECHANISM)
                               + struct.pack("!I", len(first)) + first)
                elif code == AUTH_SASL_CONTINUE:
                    if scram is None:
                        raise PGError("sasl-continue before sasl start")
                    self._send(b"p", scram.client_final(payload[4:]))
                elif code == AUTH_SASL_FINAL:
                    if scram is None:
                        raise PGError("sasl-final before sasl start")
                    scram.verify_server_final(payload[4:])
                    continue                  # AuthenticationOk follows
                else:
                    # Name the method so a total-denial is diagnosable at
                    # startup (round-4 advisor finding).
                    name = _AUTH_NAMES.get(code, "unknown")
                    raise PGError(
                        f"unsupported auth method {code} ({name}); this "
                        f"client speaks cleartext, md5, and scram-sha-256")
                await self._drain()
            else:
                raise PGError(f"unexpected message {mtype!r} during auth")
        # ParameterStatus / BackendKeyData / NoticeResponse until ReadyForQuery.
        while True:
            mtype, payload = await self._recv()
            if mtype == b"Z":
                return
            if mtype == b"E":
                raise PGError(f"server error: {self._error_text(payload)}")
            if mtype not in (b"S", b"K", b"N"):
                raise PGError(f"unexpected message {mtype!r} before ready")

    async def fetchrow(self, query: str,
                       params: List[str]) -> Optional[List[Optional[str]]]:
        """Run one parameterized query; return the first row's text columns
        (None per NULL column), or None when no row matched."""
        if self._writer is None:
            raise PGError("not connected")
        # Parse (unnamed statement, parameter types inferred by the server)
        self._send(b"P", _cstr("") + _cstr(query) + struct.pack("!H", 0))
        # Bind: text-format parameters, text-format results
        bind = _cstr("") + _cstr("") + struct.pack("!H", 0)
        bind += struct.pack("!H", len(params))
        for p in params:
            raw = p.encode("utf-8")
            bind += struct.pack("!I", len(raw)) + raw
        bind += struct.pack("!H", 0)
        self._send(b"B", bind)
        # Execute (unnamed portal, no row limit) + Sync
        self._send(b"E", _cstr("") + struct.pack("!I", 0))
        self._send(b"S", b"")
        await self._drain()

        row: Optional[List[Optional[str]]] = None
        error: Optional[str] = None
        while True:
            mtype, payload = await self._recv()
            if mtype == b"Z":                        # ReadyForQuery ends round
                break
            if mtype == b"E":
                error = self._error_text(payload)    # Sync still delivers Z
            elif mtype == b"D" and row is None:
                ncols = struct.unpack("!H", payload[:2])[0]
                cols: List[Optional[str]] = []
                off = 2
                for _ in range(ncols):
                    (ln,) = struct.unpack("!i", payload[off: off + 4])
                    off += 4
                    if ln < 0:
                        cols.append(None)
                    else:
                        cols.append(payload[off: off + ln].decode(
                            "utf-8", "replace"))
                        off += ln
                row = cols
            elif mtype not in (b"1", b"2", b"T", b"D", b"C", b"n", b"N", b"s"):
                raise PGError(f"unexpected message {mtype!r} in query round")
        if error is not None:
            raise PGError(f"query failed: {error}")
        return row

    async def close(self) -> None:
        if self._writer is not None:
            try:
                self._send(b"X", b"")                # Terminate
                await self._writer.drain()
                self._writer.close()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass
            self._writer = None
            self._reader = None
