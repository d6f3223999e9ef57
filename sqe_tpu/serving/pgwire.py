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
import hashlib
import struct
from typing import List, Optional, Tuple

PROTOCOL_V3 = 196608  # (3 << 16) | 0

AUTH_OK = 0
AUTH_CLEARTEXT = 3
AUTH_MD5 = 5


class PGError(Exception):
    """Any connection/auth/query failure (callers fail closed on it)."""


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def md5_password(user: str, password: str, salt: bytes) -> bytes:
    """PG MD5 auth response: 'md5' + hex(md5(hex(md5(password+user)) + salt))."""
    inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
    outer = hashlib.md5(inner.encode() + salt).hexdigest()
    return b"md5" + outer.encode()


class PGWireClient:
    """One connection, one extended-query at a time. Not a pool — the auth
    hook opens per check, exactly like the reference's per-check
    ``asyncpg.connect`` (embedding_gen.py:264-279)."""

    def __init__(self, timeout_s: float = 5.0):
        self.timeout_s = timeout_s
        self._reader: Optional[asyncio.StreamReader] = None
        self._writer: Optional[asyncio.StreamWriter] = None

    async def connect(self, host: str, port: int, user: str,
                      password: str, database: str) -> None:
        try:
            self._reader, self._writer = await asyncio.wait_for(
                asyncio.open_connection(host, port), self.timeout_s)
        except Exception as exc:
            raise PGError(f"connect to {host}:{port} failed: {exc}") from exc
        params = _cstr("user") + _cstr(user) + _cstr("database") + \
            _cstr(database) + b"\x00"
        body = struct.pack("!I", PROTOCOL_V3) + params
        self._writer.write(struct.pack("!I", len(body) + 4) + body)
        await self._drain()
        await self._authenticate(user, password)

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
                else:
                    raise PGError(f"unsupported auth method {code}")
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
