"""Native asyncio HTTP/1.1 + WebSocket server.

The reference rode on FastAPI/uvicorn (app/main.py:554-580, :738-739). This
framework ships its own small transport runtime instead: an asyncio protocol
server with

- HTTP/1.1 request parsing (keep-alive, Content-Length bodies),
- JSON and multipart/form-data body helpers (multipart serves the
  ``/upload_text`` file-upload contract, embedding_gen.py:315-343),
- RFC 6455 WebSocket upgrade + framing (text/binary/ping/pong/close,
  client-masked frames) for the ``/ws/ask`` token-streaming endpoint
  (app/main.py:650-735).

Handlers are ``async def handler(request) -> Response`` registered on a
``Router``; WebSocket handlers receive a ``WebSocket`` object with
``send_text`` / ``receive_text`` / ``close``.
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import json
import re
import struct
from dataclasses import dataclass, field
from typing import Any, Awaitable, Callable, Dict, List, Optional, Tuple
from urllib.parse import parse_qs, unquote, urlsplit

from sqe_tpu.utils.logging import get_logger

log = get_logger("serving.http")

_WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
MAX_BODY_BYTES = 256 * 1024 * 1024


@dataclass
class Request:
    method: str
    path: str
    query: Dict[str, List[str]]
    headers: Dict[str, str]
    body: bytes

    def json(self) -> Any:
        return json.loads(self.body.decode("utf-8") or "null")

    def form(self) -> Tuple[Dict[str, str], List[Tuple[str, bytes]]]:
        """Parse multipart/form-data -> (fields, [(filename, content), ...])."""
        ctype = self.headers.get("content-type", "")
        m = re.search(r'boundary="?([^";]+)"?', ctype)
        if not m:
            raise ValueError("not a multipart request")
        boundary = ("--" + m.group(1)).encode()
        fields: Dict[str, str] = {}
        files: List[Tuple[str, bytes]] = []
        for part in self.body.split(boundary):
            part = part.strip(b"\r\n")
            if not part or part == b"--":
                continue
            if b"\r\n\r\n" not in part:
                continue
            head, _, content = part.partition(b"\r\n\r\n")
            head_text = head.decode("utf-8", errors="replace")
            disp = re.search(r'name="([^"]*)"', head_text)
            fname = re.search(r'filename="([^"]*)"', head_text)
            if fname is not None:
                files.append((fname.group(1), content))
            elif disp is not None:
                fields[disp.group(1)] = content.decode("utf-8", errors="replace")
        return fields, files


@dataclass
class Response:
    status: int = 200
    body: bytes = b""
    content_type: str = "application/json"
    headers: Dict[str, str] = field(default_factory=dict)

    @staticmethod
    def json(payload: Any, status: int = 200) -> "Response":
        return Response(status=status, body=json.dumps(payload).encode("utf-8"))

    @staticmethod
    def text(payload: str, status: int = 200) -> "Response":
        return Response(status=status, body=payload.encode("utf-8"),
                        content_type="text/plain; charset=utf-8")

    def encode(self, keep_alive: bool) -> bytes:
        reason = {200: "OK", 400: "Bad Request", 403: "Forbidden",
                  404: "Not Found", 500: "Internal Server Error"}.get(self.status, "OK")
        lines = [f"HTTP/1.1 {self.status} {reason}"]
        headers = {
            "Content-Type": self.content_type,
            "Content-Length": str(len(self.body)),
            "Connection": "keep-alive" if keep_alive else "close",
            **self.headers,
        }
        lines += [f"{k}: {v}" for k, v in headers.items()]
        return ("\r\n".join(lines) + "\r\n\r\n").encode("utf-8") + self.body


class HTTPError(Exception):
    def __init__(self, status: int, detail: str):
        super().__init__(detail)
        self.status = status
        self.detail = detail


class WebSocketDisconnect(Exception):
    pass


class WebSocket:
    """Server side of one upgraded WebSocket connection."""

    def __init__(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        self._reader = reader
        self._writer = writer
        self.closed = False

    async def _read_frame(self) -> Tuple[int, bytes, bool]:
        header = await self._reader.readexactly(2)
        b1, b2 = header
        fin = bool(b1 & 0x80)
        opcode = b1 & 0x0F
        masked = bool(b2 & 0x80)
        length = b2 & 0x7F
        if length == 126:
            length = struct.unpack(">H", await self._reader.readexactly(2))[0]
        elif length == 127:
            length = struct.unpack(">Q", await self._reader.readexactly(8))[0]
        if length > MAX_BODY_BYTES:
            raise WebSocketDisconnect()
        mask = await self._reader.readexactly(4) if masked else b"\x00" * 4
        payload = await self._reader.readexactly(length)
        if masked:
            payload = bytes(c ^ mask[i % 4] for i, c in enumerate(payload))
        return opcode, payload, fin

    async def _send_frame(self, opcode: int, payload: bytes) -> None:
        if self.closed:
            return
        header = bytes([0x80 | opcode])
        n = len(payload)
        if n < 126:
            header += bytes([n])
        elif n < (1 << 16):
            header += bytes([126]) + struct.pack(">H", n)
        else:
            header += bytes([127]) + struct.pack(">Q", n)
        self._writer.write(header + payload)
        await self._writer.drain()

    async def receive_text(self) -> str:
        """Read the next text message, transparently handling ping/close and
        reassembling fragmented messages (RFC 6455 §5.4: a FIN=0 text frame
        followed by continuation frames, control frames may interleave)."""
        fragments: Optional[list] = None   # in-progress fragmented text
        while True:
            try:
                opcode, payload, fin = await self._read_frame()
            except (asyncio.IncompleteReadError, ConnectionResetError):
                self.closed = True
                raise WebSocketDisconnect()
            if opcode == 0x1:      # text
                if fin:
                    return payload.decode("utf-8", errors="replace")
                fragments = [payload]
            elif opcode == 0x0 and fragments is not None:  # continuation
                fragments.append(payload)
                if sum(len(p) for p in fragments) > MAX_BODY_BYTES:
                    raise WebSocketDisconnect()
                if fin:
                    return b"".join(fragments).decode("utf-8", errors="replace")
            elif opcode == 0x9:    # ping -> pong
                await self._send_frame(0xA, payload)
            elif opcode == 0x8:    # close
                await self.close()
                raise WebSocketDisconnect()
            # ignore binary/stray-continuation/pong for this API

    async def send_text(self, text: str) -> None:
        await self._send_frame(0x1, text.encode("utf-8"))

    async def close(self, code: int = 1000) -> None:
        if not self.closed:
            try:
                await self._send_frame(0x8, struct.pack(">H", code))
            except (ConnectionResetError, BrokenPipeError):
                pass
            self.closed = True


Handler = Callable[[Request], Awaitable[Response]]
WSHandler = Callable[[WebSocket, Request], Awaitable[None]]


class Router:
    def __init__(self) -> None:
        self.routes: Dict[Tuple[str, str], Handler] = {}
        self.ws_routes: Dict[str, WSHandler] = {}

    def route(self, method: str, path: str):
        def deco(fn: Handler) -> Handler:
            self.routes[(method.upper(), path)] = fn
            return fn
        return deco

    def websocket(self, path: str):
        def deco(fn: WSHandler) -> WSHandler:
            self.ws_routes[path] = fn
            return fn
        return deco


class Server:
    def __init__(self, router: Router, host: str = "0.0.0.0", port: int = 8000):
        self.router = router
        self.host = host
        self.port = port
        self._server: Optional[asyncio.AbstractServer] = None
        self._conns: set = set()

    async def start(self) -> None:
        self._server = await asyncio.start_server(
            self._handle_conn, self.host, self.port
        )
        log.info("listening on %s:%d", self.host, self.port)

    async def stop(self) -> None:
        # Close live keep-alive connections BEFORE wait_closed(): since
        # Python 3.12 wait_closed() also waits for all connection handlers,
        # and an idle keep-alive handler never finishes on its own — a
        # stopped server must not hang itself (or leave clients / a failover
        # router hanging on pooled sockets).
        for writer in list(self._conns):
            try:
                writer.close()
            except Exception:  # noqa: BLE001
                pass
        self._conns.clear()
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
            self._server = None

    async def serve_forever(self) -> None:
        await self.start()
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    async def _read_request(
        self, reader: asyncio.StreamReader
    ) -> Optional[Tuple[str, str, Dict[str, str], bytes]]:
        try:
            head = await reader.readuntil(b"\r\n\r\n")
        except (asyncio.IncompleteReadError, asyncio.LimitOverrunError,
                ConnectionResetError):
            return None
        lines = head.decode("latin-1").split("\r\n")
        try:
            method, target, _version = lines[0].split(" ", 2)
        except ValueError:
            return None
        headers: Dict[str, str] = {}
        for line in lines[1:]:
            if ":" in line:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0") or "0")
        if length > MAX_BODY_BYTES:
            return None
        body = await reader.readexactly(length) if length else b""
        return method.upper(), target, headers, body

    async def _handle_conn(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        self._conns.add(writer)
        try:
            while True:
                parsed = await self._read_request(reader)
                if parsed is None:
                    break
                method, target, headers, body = parsed
                split = urlsplit(target)
                path = unquote(split.path)
                request = Request(method, path, parse_qs(split.query), headers, body)

                if (
                    headers.get("upgrade", "").lower() == "websocket"
                    and path in self.router.ws_routes
                ):
                    await self._handle_websocket(reader, writer, request)
                    break

                keep_alive = headers.get("connection", "keep-alive").lower() != "close"
                handler = self.router.routes.get((method, path))
                if handler is None:
                    response = Response.json({"detail": "Not Found"}, status=404)
                else:
                    try:
                        response = await handler(request)
                    except HTTPError as exc:
                        response = Response.json({"detail": exc.detail}, exc.status)
                    except Exception as exc:  # noqa: BLE001
                        log.exception("handler error on %s %s", method, path)
                        response = Response.json({"detail": str(exc)}, status=500)
                writer.write(response.encode(keep_alive))
                await writer.drain()
                if not keep_alive:
                    break
        except (ConnectionResetError, BrokenPipeError):
            pass
        finally:
            self._conns.discard(writer)
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:  # noqa: BLE001
                pass

    async def _handle_websocket(
        self,
        reader: asyncio.StreamReader,
        writer: asyncio.StreamWriter,
        request: Request,
    ) -> None:
        key = request.headers.get("sec-websocket-key", "")
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_MAGIC).encode()).digest()
        ).decode()
        writer.write(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        ws = WebSocket(reader, writer)
        handler = self.router.ws_routes[request.path]
        try:
            await handler(ws, request)
        except WebSocketDisconnect:
            log.info("websocket client disconnected")
        except Exception:  # noqa: BLE001
            log.exception("websocket handler error on %s", request.path)
        finally:
            await ws.close()
