"""WebSocket framing edge cases against the native server (RFC 6455)."""

import asyncio
import json

import pytest
import websockets

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.app import build_router
from sqe_tpu.serving.engine import RAGEngine
from sqe_tpu.serving.http import Server

PORT = 8941


@pytest.fixture(scope="module")
def engine(small_engine_cfg, cpu_device):
    eng = RAGEngine(small_engine_cfg, device=cpu_device)
    eng.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"note {i} about gene{i}") for i in range(8)])
    return eng


def run_ws(engine, fn):
    async def main():
        server = Server(build_router(engine), "127.0.0.1", PORT)
        await server.start()
        try:
            return await fn()
        finally:
            await server.stop()

    return asyncio.run(main())


def test_ping_pong_midstream(engine):
    async def fn():
        async with websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask") as ws:
            pong = await ws.ping()
            await asyncio.wait_for(pong, timeout=5)
            await ws.send(json.dumps({"query": "gene3", "top_k": 2}))
            chunks = []
            try:
                while True:
                    chunks.append(await asyncio.wait_for(ws.recv(), timeout=10))
            except (websockets.ConnectionClosed, asyncio.TimeoutError):
                pass
            return "".join(chunks)

    assert "Document PMC" in run_ws(engine, fn)


def test_invalid_json_frame(engine):
    async def fn():
        async with websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask") as ws:
            await ws.send("this is not json {")
            return await asyncio.wait_for(ws.recv(), timeout=10)

    assert run_ws(engine, fn) == "[ERROR] invalid JSON"


def test_large_query_frame(engine):
    """>64KB payload exercises the 16-bit/64-bit length paths."""
    async def fn():
        big = "gene5 " * 20_000  # ~120 KB text frame
        async with websockets.connect(
            f"ws://127.0.0.1:{PORT}/ws/ask", max_size=None
        ) as ws:
            await ws.send(json.dumps({"query": big, "top_k": 1}))
            chunks = []
            try:
                while True:
                    chunks.append(await asyncio.wait_for(ws.recv(), timeout=15))
            except (websockets.ConnectionClosed, asyncio.TimeoutError):
                pass
            return "".join(chunks)

    out = run_ws(engine, fn)
    assert out  # server answered rather than dying on the long frame


def test_client_disconnect_midstream_no_crash(engine):
    async def fn():
        ws = await websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask")
        await ws.send(json.dumps({"query": "gene2", "top_k": 2}))
        # read one chunk then drop the connection abruptly
        await asyncio.wait_for(ws.recv(), timeout=10)
        await ws.close()
        # server must still answer a fresh connection
        async with websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask") as ws2:
            await ws2.send(json.dumps({"query": "gene1", "top_k": 1}))
            return await asyncio.wait_for(ws2.recv(), timeout=10)

    assert run_ws(engine, fn)


def test_ws_optional_chat_memory(engine):
    """chat_id in the WS payload opts into conversation memory (an extension
    over the reference, whose WS path had none — SURVEY B6)."""
    async def fn():
        async with websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask") as ws:
            await ws.send(json.dumps({"query": "a ws question about gene6",
                                      "top_k": 2, "chat_id": "wschat"}))
            try:
                while True:
                    await asyncio.wait_for(ws.recv(), timeout=10)
            except (websockets.ConnectionClosed, asyncio.TimeoutError):
                pass
        return engine.memory.get("wschat").buffer_as_str

    history = run_ws(engine, fn)
    assert "a ws question about gene6" in history


def test_fragmented_text_message(engine):
    """A client that fragments its text message (FIN=0 + continuation frames,
    RFC 6455 §5.4) must get a normal response — previously continuation
    frames were silently dropped."""
    async def fn():
        async with websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask") as ws:
            payload = json.dumps({"query": "gene4", "top_k": 2})
            third = len(payload) // 3
            # websockets sends an iterable as one fragmented message.
            await ws.send([payload[:third], payload[third:2 * third],
                           payload[2 * third:]])
            chunks = []
            try:
                while True:
                    chunks.append(await asyncio.wait_for(ws.recv(), timeout=10))
            except (websockets.ConnectionClosed, asyncio.TimeoutError):
                pass
            return "".join(chunks)

    assert "Document PMC" in run_ws(engine, fn)
