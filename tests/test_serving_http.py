"""Integration tests for the native HTTP/WS server: the reference's API
surface end-to-end with a stubbed generation backend (SURVEY.md §4)."""

import asyncio
import json

import httpx
import pytest
import websockets

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.app import build_router
from sqe_tpu.serving.engine import RAGEngine
from sqe_tpu.serving.http import Server

PORT = 8931


@pytest.fixture(scope="module")
def server_engine(small_engine_cfg, cpu_device, tmp_path_factory):
    eng = RAGEngine(small_engine_cfg, device=cpu_device)
    eng.ingest_chunks(
        [Chunk(f"PMC{i}.txt", 0, f"note {i} on disease{i} treatment") for i in range(12)]
    )
    upload_dir = str(tmp_path_factory.mktemp("uploads"))
    return eng, upload_dir


async def _with_server(engine, upload_dir, fn):
    server = Server(build_router(engine, upload_dir=upload_dir), "127.0.0.1", PORT)
    await server.start()
    try:
        return await fn()
    finally:
        await server.stop()


def run(engine, upload_dir, fn):
    return asyncio.run(_with_server(engine, upload_dir, fn))


def test_health_and_404(server_engine):
    eng, up = server_engine

    async def fn():
        async with httpx.AsyncClient() as c:
            h = await c.get(f"http://127.0.0.1:{PORT}/health")
            nf = await c.get(f"http://127.0.0.1:{PORT}/nope")
            return h, nf

    h, nf = run(eng, up, fn)
    assert h.status_code == 200 and h.json()["indexed"] == 12
    assert nf.status_code == 404


def test_ask_route_contract(server_engine):
    eng, up = server_engine

    async def fn():
        async with httpx.AsyncClient() as c:
            url = f"http://127.0.0.1:{PORT}/ask"
            ok = await c.post(url, json={"query": "disease5", "chat_id": "c", "top_k": 2})
            empty = await c.post(url, json={"query": "  ", "chat_id": "c"})
            nochat = await c.post(url, json={"query": "disease5"})
            return ok, empty, nochat

    ok, empty, nochat = run(eng, up, fn)
    body = ok.json()
    assert body["query"] == "disease5" and "Document PMC" in body["answer"]
    assert empty.json()["answer"] == "[ERROR] Empty query."
    assert nochat.json()["answer"] == "[ERROR] Incorrect account/chat details!"


def test_websocket_stream(server_engine):
    eng, up = server_engine

    async def fn():
        async with websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask") as ws:
            await ws.send(json.dumps({"query": "disease3 treatment", "top_k": 2}))
            chunks = []
            try:
                while True:
                    chunks.append(await asyncio.wait_for(ws.recv(), timeout=15))
            except (websockets.ConnectionClosed, asyncio.TimeoutError):
                pass
            return "".join(chunks)

    answer = run(eng, up, fn)
    assert "Document PMC" in answer


def test_websocket_empty_query(server_engine):
    eng, up = server_engine

    async def fn():
        async with websockets.connect(f"ws://127.0.0.1:{PORT}/ws/ask") as ws:
            await ws.send(json.dumps({"query": ""}))
            return await asyncio.wait_for(ws.recv(), timeout=10)

    assert run(eng, up, fn) == "[ERROR] Empty query."


def test_upload_text_roundtrip(server_engine):
    eng, up = server_engine

    async def fn():
        async with httpx.AsyncClient() as c:
            url = f"http://127.0.0.1:{PORT}/upload_text"
            good = await c.post(
                url,
                data={"user_id": "user1"},
                files={"files": ("report.txt", b"kidney dialysis notes " * 40, "text/plain")},
            )
            bad_ext = await c.post(
                url,
                data={"user_id": "user1"},
                files={"files": ("evil.exe", b"binary", "application/octet-stream")},
            )
            noauth = await c.post(
                url,
                data={"user_id": "  "},
                files={"files": ("a.txt", b"text", "text/plain")},
            )
            return good, bad_ext, noauth

    good, bad_ext, noauth = run(eng, up, fn)
    assert good.status_code == 200
    assert "Uploaded 1 files" in good.json()
    assert bad_ext.status_code == 403
    assert noauth.status_code == 403
    # chunks landed in the per-user namespace, not the default corpus
    assert eng.get_index("user1") is not None
    assert len(eng.get_index("user1")) >= 1
    assert len(eng.index) == 12
