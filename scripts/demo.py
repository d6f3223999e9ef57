"""Two-minute end-to-end demo: build a tiny index, serve it, query it.

Runs anywhere (CPU included):

    python scripts/demo.py [--corpus_dir=/path/to/PMC] [--files=20]

With a corpus dir it indexes real documents; without one it makes a small
synthetic corpus. Starts the HTTP/WS server in-process, issues an /ask (twice,
to show the semantic-cache hit), streams a /ws/ask answer, uploads a document
into a tenant namespace, and prints /stats.
"""

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flag(argv, name, default, cast=str):
    for a in argv:
        if a.startswith(f"--{name}="):
            return cast(a.split("=", 1)[1])
    return default


async def main(argv):
    import httpx
    import websockets

    from sqe_tpu.config import EngineConfig
    from sqe_tpu.data.corpus import Chunk
    from sqe_tpu.serving.app import build_router
    from sqe_tpu.serving.engine import RAGEngine
    from sqe_tpu.serving.http import Server

    corpus_dir = flag(argv, "corpus_dir", "")
    n_files = flag(argv, "files", 20, int)

    engine = RAGEngine(EngineConfig(), batching=True)
    t0 = time.perf_counter()
    if corpus_dir and os.path.isdir(corpus_dir):
        n = engine.build_from_corpus(corpus_dir, limit_files=n_files)
        question = "What is known about tuberculosis treatment?"
    else:
        chunks = [
            Chunk(f"PMC{i}.txt", 0,
                  f"Synthetic abstract {i}: condition{i % 7} responds to "
                  f"protocol {i % 3} with measurable outcomes.")
            for i in range(40)
        ]
        n = engine.ingest_chunks(chunks)
        question = "How is condition3 treated?"
    print(f"[demo] indexed {n} chunks in {time.perf_counter()-t0:.1f}s")

    port = 8901
    server = Server(build_router(engine), "127.0.0.1", port)
    await server.start()
    base = f"http://127.0.0.1:{port}"

    async with httpx.AsyncClient(timeout=120) as client:
        info = (await client.get(base + "/")).json()
        print(f"[demo] service: {info['title']}")

        t0 = time.perf_counter()
        r = await client.post(base + "/ask", json={
            "query": question, "chat_id": "demo", "top_k": 3})
        print(f"[demo] /ask ({time.perf_counter()-t0:.2f}s): "
              f"{r.json()['answer'][:120]}")

        t0 = time.perf_counter()
        r = await client.post(base + "/ask", json={
            "query": question, "chat_id": "demo"})
        print(f"[demo] /ask again ({time.perf_counter()-t0:.2f}s, "
              f"semantic-cache hit): {r.json()['answer'][:60]}...")

        files = {"files": ("note.txt",
                           b"An uploaded note about dialysis outcomes. " * 30,
                           "text/plain")}
        r = await client.post(base + "/upload_text",
                              data={"user_id": "tenant1"}, files=files)
        print(f"[demo] /upload_text: {r.json()}")

    async with websockets.connect(f"ws://127.0.0.1:{port}/ws/ask") as ws:
        await ws.send(json.dumps({"query": question, "top_k": 2}))
        chunks_out = []
        try:
            while True:
                chunks_out.append(await asyncio.wait_for(ws.recv(), timeout=30))
        except Exception:  # noqa: BLE001 - server closes when done
            pass
        print(f"[demo] /ws/ask streamed {len(chunks_out)} frame(s): "
              f"{''.join(chunks_out)[:100]}")

    async with httpx.AsyncClient() as client:
        stats = (await client.get(base + "/stats")).json()
        print(f"[demo] /stats: index={stats['index']} cache={stats['cache']}")

    await server.stop()
    print("[demo] done")


if __name__ == "__main__":
    asyncio.run(main(sys.argv[1:]))
