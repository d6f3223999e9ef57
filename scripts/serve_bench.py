"""End-to-end serving benchmark (BASELINE.json config 5).

Builds a synthetic corpus, starts the native HTTP server in-process with the
offline generation backend, fires concurrent /ask requests, and reports
throughput and latency percentiles for the full pipeline
(HTTP -> embed -> cache probe -> search -> prompt -> generate -> respond).

Usage: python scripts/serve_bench.py [--n_chunks=20000] [--n_requests=512]
       [--concurrency=64] [--batching=true]
"""

import asyncio
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_flag(argv, name, default, cast):
    for a in argv:
        if a.startswith(f"--{name}="):
            v = a.split("=", 1)[1]
            return cast(v) if cast is not bool else v.lower() == "true"
    return default


async def run(n_chunks, n_requests, concurrency, batching):
    import httpx
    import jax

    from sqe_tpu.config import EngineConfig
    from sqe_tpu.data.corpus import Chunk
    from sqe_tpu.serving.app import build_router
    from sqe_tpu.serving.engine import RAGEngine
    from sqe_tpu.serving.http import Server
    from sqe_tpu.utils.compile_cache import enable

    enable()
    device = jax.devices()[0]
    print(f"device: {device}, batching={batching}", file=sys.stderr)

    cfg = EngineConfig(index_kind="hnsw")
    engine = RAGEngine(cfg, device=device, batching=batching)
    chunks = [
        Chunk(f"PMC{i}.txt", 0,
              f"synthetic medical abstract {i} discussing disease{i % 97} "
              f"and treatment protocol {i % 31} outcomes")
        for i in range(n_chunks)
    ]
    t0 = time.perf_counter()
    engine.ingest_chunks(chunks)
    print(f"ingest {n_chunks} chunks: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    port = 8899
    server = Server(build_router(engine), "127.0.0.1", port)
    await server.start()
    if batching:
        t0 = time.perf_counter()
        warmed = await asyncio.to_thread(engine._get_batcher().prewarm_sync)
        print(f"prewarmed {warmed} programs in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    url = f"http://127.0.0.1:{port}/ask"
    latencies = []
    sem = asyncio.Semaphore(concurrency)

    async def one(client, i):
        async with sem:
            t0 = time.perf_counter()
            r = await client.post(url, json={
                "query": f"what is the outcome of treatment for disease{i % 97}",
                "chat_id": f"c{i % 16}",
                "top_k": 3,
            }, timeout=120.0)
            latencies.append(time.perf_counter() - t0)
            assert r.status_code == 200, r.text

    async with httpx.AsyncClient() as client:
        # warmup (compile)
        await one(client, 0)
        latencies.clear()
        t0 = time.perf_counter()
        await asyncio.gather(*(one(client, i) for i in range(n_requests)))
        wall = time.perf_counter() - t0

    await server.stop()
    lat_sorted = sorted(latencies)
    p50 = lat_sorted[len(lat_sorted) // 2]
    p99 = lat_sorted[int(len(lat_sorted) * 0.99)]
    stats = engine.stats()
    print(
        f"{n_requests} requests, concurrency {concurrency}: "
        f"{n_requests/wall:.0f} req/s, p50 {p50*1e3:.1f} ms, "
        f"p99 {p99*1e3:.1f} ms, mean {statistics.mean(latencies)*1e3:.1f} ms",
        file=sys.stderr,
    )
    print(f"cache: {stats['cache']}", file=sys.stderr)
    if batching and engine._batcher is not None:
        print(
            f"batcher: {engine._batcher.requests} reqs in "
            f"{engine._batcher.batches} device batches",
            file=sys.stderr,
        )
    return n_requests / wall, p50


if __name__ == "__main__":
    argv = sys.argv[1:]
    asyncio.run(run(
        parse_flag(argv, "n_chunks", 20000, int),
        parse_flag(argv, "n_requests", 512, int),
        parse_flag(argv, "concurrency", 64, int),
        parse_flag(argv, "batching", True, bool),
    ))
