"""End-to-end serving benchmark (BASELINE.json config 5).

Builds a synthetic corpus, starts the native HTTP server in-process with the
offline generation backend, fires /ask requests in two phases — sequential
B=1 (interactive latency) and concurrent (throughput) — and reports exact
end-to-end percentiles plus the engine's per-stage histograms
(HTTP -> embed -> cache probe -> search -> prompt -> generate -> respond).

The per-dispatch tunnel overhead (this environment reaches the TPU through a
relay; ~29 ms per device call) is measured separately so device-side numbers
are interpretable against the BASELINE <5 ms retrieval / <50 ms serve targets.

Writes scripts/serve_bench_results.json.

Usage: python scripts/serve_bench.py [--n_chunks=20000] [--n_requests=512]
       [--concurrency=64] [--batching=true]
"""

import asyncio
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "serve_bench_results.json")


def parse_flag(argv, name, default, cast):
    for a in argv:
        if a.startswith(f"--{name}="):
            v = a.split("=", 1)[1]
            return cast(v) if cast is not bool else v.lower() == "true"
    return default


def pctiles(latencies):
    s = sorted(latencies)
    n = len(s)
    return {
        "n": n,
        "mean_ms": round(statistics.mean(s) * 1e3, 2),
        "p50_ms": round(s[n // 2] * 1e3, 2),
        "p95_ms": round(s[min(n - 1, int(n * 0.95))] * 1e3, 2),
        "p99_ms": round(s[min(n - 1, int(n * 0.99))] * 1e3, 2),
        "max_ms": round(s[-1] * 1e3, 2),
    }


def measure_dispatch_overhead(device):
    """Round-trip cost of a trivial device program (tunnel dispatch floor)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jax.device_put(jnp.ones((8, 8), jnp.float32), device)
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))  # compile
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        np.asarray(f(x))
        times.append(time.perf_counter() - t0)
    return round(min(times) * 1e3, 2)


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
    dispatch_ms = measure_dispatch_overhead(device)
    print(f"tunnel dispatch overhead: {dispatch_ms} ms/call", file=sys.stderr)

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
    sem = asyncio.Semaphore(concurrency)

    async def one(client, i, latencies, query=None):
        async with sem:
            t0 = time.perf_counter()
            r = await client.post(url, json={
                "query": query
                or f"what is the outcome of treatment for disease{i % 97}",
                "chat_id": f"c{i % 16}",
                "top_k": 3,
            }, timeout=120.0)
            latencies.append(time.perf_counter() - t0)
            assert r.status_code == 200, r.text

    results = {
        "config": {"n_chunks": n_chunks, "n_requests": n_requests,
                   "concurrency": concurrency, "batching": batching,
                   "device": str(device), "generation": "offline-echo"},
        "tunnel_dispatch_overhead_ms": dispatch_ms,
    }

    from sqe_tpu.utils import dispatch

    def dispatch_summary(delta, n_req, p50_ms):
        """Per-request device round-trips + the hardware-honest latency:
        p50 minus the measured tunnel floor per dispatch (VERDICT r02 #3 —
        on non-tunneled hardware those round-trips are ~0.1 ms each)."""
        per_req = delta["program_total"] / max(1, n_req)
        return {
            "programs_per_request": round(per_req, 2),
            "syncs_per_request": round(delta["sync_total"] / max(1, n_req), 2),
            "programs_by_site": delta["programs"],
            "p50_minus_tunnel_floor_ms": round(
                p50_ms - per_req * dispatch_ms, 1),
        }

    async with httpx.AsyncClient() as client:
        warm = []
        await one(client, 0, warm)   # compile warmup

        # Phase 1: sequential B=1 — interactive latency.
        seq_lat = []
        n_seq = min(64, n_requests)
        before = dispatch.snapshot()
        for i in range(n_seq):
            await one(client, 1000 + i, seq_lat)
        seq_delta = dispatch.delta(before, dispatch.snapshot())
        results["sequential_b1"] = pctiles(seq_lat)
        results["sequential_b1"]["dispatches"] = dispatch_summary(
            seq_delta, n_seq, results["sequential_b1"]["p50_ms"])

        # Phase 2: concurrent mixed load (some repeats -> cache-hit path).
        conc_lat = []
        before = dispatch.snapshot()
        t0 = time.perf_counter()
        await asyncio.gather(*(one(client, i, conc_lat)
                               for i in range(n_requests)))
        wall = time.perf_counter() - t0
        conc_delta = dispatch.delta(before, dispatch.snapshot())
        results["concurrent"] = {
            **pctiles(conc_lat),
            "req_per_s": round(n_requests / wall, 1),
        }
        results["concurrent"]["dispatches"] = dispatch_summary(
            conc_delta, n_requests, results["concurrent"]["p50_ms"])
        results["concurrent"]["cache"] = dict(engine.stats()["cache"])

        # Phase 3: concurrent CACHE-COLD (VERDICT r03 #5). Phase 2's
        # queries differ in one word, so the semantic probe (tau=0.96)
        # served ~94% of them from cache and its percentiles mostly
        # measure the 1-dispatch hit path. Here every request carries a
        # disjoint per-request vocabulary (unique hash-tail tokens), so
        # no two queries can clear the probe threshold against each other
        # or against phases 1-2 — each request walks the FULL miss path
        # (embed -> probe miss -> search -> prompt -> generate -> cache
        # put) at concurrency. The phase's own hit/miss delta is recorded
        # so the 0%-hit claim is auditable.
        cold_lat = []
        hits0 = engine.stats()["cache"]["hits"]
        misses0 = engine.stats()["cache"]["misses"]
        before = dispatch.snapshot()
        t0 = time.perf_counter()
        await asyncio.gather(*(one(
            client, i, cold_lat,
            query=(f"coldq{i}alpha {i} outcome coldq{i}beta protocol "
                   f"coldq{i}gamma trial coldq{i}delta"))
            for i in range(n_requests)))
        wall = time.perf_counter() - t0
        cold_delta = dispatch.delta(before, dispatch.snapshot())
        cache_now = engine.stats()["cache"]
        results["concurrent_cold"] = {
            **pctiles(cold_lat),
            "req_per_s": round(n_requests / wall, 1),
            "cache_hits_delta": cache_now["hits"] - hits0,
            "cache_misses_delta": cache_now["misses"] - misses0,
        }
        results["concurrent_cold"]["dispatches"] = dispatch_summary(
            cold_delta, n_requests, results["concurrent_cold"]["p50_ms"])

    await server.stop()
    stats = engine.stats()
    results["stages"] = stats["stages"]
    results["cache"] = stats["cache"]
    if batching and engine._batcher is not None:
        results["batcher"] = {
            "requests": engine._batcher.requests,
            "device_batches": engine._batcher.batches,
        }

    for phase in ("sequential_b1", "concurrent", "concurrent_cold"):
        print(f"{phase}: {json.dumps(results[phase])}", file=sys.stderr)
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {RESULTS}", file=sys.stderr)
    return results


if __name__ == "__main__":
    argv = sys.argv[1:]
    asyncio.run(run(
        parse_flag(argv, "n_chunks", 20000, int),
        parse_flag(argv, "n_requests", 512, int),
        parse_flag(argv, "concurrency", 64, int),
        parse_flag(argv, "batching", True, bool),
    ))
