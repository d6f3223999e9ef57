"""Dispatch audit: count device round-trips per B=1 /ask request.

VERDICT r02 #3 asked for the serve-latency claim to be arithmetic over
*measured* dispatch counts instead of an argument. This script drives one
request per scenario through the real RAGEngine (echo generation, so only
retrieval-path dispatches are counted) and snapshots the per-site deltas
recorded by ``sqe_tpu.utils.dispatch``:

- ``programs``: jitted-executable executions (async device dispatches)
- ``syncs``:    host-blocking device->host materializations

Counts are platform-independent (the same Python call sites run on CPU and
TPU), so the audit runs on CPU and never touches the device claim. The
hardware-honest serve floor through the dev tunnel is then
``program_total x 28.6 ms`` (DESIGN.md section 9: measured per-dispatch
floor; syncs are a subset of programs' round-trips, counted separately to
show what actually blocks the event loop).

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python scripts/dispatch_audit.py [--out=scripts/dispatch_audit_results.json]

Reference workload being audited: app/main.py:467-548 (/ask) — the
reference paid four *process* boundaries per request (Ollama, Redis,
OpenSearch, OpenAI); the equivalent budget here is device dispatches.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TUNNEL_MS = 28.6  # measured per-dispatch floor, DESIGN.md section 9


def build_engine(batching: bool):
    import dataclasses

    import jax

    from sqe_tpu.config import CacheConfig, EngineConfig, ModelConfig
    from sqe_tpu.data.corpus import Chunk
    from sqe_tpu.serving.engine import RAGEngine
    from sqe_tpu.serving.generation import EchoBackend

    cfg = dataclasses.replace(
        EngineConfig(),
        model=ModelConfig(n_layers=2, d_model=128, embed_dim=128,
                          n_heads=4, max_len=64, vocab_size=4096),
        cache=CacheConfig(capacity=64, embed_dim=128),
        index_kind="flat",
    )
    eng = RAGEngine(cfg, device=jax.devices()[0], backend=EchoBackend(),
                    batching=batching)
    chunks = [
        Chunk(f"PMC{i}.txt", 0,
              f"document {i} covers topic {i}: "
              + " ".join(f"term{i}w{j}" for j in range(24)))
        for i in range(64)
    ]
    eng.ingest_chunks(chunks)
    return eng


async def drive(eng, query: str):
    from sqe_tpu.utils import dispatch

    before = dispatch.snapshot()
    answer = await eng.ask(query)
    after = dispatch.snapshot()
    return dispatch.delta(before, after), answer


async def main() -> dict:
    from sqe_tpu.utils import dispatch

    scenarios = {}
    for batching in (True, False):
        eng = build_engine(batching)
        mode = "fused_batched" if batching else "unfused"
        # Warm every program (compile + first-call paths) out of the count.
        await eng.ask("warmup query about topic 1")
        await asyncio.sleep(0.05)  # let fire-and-forget cache insert land
        dispatch.reset()

        d_miss, _ = await drive(eng, "what does document 7 say about topic 7")
        await asyncio.sleep(0.05)
        scenarios[f"{mode}_b1_miss"] = d_miss

        d_hit, _ = await drive(eng, "what does document 7 say about topic 7")
        await asyncio.sleep(0.05)
        scenarios[f"{mode}_b1_hit"] = d_hit

        if batching and eng._batcher is not None:
            await eng._batcher.stop()

    for name, d in scenarios.items():
        d["est_tunnel_floor_ms"] = round(d["program_total"] * TUNNEL_MS, 1)
    return scenarios


if __name__ == "__main__":
    out_path = "scripts/dispatch_audit_results.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    results = asyncio.run(main())
    payload = {"tunnel_ms_per_dispatch": TUNNEL_MS, "scenarios": results}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
