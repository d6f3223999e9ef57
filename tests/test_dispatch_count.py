"""Pin the device-dispatch budget per /ask request (VERDICT r02 #3).

Through the dev tunnel every device round-trip has a ~29 ms floor
(DESIGN.md section 9), so serve latency is `dispatches x floor + HTTP`.
These tests pin the counts so a regression that re-introduces an eager op
or an extra materialization on the serve path fails CI instead of showing
up as +29 ms of unexplained p50. Counts are recorded at our own dispatch
sites (utils/dispatch.py) and are platform-independent, so the pin holds
on the CPU suite.

Budget (audited by scripts/dispatch_audit.py):
- fused batched miss: 2 programs (fused front + fire-and-forget cache
  insert), 1 blocking sync — the reference paid 4 process boundaries here
  (Ollama, Redis, OpenSearch, LLM — app/main.py:467-548).
- fused batched hit: 1 program, 1 sync.
- unfused miss: 5 programs, 3 syncs (the measured 132.7 ms p50 of
  serve_bench r02 = 5 x 28.6 ms floor, now arithmetic not argument).
"""

import asyncio
import dataclasses

import pytest

from sqe_tpu.config import EngineConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.engine import RAGEngine
from sqe_tpu.serving.generation import EchoBackend
from sqe_tpu.utils import dispatch


def _build(small_engine_cfg, cpu_device, batching):
    cfg = dataclasses.replace(small_engine_cfg, index_kind="flat")
    eng = RAGEngine(cfg, device=cpu_device, backend=EchoBackend(),
                    batching=batching)
    chunks = [
        Chunk(f"PMC{i}.txt", 0,
              f"document {i} covers topic {i}: "
              + " ".join(f"term{i}w{j}" for j in range(16)))
        for i in range(32)
    ]
    eng.ingest_chunks(chunks)
    return eng


async def _delta(eng, query):
    before = dispatch.snapshot()
    answer = await eng.ask(query)
    after = dispatch.snapshot()
    assert answer
    return dispatch.delta(before, after)


@pytest.fixture
def flat_engine(small_engine_cfg, cpu_device):
    return lambda batching: _build(small_engine_cfg, cpu_device, batching)


def test_fused_batched_budget(flat_engine):
    async def run():
        eng = flat_engine(True)
        await eng.ask("warm the programs up")  # compiles out of the count
        d_miss = await _delta(eng, "what does document 7 say about topic 7")
        d_hit = await _delta(eng, "what does document 7 say about topic 7")
        await eng._batcher.stop()
        return d_miss, d_hit

    d_miss, d_hit = asyncio.run(run())
    # Miss: ONE fused front program (embed+probe+scan) + ONE packed sync on
    # the critical path; the post-answer cache insert is the only other
    # program and never blocks.
    assert d_miss["programs"] == {"fused_front": 1, "cache_insert": 1}
    assert d_miss["syncs"] == {"fused_front": 1}
    # Hit: the single fused program resolves the answer.
    assert d_hit["programs"] == {"fused_front": 1}
    assert d_hit["syncs"] == {"fused_front": 1}


def test_unfused_budget_documented(flat_engine):
    """The unfused path's cost is pinned too — it is the floor arithmetic
    that explains serve_bench r02's 132.7 ms p50 (5 x 28.6 ms)."""
    async def run():
        eng = flat_engine(False)
        await eng.ask("warm the programs up")
        d_miss = await _delta(eng, "what does document 9 say about topic 9")
        d_hit = await _delta(eng, "what does document 9 say about topic 9")
        return d_miss, d_hit

    d_miss, d_hit = asyncio.run(run())
    assert d_miss["program_total"] == 5
    assert d_miss["sync_total"] == 3
    assert d_hit["program_total"] == 2
    assert d_hit["sync_total"] == 2
