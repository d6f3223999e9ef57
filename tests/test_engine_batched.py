"""Engine with micro-batching enabled: same answers, coalesced device calls."""

import asyncio

import pytest

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.engine import RAGEngine


@pytest.fixture(scope="module")
def engine(small_engine_cfg, cpu_device):
    eng = RAGEngine(small_engine_cfg, device=cpu_device, batching=True)
    eng.ingest_chunks(
        [Chunk(f"PMC{i}.txt", 0, f"report {i} about syndrome{i}") for i in range(12)]
    )
    return eng


def test_concurrent_asks_coalesce(engine):
    async def main():
        answers = await asyncio.gather(
            *(engine.ask(f"what about syndrome{i}", chat_id=f"c{i}") for i in range(6))
        )
        await engine._get_batcher().stop()
        return answers

    answers = asyncio.run(main())
    assert len(answers) == 6
    for a in answers:
        assert "Document PMC" in a
    assert engine._get_batcher().batches <= 3
    assert engine._get_batcher().requests == 6


def test_batched_cache_roundtrip(engine):
    async def main():
        a1 = await engine.ask("a question about syndrome2", chat_id="x")
        a2 = await engine.ask("a question about syndrome2", chat_id="x")
        await engine._get_batcher().stop()
        return a1, a2

    a1, a2 = asyncio.run(main())
    assert a1 == a2
    assert engine.cache.hits >= 1
