"""Micro-batched retrieval: concurrent requests share device programs."""

import asyncio

import pytest

from sqe_tpu.cache import DeviceLFUCache
from sqe_tpu.config import CacheConfig, HNSWConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.index import HNSWIndex
from sqe_tpu.models import Embedder
from sqe_tpu.serving.batcher import RetrievalBatcher


@pytest.fixture(scope="module")
def stack(small_model_cfg, cpu_device):
    emb = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    idx = HNSWIndex(HNSWConfig(M=4, ef_construction=32, ef_search=16),
                    embed_dim=small_model_cfg.embed_dim, device=cpu_device)
    chunks = [Chunk(f"PMC{i}.txt", 0, f"article {i} about condition{i}") for i in range(16)]
    embs = emb.embed_texts([c.text for c in chunks], batch_size=16)
    idx.build(embs, chunks)
    cache = DeviceLFUCache(
        CacheConfig(capacity=8, embed_dim=small_model_cfg.embed_dim),
        device=cpu_device,
    )
    return emb, idx, cache


def test_concurrent_requests_coalesce(stack):
    emb, idx, cache = stack
    batcher = RetrievalBatcher(emb, cache, idx, max_batch=8, flush_ms=20.0)

    async def main():
        results = await asyncio.gather(
            *(batcher.retrieve(f"tell me about condition{i}") for i in range(8))
        )
        await batcher.stop()
        return results

    results = asyncio.run(main())
    assert len(results) == 8
    for r in results:
        assert r.cached is None
        assert len(r.results) == 3
        assert r.query_emb.shape[0] == 1
    # All 8 went through at most 2 flushes (coalesced, not per-request).
    assert batcher.batches <= 2
    assert batcher.requests == 8


def test_batched_cache_hits(stack):
    emb, idx, cache = stack
    batcher = RetrievalBatcher(emb, cache, idx, max_batch=4, flush_ms=5.0)

    async def main():
        r1 = await batcher.retrieve("what is condition3")
        cache.put(r1.query_emb, "a cached answer")
        r2 = await batcher.retrieve("what is condition3")
        await batcher.stop()
        return r1, r2

    r1, r2 = asyncio.run(main())
    assert r1.cached is None
    assert r2.cached == "a cached answer"
    assert r2.results == []


def test_prewarm(stack):
    emb, idx, cache = stack
    batcher = RetrievalBatcher(emb, cache, idx, max_batch=8)
    warmed = batcher.prewarm_sync()
    assert warmed == 4  # buckets 1, 2, 4, 8
    misses_before = cache.misses

    async def main():
        r = await batcher.retrieve("post-warm question about condition1")
        await batcher.stop()
        return r

    import asyncio as _a
    r = _a.run(main())
    assert len(r.results) == 3
    # Prewarm rows never touched cache counters (n_real=0).
    assert cache.misses == misses_before + 1


def test_fused_binds_after_late_ingest(small_engine_cfg, cpu_device):
    """A batch served before the first ingest must not latch the unfused
    path: once the index has data, the next flush binds the fused frontend."""
    import asyncio

    from sqe_tpu.data.corpus import Chunk
    from sqe_tpu.serving.engine import RAGEngine

    eng = RAGEngine(small_engine_cfg, device=cpu_device, batching=True)

    async def ask_one(q):
        r = await eng.ask(q, chat_id="c")
        return r

    # Empty index: request succeeds (no context), fused unbound.
    first = asyncio.run(ask_one("anything at all"))
    assert eng._get_batcher()._fused is None
    eng.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i} about ligand{i}")
                       for i in range(8)])
    second = asyncio.run(ask_one("ligand5 affinity"))
    assert "Document PMC" in second
    assert eng._get_batcher()._fused is not None
    assert first is not None
