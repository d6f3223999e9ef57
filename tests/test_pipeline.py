"""Fused retrieval front-end: one device program == the three-call path."""

import numpy as np
import pytest

from sqe_tpu.cache import DeviceLFUCache
from sqe_tpu.config import CacheConfig, HNSWConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.index import HNSWIndex
from sqe_tpu.models import Embedder
from sqe_tpu.serving.pipeline import FusedFrontend


@pytest.fixture(scope="module")
def stack(small_model_cfg, cpu_device):
    emb = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    idx = HNSWIndex(HNSWConfig(M=4, ef_construction=32, ef_search=16),
                    embed_dim=small_model_cfg.embed_dim, device=cpu_device)
    chunks = [Chunk(f"PMC{i}.txt", 0, f"study {i} of pathology{i}") for i in range(20)]
    embs = emb.embed_texts([c.text for c in chunks], batch_size=20)
    idx.build(embs, chunks)
    cache = DeviceLFUCache(
        CacheConfig(capacity=8, embed_dim=small_model_cfg.embed_dim),
        device=cpu_device,
    )
    return emb, idx, cache


def test_fused_matches_unfused(stack):
    emb, idx, cache = stack
    fe = FusedFrontend(emb, cache, idx, k=3)
    assert fe.supported()
    texts = [f"question about pathology{i}" for i in range(4)]

    embs_f, cached_f, results_f = fe.retrieve(texts)
    # Unfused reference path.
    embs_u = emb.embed_texts(texts, batch_size=4)
    np.testing.assert_allclose(embs_f, embs_u, atol=1e-5)
    assert cached_f == [None] * 4
    scores, ids = idx.search_ids(embs_u, 3)
    for row in range(4):
        got = [m["doc_id"] for m, _s in results_f[row]]
        want = [idx.metas[int(i)]["doc_id"] for i in ids[row] if i >= 0]
        assert got == want


def test_fused_cache_hit_and_freq(stack):
    emb, idx, cache = stack
    fe = FusedFrontend(emb, cache, idx, k=3)
    embs, cached, _ = fe.retrieve(["a rare question zq1"])
    assert cached == [None]
    cache.put(embs[0], "stored answer")
    hits_before = cache.hits
    _, cached2, results2 = fe.retrieve(["a rare question zq1"])
    assert cached2 == ["stored answer"]
    assert results2 == [[]]
    assert cache.hits == hits_before + 1


def test_fused_padding_rows_ignored(stack):
    emb, idx, cache = stack
    fe = FusedFrontend(emb, cache, idx, k=3)
    misses_before = cache.misses
    _, cached, results = fe.retrieve(
        ["real question xk9", "", "", ""], n_real=1
    )
    assert len(cached) == 1 and len(results) == 1
    assert cache.misses == misses_before + 1


def test_fused_frontend_int8_storage_ranks_correctly(small_model_cfg,
                                                     cpu_device):
    """int8 FlatIndex rows carry per-row scales; the fused program must
    apply them (raw int8 dots are NOT scale-invariant across rows) and rank
    identically to the index's own search path."""
    import jax.numpy as jnp
    import numpy as np

    from sqe_tpu.cache import DeviceLFUCache
    from sqe_tpu.config import CacheConfig
    from sqe_tpu.index import FlatIndex
    from sqe_tpu.models import Embedder
    from sqe_tpu.serving.pipeline import FusedFrontend

    idx = FlatIndex(embed_dim=small_model_cfg.embed_dim, dtype=jnp.int8,
                    exact=False, device=cpu_device)
    emb = Embedder(small_model_cfg, device=cpu_device)
    texts = [f"medical note {i} about receptor{i}" for i in range(24)]
    v = emb.embed_texts(texts, batch_size=8)
    idx.add(v, [{"doc_id": str(i), "text": t} for i, t in enumerate(texts)])
    cache = DeviceLFUCache(
        CacheConfig(capacity=8, embed_dim=small_model_cfg.embed_dim),
        device=cpu_device,
    )
    fe = FusedFrontend(emb, cache, idx, k=3)
    assert fe.supported()
    _emb, cached, results = fe.retrieve(["receptor7 binding study"], k=3)
    assert cached == [None]
    _, ref_ids = idx.search_ids(emb.embed_texts(["receptor7 binding study"],
                                                batch_size=1), 3)
    got = [r[0]["doc_id"] for r in results[0]]
    assert got == [str(i) for i in ref_ids[0]]
