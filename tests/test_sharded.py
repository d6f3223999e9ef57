"""Distributed-without-a-cluster: 8-device CPU mesh (SURVEY.md §4).

Gates: sharded flat search must be exactly the single-device exact scan;
sharded HNSW must hit the recall gate; merge handles uneven/padded shards.
"""

import numpy as np
import pytest

from sqe_tpu.config import HNSWConfig
from sqe_tpu.index import FlatIndex
from sqe_tpu.parallel import ShardedFlatIndex, ShardedHNSWIndex


def _recall(ids, ref_ids):
    k = ref_ids.shape[1]
    return np.mean(
        [len(set(ids[i].tolist()) & set(ref_ids[i].tolist())) / k
         for i in range(len(ids))]
    )


@pytest.fixture(scope="module")
def data(make_clustered):
    rng = np.random.default_rng(11)
    vecs = make_clustered(rng, 4096, 64)
    queries = make_clustered(rng, 16, 64)
    metas = [{"doc_id": f"d{i}", "text": f"text {i}"} for i in range(len(vecs))]
    return vecs, queries, metas


def test_sharded_flat_equals_single_device(data, cpu_mesh, cpu_device):
    vecs, queries, metas = data
    flat = FlatIndex(embed_dim=64, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    ref_s, ref_i = flat.search_ids(queries, 10)
    sharded = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=512)
    sharded.build(vecs, metas)
    s, i = sharded.search_ids(queries, 10)
    np.testing.assert_array_equal(np.sort(i, 1), np.sort(ref_i, 1))
    np.testing.assert_allclose(np.sort(s, 1), np.sort(ref_s, 1), atol=1e-5)


def test_sharded_flat_uneven_count(data, cpu_mesh, cpu_device):
    vecs, queries, metas = data
    n = 1003  # not divisible by 8 -> pad rows must never be returned
    flat = FlatIndex(embed_dim=64, block_n=1024, device=cpu_device)
    flat.add(vecs[:n], metas[:n])
    _, ref_i = flat.search_ids(queries, 10)
    sharded = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=128)
    sharded.build(vecs[:n], metas[:n])
    _, i = sharded.search_ids(queries, 10)
    assert i.max() < n and i.min() >= 0
    np.testing.assert_array_equal(np.sort(i, 1), np.sort(ref_i, 1))


def test_sharded_hnsw_recall_gate(data, cpu_mesh, cpu_device):
    vecs, queries, metas = data
    flat = FlatIndex(embed_dim=64, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_i = flat.search_ids(queries, 10)
    sharded = ShardedHNSWIndex(
        cpu_mesh, HNSWConfig(M=8, ef_construction=100, ef_search=64), embed_dim=64
    )
    sharded.build(vecs, metas)
    _, i = sharded.search_ids(queries, 10)
    assert _recall(i, ref_i) >= 0.95


def test_sharded_search_contract(data, cpu_mesh):
    vecs, queries, metas = data
    sharded = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=512)
    assert sharded.search(queries[:1], 3) == []
    sharded.build(vecs, metas)
    res = sharded.search(vecs[:1], k=3)
    assert res[0][0]["doc_id"] == "d0"
    assert res[0][1] > 0.999


def test_sharded_flat_incremental_add_parity(data, cpu_mesh, cpu_device):
    """add() after build must return the same (score, id) sets as one bulk
    build — and ids must be stable global insertion ids."""
    vecs, queries, metas = data
    n0 = 3000
    bulk = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=512)
    bulk.build(vecs, metas)
    ref_s, ref_i = bulk.search_ids(queries, 10)

    inc = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=512)
    inc.build(vecs[:n0], metas[:n0])
    # several small adds (the /upload_text shape)
    for lo in range(n0, len(vecs), 257):
        hi = min(lo + 257, len(vecs))
        inc.add(vecs[lo:hi], metas[lo:hi])
    assert len(inc) == len(vecs)
    s, i = inc.search_ids(queries, 10)
    np.testing.assert_array_equal(np.sort(i, 1), np.sort(ref_i, 1))
    np.testing.assert_allclose(np.sort(s, 1), np.sort(ref_s, 1), atol=1e-5)
    # metas resolve through global ids
    res = inc.search(vecs[n0 + 5 : n0 + 6], k=1)
    assert res[0][0]["doc_id"] == f"d{n0 + 5}"


def test_sharded_flat_add_triggers_growth(data, cpu_mesh):
    """Inserting past per-shard capacity rebuilds at doubled capacity and
    keeps every id retrievable."""
    vecs, queries, metas = data
    idx = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=128)
    idx.build(vecs[:64], metas[:64])        # cap = 8/shard
    idx.add(vecs[64:1024], metas[64:1024])  # forces growth
    assert len(idx) == 1024
    res = idx.search(vecs[500:501], k=1)
    assert res[0][0]["doc_id"] == "d500"


def test_sharded_hnsw_incremental_add_recall(data, cpu_mesh, cpu_device):
    """Incremental per-shard insert_batch path: recall vs the exact scan must
    hold after a build + several adds, and new ids must be retrievable."""
    vecs, queries, metas = data
    n0 = 3072
    flat = FlatIndex(embed_dim=64, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_i = flat.search_ids(queries, 10)

    idx = ShardedHNSWIndex(
        cpu_mesh, HNSWConfig(M=8, ef_construction=100, ef_search=64), embed_dim=64
    )
    idx.build(vecs[:n0], metas[:n0])
    for lo in range(n0, len(vecs), 300):
        hi = min(lo + 300, len(vecs))
        idx.add(vecs[lo:hi], metas[lo:hi])
    assert len(idx) == len(vecs)
    _, i = idx.search_ids(queries, 10)
    assert _recall(i, ref_i) >= 0.95
    res = idx.search(vecs[n0 + 7 : n0 + 8], k=1)
    assert res[0][0]["doc_id"] == f"d{n0 + 7}"


def test_sharded_hnsw_offsize_batch_exceeds_vmem_budget(rng, cpu_mesh,
                                                        monkeypatch):
    """An off-size batch (B % 8 != 0) whose fused-gather scratch exceeds the
    VMEM budget must fall back to the plain-layout path — mirroring
    HNSWIndex.search_ids — instead of raising from gather_dot's block_q
    selection (advisor r02 finding). The fused layout is TPU-gated, so force
    it on the CPU mesh; the clamp must route AROUND the fused kernel."""
    monkeypatch.setattr(ShardedHNSWIndex, "_use_fused", lambda self: True)
    n, d = 1024, 256
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    metas = [{"doc_id": f"d{i}"} for i in range(n)]
    idx = ShardedHNSWIndex(
        cpu_mesh, HNSWConfig(M=16, ef_construction=60, ef_search=48),
        embed_dim=d,
    )
    idx.build(vecs, metas)
    assert idx._nbr_vecs is not None  # fused layout active
    # B=385: bq_min=B (off-size), scratch 385*32*256*4B > 12 MB -> fused off.
    b = 385
    queries = vecs[:b] + 0.01 * rng.normal(size=(b, d)).astype(np.float32)
    s, i = idx.search_ids(queries, 5)
    assert i.shape == (b, 5)
    assert float((i[:, 0] == np.arange(b)).mean()) >= 0.8


def test_sharded_flat_bf16_dtype(rng, cpu_mesh):
    """vector_dtype=bfloat16 propagates through build + donated inserts and
    search remains correct (bf16 tie-tolerance)."""
    import jax.numpy as jnp

    from sqe_tpu.parallel import ShardedFlatIndex

    n, d, k = 256, 32, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    metas = [{"doc_id": str(i), "text": ""} for i in range(n)]
    idx = ShardedFlatIndex(cpu_mesh, embed_dim=d, vector_dtype=jnp.bfloat16)
    idx.build(vecs[:200], metas[:200])
    idx.add(vecs[200:], metas[200:])
    assert idx._vectors.dtype == jnp.bfloat16
    scores, ids = idx.search_ids(vecs[:4], k)
    assert (ids[:, 0] == np.arange(4)).all()      # self-match survives bf16
    assert (scores[:, 0] > 0.99).all()


def test_sharded_int8_rerank_matches_exact_oracle(data, cpu_mesh, cpu_device):
    """storage="int8_rerank" (mesh x quantized planes, DESIGN.md §8d):
    the residual rerank restores exact-class ordering, so the sharded
    int8 search must match the f32 exact scan's top-k on clustered data
    (reconstruction error ~1e-8 on the cosine — far below the data's
    score gaps)."""
    vecs, queries, metas = data
    flat = FlatIndex(embed_dim=64, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    ref_s, ref_i = flat.search_ids(queries, 10)

    idx = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=512,
                           storage="int8_rerank")
    idx.build(vecs, metas)
    assert idx._vectors.dtype == np.int8
    assert idx._residual is not None
    s, i = idx.search_ids(queries, 10)
    assert _recall(i, ref_i) >= 0.99
    np.testing.assert_allclose(np.sort(s, 1), np.sort(ref_s, 1), atol=1e-4)


def test_sharded_int8_rerank_incremental_add_parity(data, cpu_mesh):
    """Quantization is per-row, so incremental adds must produce the same
    planes — and therefore bit-identical search results — as one bulk
    build."""
    vecs, queries, metas = data
    bulk = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=512,
                            storage="int8_rerank")
    bulk.build(vecs, metas)
    ref_s, ref_i = bulk.search_ids(queries, 10)

    inc = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=512,
                           storage="int8_rerank")
    n0 = 3000
    inc.build(vecs[:n0], metas[:n0])
    for lo in range(n0, len(vecs), 257):
        hi = min(lo + 257, len(vecs))
        inc.add(vecs[lo:hi], metas[lo:hi])
    assert len(inc) == len(vecs)
    s, i = inc.search_ids(queries, 10)
    np.testing.assert_array_equal(np.sort(i, 1), np.sort(ref_i, 1))
    np.testing.assert_allclose(np.sort(s, 1), np.sort(ref_s, 1), atol=1e-6)
    res = inc.search(vecs[n0 + 5 : n0 + 6], k=1)
    assert res[0][0]["doc_id"] == f"d{n0 + 5}"


def test_sharded_int8_rerank_growth_rebuild(data, cpu_mesh):
    """Overflowing a shard's capacity rebuilds from the host f32 mirror and
    re-quantizes — every id stays retrievable."""
    vecs, _, metas = data
    idx = ShardedFlatIndex(cpu_mesh, embed_dim=64, block_n=128,
                           storage="int8_rerank")
    idx.build(vecs[:64], metas[:64])        # cap = 8/shard
    idx.add(vecs[64:1024], metas[64:1024])  # forces growth
    assert len(idx) == 1024
    res = idx.search(vecs[500:501], k=1)
    assert res[0][0]["doc_id"] == "d500"
