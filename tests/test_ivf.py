"""IVF index: k-means build, Pallas scoring parity, recall gate, inserts."""

import jax.numpy as jnp
import numpy as np
import pytest

from sqe_tpu.index import FlatIndex, IVFIndex
from sqe_tpu.index.ivf import (
    ivf_score,
    ivf_score_xla,
    ivf_search,
    kmeans_device,
)


def _recall(ids, ref_ids):
    k = ref_ids.shape[1]
    return np.mean(
        [len(set(ids[i].tolist()) & set(ref_ids[i].tolist())) / k
         for i in range(len(ids))]
    )


@pytest.fixture(scope="module")
def data(make_clustered):
    rng = np.random.default_rng(21)
    vecs = make_clustered(rng, 8192, 64)
    queries = make_clustered(rng, 16, 64)
    metas = [{"doc_id": f"d{i}", "text": f"text {i}"} for i in range(len(vecs))]
    return vecs, queries, metas


def test_kmeans_centers_normalized_and_useful(data, cpu_device):
    vecs, _, _ = data
    centers = kmeans_device(jnp.asarray(vecs), 64, iters=5, seed=0)
    c = np.asarray(centers)
    np.testing.assert_allclose(np.linalg.norm(c, axis=1), 1.0, atol=1e-4)
    # centers should explain the data better than random rows: mean max-sim
    sims = vecs @ c.T
    assert float(sims.max(axis=1).mean()) > 0.7


def test_pallas_kernel_parity_interpret(data):
    """ivf_score (interpret mode) must match the XLA oracle exactly."""
    vecs, queries, _ = data
    idx = IVFIndex(embed_dim=64, n_clusters=32, kmeans_iters=4)
    idx.build(vecs[:2048], [{"doc_id": str(i), "text": ""} for i in range(2048)])
    rng = np.random.default_rng(3)
    probe = rng.integers(0, 32, size=(8, 4)).astype(np.int32)
    q = jnp.asarray(queries[:8])
    got = ivf_score(idx._clusters, idx._counts_dev, jnp.asarray(probe), q,
                    interpret=True)
    want = ivf_score_xla(idx._clusters, idx._gids, jnp.asarray(probe), q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_recall_gate_vs_exact(data, cpu_device):
    vecs, queries, metas = data
    flat = FlatIndex(embed_dim=64, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_i = flat.search_ids(queries, 10)
    idx = IVFIndex(embed_dim=64, n_clusters=64, n_probe=8, device=cpu_device)
    idx.build(vecs, metas)
    _, i = idx.search_ids(queries, 10)
    r = _recall(i, ref_i)
    assert r >= 0.95, r


def test_self_match_and_meta_contract(data, cpu_device):
    vecs, _, metas = data
    idx = IVFIndex(embed_dim=64, n_clusters=64, n_probe=8, device=cpu_device)
    assert idx.search(vecs[:1], 3) == []
    idx.build(vecs, metas)
    res = idx.search(vecs[7:8], k=3)
    assert res[0][0]["doc_id"] == "d7"
    assert res[0][1] > 0.999


def test_incremental_add_and_overflow_rebuild(data, cpu_device):
    vecs, queries, metas = data
    n0 = 6144
    idx = IVFIndex(embed_dim=64, n_clusters=64, n_probe=12, device=cpu_device)
    idx.build(vecs[:n0], metas[:n0])
    for lo in range(n0, len(vecs), 512):
        hi = min(lo + 512, len(vecs))
        idx.add(vecs[lo:hi], metas[lo:hi])
    assert len(idx) == len(vecs)
    # new rows are retrievable under their global ids
    res = idx.search(vecs[n0 + 3 : n0 + 4], k=1)
    assert res[0][0]["doc_id"] == f"d{n0 + 3}"
    # recall holds after incremental adds
    flat = FlatIndex(embed_dim=64, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_i = flat.search_ids(queries, 10)
    _, i = idx.search_ids(queries, 10)
    assert _recall(i, ref_i) >= 0.9


def test_build_from_device_matches_host_build(data, cpu_device):
    """Device-side layout build returns the same search results as the host
    build at equal centers/probes."""
    import jax
    import jax.numpy as jnp

    vecs, queries, metas = data
    host = IVFIndex(embed_dim=64, n_clusters=32, n_probe=8, seed=7,
                    device=cpu_device)
    host.build(vecs[:4096], metas[:4096])
    dev = IVFIndex(embed_dim=64, n_clusters=32, n_probe=8, seed=7,
                   device=cpu_device)
    dev.build_from_device(
        jax.device_put(jnp.asarray(vecs[:4096]), cpu_device), metas[:4096]
    )
    s1, i1 = host.search_ids(queries, 10)
    s2, i2 = dev.search_ids(queries, 10)
    np.testing.assert_array_equal(np.sort(i1, 1), np.sort(i2, 1))
    np.testing.assert_allclose(np.sort(s1, 1), np.sort(s2, 1), atol=1e-5)


def test_spill_assignment_recall_dominates(rng):
    """Spill mode (plain argmax + overflow) never loses a row: every row is
    either in its true best cluster or in the exactly-scanned overflow, so
    recall at equal n_probe is >= balanced mode on skewed data."""
    import jax.numpy as jnp

    from sqe_tpu.index.ivf import IVFIndex

    n, d, k = 3000, 64, 10
    # Heavily skewed: 4 dominant centers + noise tail.
    centers = rng.standard_normal((4, d)).astype(np.float32)
    assign = rng.integers(0, 4, size=n)
    vecs = centers[assign] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9
    queries = vecs[:32]
    metas = [{"doc_id": str(i), "text": ""} for i in range(n)]

    vn = vecs
    ref = np.argsort(-(queries @ vn.T), axis=1)[:, :k]

    def recall(idx):
        _, ids = idx.search_ids(queries, k)
        return np.mean([
            len(set(ids[i].tolist()) & set(ref[i].tolist())) / k
            for i in range(len(queries))
        ])

    r = {}
    for mode in ("balanced", "spill"):
        idx = IVFIndex(embed_dim=d, n_clusters=32, n_probe=8,
                       kmeans_iters=5, seed=7, assign_mode=mode)
        idx.build(vecs, metas)
        r[mode] = recall(idx)
    assert r["spill"] >= r["balanced"] - 1e-6, r
    assert r["spill"] >= 0.9, r
