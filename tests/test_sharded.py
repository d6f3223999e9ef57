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
