"""Device (MXU) graph builder: well-formedness + recall gate vs exact scan."""

import numpy as np

from sqe_tpu.config import HNSWConfig
from sqe_tpu.index import FlatIndex, HNSWIndex
from sqe_tpu.index.device_build import build_graph_device


def _recall(ids, ref_ids):
    k = ref_ids.shape[1]
    return np.mean(
        [len(set(ids[i].tolist()) & set(ref_ids[i].tolist())) / k
         for i in range(len(ids))]
    )


def test_graph_wellformed(make_clustered, cpu_device):
    rng = np.random.default_rng(5)
    vecs = make_clustered(rng, 600, 32)
    graph = build_graph_device(vecs, M=8, block=256, device=cpu_device)
    assert graph.shape == (600, 16)
    for i in range(600):
        row = [x for x in graph[i] if x >= 0]
        assert i not in row
        assert all(0 <= x < 600 for x in row)
        assert len(row) == len(set(row))
        assert len(row) >= 8  # forward degree at least M
    # Reverse edges make the graph near-fully covered.
    inbound = np.zeros(600, int)
    for i in range(600):
        for x in graph[i]:
            if x >= 0:
                inbound[x] += 1
    assert (inbound > 0).mean() > 0.95


def test_device_built_index_recall(make_clustered, cpu_device):
    rng = np.random.default_rng(6)
    n, d = 4000, 64
    vecs = make_clustered(rng, n, d)
    queries = make_clustered(rng, 16, d)
    metas = [{"doc_id": str(i), "text": ""} for i in range(n)]
    idx = HNSWIndex(HNSWConfig(M=16, ef_construction=200, ef_search=100),
                    embed_dim=d, device=cpu_device)
    idx.build(vecs, metas, builder="device")
    flat = FlatIndex(embed_dim=d, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_ids = flat.search_ids(queries, 10)
    _, ids = idx.search_ids(queries, 10)
    assert _recall(ids, ref_ids) >= 0.95
