"""HNSW gates: recall vs exact scan, device-search = host-oracle parity,
incremental insert (SURVEY.md §4 'recall gates' / 'kernel tests')."""

import heapq

import numpy as np
import pytest

from sqe_tpu.config import HNSWConfig
from sqe_tpu.index import FlatIndex, HNSWIndex
from sqe_tpu.index.hnsw_build import build_graph, native_available


def _recall(ids, ref_ids):
    k = ref_ids.shape[1]
    return np.mean(
        [len(set(ids[i].tolist()) & set(ref_ids[i].tolist())) / k
         for i in range(len(ids))]
    )


def _host_beam(vecs, graph, q, ef, seeds, k):
    """Classic best-first beam search oracle over the flat graph."""
    sims = vecs[seeds] @ q
    visited = set(int(s) for s in seeds)
    cand = [(-s, int(i)) for s, i in zip(sims, seeds)]
    heapq.heapify(cand)
    best = [(float(s), int(i)) for s, i in zip(sims, seeds)]
    heapq.heapify(best)
    while len(best) > ef:
        heapq.heappop(best)
    while cand:
        negs, c = heapq.heappop(cand)
        if len(best) >= ef and -negs < best[0][0]:
            break
        for nb in graph[c]:
            nb = int(nb)
            if nb < 0 or nb in visited:
                continue
            visited.add(nb)
            s = float(vecs[nb] @ q)
            if len(best) < ef or s > best[0][0]:
                heapq.heappush(cand, (-s, nb))
                heapq.heappush(best, (s, nb))
                if len(best) > ef:
                    heapq.heappop(best)
    return [i for _s, i in sorted(best, reverse=True)[:k]]


@pytest.fixture(scope="module")
def corpus(make_clustered):
    rng = np.random.default_rng(7)
    n, d = 5000, 64
    vecs = make_clustered(rng, n, d)
    queries = make_clustered(rng, 32, d)
    return vecs, queries


def test_recall_gate_vs_exact(corpus, cpu_device):
    """recall@10 >= 0.95 vs brute force on clustered vectors (gate from
    BASELINE.json config 2, scaled to CI size)."""
    vecs, queries = corpus
    n, d = vecs.shape
    metas = [{"doc_id": str(i), "text": ""} for i in range(n)]
    idx = HNSWIndex(HNSWConfig(M=16, ef_construction=200, ef_search=100),
                    embed_dim=d, device=cpu_device)
    idx.build(vecs, metas)
    flat = FlatIndex(embed_dim=d, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_ids = flat.search_ids(queries, 10)
    _, ids = idx.search_ids(queries, 10)
    assert _recall(ids, ref_ids) >= 0.95


def test_device_search_matches_host_oracle(corpus, cpu_device):
    """The jitted batched beam search must equal a classic sequential
    best-first beam search over the same graph and seeds."""
    vecs, queries = corpus
    vecs, queries = vecs[:2000], queries[:8]
    n, d = vecs.shape
    idx = HNSWIndex(HNSWConfig(M=8, ef_construction=100, ef_search=48),
                    embed_dim=d, device=cpu_device)
    idx.build(vecs, [{"doc_id": str(i), "text": ""} for i in range(n)])
    graph = idx._graph_host
    pivots = np.asarray(idx._pivots)
    _, ids = idx.search_ids(queries, 10, ef=48, expand=1)
    for qi in range(len(queries)):
        ps = vecs[pivots] @ queries[qi]
        seeds = pivots[np.argsort(-ps)[:32]]
        oracle = _host_beam(vecs, graph, queries[qi], 48, seeds, 10)
        assert set(ids[qi].tolist()) == set(oracle)


def test_incremental_insert_recall(corpus, cpu_device):
    vecs, queries = corpus
    vecs = vecs[:3000]
    n, d = vecs.shape
    metas = [{"doc_id": str(i), "text": ""} for i in range(n)]
    idx = HNSWIndex(HNSWConfig(M=16, ef_construction=200, ef_search=100),
                    embed_dim=d, device=cpu_device)
    idx.build(vecs[:2000], metas[:2000])
    idx.add(vecs[2000:], metas[2000:])
    assert len(idx) == n
    flat = FlatIndex(embed_dim=d, block_n=1024, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_ids = flat.search_ids(queries, 10)
    _, ids = idx.search_ids(queries, 10)
    assert _recall(ids, ref_ids) >= 0.9


def test_numpy_builder_agrees_with_native(make_clustered, cpu_device):
    """Fallback builder produces a searchable graph of comparable quality."""
    rng = np.random.default_rng(3)
    vecs = make_clustered(rng, 800, 32)
    queries = make_clustered(rng, 8, 32)
    metas = [{"doc_id": str(i), "text": ""} for i in range(800)]
    flat = FlatIndex(embed_dim=32, block_n=256, device=cpu_device)
    flat.add(vecs, metas)
    _, ref_ids = flat.search_ids(queries, 10)
    idx = HNSWIndex(HNSWConfig(M=8, ef_construction=64, ef_search=64),
                    embed_dim=32, device=cpu_device)
    idx.build(vecs, metas, force_numpy_builder=True)
    _, ids = idx.search_ids(queries, 10)
    assert _recall(ids, ref_ids) >= 0.9


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_builder_graph_wellformed(make_clustered):
    rng = np.random.default_rng(4)
    vecs = make_clustered(rng, 500, 16)
    graph, levels = build_graph(vecs, M=8, ef_construction=64)
    assert graph.shape == (500, 16)
    assert levels.shape == (500,)
    # No self-loops, ids in range, no duplicate neighbors per row.
    for i in range(500):
        row = [x for x in graph[i] if x >= 0]
        assert i not in row
        assert all(0 <= x < 500 for x in row)
        assert len(row) == len(set(row))
    # Graph is reasonably connected: most nodes have inbound edges.
    inbound = np.zeros(500, int)
    for i in range(500):
        for x in graph[i]:
            if x >= 0:
                inbound[x] += 1
    assert (inbound > 0).mean() > 0.95


def test_visited_bytemap_matches_compare(corpus, cpu_device):
    """The [B, N+1] visited-bytemap dedup returns the same result set as the
    broadcast-compare dedup (both are exact ef-search visited semantics up to
    transient in-expansion duplicates resolved at the final cut)."""
    vecs, queries = corpus
    n, d = vecs.shape
    idx = HNSWIndex(HNSWConfig(M=16, ef_construction=200, ef_search=64),
                    embed_dim=d, device=cpu_device)
    idx.build(vecs, [{"doc_id": str(i), "text": ""} for i in range(n)])
    sc_c, ids_c = idx.search_ids(queries, 10, visited_impl="compare")
    sc_b, ids_b = idx.search_ids(queries, 10, visited_impl="bytemap")
    same = np.mean([
        len(set(ids_c[i]) & set(ids_b[i])) / 10 for i in range(len(queries))
    ])
    # Identical up to score ties; exact id-set agreement expected on this
    # tie-free synthetic corpus.
    assert same >= 0.99, same
    np.testing.assert_allclose(sc_c, sc_b, atol=1e-5)


def test_plan_fused_gather_block_rules():
    """The expansion clamp must account for the actual Mosaic-legal query
    block: off-size batches (B % 8 != 0) can only use block_q == B, so wide
    expansions that fit at block_q=8 may not fit at all — the plan reports
    fused_ok=False instead of letting gather_dot raise at trace time."""
    from sqe_tpu.index.hnsw import plan_fused_gather

    m0, d, itemsize = 32, 1024, 2   # 64 KB per (parent) row
    # B=1024 (divisible by 8): 12MB / (8 * 64KB) = 24 -> expand clamped.
    e, ok = plan_fused_gather(1024, m0, d, itemsize, 32)
    assert ok and e == 24
    # B=12: block_q must be 12 -> 12 * e * 64KB <= 12MB -> e <= 16.
    e, ok = plan_fused_gather(12, m0, d, itemsize, 24)
    assert ok and e == 16
    # B=1023: block_q must be 1023 -> even e=1 (64 MB) exceeds the budget.
    e, ok = plan_fused_gather(1023, m0, d, itemsize, 8)
    assert not ok
    # Small power-of-two batches keep their expansion.
    e, ok = plan_fused_gather(8, m0, d, itemsize, 16)
    assert ok and e == 16
