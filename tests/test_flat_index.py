import numpy as np
import pytest

from sqe_tpu.index import FlatIndex


def _numpy_topk(vecs, queries, k):
    vecs = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9)
    queries = queries / (np.linalg.norm(queries, axis=1, keepdims=True) + 1e-9)
    scores = queries @ vecs.T
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def test_flat_matches_numpy_oracle(rng, cpu_device):
    n, d, q, k = 1000, 32, 8, 10
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    idx = FlatIndex(embed_dim=d, block_n=128, device=cpu_device)
    idx.add(vecs, [{"doc_id": f"d{i}", "text": ""} for i in range(n)])
    scores, ids = idx.search_ids(queries, k)
    ref_scores, ref_ids = _numpy_topk(vecs, queries, k)
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ref_ids, 1))
    np.testing.assert_allclose(np.sort(scores, 1), np.sort(ref_scores, 1), atol=1e-5)


def test_flat_blocked_equals_unblocked(rng, cpu_device):
    n, d = 512, 16
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((4, d)).astype(np.float32)
    metas = [{"doc_id": str(i), "text": ""} for i in range(n)]
    small = FlatIndex(embed_dim=d, block_n=64, device=cpu_device)
    big = FlatIndex(embed_dim=d, block_n=512, device=cpu_device)
    small.add(vecs, metas)
    big.add(vecs, metas)
    _, ids_a = small.search_ids(queries, 7)
    _, ids_b = big.search_ids(queries, 7)
    np.testing.assert_array_equal(np.sort(ids_a, 1), np.sort(ids_b, 1))


def test_incremental_add(rng, cpu_device):
    d = 16
    idx = FlatIndex(embed_dim=d, block_n=32, device=cpu_device)
    a = rng.standard_normal((10, d)).astype(np.float32)
    b = rng.standard_normal((15, d)).astype(np.float32)
    idx.add(a, [{"doc_id": f"a{i}", "text": ""} for i in range(10)])
    idx.add(b, [{"doc_id": f"b{i}", "text": ""} for i in range(15)])
    assert len(idx) == 25
    all_vecs = np.concatenate([a, b])
    _, ref_ids = _numpy_topk(all_vecs, a[:2], 5)
    _, ids = idx.search_ids(a[:2], 5)
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ref_ids, 1))


def test_search_contract(rng, cpu_device):
    d = 8
    idx = FlatIndex(embed_dim=d, device=cpu_device)
    assert idx.search(np.zeros((1, d), np.float32), 3) == []
    assert not idx.has_any_data()
    vecs = rng.standard_normal((5, d)).astype(np.float32)
    idx.add(vecs, [{"doc_id": f"d{i}", "text": f"t{i}"} for i in range(5)])
    assert idx.has_any_data()
    res = idx.search(vecs[:1], k=3)
    assert len(res) == 3
    assert res[0][0]["doc_id"] == "d0"      # self-match is the best hit
    assert res[0][1] > 0.999
    # Empty query embedding -> [] (reference app/main.py:350-351).
    assert idx.search(np.zeros((0, d), np.float32), 3) == []


def test_preallocated_growth_and_inplace_insert(rng, cpu_device):
    """Incremental adds reuse the preallocated buffer (O(new rows), not
    O(index)) and searches stay correct across growth boundaries."""
    d = 16
    idx = FlatIndex(embed_dim=d, block_n=64, device=cpu_device)
    all_vecs = rng.standard_normal((70, d)).astype(np.float32)
    idx.add(all_vecs[:5], [{"doc_id": f"d{i}", "text": ""} for i in range(5)])
    cap_after_first = idx.vectors.shape[0]
    idx.add(all_vecs[5:8], [{"doc_id": f"d{i}", "text": ""} for i in range(5, 8)])
    assert idx.vectors.shape[0] == cap_after_first  # in-place, no regrow
    idx.add(all_vecs[8:70], [{"doc_id": f"d{i}", "text": ""} for i in range(8, 70)])
    assert len(idx) == 70
    assert idx.vectors.shape[0] >= 70
    _, ref_ids = _numpy_topk(all_vecs, all_vecs[:3], 7)
    _, ids = idx.search_ids(all_vecs[:3], 7)
    np.testing.assert_array_equal(np.sort(ids, 1), np.sort(ref_ids, 1))


def test_int8_storage_mode(rng, cpu_device):
    """int8 FlatIndex: quantized storage, dequant CPU search path,
    incremental donated inserts on both buffers, dequantized
    valid_vectors() for checkpointing."""
    import jax.numpy as jnp

    n, d, q, k = 500, 64, 6, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    metas = [{"doc_id": f"d{i}", "text": ""} for i in range(n)]
    idx = FlatIndex(embed_dim=d, block_n=128, device=cpu_device,
                    dtype=jnp.int8, exact=False)
    idx.add(vecs[:400], metas[:400])
    cap = idx.vectors.shape[0]
    assert cap >= 512
    idx.add(vecs[400:], metas[400:])          # in-place donated insert
    assert idx.vectors.shape[0] == cap
    assert idx.vectors.dtype == jnp.int8
    assert idx._scales.shape == (cap, 1)

    scores, ids = idx.search_ids(queries, k)
    ref_scores, ref_ids = _numpy_topk(vecs, queries, k)
    # int8 quantization flips only near-ties; compare by score tolerance.
    exact_of_got = _exact_scores(vecs, queries, ids)
    kth = ref_scores[:, k - 1:k]
    assert (exact_of_got >= kth - 5e-2).all()
    # Returned scores are calibrated (approximate cosine).
    np.testing.assert_allclose(scores, exact_of_got, atol=5e-2)
    # Checkpoint view dequantizes.
    vv = np.asarray(idx.valid_vectors())
    assert vv.shape == (n, d) and vv.dtype == np.float32
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9)
    np.testing.assert_allclose(vv, vn, atol=1e-2)


def _exact_scores(vecs, queries, ids):
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9)
    qn = queries / (np.linalg.norm(queries, axis=1, keepdims=True) + 1e-9)
    return np.take_along_axis(qn @ vn.T, ids, axis=1)


def test_int8_residual_reconstruction_is_near_exact(rng, cpu_device):
    """The rerank residual plane drops per-element reconstruction error to
    <= scale/508 — valid_vectors() becomes effectively exact (vs ~1e-2 for
    scan-only int8), which is what makes the rerank ordering bf16-class."""
    import jax.numpy as jnp

    n, d = 300, 64
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    idx = FlatIndex(embed_dim=d, device=cpu_device, dtype=jnp.int8,
                    exact=False)                  # rerank defaults ON
    assert idx.rerank
    idx.add(vecs, [{"doc_id": f"d{i}", "text": ""} for i in range(n)])
    vn = vecs / (np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9)
    np.testing.assert_allclose(np.asarray(idx.valid_vectors()), vn, atol=5e-5)


def test_int8_rerank_topk_orders_candidates_exactly(rng):
    """Rerank restricted to a candidate set must return exactly the
    candidate-set top-k by TRUE cosine, with -1 pads never selected."""
    import jax.numpy as jnp

    from sqe_tpu.index.flat import int8_rerank_topk

    n, d, b, r, k = 512, 64, 4, 32, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    qn = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    p, ps = FlatIndex._quantize_host(vn)
    res, rs = FlatIndex._quantize_residual_host(vn, p, ps)

    cand = rng.choice(n, size=(b, r), replace=False).astype(np.int32)
    cand[:, -3:] = -1                            # pad tail
    ms, mi = int8_rerank_topk(
        jnp.asarray(qn), jnp.asarray(cand), jnp.asarray(p), jnp.asarray(ps),
        jnp.asarray(res), jnp.asarray(rs), k=k, use_kernel=False,
    )
    ms, mi = np.asarray(ms), np.asarray(mi)
    sims = qn @ vn.T
    for row in range(b):
        real = cand[row][cand[row] >= 0]
        ref = real[np.argsort(-sims[row, real])][:k]
        np.testing.assert_array_equal(np.sort(mi[row]), np.sort(ref))
        assert (mi[row] >= 0).all()
        np.testing.assert_allclose(
            np.sort(ms[row]), np.sort(sims[row, ref]), atol=2e-3
        )


def test_int8_rerank_topk_kernel_matches_xla_path(rng):
    """The Pallas kernel path (grouped-4-row int8 gather_dot — Mosaic packs
    int8 at 4 sublanes, so rows are fetched in tile-aligned groups and the
    wanted row selected post-kernel) must rank identically to the XLA
    einsum path."""
    import jax.numpy as jnp

    from sqe_tpu.index.flat import int8_rerank_topk

    n, d, b, r, k = 256, 128, 4, 24, 8
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    qn = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    p, ps = FlatIndex._quantize_host(vn)
    res, rs = FlatIndex._quantize_residual_host(vn, p, ps)
    cand = rng.choice(n, size=(b, r), replace=False).astype(np.int32)
    cand[:, -2:] = -1

    args = (jnp.asarray(qn), jnp.asarray(cand), jnp.asarray(p),
            jnp.asarray(ps), jnp.asarray(res), jnp.asarray(rs))
    ms_k, mi_k = int8_rerank_topk(*args, k=k, use_kernel=True, interpret=True)
    ms_x, mi_x = int8_rerank_topk(*args, k=k, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(mi_k), np.asarray(mi_x))
    np.testing.assert_allclose(np.asarray(ms_k), np.asarray(ms_x), atol=1e-5)

    # Residual-only mode: kernel and XLA paths must also agree.
    from sqe_tpu.index.flat import int8_residual_rerank_topk

    import jax

    cand_s = jnp.asarray(
        np.where(cand >= 0, (qn @ vn.T)[np.arange(b)[:, None],
                                        np.maximum(cand, 0)], -np.inf)
    ).astype(jnp.float32)
    rargs = (jnp.asarray(qn), cand_s, jnp.asarray(cand), jnp.asarray(res),
             jnp.asarray(rs))
    ms_rk, mi_rk = int8_residual_rerank_topk(
        *rargs, k=k, use_kernel=True, interpret=True)
    ms_rx, mi_rx = int8_residual_rerank_topk(*rargs, k=k, use_kernel=False)
    np.testing.assert_array_equal(np.asarray(mi_rk), np.asarray(mi_rx))
    np.testing.assert_allclose(np.asarray(ms_rk), np.asarray(ms_rx),
                               atol=1e-5)


@pytest.mark.parametrize("scan2", [False, True])
@pytest.mark.parametrize("mode", ["full", "residual"])
def test_int8_scan_rerank_recall_gate(rng, make_clustered, scan2, mode):
    """Full int8 scan -> rerank path (interpret mode): recall@10 vs the
    exact oracle must clear the >=0.95 gate and dominate scan-only int8 —
    the VERDICT r02 #2 contract, CPU-shaped. Both candidate kernels (v1
    bin-top-1, v2 column-max) and both rerank modes (full two-plane,
    residual-only half-DMA) must clear it."""
    import jax.numpy as jnp

    from sqe_tpu.index.flat import int8_scan_rerank_topk
    from sqe_tpu.ops.fused_scan import fused_scan_topk_int8

    n, d, b, k, r = 16384, 64, 16, 10, 64
    vecs = make_clustered(rng, n, d)
    q = make_clustered(np.random.default_rng(5), b, d)
    p, ps = FlatIndex._quantize_host(vecs)
    res, rs = FlatIndex._quantize_residual_host(vecs, p, ps)
    ps2 = ps.reshape(n, 1)
    rs2 = rs.reshape(n, 1)

    ms, mi = int8_scan_rerank_topk(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(ps2), jnp.asarray(res),
        jnp.asarray(rs2), jnp.int32(n), k=k, r=r, bn=512,
        use_kernel=False, interpret=True, scan2=scan2, mode=mode,
    )
    _, only_i = fused_scan_topk_int8(
        jnp.asarray(q), jnp.asarray(p), jnp.asarray(ps2), jnp.int32(n),
        k=k, bn=512, interpret=True,
    )
    ref = np.argsort(-(q @ vecs.T), axis=1)[:, :k]

    def recall(got):
        got = np.asarray(got)
        return np.mean([
            len(set(got[i].tolist()) & set(ref[i].tolist())) / k
            for i in range(b)
        ])

    r_rerank, r_only = recall(mi), recall(only_i)
    assert r_rerank >= 0.95
    assert r_rerank >= r_only


def test_int8_engine_config(rng):
    """EngineConfig.int8_vectors flows through to an int8 flat index."""
    import jax.numpy as jnp

    from sqe_tpu.config import EngineConfig, ModelConfig
    from sqe_tpu.serving.engine import RAGEngine

    cfg = EngineConfig(model=ModelConfig(
        d_model=32, n_layers=1, n_heads=2, d_ff=64, max_len=16,
        vocab_size=256, embed_dim=32,
    ), int8_vectors=True)
    engine = RAGEngine(cfg)
    idx = engine._new_index()
    assert idx.dtype == jnp.int8 and idx._int8 and not idx.exact
