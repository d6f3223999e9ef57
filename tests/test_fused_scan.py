"""Interpret-mode parity tests for the fused Pallas scan kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from sqe_tpu.ops.fused_scan import (
    BIN,
    fused_scan_candidates,
    fused_scan_reference,
    fused_scan_topk,
    pick_bn,
)


def _mk(n, d, b, n_valid, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[n_valid:] = 0.0
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(v, jnp.bfloat16), jnp.asarray(q)


def _np_packed_bins(s, valid_mask):
    """Numpy replica of the kernel's packed bin-top-1 (bit-exact)."""
    b, n = s.shape
    shifted = np.where(valid_mask, (s + 4.0).astype(np.float32),
                       np.float32(0.0))
    packed = (shifted.view(np.int32).reshape(b, n // BIN, BIN)
              & ~np.int32(BIN - 1))
    packed = packed | (BIN - 1 - np.arange(BIN, dtype=np.int32))
    m = packed.max(axis=2)
    valid = m >= np.int32(0x40000000)
    lanes = (BIN - 1) - (m & np.int32(BIN - 1))
    scores = (m & ~np.int32(BIN - 1)).view(np.float32) - 4.0
    gids = np.arange(0, n, BIN, dtype=np.int32)[None, :] + lanes
    return (np.where(valid, scores, -np.inf), np.where(valid, gids, 0))


@pytest.mark.parametrize("n,n_valid,b", [(512, 512, 4), (1024, 700, 9)])
def test_candidates_match_oracle(n, n_valid, b):
    d = 128
    v, q = _mk(n, d, b, n_valid)
    cs, ci = fused_scan_candidates(
        q, v, jnp.int32(n_valid), bq=8, bn=256, interpret=True
    )
    # Oracle bins: identical packed selection computed in numpy.
    s = np.asarray(
        jnp.dot(q.astype(jnp.bfloat16), v.T,
                preferred_element_type=jnp.float32)
    )
    ids = np.arange(n)[None, :]
    ref_s, ref_i = _np_packed_bins(s, np.broadcast_to(ids < n_valid, s.shape))
    np.testing.assert_array_equal(np.asarray(cs), ref_s)
    finite = np.isfinite(ref_s)
    np.testing.assert_array_equal(np.asarray(ci)[finite], ref_i[finite])
    # Packed scores underestimate the true bin max by < 6.1e-5 (cleared
    # low mantissa bits), never more.
    true_max = np.where(ids < n_valid, s, -np.inf).reshape(
        b, n // BIN, BIN).max(axis=2)
    diff = (true_max - ref_s)[finite]
    assert (diff >= 0).all() and (diff < 6.2e-5).all()


def test_topk_matches_reference_and_exact():
    n, d, b, n_valid, k = 1024, 128, 16, 1000, 8
    v, q = _mk(n, d, b, n_valid, seed=1)
    ms, mi = fused_scan_topk(
        q, v, jnp.int32(n_valid), k=k, bq=8, bn=512, interpret=True
    )
    rs, ri = fused_scan_reference(q, v, jnp.int32(n_valid), k=k)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(rs), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(ri))
    # Quality vs the exact f64 scan.  At this toy scale there are only
    # n/BIN = 8 bins for k=8, so bin collisions are certain and full recall
    # is impossible by construction; assert the guaranteed parts instead:
    # top-1 is always exact (the global max wins its bin), and overall
    # epsilon-recall still clears the collision-limited floor.
    v64 = np.asarray(v, np.float64)
    q64 = np.asarray(q, np.float64)
    exact = q64 @ v64.T
    exact[:, n_valid:] = -np.inf
    top1 = np.take_along_axis(exact, np.asarray(mi)[:, :1], axis=1)
    assert (top1 >= exact.max(axis=1, keepdims=True) - 2e-2).all()
    kth = np.sort(exact, axis=1)[:, -k][:, None]
    got = np.take_along_axis(exact, np.asarray(mi), axis=1)
    assert (got >= kth - 2e-2).mean() >= 0.7


def test_pad_rows_never_returned():
    n, d, b, n_valid = 512, 128, 4, 80
    v, q = _mk(n, d, b, n_valid, seed=2)
    ms, mi = fused_scan_topk(
        q, v, jnp.int32(n_valid), k=10, bq=4, bn=256, interpret=True
    )
    ms, mi = np.asarray(ms), np.asarray(mi)
    assert (mi[np.isfinite(ms)] < n_valid).all()
    assert (mi[np.isfinite(ms)] >= 0).all()


def test_int8_matches_oracle_and_quality():
    n, d, b, n_valid, k = 2048, 128, 8, 2000, 4
    v, q = _mk(n, d, b, n_valid, seed=3)
    from sqe_tpu.ops.fused_scan import fused_scan_topk_int8, quantize_rows

    v32 = jnp.asarray(np.asarray(v, np.float32))
    vi8, vs = quantize_rows(v32)
    ms, mi = fused_scan_topk_int8(
        q, vi8, vs, jnp.int32(n_valid), k=k, bq=8, bn=512, interpret=True
    )
    ms, mi = np.asarray(ms), np.asarray(mi)
    # Oracle: int8 dot with identical scales, same packed bin-top-1 merge.
    qi8, qs = quantize_rows(q)
    s = (np.asarray(qi8, np.int32) @ np.asarray(vi8, np.int32).T)
    s = (s.astype(np.float32) * np.asarray(vs).reshape(1, n)
         * np.asarray(qs).reshape(b, 1))
    valid = np.broadcast_to(np.arange(n)[None, :] < n_valid, s.shape)
    m, am = _np_packed_bins(s, valid)
    order = np.argsort(-m, axis=1, kind="stable")[:, :k]
    np.testing.assert_allclose(
        ms, np.take_along_axis(m, order, axis=1), rtol=1e-6
    )
    np.testing.assert_array_equal(mi, np.take_along_axis(am, order, axis=1))
    # Calibration: returned scores approximate true cosine.
    v64, q64 = np.asarray(v32, np.float64), np.asarray(q, np.float64)
    true = np.take_along_axis(q64 @ v64.T, mi, axis=1)
    np.testing.assert_allclose(ms, true, atol=2e-2)
    # Top-1 lands within quantization noise of the true best.
    best = (q64 @ v64.T)[:, :n_valid].max(axis=1)
    assert (true[:, 0] >= best - 2e-2).all()


def test_pick_bn():
    assert pick_bn(131072) == 2048
    assert pick_bn(1 << 20) == 2048
    assert pick_bn(512) == 512
    assert pick_bn(384) == 384
    assert pick_bn(100) == 0
