"""Interpret-mode parity + recall tests for the v2 fused scan kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqe_tpu.index.flat import flat_topk
from sqe_tpu.ops.fused_scan import quantize_rows
from sqe_tpu.ops.fused_scan2 import (
    _plan_bits,
    _plan_shapes,
    fused_scan2_candidates,
    fused_scan2_reference,
    fused_scan2_reference_int8,
    fused_scan2_topk,
    fused_scan2_topk_int8,
)


def _mk(n, d, b, n_valid, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[n_valid:] = 0.0
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return jnp.asarray(v, jnp.bfloat16), jnp.asarray(q)


@pytest.mark.parametrize(
    "n,n_valid,b,c,bn",
    [
        (1024, 1024, 4, 256, 128),     # multi-group, m=2
        (1280, 900, 9, 256, 256),      # tail masking, m=1
        (512, 512, 40, 1024, 128),     # N < C (bits = 0)
        (1024, 700, 600, 256, 128),    # B > one slab in real shapes scaled
    ],
)
def test_topk_matches_oracle(n, n_valid, b, c, bn):
    d = 128
    v, q = _mk(n, d, b, n_valid)
    ks, ki = fused_scan2_topk(
        q, v, jnp.int32(n_valid), k=10, c=c, bn_cap=bn, bq=8, interpret=True
    )
    rs, ri = fused_scan2_reference(q, v, jnp.int32(n_valid), k=10, c=c)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(rs))
    finite = np.isfinite(np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(ki)[finite],
                                  np.asarray(ri)[finite])


def test_candidates_decode_and_score_degradation():
    n, d, b, c = 1024, 128, 6, 256
    n_valid = 1000
    v, q = _mk(n, d, b, n_valid, seed=3)
    cs, ci = fused_scan2_candidates(
        q, v, jnp.int32(n_valid), c=c, bn_cap=256, bq=8, interpret=True
    )
    cs, ci = np.asarray(cs), np.asarray(ci)
    assert cs.shape == (b, c) and ci.shape == (b, c)
    s = np.asarray(jnp.dot(q.astype(jnp.bfloat16), v.T,
                           preferred_element_type=jnp.float32))
    finite = np.isfinite(cs)
    # Ids are exact members of their residue class and beat every other
    # class member except at the cleared-mantissa tie granularity.
    bits = _plan_bits(n, c)
    tol = (2.0 ** bits) * np.float32(4.0 * 2 ** -23) + 1e-7
    for bi in range(b):
        for col in np.nonzero(finite[bi])[0][:32]:
            idx = ci[bi, col]
            assert idx % c == col and 0 <= idx < n_valid
            cls = np.arange(col, n_valid, c)
            assert s[bi, idx] >= s[bi, cls].max() - tol
            # Packed scores underestimate by at most the cleared bits (the
            # -3e-7 slack is the f32 (s+4.0)-4.0 round-trip, ~ulp at 4.0).
            assert -3e-7 <= s[bi, idx] - cs[bi, col] <= tol
    # Every id >= valid_n is excluded.
    assert (ci[finite] < n_valid).all() and (ci[finite] >= 0).all()
    assert (ci[~finite] == -1).all()


def test_int8_matches_oracle():
    n, d, b, c = 1280, 128, 9, 256
    n_valid = 1111
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    base[n_valid:] = 0.0
    v_i8, vscales = quantize_rows(jnp.asarray(base))
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q = jnp.asarray(q)
    ks, ki = fused_scan2_topk_int8(
        q, v_i8, vscales, jnp.int32(n_valid), k=10, c=c, bn_cap=256, bq=8,
        interpret=True
    )
    rs, ri = fused_scan2_reference_int8(
        q, v_i8, vscales, jnp.int32(n_valid), k=10, c=c
    )
    # The jitted kernel path and the eager oracle may fma-fuse the
    # dequant chain differently (1-ulp pre-pack differences land on
    # adjacent cleared-mantissa quanta), so parity is gated at the packing
    # granularity rather than bit-exactly; the bf16 test stays bit-exact.
    quantum = (2.0 ** _plan_bits(n, c)) * np.float32(4.0 * 2 ** -23)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(rs),
                               atol=3 * quantum + 1e-6)
    ki_n, ri_n = np.asarray(ki), np.asarray(ri)
    overlap = np.mean([
        len(set(ki_n[bi]) & set(ri_n[bi])) / 10 for bi in range(b)
    ])
    assert overlap >= 0.9, overlap
    # Calibrated scores track true cosines within int8 quantization noise.
    true = np.asarray(q) @ base.T
    got = np.asarray(ks)
    for bi in range(b):
        sel = ki_n[bi] >= 0
        np.testing.assert_allclose(
            got[bi][sel], true[bi][ki_n[bi][sel]], atol=5e-2
        )


def test_recall_vs_exact():
    """Residue-class binning holds >= 0.95 epsilon-recall@10 (the BASELINE
    gate) on random unit vectors; the uniform model predicts ~1 - 4.5/C."""
    n, d, b, c = 8192, 64, 32, 512
    v, q = _mk(n, d, b, n, seed=11)
    es, ei = flat_topk(q, v.astype(jnp.float32), jnp.int32(n), k=10,
                       block_n=1024)
    ks, ki = fused_scan2_topk(
        q, v, jnp.int32(n), k=10, c=c, bn_cap=512, bq=8, interpret=True
    )
    es, ei, ks, ki = map(np.asarray, (es, ei, ks, ki))
    eps = 1e-5
    hits = 0
    for bi in range(b):
        thresh = es[bi, -1] - eps
        hits += sum(1 for i in ki[bi] if i >= 0 and
                    float(q[bi] @ v[i].astype(jnp.float32)) >= thresh)
    recall = hits / (b * 10)
    assert recall >= 0.95, recall


def test_k_larger_than_c_pads():
    n, d, b, c = 512, 128, 3, 128
    v, q = _mk(n, d, b, n)
    ks, ki = fused_scan2_topk(
        q, v, jnp.int32(n), k=200, c=c, bn_cap=128, bq=8, interpret=True
    )
    assert ks.shape == (b, 200) and ki.shape == (b, 200)
    assert np.isneginf(np.asarray(ks)[:, c:]).all()
    assert (np.asarray(ki)[:, c:] == -1).all()


def test_plan_shapes_and_bits():
    assert _plan_bits(2048, 2048) == 0
    assert _plan_bits(4096, 2048) == 1
    assert _plan_bits(4_194_304, 2048) == 11
    b_pad, slab, bn = _plan_shapes(1024, 1 << 20, bn_cap=1024, c=2048, bq=256)
    assert (b_pad, slab, bn) == (1024, 512, 1024)
    b_pad, slab, bn = _plan_shapes(1, 1 << 17, bn_cap=1024, c=2048, bq=256)
    assert (b_pad, slab, bn) == (256, 256, 1024)
    # Indivisible N -> bn = 0 sentinel.
    assert _plan_shapes(8, 1000, bn_cap=1024, c=2048, bq=8)[2] == 0


def test_empty_tail_tile_only_pads():
    # valid_n far below the last tile: whole trailing tiles masked out.
    n, d, b, c = 1024, 128, 5, 256
    v, q = _mk(n, d, b, 130, seed=5)
    ks, ki = fused_scan2_topk(
        q, v, jnp.int32(130), k=10, c=c, bn_cap=128, bq=8, interpret=True
    )
    ki = np.asarray(ki)
    assert (ki[np.isfinite(np.asarray(ks))] < 130).all()
