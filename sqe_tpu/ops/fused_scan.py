"""Pallas fused matmul + top-k-candidate scan for the flat index.

The blocked XLA scan (index/flat.py::flat_topk) is merge-bound, not
MXU-bound: XLA materializes each [B, block_n] f32 score tile to HBM and
re-reads it for ``top_k``/``approx_max_k`` — at 100k x 1024-d, B=1024 that is
>1 GB of score traffic per batch against a 0.2 TFLOP matmul, leaving the scan
at <10% of bf16 peak (the round-1 headline's measured ceiling; it replaces
the reference's delegated OpenSearch k-NN scoring, app/main.py:347-373).

This kernel never writes scores to HBM.  Per grid step it computes one
[BQ, BN] score tile on the MXU and immediately reduces it on the VPU to one
candidate per 128-lane *bin* (exact top-1 within each bin — the same
aggregation ``lax.approx_max_k`` uses, so the recall characteristics match
the measured 0.99+ approx-scan gate), writing only a [BQ, BN/128] candidate
tile.  HBM traffic is the corpus read itself plus ~1/128 of the score
matrix.  The final exact merge (``lax.top_k`` over all bins' candidates) is
[B, N/128] — 128x smaller than what the XLA path sorts.

Approximation contract: a true top-k id is missed only when two of the true
top-k land in the same 128-wide bin (probability ~ k^2 * 128 / 2N for
uniformly-placed ids); at N >= 100k this measures >= 0.99 epsilon-recall@10,
identical to the approx_max_k path, and the cross-bin merge is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIN = 128  # candidate bin width = one VPU lane row


# Packed bitcast-max selection constants: scores (cosines, |s| <= ~1.02)
# are shifted by +_PACK_OFF so every valid value is a positive float whose
# int32 bit pattern orders identically to its float value; the low 7
# mantissa bits are replaced by (127 - lane) so ONE integer max-reduction
# yields both the bin max and its lane (ties break to the smallest lane,
# matching argmax-first-occurrence). Masked/invalid lanes pack to tiny
# positive ints (< _PACK_MIN) and decode back to -inf. Clearing 7 mantissa
# bits underestimates a returned score by < 6.1e-5 at this exponent — far
# below the bf16 scoring noise (~1e-3).
_PACK_OFF = 4.0


def _packed_bin_top1(s, base, valid_n, *, bq: int, bn: int,
                     masked: bool = True):
    """Shared packed selection: s [BQ, BN] f32 (approximate cosines) ->
    (scores [BQ, L], global ids [BQ, L]) with one reduction per bin.

    ``masked=False`` skips the per-element ``gids < valid_n`` iota/compare/
    select (half the VPU passes over the score tile) — correct whenever the
    whole tile lies below ``valid_n``, i.e. every corpus tile except the one
    straddling the pad boundary (see the tail branch in ``_scan_kernel``)."""
    bitcast = jax.lax.bitcast_convert_type
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bq, BIN), 1)
    lanes_rev = BIN - 1 - lanes
    pack_min = jnp.int32(0x40000000)                     # bitcast(2.0f)
    out_s = []
    out_i = []
    for l in range(bn // BIN):
        # Static lane-aligned slice: no relayout.
        chunk = s[:, l * BIN:(l + 1) * BIN]
        if masked:
            gids = base + l * BIN + lanes
            shifted = jnp.where(gids < valid_n, chunk + _PACK_OFF, 0.0)
        else:
            shifted = chunk + _PACK_OFF
        packed = (bitcast(shifted, jnp.int32) & ~jnp.int32(BIN - 1)) | lanes_rev
        m = jnp.max(packed, axis=1, keepdims=True)       # [BQ, 1] int32
        valid = m >= pack_min
        lane = (BIN - 1) - (m & jnp.int32(BIN - 1))
        score = bitcast(m & ~jnp.int32(BIN - 1), jnp.float32) - _PACK_OFF
        out_s.append(jnp.where(valid, score, -jnp.inf))
        out_i.append(jnp.where(valid, base + l * BIN + lane, 0))
    return jnp.concatenate(out_s, axis=1), jnp.concatenate(out_i, axis=1)


def _scan_kernel(
    valid_ref,   # [1, 1] int32 in SMEM: number of real corpus rows
    q_ref,       # [BQ, D] bf16 query tile (resident across the i axis)
    v_ref,       # [BN, D] bf16 vector tile
    s_out,       # [1, BQ, L] f32 candidate scores (tile-major layout)
    i_out,       # [1, BQ, L] int32 candidate (global) ids
    *,
    bq: int,
    bn: int,
):
    i = pl.program_id(0)
    valid_n = valid_ref[0, 0]
    base = i * bn
    # One MXU contraction: [BQ, D] x [BN, D]^T -> [BQ, BN] f32.
    s = jax.lax.dot_general(
        q_ref[:], v_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Pad-row masking is only needed on the tile straddling valid_n; every
    # other tile takes the unmasked path (half the VPU passes).
    tail = base + bn > valid_n

    @pl.when(jnp.logical_not(tail))
    def _():
        cs, ci = _packed_bin_top1(s, base, valid_n, bq=bq, bn=bn,
                                  masked=False)
        s_out[0] = cs
        i_out[0] = ci

    @pl.when(tail)
    def _():
        cs, ci = _packed_bin_top1(s, base, valid_n, bq=bq, bn=bn)
        s_out[0] = cs
        i_out[0] = ci


@functools.partial(
    jax.jit, static_argnames=("bq", "bn", "interpret")
)
def fused_scan_candidates(
    queries: jax.Array,    # [B, D] (any float dtype; cast to bf16)
    vectors: jax.Array,    # [N, D] bf16, N % bn == 0, pad rows arbitrary
    valid_n: jax.Array,    # scalar int32
    *,
    bq: int = 256,
    bn: int = 2048,
    interpret: bool = False,
):
    """Per-bin top-1 candidates: (scores [B, N//128], ids [B, N//128]).

    Pad rows (ids >= valid_n) come back as -inf and never win the merge.
    B is padded to a multiple of ``bq`` internally.
    """
    n, d = vectors.shape
    assert n % bn == 0 and bn % BIN == 0, (n, bn)
    b = queries.shape[0]
    b_pad = -(-b // bq) * bq
    q = jnp.zeros((b_pad, d), jnp.bfloat16).at[:b].set(
        queries.astype(jnp.bfloat16)
    )
    nb = n // bn
    l = bn // BIN
    grid_spec = pl.GridSpec(
        # i (vector tile) outermost so each corpus tile is DMA'd once and
        # re-used across all query tiles.
        grid=(nb, b_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # Tile-major [NB, B, L] keeps the block's trailing dims
            # (BQ, L) aligned to the (8, full-dim) layout rule; the
            # per-query flatten below is one cheap XLA transpose.
            pl.BlockSpec((1, bq, l), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, l), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_scan_kernel, bq=bq, bn=bn)
    cs, ci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, b_pad, l), jnp.float32),
            jax.ShapeDtypeStruct((nb, b_pad, l), jnp.int32),
        ],
        interpret=interpret,
    )(valid_n.reshape(1, 1).astype(jnp.int32), q, vectors)
    cs = cs.transpose(1, 0, 2).reshape(b_pad, nb * l)
    ci = ci.transpose(1, 0, 2).reshape(b_pad, nb * l)
    return cs[:b], ci[:b]


def _scan_kernel_int8(
    valid_ref,   # [1, 1] int32 in SMEM
    q_ref,       # [BQ, D] int8 query tile
    qs_ref,      # [BQ, 1] f32 per-query scales
    v_ref,       # [BN, D] int8 vector tile
    vs_ref,      # [1, BN] f32 per-row vector scales
    s_out,       # [1, BQ, L] f32 candidate scores (calibrated ~cosine)
    i_out,       # [1, BQ, L] int32 candidate ids
    *,
    bq: int,
    bn: int,
):
    i = pl.program_id(0)
    valid_n = valid_ref[0, 0]
    base = i * bn
    # Int8 MXU contraction (2x bf16 rate on v5e) -> i32 accumulators,
    # dequantized to ~cosine with both scale factors (the packed selection
    # needs cosine-ranged values).
    s = jax.lax.dot_general(
        q_ref[:], v_ref[:],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    s = s * vs_ref[0][None, :] * qs_ref[:]
    tail = base + bn > valid_n

    @pl.when(jnp.logical_not(tail))
    def _():
        cs, ci = _packed_bin_top1(s, base, valid_n, bq=bq, bn=bn,
                                  masked=False)
        s_out[0] = cs
        i_out[0] = ci

    @pl.when(tail)
    def _():
        cs, ci = _packed_bin_top1(s, base, valid_n, bq=bq, bn=bn)
        s_out[0] = cs
        i_out[0] = ci


def quantize_rows(x: jax.Array):
    """Symmetric per-row int8: returns (values int8, scales f32 [rows, 1])
    with ``x ~= values * scales``."""
    scales = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0
    scales = jnp.maximum(scales, 1e-12)
    vals = jnp.clip(jnp.round(x / scales), -127, 127).astype(jnp.int8)
    return vals, scales.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("k", "bq", "bn", "interpret")
)
def fused_scan_topk_int8(
    queries: jax.Array,    # [B, D] float
    vectors_i8: jax.Array,  # [N, D] int8 (quantize_rows of the corpus)
    vscales: jax.Array,    # [N, 1] f32 row scales
    valid_n: jax.Array,    # scalar int32
    *,
    k: int,
    bq: int = 256,
    bn: int = 2048,
    interpret: bool = False,
):
    """Int8 fused scan: 2x the MXU rate and half the HBM traffic of the
    bf16 kernel, at ~int8 quantization noise (measured in DESIGN.md §8).
    Returns calibrated (scores [B, k], ids [B, k])."""
    n, d = vectors_i8.shape
    assert n % bn == 0 and bn % BIN == 0, (n, bn)
    b = queries.shape[0]
    b_pad = -(-b // bq) * bq
    q_i8, q_scales = quantize_rows(queries.astype(jnp.float32))
    q = jnp.zeros((b_pad, d), jnp.int8).at[:b].set(q_i8)
    qs = jnp.zeros((b_pad, 1), jnp.float32).at[:b].set(q_scales)
    vs_row = vscales.reshape(1, n)
    nb = n // bn
    l = bn // BIN
    grid_spec = pl.GridSpec(
        grid=(nb, b_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, l), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, l), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_scan_kernel_int8, bq=bq, bn=bn)
    cs, ci = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, b_pad, l), jnp.float32),
            jax.ShapeDtypeStruct((nb, b_pad, l), jnp.int32),
        ],
        interpret=interpret,
    )(valid_n.reshape(1, 1).astype(jnp.int32), q, qs, vectors_i8, vs_row)
    cs = cs.transpose(1, 0, 2).reshape(b_pad, nb * l)[:b]
    ci = ci.transpose(1, 0, 2).reshape(b_pad, nb * l)[:b]
    k_eff = min(k, cs.shape[1])
    ms, sel = jax.lax.top_k(cs, k_eff)
    mi = jnp.take_along_axis(ci, sel, axis=1)
    mi = jnp.where(jnp.isfinite(ms), mi, -1)
    if k_eff < k:
        pad = k - k_eff
        ms = jnp.pad(ms, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        mi = jnp.pad(mi, ((0, 0), (0, pad)), constant_values=-1)
    return ms, mi


def pick_bn(n: int, cap: int = 2048) -> int:
    """Largest vector-tile size <= cap (multiple of BIN) dividing n, or 0."""
    bn = min(cap, n)
    while bn >= BIN:
        if n % bn == 0 and bn % BIN == 0:
            return bn
        bn -= BIN
    return 0


@functools.partial(
    jax.jit, static_argnames=("k", "bq", "bn", "interpret")
)
def fused_scan_topk(
    queries: jax.Array,    # [B, D]
    vectors: jax.Array,    # [N, D] bf16
    valid_n: jax.Array,    # scalar int32
    *,
    k: int,
    bq: int = 256,
    bn: int = 2048,
    interpret: bool = False,
):
    """Full fused scan: kernel candidates + exact cross-bin merge.

    Drop-in for ``flat_topk(..., exact=False)``; returns (scores [B, k],
    ids [B, k]) with ids of -inf slots undefined-but-masked (score -inf)."""
    cs, ci = fused_scan_candidates(
        queries, vectors, valid_n, bq=bq, bn=bn, interpret=interpret
    )
    k_eff = min(k, cs.shape[1])
    ms, sel = jax.lax.top_k(cs, k_eff)
    mi = jnp.take_along_axis(ci, sel, axis=1)
    mi = jnp.where(jnp.isfinite(ms), mi, -1)
    if k_eff < k:
        pad = k - k_eff
        ms = jnp.pad(ms, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        mi = jnp.pad(mi, ((0, 0), (0, pad)), constant_values=-1)
    return ms, mi


def packed_bins_reference(s, valid_mask):
    """Bit-exact XLA replica of the kernel's packed bin-top-1 selection:
    s [B, N] f32 approximate cosines, valid_mask [B, N] bool.
    Returns (bin scores [B, N//BIN], global bin-argmax ids [B, N//BIN])."""
    bitcast = jax.lax.bitcast_convert_type
    b, n = s.shape
    shifted = jnp.where(valid_mask, s + _PACK_OFF, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n // BIN, BIN), 2)
    packed = (
        bitcast(shifted, jnp.int32).reshape(b, n // BIN, BIN)
        & ~jnp.int32(BIN - 1)
    ) | (BIN - 1 - lane)
    m = jnp.max(packed, axis=2)
    valid = m >= jnp.int32(0x40000000)
    lanes = (BIN - 1) - (m & jnp.int32(BIN - 1))
    scores = bitcast(m & ~jnp.int32(BIN - 1), jnp.float32) - _PACK_OFF
    gids = jnp.arange(0, n, BIN, dtype=jnp.int32)[None, :] + lanes
    return (jnp.where(valid, scores, -jnp.inf),
            jnp.where(valid, gids, 0))


def fused_scan_reference(queries, vectors, valid_n, *, k):
    """XLA oracle with identical packed bin-top-1 semantics (parity tests)."""
    n, d = vectors.shape
    s = jnp.dot(
        queries.astype(jnp.bfloat16), vectors.T,
        preferred_element_type=jnp.float32,
    )
    ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    m, gids = packed_bins_reference(s, ids < valid_n)
    ms, sel = jax.lax.top_k(m, min(k, m.shape[1]))
    mi = jnp.take_along_axis(gids, sel, axis=1)
    mi = jnp.where(jnp.isfinite(ms), mi, -1)
    return ms, mi
