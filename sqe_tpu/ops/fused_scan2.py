"""Fused scan v2: column-max accumulation — the VPU-light fused scan.

The v1 kernel (ops/fused_scan.py) is MXU-underutilized at scale: its per-tile
bin-top-1 needs a cross-lane max-reduction tree (7 shuffle steps over every
[BQ, 128] chunk) plus a lane-narrow concatenate, and roofline arithmetic on
the DESIGN.md §8c measurements puts it at ~60% of bf16 peak / ~42% of int8
peak at 2M rows (ROADMAP #0).  v2 removes every cross-lane operation from the
hot loop:

- The candidate *bin* of corpus row ``id`` is ``id % C`` (C = accumulator
  width, default 2048) instead of ``id // 128``.  A score tile's columns then
  map 1:1 onto accumulator columns, so per-tile selection is ONE element-wise
  ``max`` against a VMEM-resident [slab, C] accumulator — no lane shuffles,
  no relayouts, no per-tile HBM candidate writes.
- Scores carry their id with them: shifted to positive floats (+4.0) whose
  int32 bit pattern orders identically to their float value, low mantissa
  bits replaced by ``id // C`` (the column gives ``id % C`` positionally).
  One integer max per element selects winner-score-and-id at once — the v1
  packed-bitcast-max trick, now accumulated across corpus tiles instead of
  reduced across lanes.
- The exact cross-bin merge shrinks from ``lax.top_k`` over [B, N/128] to
  [B, C]: at 4M rows that is 16x less merge traffic.

HBM traffic is the corpus read itself, once per 512-query slab (the slab's
queries, its accumulator, and a double-buffered corpus tile fit VMEM's
~16 MB together), plus one [slab, C] i32 accumulator flush per slab.

Approximation contract: a true top-k id is missed only when a better top-k id
shares its ``id % C`` residue class — P ~ (k-1)/(2C) per id, recall@10
>= 0.995 at C=2048 under the uniform model, gated in tests/test_fused_scan2.py
and measured on hardware in scripts/fused_scan2_bench.py.  Unlike v1 (bins =
N/128) the bin count is N-independent, so small-N recall is *better* than v1
below N = 128*C = 262k and slightly lower above it; the int8 serving path
restores exactness via the existing residual rerank (index/flat.py).

Returned scores have their low ``ceil(log2(N/C))`` mantissa bits cleared
(<= 1e-3 at 4M rows — bf16 scoring noise scale); ids are exact.

Replaces the reference's delegated OpenSearch k-NN scoring
(app/main.py:347-373), same contract as ops/fused_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PACK_OFF = 4.0                    # score shift: cosines (|s|<=1.02) -> [2.98, 5.02]
_PACK_MIN = 0x40000000             # bitcast(2.0f): below any shifted valid score


def _plan_bits(n_pad: int, c: int) -> int:
    """Mantissa bits the encoded ``id // C`` needs. 0 when N <= C."""
    groups = -(-n_pad // c)
    return max(0, (groups - 1).bit_length())


def _scan2_kernel(valid_ref, q_ref, v_ref, acc_ref, *, slab, bq, bn, c, bits):
    i = pl.program_id(1)
    nb = pl.num_programs(1)
    base = i * bn
    m = c // bn
    lowmask = jnp.int32((1 << bits) - 1)
    # id = enc*C + (acc column); enc advances once per m tiles.
    enc = jax.lax.div(i, m) & lowmask
    col0 = jax.lax.rem(i, m) * bn

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros((slab, c), jnp.int32)

    tail = base + bn > valid_ref[0, 0]
    for jq in range(slab // bq):
        rows = slice(jq * bq, (jq + 1) * bq)
        s = jax.lax.dot_general(
            q_ref[rows], v_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [bq, bn]
        packed = (
            jax.lax.bitcast_convert_type(s + _PACK_OFF, jnp.int32) & ~lowmask
        ) | enc
        cslice = pl.ds(pl.multiple_of(col0, bn), bn)

        @pl.when(jnp.logical_not(tail))
        def _():
            acc_ref[rows, cslice] = jnp.maximum(acc_ref[rows, cslice], packed)

        @pl.when(tail)
        def _():
            gids = base + jax.lax.broadcasted_iota(jnp.int32, (bq, bn), 1)
            masked = jnp.where(gids < valid_ref[0, 0], packed, 0)
            acc_ref[rows, cslice] = jnp.maximum(acc_ref[rows, cslice], masked)


def _scan2_kernel_int8(valid_ref, q_ref, qs_ref, v_ref, vs_ref, acc_ref, *,
                       slab, bq, bn, c, bits):
    i = pl.program_id(1)
    base = i * bn
    m = c // bn
    lowmask = jnp.int32((1 << bits) - 1)
    enc = jax.lax.div(i, m) & lowmask
    col0 = jax.lax.rem(i, m) * bn

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros((slab, c), jnp.int32)

    tail = base + bn > valid_ref[0, 0]
    vs = vs_ref[0][None, :]                                  # [1, bn]
    for jq in range(slab // bq):
        rows = slice(jq * bq, (jq + 1) * bq)
        s = jax.lax.dot_general(
            q_ref[rows], v_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        # Both scale planes must be applied before packing: the shift trick
        # needs cosine-ranged positive floats (an unscaled row would pack
        # huge or negative values, breaking the int-order bitcast).
        s = (s * vs) * qs_ref[rows] + _PACK_OFF
        packed = (
            jax.lax.bitcast_convert_type(s, jnp.int32) & ~lowmask
        ) | enc
        cslice = pl.ds(pl.multiple_of(col0, bn), bn)

        @pl.when(jnp.logical_not(tail))
        def _():
            acc_ref[rows, cslice] = jnp.maximum(acc_ref[rows, cslice], packed)

        @pl.when(tail)
        def _():
            gids = base + jax.lax.broadcasted_iota(jnp.int32, (bq, bn), 1)
            masked = jnp.where(gids < valid_ref[0, 0], packed, 0)
            acc_ref[rows, cslice] = jnp.maximum(acc_ref[rows, cslice], masked)


def _plan_shapes(b: int, n: int, *, bn_cap: int, c: int, bq: int):
    """(b_pad, slab, bn) for a [B] query batch over an [N]-row corpus.
    The slab is the per-pass query block: 512 keeps q + acc + a
    double-buffered corpus tile inside VMEM; smaller batches shrink to one
    slab so tiny-B searches never pad to 512."""
    b_pad = -(-b // bq) * bq
    slab = min(512, b_pad)
    b_pad = -(-b_pad // slab) * slab
    bn = min(bn_cap, n, c)
    while bn >= 128:
        if n % bn == 0 and c % bn == 0:
            return b_pad, slab, bn
        bn -= 128
    return b_pad, slab, 0


def unpack_scan2(acc: jax.Array, *, c: int, bits: int):
    """Decode the packed accumulator -> (scores [B, C] f32, ids [B, C] i32).
    Invalid columns (never won by a real row) come back (-inf, -1)."""
    bitcast = jax.lax.bitcast_convert_type
    lowmask = jnp.int32((1 << bits) - 1)
    valid = acc >= jnp.int32(_PACK_MIN)
    scores = bitcast(acc & ~lowmask, jnp.float32) - _PACK_OFF
    cols = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
    ids = (acc & lowmask) * c + cols
    return (jnp.where(valid, scores, -jnp.inf),
            jnp.where(valid, ids, -1))


@functools.partial(
    jax.jit, static_argnames=("c", "bn_cap", "bq", "interpret")
)
def fused_scan2_candidates(
    queries: jax.Array,    # [B, D] any float; cast to bf16
    vectors: jax.Array,    # [N, D] bf16, pad rows arbitrary
    valid_n: jax.Array,    # scalar int32
    *,
    c: int = 2048,
    bn_cap: int = 1024,
    bq: int = 256,
    interpret: bool = False,
):
    """Per-residue-class top-1 candidates: (scores [B, C], ids [B, C])."""
    n, d = vectors.shape
    b = queries.shape[0]
    b_pad, slab, bn = _plan_shapes(b, n, bn_cap=bn_cap, c=c, bq=bq)
    assert bn, f"no tile size <= {bn_cap} divides N={n} and C={c}"
    bits = _plan_bits(n, c)
    q = jnp.zeros((b_pad, d), jnp.bfloat16).at[:b].set(
        queries.astype(jnp.bfloat16))
    nb = n // bn
    grid_spec = pl.GridSpec(
        # Inner axis streams corpus tiles (double-buffered by Mosaic); the
        # accumulator block is revisited across it and flushed once per slab.
        grid=(b_pad // slab, nb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((slab, d), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((slab, c), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _scan2_kernel, slab=slab, bq=min(bq, slab), bn=bn, c=c, bits=bits)
    (acc,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b_pad, c), jnp.int32)],
        interpret=interpret,
    )(valid_n.reshape(1, 1).astype(jnp.int32), q, vectors)
    cs, ci = unpack_scan2(acc, c=c, bits=bits)
    return cs[:b], ci[:b]


def _merge_topk(cs, ci, k):
    k_eff = min(k, cs.shape[1])
    ms, sel = jax.lax.top_k(cs, k_eff)
    mi = jnp.take_along_axis(ci, sel, axis=1)
    mi = jnp.where(jnp.isfinite(ms), mi, -1)
    if k_eff < k:
        pad = k - k_eff
        ms = jnp.pad(ms, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        mi = jnp.pad(mi, ((0, 0), (0, pad)), constant_values=-1)
    return ms, mi


@functools.partial(
    jax.jit, static_argnames=("k", "c", "bn_cap", "bq", "interpret")
)
def fused_scan2_topk(
    queries: jax.Array,
    vectors: jax.Array,
    valid_n: jax.Array,
    *,
    k: int,
    c: int = 2048,
    bn_cap: int = 1024,
    bq: int = 256,
    interpret: bool = False,
):
    """v2 fused scan + exact cross-bin merge; drop-in for fused_scan_topk."""
    cs, ci = fused_scan2_candidates(
        queries, vectors, valid_n, c=c, bn_cap=bn_cap, bq=bq,
        interpret=interpret)
    return _merge_topk(cs, ci, k)


@functools.partial(
    jax.jit, static_argnames=("k", "c", "bn_cap", "bq", "interpret")
)
def fused_scan2_topk_int8(
    queries: jax.Array,     # [B, D] float
    vectors_i8: jax.Array,  # [N, D] int8
    vscales: jax.Array,     # [N, 1] f32 row scales
    valid_n: jax.Array,
    *,
    k: int,
    c: int = 2048,
    bn_cap: int = 2048,
    bq: int = 256,
    interpret: bool = False,
):
    """Int8 v2 fused scan (2x MXU rate, half HBM read of bf16) + exact
    merge. Scores are calibrated ~cosines (both quantization scales applied
    in-kernel, as in the v1 kernel)."""
    from sqe_tpu.ops.fused_scan import quantize_rows

    n, d = vectors_i8.shape
    b = queries.shape[0]
    b_pad, slab, bn = _plan_shapes(b, n, bn_cap=bn_cap, c=c, bq=bq)
    assert bn, f"no tile size <= {bn_cap} divides N={n} and C={c}"
    bits = _plan_bits(n, c)
    q_i8, q_scales = quantize_rows(queries.astype(jnp.float32))
    q = jnp.zeros((b_pad, d), jnp.int8).at[:b].set(q_i8)
    qs = jnp.zeros((b_pad, 1), jnp.float32).at[:b].set(q_scales)
    vs_row = vscales.reshape(1, n)
    nb = n // bn
    grid_spec = pl.GridSpec(
        grid=(b_pad // slab, nb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((slab, d), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, 1), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda s, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda s, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((slab, c), lambda s, i: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _scan2_kernel_int8, slab=slab, bq=min(bq, slab), bn=bn, c=c,
        bits=bits)
    (acc,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b_pad, c), jnp.int32)],
        interpret=interpret,
    )(valid_n.reshape(1, 1).astype(jnp.int32), q, qs, vectors_i8, vs_row)
    cs, ci = unpack_scan2(acc, c=c, bits=bits)
    return _merge_topk(cs[:b], ci[:b], k)


def fused_scan2_reference(queries, vectors, valid_n, *, k, c: int = 2048):
    """XLA oracle with bit-identical packing semantics (parity tests)."""
    n, d = vectors.shape
    bits = _plan_bits(n, c)
    s = jnp.dot(
        queries.astype(jnp.bfloat16), vectors.T,
        preferred_element_type=jnp.float32,
    )
    ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    lowmask = jnp.int32((1 << bits) - 1)
    packed = (
        jax.lax.bitcast_convert_type(s + _PACK_OFF, jnp.int32) & ~lowmask
    ) | (jax.lax.div(ids, c) & lowmask)
    packed = jnp.where(ids < valid_n, packed, 0)
    b = s.shape[0]
    groups = -(-n // c)
    pad_cols = groups * c - n
    packed = jnp.pad(packed, ((0, 0), (0, pad_cols)))
    acc = jnp.max(packed.reshape(b, groups, c), axis=1)
    cs, ci = unpack_scan2(acc, c=c, bits=bits)
    return _merge_topk(cs, ci, k)


def fused_scan2_reference_int8(queries, vectors_i8, vscales, valid_n, *, k,
                               c: int = 2048):
    """XLA oracle for the int8 v2 kernel (bit-identical packing)."""
    from sqe_tpu.ops.fused_scan import quantize_rows

    n, d = vectors_i8.shape
    bits = _plan_bits(n, c)
    q_i8, q_scales = quantize_rows(queries.astype(jnp.float32))
    s = jax.lax.dot_general(
        q_i8, vectors_i8, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    s = (s * vscales.reshape(1, n)) * q_scales + _PACK_OFF
    ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    lowmask = jnp.int32((1 << bits) - 1)
    packed = (
        jax.lax.bitcast_convert_type(s, jnp.int32) & ~lowmask
    ) | (jax.lax.div(ids, c) & lowmask)
    packed = jnp.where(ids < valid_n, packed, 0)
    b = s.shape[0]
    groups = -(-n // c)
    pad_cols = groups * c - n
    packed = jnp.pad(packed, ((0, 0), (0, pad_cols)))
    acc = jnp.max(packed.reshape(b, groups, c), axis=1)
    cs, ci = unpack_scan2(acc, c=c, bits=bits)
    return _merge_topk(cs, ci, k)
