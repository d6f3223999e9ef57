"""Fused (flash-style) multi-head attention for the embedding encoder.

The reference's attention runs inside llama.cpp on the Ollama side of an HTTP
boundary (reference app/main.py:134-145); here it is a Pallas TPU kernel:
blockwise QK^T with an online-softmax accumulator so the [L, L] score matrix is
never materialized in HBM, padding handled with an additive bias. Equivalent
XLA path (`impl="xla"`) is used on CPU and as the oracle in kernel parity tests.

Layout: grid over (batch*heads, q blocks); K/V for the (b, h) pair stay in
VMEM and are consumed in BK-sized blocks by a fori_loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# Test hook: route every pallas_call through interpret mode (CPU test runs).
_FORCE_INTERPRET = False


def _flash_attention_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, bk: int, scale: float):
    """One q-block of online-softmax attention for a single (batch, head).

    q_ref: [1, BQ, D]; k_ref/v_ref: [1, L, D]; bias_ref: [1, 1, L]; o_ref: [1, BQ, D].
    """
    q = q_ref[0].astype(jnp.float32) * scale          # [BQ, D]
    bq, d = q.shape
    l_total = k_ref.shape[1]
    nk = l_total // bk

    m0 = jnp.full((bq, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((bq, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((bq, d), dtype=jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)      # [BK, D]
        v = v_ref[0, pl.ds(j * bk, bk), :].astype(jnp.float32)      # [BK, D]
        bias = bias_ref[0, 0, pl.ds(j * bk, bk)].astype(jnp.float32)  # [BK]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                            # [BQ, BK]
        s = s + bias[None, :]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    *,
    n_heads: int,
    block_q: int = 128,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """q/k/v: [BH, L, D]; bias: [B, L] additive (0 or NEG_INF). Returns [BH, L, D]."""
    interpret = interpret or _FORCE_INTERPRET
    bh, l, d = q.shape
    h = n_heads
    bq = min(block_q, l)
    bk = min(block_k, l)
    assert l % bq == 0 and l % bk == 0, (l, bq, bk)
    scale = 1.0 / (d ** 0.5)

    grid = (bh, l // bq)
    kernel = functools.partial(_flash_attention_kernel, bk=bk, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i, j: (i // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, l, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias[:, None, :])


def _xla_attention(q, k, v, bias):
    """Reference implementation: q/k/v [BH, L, D], bias [BH, L] broadcast over queries."""
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / (d ** 0.5) + bias[:, None, :].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _xla_attention_b(q, k, v, bias, n_heads):
    """Same math with the [B, L] bias layout the flash kernel takes."""
    bias_bh = jnp.repeat(bias, n_heads, axis=0)
    return _xla_attention(q, k, v, bias_bh)


def _flash_attention_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref,
    dq_ref, dk_ref, dv_ref, ds_sum_ref,
    *, scale: float,
):
    """Backward for one (batch, head): recompute P in VMEM, produce all grads.

    Shapes: q/k/v/do [1, L, D]; bias [1, 1, L]; outputs dq/dk/dv [1, L, D] and
    ds_sum [1, 1, L] (the per-(b,h) bias-gradient contribution, summed over
    query rows). Full-L recompute is exact and fits VMEM for the encoder's
    chunk-bounded sequence lengths (L <= 512: ~3 MB of scratch values).
    """
    q = q_ref[0].astype(jnp.float32) * scale                    # [L, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    bias = bias_ref[0, 0, :].astype(jnp.float32)                # [L]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + bias[None, :]                                           # [L, L]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)

    # dV = P^T dO
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = dO V^T ; dS = P * (dP - rowsum(P * dP))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = p * (dp - delta)                                       # [L, L]

    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # q already carries `scale`
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    ds_sum_ref[0, 0, :] = jnp.sum(ds, axis=0)


def _flash_attention_bwd(q, k, v, bias, do, *, n_heads, interpret=False):
    """q/k/v/do: [BH, L, D]; bias [B, L]. Returns (dq, dk, dv, dbias)."""
    interpret = interpret or _FORCE_INTERPRET
    bh, l, d = q.shape
    h = n_heads
    scale = 1.0 / (d ** 0.5)
    kernel = functools.partial(_flash_attention_bwd_kernel, scale=scale)
    dq, dk, dv, ds_sum = pl.pallas_call(
        kernel,
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i: (i // h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, l, d), q.dtype),
            jax.ShapeDtypeStruct((bh, l, d), k.dtype),
            jax.ShapeDtypeStruct((bh, l, d), v.dtype),
            jax.ShapeDtypeStruct((bh, 1, l), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v, bias[:, None, :], do)
    b = bias.shape[0]
    dbias = jnp.sum(ds_sum.reshape(b, h, l), axis=1)            # [B, L]
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_ad(q, k, v, bias, n_heads):
    """Differentiable Pallas attention: flash forward, full-recompute Pallas
    backward (both kernels; parity-gated against XLA grads in tests)."""
    return _flash_attention(q, k, v, bias, n_heads=n_heads)


def _flash_ad_fwd(q, k, v, bias, n_heads):
    out = _flash_attention(q, k, v, bias, n_heads=n_heads)
    return out, (q, k, v, bias)


def _flash_ad_bwd(n_heads, residuals, g):
    q, k, v, bias = residuals
    return _flash_attention_bwd(q, k, v, bias, g, n_heads=n_heads)


_flash_attention_ad.defvjp(_flash_ad_fwd, _flash_ad_bwd)


def multihead_attention(
    x: jax.Array,
    mask: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    wo: jax.Array,
    *,
    n_heads: int,
    impl: str = "xla",
) -> jax.Array:
    """Full MHA block: projections + fused attention + output projection.

    x: [B, L, D_model]; mask: [B, L] (1 = real token, 0 = pad);
    w*: [D_model, D_model]. Returns [B, L, D_model].
    impl: "pallas" (TPU kernel), "pallas_interpret" (kernel in interpreter
    mode, for CPU parity tests), or "xla".
    """
    b, l, dm = x.shape
    h = n_heads
    dh = dm // h
    dtype = x.dtype

    # Fused QKV: one [dm, 3*dm] contraction instead of three [dm, dm] ones —
    # x streams through the MXU once (3x less activation HBM traffic) and the
    # single wider matmul tiles better at d_model=512. The concat is a ~MB
    # weight copy, negligible next to the [B*L, dm] x [dm, 3dm] dot.
    wqkv = jnp.concatenate(
        [wq.astype(dtype), wk.astype(dtype), wv.astype(dtype)], axis=1
    )
    y = jnp.einsum("bld,de->ble", x, wqkv)                        # [B, L, 3*dm]

    def heads(z):
        # [B, L, D] -> [B*H, L, Dh]
        return z.reshape(b, l, h, dh).transpose(0, 2, 1, 3).reshape(b * h, l, dh)

    q, k, v = (heads(y[..., i * dm:(i + 1) * dm]) for i in range(3))
    bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32)  # [B, L]

    if impl == "xla":
        bias_bh = jnp.repeat(bias, h, axis=0)
        o = _xla_attention(q, k, v, bias_bh)
    elif impl == "pallas":
        o = _flash_attention_ad(q, k, v, bias, h)
    elif impl == "pallas_interpret":
        o = _flash_attention(q, k, v, bias, n_heads=h, interpret=True)
    else:
        raise ValueError(f"unknown attention impl: {impl}")

    o = o.reshape(b, h, l, dh).transpose(0, 2, 1, 3).reshape(b, l, dm)
    return jnp.einsum("bld,de->ble", o, wo.astype(dtype))
