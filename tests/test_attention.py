"""Pallas flash-attention kernel parity vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqe_tpu.ops.attention import multihead_attention


@pytest.mark.parametrize("seq_len", [64, 128])
def test_flash_attention_matches_xla(rng, seq_len):
    b, h, dm = 2, 2, 64
    x = jnp.asarray(rng.standard_normal((b, seq_len, dm)), jnp.float32)
    mask = np.ones((b, seq_len), np.float32)
    mask[0, seq_len // 2 :] = 0.0  # padded tail on first sequence
    mask = jnp.asarray(mask)
    ws = [
        jnp.asarray(rng.standard_normal((dm, dm)) * 0.05, jnp.float32)
        for _ in range(4)
    ]

    ref = multihead_attention(x, mask, *ws, n_heads=h, impl="xla")
    out = multihead_attention(x, mask, *ws, n_heads=h, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_flash_attention_blockwise_equivalence(rng):
    """Online-softmax accumulation over several KV blocks must equal one block."""
    from sqe_tpu.ops.attention import _flash_attention

    bh, l, d = 2, 128, 32
    q = jnp.asarray(rng.standard_normal((bh, l, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, l, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, l, d)), jnp.float32)
    bias = jnp.zeros((2, l), jnp.float32)
    one = _flash_attention(q, k, v, bias, n_heads=1, block_k=128, interpret=True)
    many = _flash_attention(q, k, v, bias, n_heads=1, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(many), np.asarray(one), atol=1e-5)


def test_pallas_attention_grad_matches_xla(rng):
    """custom_vjp path: grads through the pallas impl == XLA grads (the
    backward is an XLA recompute; interpret mode runs the kernel on CPU)."""
    import jax

    b, h, l, dm = 2, 2, 64, 64
    x = jnp.asarray(rng.standard_normal((b, l, dm)) * 0.3, jnp.float32)
    mask = jnp.ones((b, l), jnp.float32)
    ws = [jnp.asarray(rng.standard_normal((dm, dm)) * 0.05, jnp.float32)
          for _ in range(4)]

    def loss(impl, wq):
        out = multihead_attention(x, mask, wq, *ws[1:], n_heads=h, impl=impl)
        return jnp.sum(out ** 2)

    from sqe_tpu.ops import attention as A
    # Route both pallas kernels through interpret mode for the CPU test.
    A._FORCE_INTERPRET = True
    try:
        g_pallas = jax.grad(lambda w: loss("pallas", w))(ws[0])
    finally:
        A._FORCE_INTERPRET = False
    g_xla = jax.grad(lambda w: loss("xla", w))(ws[0])
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=5e-3, rtol=5e-3)
