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
