"""Pallas gather_dot kernel parity vs the XLA oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.ops.gather_dot import gather_dot, gather_dot_reference


def test_gather_dot_matches_oracle(rng):
    n, m0, d, b, e = 64, 8, 128, 8, 4
    nbr_vecs = jnp.asarray(rng.standard_normal((n, m0, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n, size=(b, e)), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    out = gather_dot(nbr_vecs, ids, q, interpret=True)
    ref = gather_dot_reference(nbr_vecs, ids, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_gather_dot_odd_batch(rng):
    """Batch sizes that aren't multiples of 16 pick a smaller block."""
    n, m0, d, b, e = 32, 4, 128, 6, 2
    nbr_vecs = jnp.asarray(rng.standard_normal((n, m0, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n, size=(b, e)), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    out = gather_dot(nbr_vecs, ids, q, interpret=True)
    ref = gather_dot_reference(nbr_vecs, ids, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)
