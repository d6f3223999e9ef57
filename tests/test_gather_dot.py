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


def test_gather_dot_chunked_matches_unchunked(rng):
    """_gather_dot_chunked (index/flat.py): the SMEM-bounded query-chunked
    path (a lax.map of gather_dot calls) must be exactly the single-call
    result. The tiny smem_budget forces chunking at test scale; production
    triggers at B x max(R,128) x 4 > 512 KB (bench.py's B=4096 1M rerank
    row failed to compile without this)."""
    from sqe_tpu.index.flat import _gather_dot_chunked

    n, m0, d, b, e = 64, 8, 128, 32, 4
    nbr_vecs = jnp.asarray(rng.standard_normal((n, m0, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, n, size=(b, e)), jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    whole = gather_dot(nbr_vecs, ids, q, interpret=True)
    # budget of one 8-row chunk: 8 * max(4,128) * 4 bytes
    chunked = _gather_dot_chunked(nbr_vecs, ids, q, interpret=True,
                                  smem_budget=8 * 128 * 4)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))
