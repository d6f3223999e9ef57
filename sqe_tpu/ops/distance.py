"""Distance / similarity primitives shared by index, cache, and embedder.

The reference L2-normalizes embeddings with epsilon 1e-9 before both insert and
query (app/main.py:315-316, :353-354) so that its `cosinesimil` space reduces
to a dot product — the same convention is canonical here (SURVEY.md Q1):
normalize once, then every similarity is a pure matmul that XLA maps onto the
MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NORM_EPS = 1e-9  # matches reference app/main.py:316


@functools.partial(jax.jit, static_argnames=("axis", "eps"))
def l2_normalize(x: jax.Array, axis: int = -1, eps: float = NORM_EPS) -> jax.Array:
    # Jitted so an EAGER call (index add()/search_ids() on raw host queries)
    # is ONE device program instead of a norm/add/divide dispatch chain —
    # each eager op is a ~29 ms tunnel round-trip on the serve path
    # (utils/dispatch.py). Inside traced code it inlines as before.
    norms = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return (x.astype(jnp.float32) / (norms + eps)).astype(x.dtype)


def cosine_scores(queries: jax.Array, vectors: jax.Array) -> jax.Array:
    """Cosine similarity of pre-normalized rows: [B, D] x [N, D] -> [B, N]."""
    return jax.lax.dot_general(
        queries,
        vectors,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
