"""TPU-accelerated graph construction.

The reference's index build delegated to nmslib's sequential insert loop
(HTTP bulk -> C++ pointer-chasing, app/main.py:309-345). Sequential HNSW
insertion is inherently serial; on TPU the build is re-designed as dense
linear algebra over the MXU:

1. **Exact kNN**: blocked ``block @ corpus.T`` matmuls + ``lax.top_k`` give
   every node its true K nearest neighbors (K = 2M + slack).
2. **Occlusion pruning** (HNSW's select_neighbors_heuristic, vectorized):
   candidate-pairwise similarities for each node come from one batched
   ``[B,K,D] x [B,D,K]`` matmul; the sequential "keep candidate unless it is
   closer to an already-kept neighbor than to the node" rule runs as an
   M-step ``lax.scan`` over a boolean mask, parallel across all nodes in the
   block.
3. **Reverse edges**: host-side vectorized fill of remaining degree slots, so
   every forward edge gets a back-edge while degree stays capped at 2M.

Output format is identical to the C++ builder's (``[N, 2M] int32`` flat
neighbor table), so the same beam search serves both. The device build is
O(N^2 D) FLOPs but on the MXU that beats the host's O(N log N * ef * D)
pointer walk by orders of magnitude for corpus-scale N (the 107 MB PMC corpus
is ~31k chunks; 100k chunks build in seconds).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k", "m", "chunk"))
def _block_knn_prune(
    block_vecs: jax.Array,   # [B, D] normalized
    all_vecs: jax.Array,     # [N, D] normalized, N a multiple of `chunk`
    block_ids: jax.Array,    # [B] global ids of the block rows
    valid_n: jax.Array,      # scalar: real row count in all_vecs
    *,
    k: int,
    m: int,
    chunk: int = 8192,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k neighbors for a block of nodes, occlusion-pruned to m.

    The corpus axis is consumed in chunks with a running top-k merge — a
    top-k over 2k candidates per chunk is far cheaper than one top-k over N
    lanes, and the [B, chunk] score tile stays small in HBM.

    Returns (chosen_ids [B, m] int32 with -1 padding, knn_ids [B, k]).
    """
    b, d = block_vecs.shape
    n = all_vecs.shape[0]
    nc = n // chunk
    bf = block_vecs.astype(jnp.float32)

    def scan_body(carry, blk):
        top_s, top_i = carry
        chunk_vecs, base = blk
        s = jax.lax.dot_general(
            bf, chunk_vecs.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )                                                       # [B, chunk]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        s = jnp.where(ids == block_ids[:, None], -jnp.inf, s)   # no self
        s = jnp.where(ids < valid_n, s, -jnp.inf)               # no pad
        cs, ci_local = jax.lax.top_k(s, k)
        ci = jnp.take_along_axis(ids, ci_local, axis=1)
        ms, sel = jax.lax.top_k(jnp.concatenate([top_s, cs], axis=1), k)
        mi = jnp.take_along_axis(jnp.concatenate([top_i, ci], axis=1), sel, axis=1)
        return (ms, mi), None

    init = (
        jnp.full((b, k), -jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    chunks = all_vecs.reshape(nc, chunk, d)
    bases = jnp.arange(nc, dtype=jnp.int32) * chunk
    (top_s, top_i), _ = jax.lax.scan(scan_body, init, (chunks, bases))
    top_i = jnp.maximum(top_i, 0)
    cand_valid = jnp.isfinite(top_s)

    cand_vecs = all_vecs[top_i].astype(jnp.float32)             # [B, K, D]
    pair = jnp.einsum("bkd,bld->bkl", cand_vecs, cand_vecs,
                      preferred_element_type=jnp.float32)       # [B, K, K]

    rank_bonus = -jnp.arange(k, dtype=jnp.float32)              # prefer rank order

    def select(carry, _):
        chosen = carry                                          # [B, K] bool
        # candidate k occluded iff exists chosen l with sim(k,l) > sim(node,k)
        occl = jnp.any(chosen[:, None, :] & (pair > top_s[:, :, None]), axis=2)
        avail = (~chosen) & (~occl) & cand_valid
        pick = jnp.argmax(avail.astype(jnp.float32) * 2.0 + rank_bonus[None, :] * 1e-4, axis=1)
        any_avail = jnp.any(avail, axis=1)
        onehot = jax.nn.one_hot(pick, k, dtype=jnp.bool_)
        chosen = chosen | (onehot & any_avail[:, None])
        return chosen, None

    chosen, _ = jax.lax.scan(select, jnp.zeros((b, k), jnp.bool_), None, length=m)

    # Order chosen candidates by rank; backfill with best-ranked unchosen so
    # every node keeps m edges when possible (HNSW heuristic backfill).
    rank = jnp.arange(k, dtype=jnp.int32)
    chosen_key = jnp.where(chosen, rank, k + rank)              # chosen first
    order = jnp.argsort(chosen_key, axis=1)[:, :m]              # [B, m]
    out_ids = jnp.take_along_axis(top_i, order, axis=1).astype(jnp.int32)
    out_valid = jnp.take_along_axis(cand_valid, order, axis=1)
    out_ids = jnp.where(out_valid, out_ids, -1)
    return out_ids, top_i.astype(jnp.int32)


def build_graph_device(
    vectors: np.ndarray | jax.Array,
    M: int = 16,
    k_candidates: int | None = None,
    block: int = 4096,
    device=None,
) -> np.ndarray:
    """Build a flat [N, 2M] neighbor table on device. Vectors must be
    normalized; returns the same format as hnsw_build.build_graph."""
    n, d = np.asarray(vectors).shape[-2:] if hasattr(vectors, "shape") else vectors.shape
    n = vectors.shape[0]
    m0 = 2 * M
    k = k_candidates or min(n - 1, m0 + 16)
    k = max(1, min(k, n - 1))
    vecs = jnp.asarray(vectors, dtype=jnp.float32)
    if device is not None:
        vecs = jax.device_put(vecs, device)
    # Pad corpus rows so every block/chunk program has identical shape.
    chunk = block
    n_pad = -(-n // block) * block
    if n_pad != n:
        vecs_p = jnp.concatenate(
            [vecs, jnp.zeros((n_pad - n, vecs.shape[1]), vecs.dtype)], axis=0
        )
    else:
        vecs_p = vecs
    chunk = min(chunk, vecs_p.shape[0])

    n_blocks = vecs_p.shape[0] // block

    @functools.partial(jax.jit, static_argnames=("k", "m", "chunk"))
    def all_blocks(vecs_p, valid_n, *, k, m, chunk):
        def one(start):
            ids = start + jnp.arange(block, dtype=jnp.int32)
            chosen, _ = _block_knn_prune(
                jax.lax.dynamic_slice_in_dim(vecs_p, start, block, axis=0),
                vecs_p, ids, valid_n, k=k, m=m, chunk=chunk,
            )
            return chosen

        starts = jnp.arange(n_blocks, dtype=jnp.int32) * block
        # One device program for the whole forward pass: no per-block host
        # round-trips, one transfer of the [n, M] result at the end.
        return jax.lax.map(one, starts)

    chosen = all_blocks(vecs_p, jnp.int32(n), k=k, m=M, chunk=chunk)
    forward = np.asarray(chosen).reshape(-1, M)[:n]

    return _add_reverse_edges(forward, n, m0)


def _add_reverse_edges(forward: np.ndarray, n: int, m0: int) -> np.ndarray:
    """Vectorized reverse-edge fill: each forward edge (i -> j) also requests
    (j -> i); requests land in j's free slots in order until degree m0."""
    M = forward.shape[1]
    out = np.full((n, m0), -1, dtype=np.int32)
    out[:, :M] = forward
    deg = (forward >= 0).sum(axis=1).astype(np.int64)

    src = np.repeat(np.arange(n, dtype=np.int32), M)
    dst = forward.reshape(-1)
    keep = dst >= 0
    src, dst = src[keep], dst[keep]
    # Drop requests already present as forward edges of dst: cheap check via
    # sorted (dst, src) pairs against dst's own forward list is O(E*M); with
    # M small, a vectorized membership test is fine.
    present = (forward[dst] == src[:, None]).any(axis=1)
    src, dst = src[~present], dst[~present]

    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    # Position of each request within its destination group.
    first_idx = np.searchsorted(dst_s, np.arange(n))
    pos_in_group = np.arange(len(dst_s)) - first_idx[dst_s]
    slot = deg[dst_s] + pos_in_group
    ok = slot < m0
    out[dst_s[ok], slot[ok].astype(np.int64)] = src_s[ok]
    return out
