"""HNSW index with batched on-device beam search.

Replaces OpenSearch's nmslib HNSW query path (reference app/main.py:347-373)
with a TPU-resident search over the flattened neighbor table produced by
``hnsw_build``:

- **Seeding**: instead of pointer-chasing down the HNSW hierarchy (hostile to
  a vector machine), the query batch is scored against a fixed pivot sample of
  the corpus with a single MXU matmul and the top seeds initialize the beam.
- **Beam search**: fixed-shape ef-candidate loop. Each iteration expands the
  best unexplored candidate per query: gather its neighbor row from the flat
  graph, mask already-seen ids (compare against the candidate list and the
  explored log — bounded, branch-free dedup), score the gathered neighbor
  vectors against the query (batched dot), and merge into the running top-ef
  with one ``lax.top_k``. All queries in the batch advance in lockstep; the
  whole search is one jitted device program with static shapes.

Termination matches HNSW semantics: a query stops when its candidate list
holds no unexplored entry (every unexplored candidate worse than the current
top-ef has been evicted); the batch stops when all queries have stopped or at
``max_iters``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.config import HNSWConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.index import hnsw_build
from sqe_tpu.ops.distance import l2_normalize
from sqe_tpu.utils import dispatch

NEG_INF = jnp.float32(-jnp.inf)


def plan_fused_gather(b: int, m0: int, d: int, itemsize: int,
                      expand: int, budget: int = 12 << 20):
    """Clamp the expansion width to gather_dot's VMEM scratch budget at the
    smallest query block Mosaic permits for this batch size (block_q must be
    a multiple of 8 or equal B — ops/gather_dot.py), and report whether the
    fused layout is usable at all. Returns (expand, fused_ok); callers fall
    back to the plain-layout einsum scoring when fused_ok is False (e.g. an
    off-size batch whose only legal block is B itself and does not fit).
    Shared by HNSWIndex.search_ids and the fused serving frontend so every
    entry point applies the same rule."""
    bq_min = 8 if b % 8 == 0 else b
    e_max = budget // max(1, bq_min * m0 * d * itemsize)
    if e_max < 1:
        return expand, False
    return max(1, min(expand, e_max)), True


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "max_iters", "n_seeds", "expand", "fused_gather",
        "approx_merge", "dedup_expansion", "visited_impl",
    ),
)
def hnsw_search_batch(
    queries: jax.Array,     # [B, D] normalized f32
    vectors: jax.Array,     # [N, D] normalized (f32 or bf16)
    graph: jax.Array,       # [N, M0] int32, -1 padded
    pivot_ids: jax.Array,   # [S] int32
    nbr_vecs: Optional[jax.Array] = None,  # [N, M0, D] neighbor-materialized
    nbr_scales: Optional[jax.Array] = None,  # [N, M0] f32 when nbr_vecs is int8
    *,
    k: int,
    ef: int = 100,
    max_iters: int = 40,
    n_seeds: int = 32,
    expand: int = 4,
    fused_gather: bool = False,
    approx_merge: bool = False,
    dedup_expansion: bool = False,
    visited_impl: str = "compare",
) -> Tuple[jax.Array, jax.Array]:
    """Batched beam search. Returns (scores [B, k], ids [B, k]).

    ``expand`` is the per-iteration expansion width: the E best unexplored
    candidates are expanded together, so the sequential depth is ~ef/E while
    total gathered bytes stay the same — the per-step gathers/einsums get E
    times larger and the TPU pipelines them far better than E tiny steps.

    ``fused_gather`` scores neighbors with the Pallas gather_dot kernel over
    the neighbor-materialized ``nbr_vecs [N, M0, D]`` layout (one contiguous
    64KB DMA per expanded parent instead of M0 scattered row gathers) — ~6x
    the effective HBM bandwidth of the XLA gather+einsum lowering on TPU.

    ``visited_impl`` selects the dedup mechanism:
    - "compare": branch-free broadcast compares of each neighbor against the
      candidate list and an explored log ([B, EM, ef+T] VPU work/iteration).
    - "bytemap": nmslib's visited-list semantics as a [B, N+1] device byte
      map — every *generated* neighbor is marked (seeds at init) and future
      occurrences are masked with one [B, EM] gather + one scatter, making
      per-iteration dedup cost independent of ef and iteration count. Memory
      B*(N+1) bytes; exact-equivalent to "compare" up to transient
      in-expansion duplicates, which both modes resolve at the final cut.
      MEASURED 3x slower than "compare" on TPU at 100k/B=1024 (XLA's batched
      scatter serializes the marks — scripts/hnsw_bytemap_bench.py), so
      "compare" stays the default; kept for backends/future lowerings where
      scatter is cheap.
    """
    b, d = queries.shape
    m0 = graph.shape[1]
    e = expand
    qf = queries.astype(jnp.float32)
    assert n_seeds <= ef
    if fused_gather:
        from sqe_tpu.ops.gather_dot import gather_dot

    # --- Seed the beam: one matmul against the pivot sample.
    pivot_vecs = vectors[pivot_ids].astype(jnp.float32)          # [S, D]
    ps = jax.lax.dot_general(
        qf, pivot_vecs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                             # [B, S]
    seed_sims, seed_pos = jax.lax.top_k(ps, n_seeds)
    seed_ids = pivot_ids[seed_pos].astype(jnp.int32)              # [B, n_seeds]

    pad = ef - n_seeds
    cand_ids = jnp.concatenate(
        [seed_ids, jnp.full((b, pad), -1, jnp.int32)], axis=1
    )
    cand_sims = jnp.concatenate(
        [seed_sims, jnp.full((b, pad), -jnp.inf, jnp.float32)], axis=1
    )
    explored = jnp.zeros((b, ef), dtype=jnp.bool_)
    explored_log = jnp.full((b, max_iters * e), -1, jnp.int32)

    if visited_impl == "bytemap":
        cand_ids, cand_sims = _beam_loop_bytemap(
            qf, vectors, graph, nbr_vecs, nbr_scales, cand_ids, cand_sims,
            explored, seed_ids, ef=ef, max_iters=max_iters, e=e, m0=m0,
            fused_gather=fused_gather, approx_merge=approx_merge,
        )
        # Transient in-expansion duplicates resolve at the final cut.
        dup = jnp.any(
            (cand_ids[:, :, None] == cand_ids[:, None, :])
            & (jax.lax.broadcasted_iota(jnp.int32, (ef, ef), 1)
               < jax.lax.broadcasted_iota(jnp.int32, (ef, ef), 0))[None],
            axis=2,
        )
        cand_sims = jnp.where(dup, -jnp.inf, cand_sims)
        out_sims, sel = jax.lax.top_k(cand_sims, k)
        out_ids = jnp.take_along_axis(cand_ids, sel, axis=1)
        out_ids = jnp.where(jnp.isfinite(out_sims), out_ids, -1)
        return out_sims, out_ids
    assert visited_impl == "compare", visited_impl

    def cond(state):
        it, cand_ids, cand_sims, explored, explored_log = state
        avail = (~explored) & (cand_ids >= 0)
        return (it < max_iters) & jnp.any(avail)

    def body(state):
        it, cand_ids, cand_sims, explored, explored_log = state
        avail = (~explored) & (cand_ids >= 0)
        masked = jnp.where(avail, cand_sims, -jnp.inf)
        sel_sims, sel_pos = jax.lax.top_k(masked, e)              # [B, E]
        sel_active = jnp.isfinite(sel_sims)

        # Mark the selected candidates explored.
        onehots = jax.nn.one_hot(sel_pos, ef, dtype=jnp.bool_)    # [B, E, ef]
        explored = explored | jnp.any(
            onehots & sel_active[:, :, None], axis=1
        )

        nids = jnp.take_along_axis(cand_ids, sel_pos, axis=1)     # [B, E]
        nid_safe = jnp.where(sel_active, jnp.maximum(nids, 0), 0)
        explored_log = jax.lax.dynamic_update_slice(
            explored_log,
            jnp.where(sel_active, nid_safe, -1),
            (0, it * e),
        )

        nbrs = graph[nid_safe].reshape(b, e * m0)                 # [B, E*M0]
        valid = (nbrs >= 0) & jnp.repeat(sel_active, m0, axis=1)
        # Dedup: against the candidate list, the explored log, and earlier
        # positions within this expansion batch (two parents share a child).
        seen_cand = jnp.any(nbrs[:, :, None] == cand_ids[:, None, :], axis=2)
        seen_expl = jnp.any(nbrs[:, :, None] == explored_log[:, None, :], axis=2)
        em = e * m0
        valid = valid & ~seen_cand & ~seen_expl
        # Default off: transient in-expansion duplicates cost ~0.1% recall but
        # the EMxEM compare costs ~16% throughput; the output list is deduped
        # after the loop either way (measured A/B in DESIGN.md).
        if dedup_expansion:
            # Cross-parent duplicates within one expansion batch (children of
            # one parent are unique by graph construction).
            eq = nbrs[:, :, None] == nbrs[:, None, :]             # [B, EM, EM]
            tri = jax.lax.broadcasted_iota(jnp.int32, (em, em), 1) < \
                jax.lax.broadcasted_iota(jnp.int32, (em, em), 0)
            dup_prev = jnp.any(eq & tri[None], axis=2)
            valid = valid & ~dup_prev

        if fused_gather:
            sims = gather_dot(nbr_vecs, nid_safe, qf)             # [B, E*M0]
            if nbr_scales is not None:
                # int8 layout: dequantize scores with the per-row scales.
                sims = sims * nbr_scales[nid_safe].reshape(b, em)
        else:
            nbr_safe = jnp.where(valid, nbrs, 0)
            nvecs = vectors[nbr_safe]                             # [B, E*M0, D]
            sims = jnp.einsum(
                "bd,bmd->bm", qf.astype(nvecs.dtype), nvecs,
                preferred_element_type=jnp.float32,
            )
        sims = jnp.where(valid, sims, -jnp.inf)

        all_sims = jnp.concatenate([cand_sims, sims], axis=1)     # [B, ef+E*M0]
        all_ids = jnp.concatenate([cand_ids, nbrs], axis=1)
        all_expl = jnp.concatenate(
            [explored, jnp.zeros((b, em), jnp.bool_)], axis=1
        )
        if approx_merge:
            # TPU-optimized aggregation: much cheaper than the sort-based
            # top_k; the beam is a heuristic frontier, so approximate
            # membership trades negligible recall for per-iteration latency.
            new_sims, sel = jax.lax.approx_max_k(
                all_sims, ef, recall_target=0.95
            )
        else:
            new_sims, sel = jax.lax.top_k(all_sims, ef)
        new_ids = jnp.take_along_axis(all_ids, sel, axis=1)
        new_expl = jnp.take_along_axis(all_expl, sel, axis=1)
        new_ids = jnp.where(jnp.isfinite(new_sims), new_ids, -1)

        return it + 1, new_ids, new_sims, new_expl, explored_log

    state = (jnp.int32(0), cand_ids, cand_sims, explored, explored_log)
    _, cand_ids, cand_sims, _, _ = jax.lax.while_loop(cond, body, state)

    if not dedup_expansion:
        # Mask duplicate ids (keep the first occurrence) before the final cut.
        dup = jnp.any(
            (cand_ids[:, :, None] == cand_ids[:, None, :])
            & (jax.lax.broadcasted_iota(jnp.int32, (ef, ef), 1)
               < jax.lax.broadcasted_iota(jnp.int32, (ef, ef), 0))[None],
            axis=2,
        )
        cand_sims = jnp.where(dup, -jnp.inf, cand_sims)
    out_sims, sel = jax.lax.top_k(cand_sims, k)
    out_ids = jnp.take_along_axis(cand_ids, sel, axis=1)
    out_ids = jnp.where(jnp.isfinite(out_sims), out_ids, -1)
    return out_sims, out_ids


def _beam_loop_bytemap(
    qf, vectors, graph, nbr_vecs, nbr_scales, cand_ids, cand_sims,
    explored, seed_ids, *, ef, max_iters, e, m0, fused_gather, approx_merge,
):
    """Beam loop with nmslib-style visited-list dedup on device.

    A [B, N+1] byte map (slot N is the trash slot for masked writes) marks
    every node whose similarity has ever been computed — seeds at init, every
    generated neighbor per iteration. Dedup is then one [B, EM] gather
    (already-seen mask) + one scatter (mark), replacing the compare path's
    [B, EM, ef] + [B, EM, max_iters*E] broadcast compares whose cost grows
    with ef and iteration count. Semantics match nmslib's ef-search visited
    list (hnsw_builder.cc's host-side equivalent): a node generated but not
    admitted to the beam is never re-scored.
    """
    b = qf.shape[0]
    n = vectors.shape[0]
    if fused_gather:
        from sqe_tpu.ops.gather_dot import gather_dot

    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    visited = jnp.zeros((b, n + 1), jnp.int8)
    visited = visited.at[rows, seed_ids].set(jnp.int8(1))

    def cond(state):
        it, cand_ids, cand_sims, explored, visited = state
        avail = (~explored) & (cand_ids >= 0)
        return (it < max_iters) & jnp.any(avail)

    def body(state):
        it, cand_ids, cand_sims, explored, visited = state
        avail = (~explored) & (cand_ids >= 0)
        masked = jnp.where(avail, cand_sims, -jnp.inf)
        sel_sims, sel_pos = jax.lax.top_k(masked, e)              # [B, E]
        sel_active = jnp.isfinite(sel_sims)

        onehots = jax.nn.one_hot(sel_pos, ef, dtype=jnp.bool_)    # [B, E, ef]
        explored = explored | jnp.any(
            onehots & sel_active[:, :, None], axis=1
        )

        nids = jnp.take_along_axis(cand_ids, sel_pos, axis=1)     # [B, E]
        nid_safe = jnp.where(sel_active, jnp.maximum(nids, 0), 0)

        em = e * m0
        nbrs = graph[nid_safe].reshape(b, em)                     # [B, EM]
        valid = (nbrs >= 0) & jnp.repeat(sel_active, m0, axis=1)
        probe = jnp.where(valid, nbrs, n)                         # trash slot
        seen = jnp.take_along_axis(visited, probe, axis=1) > 0
        valid = valid & ~seen
        visited = visited.at[rows, jnp.where(valid, nbrs, n)].set(jnp.int8(1))

        if fused_gather:
            sims = gather_dot(nbr_vecs, nid_safe, qf)             # [B, E*M0]
            if nbr_scales is not None:
                sims = sims * nbr_scales[nid_safe].reshape(b, em)
        else:
            nbr_safe = jnp.where(valid, nbrs, 0)
            nvecs = vectors[nbr_safe]                             # [B, EM, D]
            sims = jnp.einsum(
                "bd,bmd->bm", qf.astype(nvecs.dtype), nvecs,
                preferred_element_type=jnp.float32,
            )
        sims = jnp.where(valid, sims, -jnp.inf)

        all_sims = jnp.concatenate([cand_sims, sims], axis=1)     # [B, ef+EM]
        all_ids = jnp.concatenate([cand_ids, nbrs], axis=1)
        all_expl = jnp.concatenate(
            [explored, jnp.zeros((b, em), jnp.bool_)], axis=1
        )
        if approx_merge:
            new_sims, sel = jax.lax.approx_max_k(
                all_sims, ef, recall_target=0.95
            )
        else:
            new_sims, sel = jax.lax.top_k(all_sims, ef)
        new_ids = jnp.take_along_axis(all_ids, sel, axis=1)
        new_expl = jnp.take_along_axis(all_expl, sel, axis=1)
        new_ids = jnp.where(jnp.isfinite(new_sims), new_ids, -1)

        return it + 1, new_ids, new_sims, new_expl, visited

    state = (jnp.int32(0), cand_ids, cand_sims, explored, visited)
    _, cand_ids, cand_sims, _, _ = jax.lax.while_loop(cond, body, state)
    return cand_ids, cand_sims


@jax.jit
def _exact_rerank(
    queries: jax.Array,   # [B, D] f32 normalized
    vectors: jax.Array,   # [N, D]
    ids: jax.Array,       # [B, k] int32 (may contain -1)
) -> Tuple[jax.Array, jax.Array]:
    """Re-score the final candidates against the base vectors and re-sort —
    absorbs quantization noise from the int8 search layout."""
    safe = jnp.maximum(ids, 0)
    cand = vectors[safe].astype(jnp.float32)                     # [B, k, D]
    sims = jnp.einsum("bd,bkd->bk", queries.astype(jnp.float32), cand,
                      preferred_element_type=jnp.float32)
    sims = jnp.where(ids >= 0, sims, -jnp.inf)
    order = jnp.argsort(-sims, axis=1)
    return jnp.take_along_axis(sims, order, axis=1), jnp.take_along_axis(
        ids, order, axis=1
    )


class HNSWIndex:
    """Flat-graph HNSW index: host C++ build, device beam search.

    Mirrors the reference indexer's contract (has_any_data / add_embeddings /
    search, app/main.py:291-373) with the graph and vectors resident on device.
    """

    # Auto-enable the neighbor-materialized fused-gather layout up to this
    # many bytes of HBM (layout cost: N * M0 * D * itemsize).
    FUSED_LAYOUT_MAX_BYTES = 8 << 30

    def __init__(
        self,
        cfg: Optional[HNSWConfig] = None,
        embed_dim: int = 1024,
        n_pivots: int = 1024,
        vector_dtype: Any = jnp.float32,
        device: Optional[jax.Device] = None,
        layout: str = "auto",   # 'auto' | 'fused' | 'plain'
        fused_dtype: Any = None,  # dtype of the fused layout; jnp.int8 halves
                                  # gather bandwidth (per-row scales + rerank)
    ):
        self.cfg = cfg or HNSWConfig()
        self.embed_dim = embed_dim
        self.n_pivots = n_pivots
        self.vector_dtype = vector_dtype
        self.fused_dtype = fused_dtype or vector_dtype
        self.device = device
        self.layout = layout
        self.metas: List[Dict[str, Any]] = []
        self._vectors_host: Optional[np.ndarray] = None   # [N, D] f32 normalized
        self._graph_host: Optional[np.ndarray] = None     # [N, M0] int32
        self._levels_host: Optional[np.ndarray] = None
        self._vectors: Optional[jax.Array] = None
        self._graph: Optional[jax.Array] = None
        self._pivots: Optional[jax.Array] = None
        self._nbr_vecs: Optional[jax.Array] = None        # [N, M0, D] fused layout
        self._nbr_scales: Optional[jax.Array] = None      # [N, M0] f32 (int8 only)

    def __len__(self) -> int:
        return 0 if self._vectors_host is None else self._vectors_host.shape[0]

    def has_any_data(self) -> bool:
        return len(self) > 0

    def _refresh_device(self) -> None:
        n = len(self)
        rng = np.random.default_rng(self.cfg.seed)
        n_piv = min(self.n_pivots, n)
        pivots = rng.choice(n, size=n_piv, replace=False).astype(np.int32)
        put = (lambda x: jax.device_put(x, self.device)) if self.device else jnp.asarray
        self._vectors = put(jnp.asarray(self._vectors_host, dtype=self.vector_dtype))
        self._graph = put(self._graph_host)
        self._pivots = put(pivots)
        self._nbr_vecs = None
        self._nbr_scales = None
        if self._use_fused():
            # Neighbor-materialized layout computed on device (one-time gather).
            safe_graph = jnp.maximum(self._graph, 0)
            if jnp.dtype(self.fused_dtype) == jnp.int8:
                from sqe_tpu.ops.quantize import quantize_rows

                # Quantize the base vectors once; each row keeps one scale
                # wherever it appears in the neighbor-materialized layout.
                qv, scales = jax.jit(quantize_rows)(
                    self._vectors.astype(jnp.float32)
                )
                self._nbr_vecs = jnp.take(qv, safe_graph, axis=0)
                self._nbr_scales = jnp.take(scales, safe_graph, axis=0)
            else:
                self._nbr_vecs = jnp.take(
                    self._vectors, safe_graph, axis=0
                ).astype(self.fused_dtype)

    def _use_fused(self) -> bool:
        if self.layout == "plain":
            return False
        # Decide from where the vectors actually live; the fused kernel is
        # TPU-only (tests on CPU exercise it via interpret mode directly).
        platform = next(iter(self._vectors.devices())).platform
        if platform != "tpu":
            return False
        if self.layout == "fused":
            return True
        n, m0 = self._graph_host.shape
        bytes_needed = n * m0 * self.embed_dim * jnp.dtype(self.fused_dtype).itemsize
        return bytes_needed <= self.FUSED_LAYOUT_MAX_BYTES

    def build(
        self,
        embeddings: np.ndarray,
        metas: Sequence[Dict[str, Any] | Chunk],
        force_numpy_builder: bool = False,
        builder: str = "auto",
    ) -> None:
        """Build the graph. ``builder``: 'auto' (device when a TPU holds the
        index and the corpus is large enough to amortize the compile, else
        host), 'host' (C++ hierarchical insert), 'device' (TPU blocked-kNN +
        occlusion pruning, device_build.py), or 'numpy' (fallback)."""
        emb = np.asarray(embeddings, dtype=np.float32)
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
        if force_numpy_builder:
            builder = "numpy"
        if builder == "auto":
            dev = self.device or jax.devices()[0]
            builder = (
                "device"
                if dev.platform == "tpu" and emb.shape[0] >= 4096
                else "host"
            )
        if builder == "device":
            from sqe_tpu.index.device_build import build_graph_device

            graph = build_graph_device(emb, M=self.cfg.M, device=self.device)
            levels = np.zeros((emb.shape[0],), np.int32)
        else:
            graph, levels = hnsw_build.build_graph(
                emb,
                M=self.cfg.M,
                ef_construction=self.cfg.ef_construction,
                seed=self.cfg.seed,
                force_numpy=(builder == "numpy"),
            )
        self._vectors_host = emb
        self._graph_host = graph
        self._levels_host = levels
        self.metas = [
            {"doc_id": m.doc_id, "text": m.text} if isinstance(m, Chunk) else dict(m)
            for m in metas
        ]
        self._refresh_device()

    def add(
        self,
        embeddings: np.ndarray,
        metas: Sequence[Dict[str, Any] | Chunk],
    ) -> None:
        """Incremental insert (the /upload_text path)."""
        if np.asarray(embeddings).size == 0:
            return
        if self._vectors_host is None:
            self.build(embeddings, metas)
            return
        emb = np.asarray(embeddings, dtype=np.float32)
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
        n_old = len(self)
        all_vecs = np.concatenate([self._vectors_host, emb], axis=0)
        graph, levels = hnsw_build.insert_batch(
            all_vecs,
            self._graph_host,
            self._levels_host,
            n_old,
            M=self.cfg.M,
            ef_construction=self.cfg.ef_construction,
            seed=self.cfg.seed + n_old,
        )
        self._vectors_host = all_vecs
        self._graph_host = graph
        self._levels_host = levels
        self.metas.extend(
            {"doc_id": m.doc_id, "text": m.text} if isinstance(m, Chunk) else dict(m)
            for m in metas
        )
        self._refresh_device()

    # Visited-bytemap dedup budget: the [B, N+1] map is only *allowed* under
    # this many bytes. It is never auto-picked on TPU: measured 3x SLOWER
    # than the broadcast-compare dedup at 100k/B=1024 (177 ms vs 56 ms,
    # scripts/hnsw_bytemap_bench.py) — XLA's batched scatter lowering
    # serializes the [B, EM] marks, costing more than the O(B*EM*(ef+T))
    # VPU compares it replaces. Kept selectable: the compare path's cost
    # grows with ef and iteration count, the bytemap's doesn't, and a future
    # scatter lowering (or other backend) may flip the balance.
    BYTEMAP_MAX_BYTES = 256 << 20

    def search_ids(
        self,
        query_emb: np.ndarray | jax.Array,
        k: int,
        ef: Optional[int] = None,
        expand: int = 8,
        rerank: Optional[bool] = None,
        visited_impl: str = "auto",
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._vectors is None:
            b = np.asarray(query_emb).shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        n = len(self)
        ef = ef or self.cfg.ef_search
        ef = max(k, min(ef, n))
        expand = max(1, min(expand, ef))
        fused = self._nbr_vecs is not None
        if fused:
            _, m0, d = self._nbr_vecs.shape
            expand, fused = plan_fused_gather(
                np.asarray(query_emb).shape[0], m0, d,
                self._nbr_vecs.dtype.itemsize, expand,
            )
        q = l2_normalize(jnp.asarray(query_emb, dtype=jnp.float32))
        dispatch.program("query_normalize")
        if self.device is not None:
            q = jax.device_put(q, self.device)
        if visited_impl == "auto":
            visited_impl = "compare"
        if (visited_impl == "bytemap"
                and q.shape[0] * (n + 1) > self.BYTEMAP_MAX_BYTES):
            visited_impl = "compare"
        scores, ids = hnsw_search_batch(
            q, self._vectors, self._graph, self._pivots,
            self._nbr_vecs if fused else None,
            self._nbr_scales if fused else None,
            k=min(k, n),
            ef=ef,
            max_iters=ef // expand + 32,
            n_seeds=min(32, ef, n),
            expand=expand,
            fused_gather=fused,
            visited_impl=visited_impl,
        )
        dispatch.program("index_scan")
        if rerank is None:
            rerank = self._nbr_scales is not None
        if rerank:
            scores, ids = _exact_rerank(q, self._vectors, ids)
            dispatch.program("index_rerank")
        out = np.asarray(scores), np.asarray(ids)
        dispatch.sync("index_scan")
        return out

    def search(
        self, query_emb: np.ndarray, k: int = 3
    ) -> List[Tuple[Dict[str, Any], float]]:
        """Reference-contract search: [(source_dict, score)] (app/main.py:347-373)."""
        if np.asarray(query_emb).size == 0 or len(self) == 0:
            return []
        scores, ids = self.search_ids(np.asarray(query_emb), k)
        out: List[Tuple[Dict[str, Any], float]] = []
        for score, idx in zip(scores[0], ids[0]):
            if idx < 0:
                continue
            out.append((self.metas[int(idx)], float(score)))
        return out
