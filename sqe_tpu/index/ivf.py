"""IVF (inverted-file) index: the TPU-native ANN design.

Graph ANN (HNSW) is pointer-chasing — every beam iteration is a data-dependent
scatter of tiny gathers plus a sort, which is exactly what a systolic-array
machine is worst at. The TPU-shaped alternative replaces the reference's
nmslib HNSW (app/main.py:263-281) at large N / small batch:

- **Build**: spherical k-means over the corpus, run entirely on the MXU
  (blocked assign matmul + segment-sum update). Rows are then laid out
  cluster-major and padded to a fixed cluster capacity, so every cluster is
  ONE contiguous HBM block.
- **Search**: stage 1 probes all C centroids with one matmul (top-P clusters
  per query); stage 2 scores the probed clusters with a Pallas kernel whose
  BlockSpec index map is driven by the scalar-prefetched probe ids — Mosaic
  double-buffers the data-dependent cluster DMAs across grid steps, so HBM
  traffic is exactly the probed bytes (the XLA lowering would materialize a
  [B, P, Smax, D] gather to HBM first). Final top-k merges P*Smax masked
  scores per query in XLA.

Recall is tunable via n_probe; the recall gate vs the exact scan lives in
tests/test_ivf.py. Search cost scales with probed bytes (~P/C of the corpus),
not N. Measured verdict (DESIGN.md §8b/§8c): the fused exact scan beats IVF
at EVERY measured operating point (131k/1M/2M, B=1 and B=1024) — probe
depths that restore recall re-scan enough bytes that the MXU would have
finished the exact job, and at 4M the cluster-major copy no longer fits
beside the base. IVF is NOT the engine default; its niche is >4M
vectors/chip where the scan's linear cost finally dominates, and the router
(index/router.py) only selects it past the flat engine's HBM/latency bounds.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.ops.distance import l2_normalize
from sqe_tpu.utils import dispatch


def _to_meta(m: Dict[str, Any] | Chunk) -> Dict[str, Any]:
    return {"doc_id": m.doc_id, "text": m.text} if isinstance(m, Chunk) else dict(m)


# ----------------------------------------------------------------- k-means


@functools.partial(jax.jit, static_argnames=("block_n",))
def _assign_blocked(vecs: jax.Array, centers: jax.Array,
                    block_n: int = 16384) -> jax.Array:
    """argmax cluster per row, computed in [block_n, C] score tiles."""
    n = vecs.shape[0]
    nb = n // block_n

    def body(_, block):
        # Per-block f32 cast supports bf16-stored corpora (the cast transient
        # is one block, not the corpus).
        s = jax.lax.dot_general(
            block.astype(jnp.float32), centers, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return None, jnp.argmax(s, axis=1).astype(jnp.int32)

    _, out = jax.lax.scan(
        body, None, vecs.reshape(nb, block_n, vecs.shape[1])
    )
    return out.reshape(n)


@functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("block_n",))
def _kmeans_step(vecs: jax.Array, centers: jax.Array, key: jax.Array,
                 block_n: int = 16384) -> jax.Array:
    """One spherical k-means iteration; dead clusters reseed from random rows."""
    c = centers.shape[0]
    assign = _assign_blocked(vecs, centers, block_n=block_n)
    counts = jax.ops.segment_sum(
        jnp.ones_like(assign, jnp.float32), assign, num_segments=c
    )
    sums = jax.ops.segment_sum(vecs.astype(jnp.float32), assign,
                               num_segments=c)
    new_centers = l2_normalize(sums / jnp.maximum(counts, 1.0)[:, None])
    reseed = vecs[jax.random.randint(key, (c,), 0, vecs.shape[0])]
    return jnp.where((counts > 0)[:, None], new_centers, reseed)


@functools.partial(jax.jit, static_argnames=("block_n", "rounds"))
def _balanced_assign(vecs: jax.Array, centers: jax.Array,
                     block_n: int = 16384, rounds: int = 8,
                     eta: float = 0.02, cap_factor: float = 2.5) -> jax.Array:
    """Capacity-bounded assignment: argmax(sim - penalty[c]) with the penalty
    growing gently on over-full clusters across ``rounds``. The FIRST round
    whose max cluster size fits ``cap_factor * mean`` wins — the least
    distorted assignment that bounds the padded layout's HBM waste (recall
    degrades with distortion: rows pushed off their best centroid are only
    found by probing deeper). If no round fits, the min-max round wins.
    Penalties oscillate, so taking the last round is NOT monotone (measured
    45x padding blowup with aggressive eta)."""
    n = vecs.shape[0]
    c = centers.shape[0]
    target = n / c
    bound = cap_factor * target

    def one_round(carry, _):
        penalty, chosen, chosen_assign, best_max, best_assign = carry

        def body(_, block):
            s = jax.lax.dot_general(
                block.astype(jnp.float32), centers, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return None, jnp.argmax(s - penalty[None, :], axis=1).astype(jnp.int32)

        _, a = jax.lax.scan(
            body, None, vecs.reshape(n // block_n, block_n, vecs.shape[1])
        )
        a = a.reshape(n)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), a,
                                     num_segments=c)
        maxc = jnp.max(counts)
        take = (~chosen) & (maxc <= bound)
        chosen_assign = jnp.where(take, a, chosen_assign)
        chosen = chosen | take
        better = maxc < best_max
        best_assign = jnp.where(better, a, best_assign)
        best_max = jnp.minimum(maxc, best_max)
        penalty = penalty + eta * jnp.maximum(counts / target - 1.0, 0.0)
        return (penalty, chosen, chosen_assign, best_max, best_assign), None

    init = (jnp.zeros((c,), jnp.float32), jnp.bool_(False),
            jnp.zeros((n,), jnp.int32), jnp.float32(jnp.inf),
            jnp.zeros((n,), jnp.int32))
    (_, chosen, chosen_assign, _, best_assign), _ = jax.lax.scan(
        one_round, init, None, length=rounds
    )
    return jnp.where(chosen, chosen_assign, best_assign)


def kmeans_device(
    vecs_dev: jax.Array,      # [N, D] f32 normalized, on device (N % block == 0 not required)
    n_clusters: int,
    iters: int = 10,
    seed: int = 0,
    block_n: int = 16384,
) -> jax.Array:
    """Spherical k-means on the MXU. Returns centers [C, D] f32 (normalized)."""
    n = vecs_dev.shape[0]
    block_n = min(block_n, n)
    n_trim = (n // block_n) * block_n      # assignment scan needs full blocks
    v = vecs_dev[:n_trim]
    key = jax.random.PRNGKey(seed)
    init_rows = jax.random.choice(key, n_trim, (n_clusters,), replace=False)
    centers = v[init_rows].astype(jnp.float32)
    for i in range(iters):
        key, sub = jax.random.split(key)
        centers = _kmeans_step(v, centers, sub, block_n=block_n)
    return centers


# ------------------------------------------------------------ pallas scoring


_BQ = 8          # queries per grid step (sublane-aligned block)
_CHUNK = 512     # cluster rows scored per DMA (bounds VMEM at 8*512*D*2B)


def round_smax(smax: int) -> int:
    """Cluster capacity rounding: lane-aligned, and chunk-aligned once the
    capacity exceeds one kernel chunk (the Pallas scorer DMAs _CHUNK rows at
    a time)."""
    if smax > _CHUNK:
        return -(-smax // _CHUNK) * _CHUNK
    return -(-smax // 128) * 128


def _ivf_score_kernel(ids_ref, counts_ref, q_ref, hbm_ref, out_ref, buf, sems,
                      *, smax: int):
    """One grid step = _BQ queries x one probe rank j: DMA each query's probed
    cluster from HBM in _CHUNK-row slabs (addresses come from the scalar-
    prefetched probe ids — the gather_dot pattern, ops/gather_dot.py), score
    on the MXU, and mask pad slots with the scalar-prefetched per-cluster
    counts (slots fill contiguously, so validity is one iota compare)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    ch = min(smax, _CHUNK)
    n_chunks = smax // ch

    for c0 in range(n_chunks):
        def dma(q, c0=c0):
            cluster = ids_ref[i * _BQ + q, j]
            return pltpu.make_async_copy(
                hbm_ref.at[cluster, pl.ds(c0 * ch, ch), :],
                buf.at[pl.ds(q * ch, ch), :],
                sems.at[q],
            )

        for q in range(_BQ):
            dma(q).start()
        for q in range(_BQ):
            dma(q).wait()
        pos = c0 * ch + jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)
        for q in range(_BQ):
            block = buf[pl.ds(q * ch, ch), :].astype(jnp.float32)   # [ch, D]
            qv = q_ref[pl.ds(q, 1), :].astype(jnp.float32)          # [1, D]
            sims = jax.lax.dot_general(
                block, qv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(1, ch)
            count = counts_ref[ids_ref[i * _BQ + q, j]]
            sims = jnp.where(pos < count, sims, -jnp.inf)
            out_ref[pl.ds(q, 1), pl.ds(c0 * ch, ch)] = sims


@functools.partial(jax.jit, static_argnames=("interpret",))
def ivf_score(
    clusters: jax.Array,    # [C, Smax, D] cluster-major padded vectors
    counts: jax.Array,      # [C] int32 valid rows per cluster
    probe_ids: jax.Array,   # [B, P] int32
    queries: jax.Array,     # [B, D] f32 normalized
    *,
    interpret: bool = False,
) -> jax.Array:
    """Returns masked scores [B, P*Smax] f32 (pad slots are -inf).
    B must be a multiple of _BQ (ivf_search pads)."""
    c, smax, d = clusters.shape
    b, p = probe_ids.shape
    assert b % _BQ == 0, b
    ch = min(smax, _CHUNK)
    assert smax % ch == 0, (smax, ch)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // _BQ, p),
        in_specs=[
            pl.BlockSpec((_BQ, d), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((_BQ, smax), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_BQ * ch, d), clusters.dtype),
            pltpu.SemaphoreType.DMA((_BQ,)),
        ],
    )
    kernel = functools.partial(_ivf_score_kernel, smax=smax)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p * smax), jnp.float32),
        interpret=interpret,
    )(probe_ids, counts, queries, clusters)


def ivf_score_xla(clusters, member_gids, probe_ids, queries):
    """XLA oracle for the Pallas kernel (also the CPU path)."""
    b, p = probe_ids.shape
    blocks = clusters[probe_ids].astype(jnp.float32)   # [B, P, Smax, D]
    sims = jnp.einsum("bd,bpsd->bps", queries.astype(jnp.float32), blocks,
                      preferred_element_type=jnp.float32)
    gids = member_gids[probe_ids]                      # [B, P, Smax]
    sims = jnp.where(gids >= 0, sims, -jnp.inf)
    return sims.reshape(b, -1)


@functools.partial(
    jax.jit, static_argnames=("n_probe", "k", "use_pallas", "interpret")
)
def ivf_search(
    queries: jax.Array,      # [B, D] normalized f32
    centers: jax.Array,      # [C, D]
    clusters: jax.Array,     # [C, Smax, D]
    member_gids: jax.Array,  # [C, Smax]
    counts: jax.Array,       # [C] int32 valid rows per cluster
    ovf_vecs: Optional[jax.Array] = None,   # [O_cap, D] overflow block
    ovf_gids: Optional[jax.Array] = None,   # [O_cap] int32 (-1 pad)
    ovf_n: Optional[jax.Array] = None,      # scalar int32 valid overflow rows
    *,
    n_probe: int,
    k: int,
    use_pallas: bool,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage IVF search. Returns (scores [B, k], global ids [B, k])."""
    b = queries.shape[0]
    qf = queries.astype(jnp.float32)
    ps = jax.lax.dot_general(
        qf, centers, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [B, C]
    _, probe_ids = jax.lax.top_k(ps, n_probe)
    probe_ids = probe_ids.astype(jnp.int32)
    if use_pallas:
        if b == 1 and n_probe % _BQ == 0:
            # Latency path: spread the single query's probes across the
            # kernel's 8 sublane slots instead of padding with dead queries —
            # 8x less wasted DMA, sequential probe depth P/8.
            q8 = jnp.broadcast_to(qf, (_BQ, qf.shape[1]))
            p8 = probe_ids.reshape(_BQ, n_probe // _BQ)
            scores = ivf_score(clusters, counts, p8, q8,
                               interpret=interpret).reshape(1, -1)
        else:
            if b % _BQ:
                qf_pad = jnp.concatenate(
                    [qf, jnp.zeros((_BQ - b % _BQ, qf.shape[1]), jnp.float32)]
                )
                probe_pad = jnp.concatenate(
                    [probe_ids,
                     jnp.zeros((_BQ - b % _BQ, n_probe), jnp.int32)]
                )
            else:
                qf_pad, probe_pad = qf, probe_ids
            scores = ivf_score(clusters, counts, probe_pad, qf_pad,
                               interpret=interpret)[:b]
    else:
        scores = ivf_score_xla(clusters, member_gids, probe_ids, qf)
    top_s, sel = jax.lax.top_k(scores, k)
    flat_gids = member_gids[probe_ids].reshape(qf.shape[0], -1)
    top_i = jnp.take_along_axis(flat_gids, sel, axis=1)
    top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
    top_s, top_i = top_s[:b], top_i[:b]
    if ovf_vecs is not None and ovf_vecs.shape[0]:
        # Guaranteed-visibility overflow: rows that didn't fit their
        # cluster's capacity live in a small flat block that is ALWAYS
        # scanned exactly — capping cluster memory costs no recall.
        from sqe_tpu.index.flat import flat_topk
        from sqe_tpu.ops.fused_scan import fused_scan_topk, pick_bn

        o_cap = ovf_vecs.shape[0]
        if (use_pallas and ovf_vecs.dtype == jnp.bfloat16
                and pick_bn(o_cap) and o_cap // 128 >= min(k, o_cap)):
            # Large overflow tails (spill assignment) ride the fused scan
            # kernel instead of materializing a [B, O_cap] score tile.
            ovf_s, ovf_local = fused_scan_topk(
                queries.astype(jnp.float32), ovf_vecs, ovf_n,
                k=min(k, o_cap), bn=pick_bn(o_cap),
            )
        else:
            ovf_s, ovf_local = flat_topk(
                queries.astype(jnp.float32), ovf_vecs, ovf_n,
                k=min(k, o_cap), block_n=o_cap, exact=False,
            )
        ovf_i = jnp.where(
            ovf_local >= 0, jnp.take(ovf_gids, jnp.maximum(ovf_local, 0)), -1
        )
        ovf_s = jnp.where(ovf_i >= 0, ovf_s, -jnp.inf)
        all_s = jnp.concatenate([top_s, ovf_s], axis=1)
        all_i = jnp.concatenate([top_i, ovf_i], axis=1)
        top_s, sel2 = jax.lax.top_k(all_s, k)
        top_i = jnp.take_along_axis(all_i, sel2, axis=1)
        top_i = jnp.where(jnp.isfinite(top_s), top_i, -1)
    return top_s, top_i


# ------------------------------------------------------------------ the index


class IVFIndex:
    """Cluster-major IVF index with MXU k-means build.

    Same contract as FlatIndex/HNSWIndex (has_any_data / add / search /
    search_ids / metas — reference app/main.py:291-373). ``n_probe`` trades
    recall for probed bytes; defaults target recall@10 >= 0.95 on
    embedding-like (clustered) data.
    """

    def __init__(
        self,
        embed_dim: int = 1024,
        n_clusters: int = 0,         # 0 = auto: ~4*sqrt(N)
        n_probe: int = 0,            # 0 = auto: max(8, C//16)
        kmeans_iters: int = 10,
        device: Optional[jax.Device] = None,
        vector_dtype: Any = jnp.float32,
        seed: int = 0,
        assign_mode: str = "balanced",
    ):
        """``assign_mode``: "balanced" bounds cluster sizes by distorting
        assignments (penalized re-assign rounds) — minimal overflow, but rows
        pushed off their best centroid are only found by probing deeper.
        "spill" keeps every row in its TRUE best cluster and sends everything
        past the capacity cap to the exact-scanned overflow block — zero
        assignment distortion at the cost of a larger overflow tail (scanned
        by the fused kernel on TPU)."""
        assert assign_mode in ("balanced", "spill")
        self.embed_dim = embed_dim
        self.n_clusters = n_clusters
        self.n_probe = n_probe
        self.kmeans_iters = kmeans_iters
        self.device = device
        self.vector_dtype = vector_dtype
        self.seed = seed
        self.assign_mode = assign_mode
        self.metas: List[Dict[str, Any]] = []
        self._centers: Optional[jax.Array] = None     # [C, D] f32
        self._clusters: Optional[jax.Array] = None    # [C, Smax, D]
        self._gids: Optional[jax.Array] = None        # [C, Smax] int32
        self._counts: Optional[np.ndarray] = None     # [C] host
        self._counts_dev: Optional[jax.Array] = None  # [C] int32 device
        self._ovf_vecs: Optional[jax.Array] = None    # [O_cap, D] overflow
        self._ovf_gids: Optional[jax.Array] = None    # [O_cap] int32
        self._ovf_n = 0
        self._vectors_host: Optional[np.ndarray] = None
        self._smax = 0
        self._n = 0

    def __len__(self) -> int:
        return self._n

    def has_any_data(self) -> bool:
        return self._n > 0

    def valid_vectors(self) -> Optional[np.ndarray]:
        return self._vectors_host if self._n else None

    def _put(self, x, dtype=None):
        arr = jnp.asarray(x, dtype=dtype) if dtype is not None else jnp.asarray(x)
        return jax.device_put(arr, self.device) if self.device else arr

    def _use_pallas(self) -> bool:
        dev = self.device or jax.devices()[0]
        return dev.platform == "tpu"

    def build(
        self,
        embeddings: np.ndarray,
        metas: Sequence[Dict[str, Any] | Chunk],
        centers: Optional[np.ndarray] = None,
    ) -> None:
        emb = np.asarray(embeddings, dtype=np.float32)
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
        n = emb.shape[0]
        vecs_dev = self._put(emb)
        if centers is None:
            c = min(self.n_clusters or max(8, int(4 * np.sqrt(n))), n)
            centers_dev = kmeans_device(
                vecs_dev, c, iters=self.kmeans_iters, seed=self.seed
            )
        else:
            centers_dev = self._put(centers, jnp.float32)
        assign = self._assign_host(vecs_dev, centers_dev)
        plan = self._plan_layout(assign, int(centers_dev.shape[0]))
        cap, kept_rows, kept_pos, kept_counts, ovf_rows, o_cap = plan
        c = int(centers_dev.shape[0])
        d = emb.shape[1]

        clusters = np.zeros((c * cap, d), np.float32)
        clusters[kept_pos] = emb[kept_rows]
        gids = np.full((c * cap,), -1, np.int32)
        gids[kept_pos] = kept_rows
        ovf_vecs = np.zeros((o_cap, d), np.float32)
        ovf_gids = np.full((o_cap,), -1, np.int32)
        ovf_vecs[: len(ovf_rows)] = emb[ovf_rows]
        ovf_gids[: len(ovf_rows)] = ovf_rows

        self._centers = centers_dev
        self._clusters = self._put(clusters.reshape(c, cap, d),
                                   self.vector_dtype)
        self._gids = self._put(gids.reshape(c, cap))
        self._counts = kept_counts.astype(np.int64)
        self._counts_dev = self._put(kept_counts.astype(np.int32))
        self._ovf_vecs = self._put(ovf_vecs, self.vector_dtype)
        self._ovf_gids = self._put(ovf_gids)
        self._ovf_n = len(ovf_rows)
        self._vectors_host = emb
        self._smax = cap
        self._n = n
        self.metas = [_to_meta(m) for m in metas]

    def _assign_host(self, vecs_dev, centers_dev) -> np.ndarray:
        n = vecs_dev.shape[0]
        block = min(16384, n)
        n_trim = (n // block) * block
        if self.assign_mode == "spill":
            assign = np.asarray(
                _assign_blocked(vecs_dev[:n_trim], centers_dev, block_n=block)
            )
        else:
            assign = np.asarray(
                _balanced_assign(vecs_dev[:n_trim], centers_dev,
                                 block_n=block)
            )
        if n_trim < n:
            tail = np.asarray(jnp.argmax(jax.lax.dot_general(
                vecs_dev[n_trim:].astype(jnp.float32), centers_dev,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32), axis=1)).astype(np.int32)
            assign = np.concatenate([assign, tail])
        return assign

    def _plan_layout(self, assign: np.ndarray, c: int,
                     max_mem_factor: float = 3.0):
        """Host-side layout plan: per-cluster capacity chosen to minimize
        expected scanned bytes; rows past a cluster's capacity go to the
        guaranteed-visibility overflow block (always exact-scanned at
        search), so capping memory costs no recall.

        Cost model: a query scans ``n_probe`` full padded clusters plus the
        whole overflow block, so cost(cap) = n_probe * cap
        + 2 * overflow_rows(cap)   (x2: the overflow block keeps
        power-of-two headroom). A fixed cap_factor x mean cap measured a 21%
        always-scanned overflow tail on clustered data at 2M (DESIGN.md
        §8c) — the histogram-aware cap eliminates exactly that failure
        mode. Candidates are chunk-aligned caps spanning mean..max count,
        bounded by ``max_mem_factor`` (cluster memory <= ~cap/mean x
        vectors — the guard against the 45x padding blowup measured with
        unbounded caps in round 2)."""
        n = len(assign)
        counts = np.bincount(assign, minlength=c)
        mean = max(1.0, n / c)
        n_probe = self.n_probe or max(8, c // 16)
        lo = round_smax(max(1, int(np.ceil(mean))))
        hi = round_smax(int(counts.max()))
        mem_bound = round_smax(max(1, int(mean * max_mem_factor)))
        candidates = sorted({
            cp for cp in (
                {round_smax(int(mean * f))
                 for f in (1.0, 1.25, 1.5, 2.0, 2.5, 3.0)} | {lo, hi}
            )
            if lo <= cp <= max(mem_bound, lo)
        })
        sorted_counts = np.sort(counts)

        def overflow_rows(cap):
            above = sorted_counts[sorted_counts > cap]
            return int(above.sum() - above.size * cap)

        cap = min(
            candidates,
            key=lambda cp: n_probe * cp + 2 * overflow_rows(cp),
        )
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        starts = np.zeros(c, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        slots = np.arange(n, dtype=np.int64) - starts[sorted_assign]
        keep = slots < cap
        kept_rows = order[keep]
        kept_pos = sorted_assign[keep] * cap + slots[keep]
        ovf_rows = order[~keep]
        kept_counts = np.minimum(counts, cap)
        # Overflow capacity: power of two with headroom (flat_topk block).
        o_cap = 128
        while o_cap < max(1, len(ovf_rows)) * 2:
            o_cap *= 2
        return cap, kept_rows, kept_pos, kept_counts, ovf_rows, o_cap

    def build_from_device(
        self,
        vecs_dev: jax.Array,               # [N, D] f32, already on device, normalized
        metas: Optional[Sequence[Dict[str, Any] | Chunk]] = None,
    ) -> None:
        """Build with the vectors staying on device (k-means, assignment, and
        the scatter into the layout all run there; only the [N] assignment
        and the layout index plan round-trip the host — ~8 bytes/row, not the
        vectors). For benchmark/large-N cases where host<->device bandwidth
        dominates; the serving path uses ``build`` (host mirror kept for
        checkpointing)."""
        n, d = vecs_dev.shape
        c = min(self.n_clusters or max(8, int(4 * np.sqrt(n))), n)
        centers = kmeans_device(vecs_dev, c, iters=self.kmeans_iters,
                                seed=self.seed)
        assign = self._assign_host(vecs_dev, centers)
        cap, kept_rows, kept_pos, kept_counts, ovf_rows, o_cap = \
            self._plan_layout(assign, c)

        @functools.partial(jax.jit, static_argnames=("c_", "cap_", "o_cap_"))
        def scatter(vecs, kept_rows_d, kept_pos_d, ovf_rows_d, c_, cap_, o_cap_):
            vb = vecs.astype(self.vector_dtype)
            clusters = jnp.zeros((c_ * cap_, vecs.shape[1]), self.vector_dtype)
            clusters = clusters.at[kept_pos_d].set(vb[kept_rows_d])
            gids = jnp.full((c_ * cap_,), -1, jnp.int32)
            gids = gids.at[kept_pos_d].set(kept_rows_d.astype(jnp.int32))
            o = ovf_rows_d.shape[0]
            ovf_vecs = jnp.zeros((o_cap_, vecs.shape[1]), self.vector_dtype)
            ovf_gids = jnp.full((o_cap_,), -1, jnp.int32)
            if o:
                ovf_vecs = ovf_vecs.at[jnp.arange(o)].set(vb[ovf_rows_d])
                ovf_gids = ovf_gids.at[jnp.arange(o)].set(
                    ovf_rows_d.astype(jnp.int32))
            return (clusters.reshape(c_, cap_, vecs.shape[1]),
                    gids.reshape(c_, cap_), ovf_vecs, ovf_gids)

        self._clusters, self._gids, self._ovf_vecs, self._ovf_gids = scatter(
            vecs_dev, self._put(kept_rows.astype(np.int32)),
            self._put(kept_pos.astype(np.int32)),
            self._put(ovf_rows.astype(np.int32)), c, cap, o_cap,
        )
        self._centers = centers
        self._counts = kept_counts.astype(np.int64)
        self._counts_dev = self._put(kept_counts.astype(np.int32))
        self._ovf_n = len(ovf_rows)
        self._vectors_host = None
        self._smax = cap
        self._n = n
        self.metas = [_to_meta(m) for m in metas] if metas else [
            {"doc_id": str(i), "text": ""} for i in range(n)
        ]

    def add(self, embeddings: np.ndarray, metas) -> None:
        """Incremental insert: assign to the nearest centroid and append into
        that cluster's free slots; a full cluster sends the row to the
        overflow block (centroids stay fixed — standard IVF add). Falls back
        to a rebuild (fresh k-means) only when the overflow block itself
        fills (amortized by its power-of-two headroom)."""
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.size == 0:
            return
        new_metas = [_to_meta(m) for m in metas]
        if self._n == 0:
            self.build(emb, new_metas)
            return
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
        assign = np.asarray(jnp.argmax(jax.lax.dot_general(
            self._put(emb), self._centers, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32), axis=1)).astype(np.int32)
        fill = self._counts.copy()
        cl_list, slot_list, cl_rows = [], [], []
        ovf_rows = []
        for i, cl in enumerate(assign):
            if fill[cl] < self._smax:
                cl_list.append(cl)
                slot_list.append(fill[cl])
                cl_rows.append(i)
                fill[cl] += 1
            else:
                ovf_rows.append(i)
        o_cap = self._ovf_vecs.shape[0]
        if self._ovf_n + len(ovf_rows) > o_cap:
            all_vecs = np.concatenate([self._vectors_host, emb])
            self.build(all_vecs, self.metas + new_metas)
            return
        gid0 = self._n
        if cl_rows:
            self._clusters = self._clusters.at[
                self._put(np.asarray(cl_list, np.int32)),
                self._put(np.asarray(slot_list, np.int32)),
            ].set(self._put(emb[cl_rows], self.vector_dtype))
            self._gids = self._gids.at[
                self._put(np.asarray(cl_list, np.int32)),
                self._put(np.asarray(slot_list, np.int32)),
            ].set(self._put(gid0 + np.asarray(cl_rows, np.int32)))
        if ovf_rows:
            pos = self._put(self._ovf_n + np.arange(len(ovf_rows), dtype=np.int32))
            self._ovf_vecs = self._ovf_vecs.at[pos].set(
                self._put(emb[ovf_rows], self.vector_dtype))
            self._ovf_gids = self._ovf_gids.at[pos].set(
                self._put(gid0 + np.asarray(ovf_rows, np.int32)))
            self._ovf_n += len(ovf_rows)
        self._counts = fill
        self._counts_dev = self._put(fill.astype(np.int32))
        self._vectors_host = np.concatenate([self._vectors_host, emb])
        self._n += len(assign)
        self.metas.extend(new_metas)

    def search_ids(
        self, query_emb, k: int, n_probe: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._n == 0:
            b = np.asarray(query_emb).shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        c = self._centers.shape[0]
        n_probe = n_probe or self.n_probe or max(8, c // 16)
        n_probe = min(n_probe, c)
        q = l2_normalize(jnp.asarray(query_emb, dtype=jnp.float32))
        dispatch.program("query_normalize")
        if self.device is not None:
            q = jax.device_put(q, self.device)
        scores, ids = ivf_search(
            q, self._centers, self._clusters, self._gids, self._counts_dev,
            self._ovf_vecs, self._ovf_gids, jnp.int32(self._ovf_n),
            n_probe=n_probe, k=min(k, self._n),
            use_pallas=self._use_pallas(),
        )
        dispatch.program("index_scan")
        out = np.asarray(scores), np.asarray(ids)
        dispatch.sync("index_scan")
        return out

    def search(self, query_emb: np.ndarray, k: int = 3):
        if np.asarray(query_emb).size == 0 or self._n == 0:
            return []
        scores, ids = self.search_ids(np.asarray(query_emb), k)
        return [
            (self.metas[int(i)], float(s))
            for s, i in zip(scores[0], ids[0])
            if i >= 0
        ]
