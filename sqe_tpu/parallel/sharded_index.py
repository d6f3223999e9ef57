"""Index sharding over the device mesh.

This is the first-class "distribution" component the reference outsourced to a
single-node OpenSearch (SURVEY.md §2, index-sharding row). Vectors (and, for
HNSW, per-shard graphs + pivot samples) are partitioned over the mesh's
``shard`` axis with NamedSharding. A query batch is replicated; each device
searches its shard locally (the same single-device kernels — ``flat_topk`` /
``hnsw_search_batch`` — run inside ``jax.shard_map``), local slot ids map to
global ids through a device-resident ``gid`` table, and the per-shard top-k
are merged with an ``all_gather`` over ICI followed by one ``lax.top_k``
(k entries per shard — merge traffic is tiny; SURVEY.md §7 risk note).

Incremental ingestion (the /upload_text path, embedding_gen.py:196-257) is
O(new rows), never a corpus rebuild:

- ``ShardedFlatIndex.add`` scatters new rows into preallocated per-shard
  capacity with ONE donated device program (new rows spread across shards to
  balance load); the ``gid`` table keeps global ids correct under any
  placement.
- ``ShardedHNSWIndex.add`` routes a batch to the least-full shard, extends
  that shard's graph host-side with the C++ ``hnsw_insert_batch``, and
  uploads only the new vectors plus the graph rows the insert rewired
  (host->device traffic is O(new + rewired), not O(corpus)); the global
  sharded arrays are reassembled zero-copy from the per-shard device blocks
  with ``jax.make_array_from_single_device_arrays``.

Sharded search returns the same (score, id) sets as single-device search over
the union of the shards (gated in tests/test_sharded.py).
"""

from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sqe_tpu.config import HNSWConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.index import hnsw_build
from sqe_tpu.index.flat import flat_topk, int8_rerank_topk, int8_scan_rerank_topk
from sqe_tpu.ops.fused_scan import fused_scan_topk, pick_bn
from sqe_tpu.index.hnsw import hnsw_search_batch
from sqe_tpu.ops.distance import l2_normalize
from sqe_tpu.utils import dispatch


def _to_meta(m: Dict[str, Any] | Chunk) -> Dict[str, Any]:
    return {"doc_id": m.doc_id, "text": m.text} if isinstance(m, Chunk) else dict(m)


def _pad_to(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    if x.shape[0] >= n:
        return x[:n]
    pad = np.full((n - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


def _pow2_at_least(n: int, floor: int = 8) -> int:
    c = floor
    while c < n:
        c *= 2
    return c


def _normalize(emb: np.ndarray) -> np.ndarray:
    emb = np.asarray(emb, dtype=np.float32)
    return emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)


def _quantize2_np(emb: np.ndarray):
    """Host mirror of ops/fused_scan.quantize_rows applied twice: symmetric
    per-row int8 primary plus an int8 residual plane over the reconstruction
    error (x ~= p*ps + r*rs — the int8_rerank storage, DESIGN.md §8d).
    Same arithmetic as the device version (round-half-even), so sharded
    int8 storage ranks identically to FlatIndex int8 storage."""
    s = np.maximum(np.abs(emb).max(axis=1, keepdims=True) / 127.0, 1e-12)
    p = np.clip(np.rint(emb / s), -127, 127).astype(np.int8)
    err = emb - p.astype(np.float32) * s
    rs = np.maximum(np.abs(err).max(axis=1, keepdims=True) / 127.0, 1e-12)
    r = np.clip(np.rint(err / rs), -127, 127).astype(np.int8)
    return p, s.astype(np.float32), r, rs.astype(np.float32)


class _HostRows:
    """Append-only host mirror of the global vector set (checkpoint source).
    Amortized-O(new) appends via capacity doubling."""

    def __init__(self, dim: int):
        self.dim = dim
        self._buf = np.zeros((0, dim), np.float32)
        self.n = 0

    def append(self, rows: np.ndarray) -> None:
        need = self.n + rows.shape[0]
        if need > self._buf.shape[0]:
            cap = max(64, self._buf.shape[0])
            while cap < need:
                cap *= 2
            buf = np.zeros((cap, self.dim), np.float32)
            buf[: self.n] = self._buf[: self.n]
            self._buf = buf
        self._buf[self.n : need] = rows
        self.n = need

    def view(self) -> np.ndarray:
        return self._buf[: self.n]


class ShardedFlatIndex:
    """Exact cosine top-k sharded over a 1-D mesh axis.

    Layout: per-shard preallocated slot arrays ``vectors [ns*S, D]`` and a
    global-id table ``gids [ns*S]`` (-1 = empty slot), both sharded on the
    mesh axis. Slots fill contiguously per shard, so per-shard validity is a
    single count and the blocked scan's contiguous-valid masking applies.
    """

    def __init__(
        self,
        mesh: Mesh,
        embed_dim: int = 1024,
        axis: str = "shard",
        block_n: int = 131072,
        approx_topk: bool = False,
        vector_dtype: Any = jnp.float32,
        scan_impl: str = "auto",
        storage: str = "dense",
        rerank_depth: int = 32,
    ):
        """``vector_dtype=jnp.bfloat16`` + ``scan_impl="auto"`` runs each
        shard's scan through the fused Pallas kernel on TPU (DESIGN.md §2b);
        the all_gather merge is unchanged. CPU meshes always use the blocked
        scan (bit-equivalence gate, tests/test_sharded.py).

        ``storage="int8_rerank"`` composes the mesh with the int8 +
        exact-residual-rerank storage (DESIGN.md §8d): each shard holds an
        int8 primary plane plus an int8 residual plane (2 bytes/dim — bf16
        memory parity, bf16-class recall), searched per shard with the fused
        int8 scan -> top-``rerank_depth`` -> residual rerank, merged across
        shards exactly like dense storage. This is the beyond-HBM
        composition: ~8M rows/chip/plane at 1024-d times the mesh width.
        ``rerank_depth`` defaults to 32 from the 2M R-sweep
        (scripts/rerank_ab_results.json): recall is flat across R=32..128
        while batched cost grows ~18% per R-doubling."""
        assert scan_impl in ("auto", "blocked")
        assert storage in ("dense", "int8_rerank")
        self.mesh = mesh
        self.axis = axis
        self.embed_dim = embed_dim
        self.block_n = block_n
        self.approx_topk = approx_topk
        self.vector_dtype = vector_dtype
        self.scan_impl = scan_impl
        self.storage = storage
        self.rerank_depth = rerank_depth
        self.n_shards = mesh.shape[axis]
        self.metas: List[Dict[str, Any]] = []
        self._vectors: Optional[jax.Array] = None  # [ns*S, D] sharded
        # int8_rerank planes (None for dense storage): per-row scales for
        # the primary plane, plus the residual plane and its scales.
        self._scales: Optional[jax.Array] = None    # [ns*S, 1] f32 sharded
        self._residual: Optional[jax.Array] = None  # [ns*S, D] int8 sharded
        self._rscales: Optional[jax.Array] = None   # [ns*S, 1] f32 sharded
        self._gids: Optional[jax.Array] = None     # [ns*S] int32 sharded
        self._counts_dev: Optional[jax.Array] = None  # [ns] int32 sharded
        self._counts = np.zeros(self.n_shards, np.int64)
        self._cap = 0                              # S: slots per shard
        self._n = 0                                # real rows (global)
        self._host = _HostRows(embed_dim)
        self._search_fn = None
        self._insert_fn: Dict[int, Any] = {}
        # add() donates the live buffers; guard capture+dispatch (same
        # pattern as index/flat.py).
        self.lock = threading.RLock()

    def __len__(self) -> int:
        return self._n

    def has_any_data(self) -> bool:
        return self._n > 0

    # ------------------------------------------------------------------ build

    def build(self, embeddings: np.ndarray, metas: Sequence[Dict[str, Any] | Chunk]):
        """Bulk build: contiguous shard-major placement (global row g lands in
        shard g // S, slot g % S), capacity rounded up to a power of two for
        insert headroom and block divisibility."""
        emb = _normalize(embeddings)
        n = emb.shape[0]
        ns = self.n_shards
        cap = _pow2_at_least(-(-n // ns))
        padded = _pad_to(emb, ns * cap)
        gids = np.full(ns * cap, -1, np.int32)
        counts = np.zeros(ns, np.int64)
        for i in range(ns):
            lo = min(i * cap, n)
            hi = min((i + 1) * cap, n)
            counts[i] = hi - lo
            gids[i * cap : i * cap + (hi - lo)] = np.arange(lo, hi, dtype=np.int32)
        with self.lock:
            vsh = NamedSharding(self.mesh, P(self.axis, None))
            ssh = NamedSharding(self.mesh, P(self.axis))
            if self.storage == "int8_rerank":
                # Quantize REAL rows only, then pad: a zero pad row would
                # otherwise get a garbage scale from the epsilon floor.
                p, ps, r, rs = _quantize2_np(emb)
                self._vectors = jax.device_put(
                    jnp.asarray(_pad_to(p, ns * cap)), vsh)
                self._scales = jax.device_put(
                    jnp.asarray(_pad_to(ps, ns * cap)), vsh)
                self._residual = jax.device_put(
                    jnp.asarray(_pad_to(r, ns * cap)), vsh)
                self._rscales = jax.device_put(
                    jnp.asarray(_pad_to(rs, ns * cap)), vsh)
            else:
                self._vectors = jax.device_put(
                    jnp.asarray(padded, dtype=self.vector_dtype), vsh
                )
            self._gids = jax.device_put(jnp.asarray(gids), ssh)
            self._counts_dev = jax.device_put(
                jnp.asarray(counts, dtype=jnp.int32), ssh
            )
            self._counts = counts
            self._cap = cap
            self._n = n
            self._host = _HostRows(self.embed_dim)
            self._host.append(emb)
            self.metas = [_to_meta(m) for m in metas]
            self._search_fn = None
            self._insert_fn = {}

    # -------------------------------------------------------------------- add

    def _make_insert(self, b: int):
        cap = self._cap
        axis = self.axis

        def local(vecs, gids, counts, upd, upd_gids, n_upd):
            # local views: vecs [cap, D], gids [cap], counts [1], upd [b, D],
            # upd_gids [b], n_upd [1]
            cnt = counts[0]
            k_new = n_upd[0]
            rows = cnt + jax.lax.iota(jnp.int32, b)
            # rows beyond this shard's quota scatter out of range -> dropped
            rows = jnp.where(jax.lax.iota(jnp.int32, b) < k_new, rows, cap)
            vecs = vecs.at[rows].set(upd, mode="drop")
            gids = gids.at[rows].set(upd_gids, mode="drop")
            return vecs, gids, counts + k_new

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(axis, None), P(axis), P(axis),
                      P(axis, None), P(axis), P(axis)),
            out_specs=(P(axis, None), P(axis), P(axis)),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0, 1, 2))

    def _make_insert_q(self, b: int):
        """int8_rerank-storage insert: the same slot scatter applied to all
        four quantized planes (primary/scales/residual/rscales) in one
        donated device program."""
        cap = self._cap
        axis = self.axis

        def local(p, ps, r_, rs, gids, counts,
                  up, ups, ur, urs, upd_gids, n_upd):
            cnt = counts[0]
            k_new = n_upd[0]
            rows = cnt + jax.lax.iota(jnp.int32, b)
            rows = jnp.where(jax.lax.iota(jnp.int32, b) < k_new, rows, cap)
            p = p.at[rows].set(up, mode="drop")
            ps = ps.at[rows].set(ups, mode="drop")
            r_ = r_.at[rows].set(ur, mode="drop")
            rs = rs.at[rows].set(urs, mode="drop")
            gids = gids.at[rows].set(upd_gids, mode="drop")
            return p, ps, r_, rs, gids, counts + k_new

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None),
                      P(axis, None), P(axis), P(axis),
                      P(axis, None), P(axis, None), P(axis, None),
                      P(axis, None), P(axis), P(axis)),
            out_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P(axis), P(axis)),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0, 1, 2, 3, 4, 5))

    def add(self, embeddings: np.ndarray, metas: Sequence[Dict[str, Any] | Chunk]):
        """O(new rows) incremental insert: new rows are spread across shards
        (fullest-last) and scattered into preallocated slots with one donated
        device program. Falls back to a full rebuild only when a shard's
        capacity would overflow (amortized by power-of-two growth)."""
        emb = _normalize(embeddings)
        if emb.size == 0:
            return
        new_metas = [_to_meta(m) for m in metas]
        if self._n == 0:
            self.build(emb, new_metas)
            return
        b_total = emb.shape[0]
        with self.lock:
            free = self._cap - self._counts
            if b_total > free.sum():
                # Grow: rebuild at the next power-of-two capacity.
                all_vecs = np.concatenate([self._host.view(), emb])
                self.build(all_vecs, self.metas + new_metas)
                return
            # Water-fill: assign rows to shards in ascending-count order.
            order = np.argsort(self._counts, kind="stable")
            quota = np.zeros(self.n_shards, np.int64)
            remaining = b_total
            for i in order:
                take = min(remaining, free[i])
                quota[i] = take
                remaining -= take
                if remaining == 0:
                    break
            b_max = int(quota.max())
            b_pad = _pow2_at_least(b_max, floor=1)

            upd = np.zeros((self.n_shards, b_pad, self.embed_dim), np.float32)
            upd_g = np.full((self.n_shards, b_pad), -1, np.int32)
            gid0 = self._n
            off = 0
            for i in order:
                q = int(quota[i])
                if q == 0:
                    continue
                upd[i, :q] = emb[off : off + q]
                upd_g[i, :q] = np.arange(gid0 + off, gid0 + off + q, dtype=np.int32)
                off += q

            vsh = NamedSharding(self.mesh, P(self.axis, None))
            ssh = NamedSharding(self.mesh, P(self.axis))
            fn = self._insert_fn.get(b_pad)
            if fn is None:
                fn = (self._make_insert_q(b_pad)
                      if self.storage == "int8_rerank"
                      else self._make_insert(b_pad))
                self._insert_fn[b_pad] = fn
            upd_flat = upd.reshape(-1, self.embed_dim)
            if self.storage == "int8_rerank":
                # Quantization is per-row, so quantizing the padded update
                # block is placement-independent; pad rows are zero with a
                # floor scale and land beyond the shard quota (dropped).
                up, ups, ur, urs = _quantize2_np(upd_flat)
                (self._vectors, self._scales, self._residual, self._rscales,
                 self._gids, self._counts_dev) = fn(
                    self._vectors, self._scales, self._residual,
                    self._rscales, self._gids, self._counts_dev,
                    jax.device_put(jnp.asarray(up), vsh),
                    jax.device_put(jnp.asarray(ups), vsh),
                    jax.device_put(jnp.asarray(ur), vsh),
                    jax.device_put(jnp.asarray(urs), vsh),
                    jax.device_put(jnp.asarray(upd_g.reshape(-1)), ssh),
                    jax.device_put(jnp.asarray(quota, dtype=jnp.int32), ssh),
                )
            else:
                self._vectors, self._gids, self._counts_dev = fn(
                    self._vectors, self._gids, self._counts_dev,
                    jax.device_put(jnp.asarray(upd_flat,
                               dtype=self.vector_dtype), vsh),
                    jax.device_put(jnp.asarray(upd_g.reshape(-1)), ssh),
                    jax.device_put(jnp.asarray(quota, dtype=jnp.int32), ssh),
                )
            self._counts = self._counts + quota
            self._n += b_total
            self._host.append(emb)
            self.metas.extend(new_metas)

    def valid_vectors(self) -> Optional[np.ndarray]:
        return self._host.view() if self._n else None

    # ------------------------------------------------------------------ search

    def _make_search(self, k: int):
        cap = self._cap
        axis = self.axis
        block = min(self.block_n, cap)

        on_tpu = jax.default_backend() == "tpu"
        use_fused = (
            self.scan_impl == "auto"
            and jnp.dtype(self.vector_dtype) == jnp.bfloat16
            and self.storage == "dense"
            and on_tpu
            and pick_bn(cap) and cap // 128 >= 16 * k
        )
        # int8_rerank: fused int8 scan selects the per-shard candidate pool;
        # the rerank stage then restores exact ordering. Routed through the
        # v2 column-max scan per shard (ops/fused_scan2.py) — the measured
        # single-chip serving default (5.9x v1 at 2M rows; the mesh exists
        # to scale BEYOND single-chip N, so every shard sits in v2's win
        # regime) — with the same rerank-restores-recall argument: v2's
        # residue-class selection margin is N-independent (C=2048 columns,
        # r_depth=32 << C), so no v1-style per-shard depth clamp is needed.
        use_fused_int8 = (
            self.storage == "int8_rerank"
            and self.scan_impl == "auto"
            and on_tpu
            and pick_bn(cap) and cap // 128 >= 16 * k
        )
        r_depth = max(k, min(self.rerank_depth, cap))

        def _merge(scores, ids, gids):
            g = jnp.where(ids >= 0, jnp.take(gids, jnp.maximum(ids, 0)), -1)
            scores = jnp.where(g >= 0, scores, -jnp.inf)
            all_s = jax.lax.all_gather(scores, axis, axis=1, tiled=True)
            all_i = jax.lax.all_gather(g, axis, axis=1, tiled=True)
            ms, sel = jax.lax.top_k(all_s, k)
            mi = jnp.take_along_axis(all_i, sel, axis=1)
            return ms, mi

        if self.storage == "int8_rerank":

            def local_q(q, p, ps, r_, rs, gids, counts):
                valid_local = counts[0]
                if use_fused_int8:
                    # One fused program per shard: v2 int8 scan ->
                    # top-r_depth -> exact residual rerank (DESIGN.md §8d).
                    scores, ids = int8_scan_rerank_topk(
                        q, p, ps, r_, rs, valid_local,
                        k=k, r=r_depth, bn=pick_bn(cap), scan2=True,
                    )
                else:
                    # XLA fallback (CPU meshes / tiny shards): coarse scan
                    # over the dequantized primary plane, then the same
                    # residual rerank in XLA — identical arithmetic to the
                    # kernel path.
                    coarse = p.astype(jnp.float32) * ps
                    _, ci = flat_topk(q, coarse, valid_local, k=r_depth,
                                      block_n=block, exact=False,
                                      approx_topk=self.approx_topk)
                    scores, ids = int8_rerank_topk(
                        q, ci, p, ps, r_, rs, k=k, use_kernel=False,
                    )
                return _merge(scores, ids, gids)

            fn = jax.shard_map(
                local_q,
                mesh=self.mesh,
                in_specs=(P(), P(self.axis, None), P(self.axis, None),
                          P(self.axis, None), P(self.axis, None),
                          P(self.axis), P(self.axis)),
                out_specs=(P(), P()),
                check_vma=False,
            )
            return jax.jit(fn)

        def local(q, vecs, gids, counts):
            valid_local = counts[0]
            if use_fused:
                # Per-shard fused Pallas scan (DESIGN.md §2b); the cross-
                # shard all_gather merge below is identical either way.
                scores, ids = fused_scan_topk(
                    q, vecs, valid_local, k=k, bn=pick_bn(cap)
                )
            else:
                scores, ids = flat_topk(q, vecs, valid_local, k=k,
                                        block_n=block, exact=False,
                                        approx_topk=self.approx_topk)
            return _merge(scores, ids, gids)

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(), P(self.axis, None), P(self.axis), P(self.axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search_ids(self, query_emb, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._n == 0:
            b = np.asarray(query_emb).shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        q = l2_normalize(jnp.asarray(query_emb, dtype=jnp.float32))
        dispatch.program("query_normalize")
        with self.lock:
            k_eff = min(k, self._cap)
            if self._search_fn is None or self._search_fn[0] != (k_eff, self._cap):
                self._search_fn = ((k_eff, self._cap), self._make_search(k_eff))
            q = jax.device_put(q, NamedSharding(self.mesh, P()))
            if self.storage == "int8_rerank":
                scores, ids = self._search_fn[1](
                    q, self._vectors, self._scales, self._residual,
                    self._rscales, self._gids, self._counts_dev
                )
            else:
                scores, ids = self._search_fn[1](
                    q, self._vectors, self._gids, self._counts_dev
                )
            dispatch.program("index_scan")
        out = np.asarray(scores)[:, :k], np.asarray(ids)[:, :k]
        dispatch.sync("index_scan")
        return out

    def search(self, query_emb: np.ndarray, k: int = 3):
        if np.asarray(query_emb).size == 0 or self._n == 0:
            return []
        scores, ids = self.search_ids(np.asarray(query_emb), k)
        return [
            (self.metas[int(i)], float(sc))
            for sc, i in zip(scores[0], ids[0])
            if i >= 0
        ]


class ShardedHNSWIndex:
    """Per-shard HNSW graphs searched in parallel, merged with all_gather.

    Each shard owns its own C++-built graph and pivot sample over the rows
    placed in it; a query beam-searches every shard concurrently and the
    per-shard top-k are merged on device. Per-shard ef keeps work per chip
    constant as shards are added — corpus scale-out is the scaling axis
    (SURVEY.md §5 long-context row).

    Storage is per-shard device blocks committed to each mesh device and
    assembled zero-copy into global sharded arrays
    (``jax.make_array_from_single_device_arrays``), so an incremental insert
    touches only the affected shard's blocks.
    """

    # Per-shard byte budget for the neighbor-materialized fused layout.
    FUSED_LAYOUT_MAX_BYTES = 8 << 30

    def __init__(
        self,
        mesh: Mesh,
        cfg: Optional[HNSWConfig] = None,
        embed_dim: int = 1024,
        axis: str = "shard",
        n_pivots: int = 1024,
        vector_dtype: Any = jnp.float32,
        layout: str = "auto",
        fused_dtype: Any = None,
    ):
        self.mesh = mesh
        self.cfg = cfg or HNSWConfig()
        self.embed_dim = embed_dim
        self.axis = axis
        self.n_pivots = n_pivots
        self.vector_dtype = vector_dtype
        self.fused_dtype = fused_dtype or vector_dtype
        self.layout = layout
        self.n_shards = mesh.shape[axis]
        # Shard i lives on this device (1-D mesh order).
        self._devices = list(mesh.devices.flatten())
        self.metas: List[Dict[str, Any]] = []
        # Host-side per-shard state (source of truth for graph construction).
        self._h_vecs: List[np.ndarray] = []    # [cap, D] f32, normalized
        self._h_graph: List[np.ndarray] = []   # [cap, M0] int32
        self._h_levels: List[np.ndarray] = []  # [cap] int32
        self._h_gids: List[np.ndarray] = []    # [cap] int32 (-1 empty)
        self._counts = np.zeros(self.n_shards, np.int64)
        # Device-side per-shard blocks + assembled sharded arrays.
        self._d_vecs: List[jax.Array] = []
        self._d_graph: List[jax.Array] = []
        self._d_gids: List[jax.Array] = []
        self._d_pivots: List[jax.Array] = []
        self._vectors: Optional[jax.Array] = None
        self._graph: Optional[jax.Array] = None
        self._gids_arr: Optional[jax.Array] = None
        self._pivots: Optional[jax.Array] = None
        self._nbr_vecs: Optional[jax.Array] = None
        self._nbr_scales: Optional[jax.Array] = None
        self._cap = 0
        self._n = 0
        self._host = _HostRows(embed_dim)
        self._search_fn = None
        self.lock = threading.RLock()

    def __len__(self) -> int:
        return self._n

    def has_any_data(self) -> bool:
        return self._n > 0

    def valid_vectors(self) -> Optional[np.ndarray]:
        return self._host.view() if self._n else None

    def _use_fused(self) -> bool:
        if self.layout == "plain":
            return False
        platform = self._devices[0].platform
        if platform != "tpu":
            return False
        if self.layout == "fused":
            return True
        per_shard = (
            self._cap * self.cfg.M0 * self.embed_dim
            * jnp.dtype(self.fused_dtype).itemsize
        )
        return per_shard <= self.FUSED_LAYOUT_MAX_BYTES

    # ----------------------------------------------------------- device assembly

    def _assemble(self, blocks: List[jax.Array], spec: P) -> jax.Array:
        shape = (self.n_shards * blocks[0].shape[0],) + blocks[0].shape[1:]
        sharding = NamedSharding(self.mesh, spec)
        return jax.make_array_from_single_device_arrays(shape, sharding, blocks)

    def _put_shard(self, arr: np.ndarray, i: int, dtype=None) -> jax.Array:
        x = jnp.asarray(arr, dtype=dtype) if dtype is not None else jnp.asarray(arr)
        return jax.device_put(x, self._devices[i])

    def _reassemble_all(self) -> None:
        self._vectors = self._assemble(self._d_vecs, P(self.axis, None))
        self._graph = self._assemble(self._d_graph, P(self.axis, None))
        self._gids_arr = self._assemble(self._d_gids, P(self.axis))
        self._pivots = self._assemble(self._d_pivots, P(self.axis))
        self._refresh_fused()

    def _refresh_fused(self) -> None:
        self._nbr_vecs = None
        self._nbr_scales = None
        if not self._use_fused():
            return
        # Per-shard neighbor-materialized layout: the gather uses LOCAL
        # graph ids, so it must run shard-locally under shard_map. This is a
        # device-side recompute (no host traffic); O(N*M0*D) gather at HBM
        # speed, amortized over the adds between refreshes.
        int8 = jnp.dtype(self.fused_dtype) == jnp.int8

        def local_build(v, g):
            safe = jnp.maximum(g, 0)
            if int8:
                from sqe_tpu.ops.quantize import quantize_rows

                qv, scales = quantize_rows(v.astype(jnp.float32))
                return jnp.take(qv, safe, axis=0), jnp.take(scales, safe, axis=0)
            taken = jnp.take(v, safe, axis=0).astype(self.fused_dtype)
            return taken, jnp.zeros((g.shape[0], g.shape[1]), jnp.float32)

        build = jax.jit(
            jax.shard_map(
                local_build,
                mesh=self.mesh,
                in_specs=(P(self.axis, None), P(self.axis, None)),
                out_specs=(P(self.axis, None, None), P(self.axis, None)),
                check_vma=False,
            )
        )
        nbr_vecs, nbr_scales = build(self._vectors, self._graph)
        self._nbr_vecs = nbr_vecs
        self._nbr_scales = nbr_scales if int8 else None

    # ------------------------------------------------------------------- build

    def build(
        self,
        embeddings: np.ndarray,
        metas: Sequence[Dict[str, Any] | Chunk],
        force_numpy_builder: bool = False,
    ):
        emb = _normalize(embeddings)
        n = emb.shape[0]
        ns = self.n_shards
        cap = _pow2_at_least(-(-n // ns))
        m0 = self.cfg.M0
        p = min(self.n_pivots, cap)
        rng = np.random.default_rng(self.cfg.seed)

        with self.lock:
            self._force_numpy = force_numpy_builder
            self._h_vecs, self._h_graph, self._h_levels, self._h_gids = [], [], [], []
            self._d_vecs, self._d_graph, self._d_gids, self._d_pivots = [], [], [], []
            counts = np.zeros(ns, np.int64)
            for i in range(ns):
                lo, hi = min(i * cap, n), min((i + 1) * cap, n)
                local = emb[lo:hi]
                c = local.shape[0]
                counts[i] = c
                h_vec = np.zeros((cap, emb.shape[1]), np.float32)
                h_graph = np.full((cap, m0), -1, np.int32)
                h_levels = np.zeros((cap,), np.int32)
                h_gid = np.full((cap,), -1, np.int32)
                piv = np.zeros((p,), np.int32)
                if c:
                    graph, levels = hnsw_build.build_graph(
                        local, M=self.cfg.M,
                        ef_construction=self.cfg.ef_construction,
                        seed=self.cfg.seed + i, force_numpy=force_numpy_builder,
                    )
                    h_vec[:c] = local
                    h_graph[:c] = graph
                    h_levels[:c] = levels
                    h_gid[:c] = np.arange(lo, hi, dtype=np.int32)
                    piv[: min(p, c)] = rng.choice(
                        c, size=min(p, c), replace=False
                    ).astype(np.int32)
                self._h_vecs.append(h_vec)
                self._h_graph.append(h_graph)
                self._h_levels.append(h_levels)
                self._h_gids.append(h_gid)
                self._d_vecs.append(self._put_shard(h_vec, i, self.vector_dtype))
                self._d_graph.append(self._put_shard(h_graph, i))
                self._d_gids.append(self._put_shard(h_gid, i))
                self._d_pivots.append(self._put_shard(piv, i))
            self._counts = counts
            self._cap = cap
            self._n = n
            self._host = _HostRows(self.embed_dim)
            self._host.append(emb)
            self.metas = [_to_meta(m) for m in metas]
            self._search_fn = None
            self._reassemble_all()

    # --------------------------------------------------------------------- add

    def add(self, embeddings: np.ndarray, metas, force_numpy_builder: bool = False):
        """Incremental insert: the whole batch goes to the least-full shard;
        the C++ ``hnsw_insert_batch`` extends that shard's graph in place and
        only the new vectors + rewired graph rows travel host->device. Falls
        back to a full rebuild when the shard would overflow (amortized by
        power-of-two capacity growth) or when no graph exists yet."""
        emb = _normalize(embeddings)
        if emb.size == 0:
            return
        new_metas = [_to_meta(m) for m in metas]
        if self._n == 0:
            self.build(emb, new_metas, force_numpy_builder=force_numpy_builder)
            return
        b = emb.shape[0]
        with self.lock:
            j = int(np.argmin(self._counts))
            old = int(self._counts[j])
            if old + b > self._cap:
                all_vecs = np.concatenate([self._host.view(), emb])
                self.build(all_vecs, self.metas + new_metas,
                           force_numpy_builder=force_numpy_builder)
                return
            # Host-side graph extension for shard j.
            self._h_vecs[j][old : old + b] = emb
            graph_new, levels_new = hnsw_build.insert_batch(
                self._h_vecs[j][: old + b],
                self._h_graph[j][:old],
                self._h_levels[j][:old],
                old,
                M=self.cfg.M,
                ef_construction=self.cfg.ef_construction,
                seed=self.cfg.seed + j,
            )
            changed = np.nonzero(
                (graph_new[:old] != self._h_graph[j][:old]).any(axis=1)
            )[0].astype(np.int32)
            rows = np.concatenate(
                [changed, np.arange(old, old + b, dtype=np.int32)]
            )
            self._h_graph[j][: old + b] = graph_new
            self._h_levels[j][: old + b] = levels_new
            gid0 = self._n
            self._h_gids[j][old : old + b] = np.arange(
                gid0, gid0 + b, dtype=np.int32
            )
            # Device update for shard j only: scatter new vector rows, the
            # rewired graph rows, and the new gid entries. Blocks are NOT
            # donated (the assembled global array shares their buffers); the
            # scatter allocates a fresh per-shard block on that one device.
            dev_rows = self._put_shard(rows, j)
            self._d_vecs[j] = (
                self._d_vecs[j]
                .at[self._put_shard(np.arange(old, old + b, dtype=np.int32), j)]
                .set(self._put_shard(emb, j, self.vector_dtype))
            )
            self._d_graph[j] = self._d_graph[j].at[dev_rows].set(
                self._put_shard(graph_new[rows], j)
            )
            self._d_gids[j] = (
                self._d_gids[j]
                .at[self._put_shard(np.arange(old, old + b, dtype=np.int32), j)]
                .set(self._put_shard(self._h_gids[j][old : old + b], j))
            )
            self._counts[j] = old + b
            self._n += b
            self._host.append(emb)
            self.metas.extend(new_metas)
            self._reassemble_all()

    # ------------------------------------------------------------------ search

    def _make_search(self, k: int, ef: int, n_seeds: int, max_iters: int,
                     expand: int = 4, fused: Optional[bool] = None):
        axis = self.axis
        if fused is None:
            fused = self._nbr_vecs is not None
        quantized = fused and self._nbr_scales is not None

        def local(q, vecs, graph, pivots, gids, nbr_vecs=None, nbr_scales=None):
            scores, ids = hnsw_search_batch(
                q, vecs, graph, pivots, nbr_vecs, nbr_scales,
                k=k, ef=ef, max_iters=max_iters, n_seeds=n_seeds,
                expand=expand, fused_gather=fused,
            )
            # Map local slot ids to global ids; empty slots (gid -1) mask out.
            g = jnp.where(ids >= 0, jnp.take(gids, jnp.maximum(ids, 0)), -1)
            scores = jnp.where(g >= 0, scores, -jnp.inf)
            all_s = jax.lax.all_gather(scores, axis, axis=1, tiled=True)
            all_i = jax.lax.all_gather(g, axis, axis=1, tiled=True)
            ms, sel = jax.lax.top_k(all_s, k)
            mi = jnp.take_along_axis(all_i, sel, axis=1)
            return ms, mi

        in_specs = [P(), P(self.axis, None), P(self.axis, None), P(self.axis),
                    P(self.axis)]
        if fused:
            in_specs.append(P(self.axis, None, None))
            if quantized:
                in_specs.append(P(self.axis, None))
        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=tuple(in_specs),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search_ids(
        self, query_emb, k: int, ef: Optional[int] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._n == 0:
            b = np.asarray(query_emb).shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        q = l2_normalize(jnp.asarray(query_emb, dtype=jnp.float32))
        dispatch.program("query_normalize")
        with self.lock:
            ef = ef or self.cfg.ef_search
            k_eff = min(k, self._cap)
            ef = max(k_eff, min(ef, self._cap))
            n_seeds = min(32, ef)
            expand = max(1, min(8, ef))
            fused = self._nbr_vecs is not None
            if fused:
                # Same VMEM-budget clamp as HNSWIndex.search_ids / the fused
                # frontend: gather_dot's block_q selection rejects off-size
                # batches whose scratch exceeds the budget — shrink expand or
                # drop to the plain einsum path (advisor r02 finding).
                from sqe_tpu.index.hnsw import plan_fused_gather

                _, m0, d = self._nbr_vecs.shape
                expand, fused = plan_fused_gather(
                    np.asarray(query_emb).shape[0], m0, d,
                    self._nbr_vecs.dtype.itemsize, expand,
                )
            max_iters = ef // expand + 32
            key = (k_eff, ef, n_seeds, max_iters, expand, self._cap, fused)
            if self._search_fn is None or self._search_fn[0] != key:
                self._search_fn = (key,
                                   self._make_search(*key[:5], fused=fused))
            q = jax.device_put(q, NamedSharding(self.mesh, P()))
            args = (q, self._vectors, self._graph, self._pivots, self._gids_arr)
            if fused:
                args = args + (self._nbr_vecs,)
                if self._nbr_scales is not None:
                    args = args + (self._nbr_scales,)
            scores, ids = self._search_fn[1](*args)
            dispatch.program("index_scan")
        out = np.asarray(scores)[:, :k], np.asarray(ids)[:, :k]
        dispatch.sync("index_scan")
        return out

    def search(self, query_emb: np.ndarray, k: int = 3):
        if np.asarray(query_emb).size == 0 or self._n == 0:
            return []
        scores, ids = self.search_ids(np.asarray(query_emb), k)
        return [
            (self.metas[int(i)], float(sc))
            for sc, i in zip(scores[0], ids[0])
            if i >= 0
        ]
