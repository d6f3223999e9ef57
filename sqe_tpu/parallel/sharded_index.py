"""Index sharding over the device mesh.

This is the first-class "distribution" component the reference outsourced to a
single-node OpenSearch (SURVEY.md §2, index-sharding row). Vectors (and, for
HNSW, per-shard graphs + pivot samples) are laid out shard-major along axis 0
and partitioned over the mesh's ``shard`` axis with NamedSharding. A query
batch is replicated; each device searches its shard locally (the same
single-device kernels — ``flat_topk`` / ``hnsw_search_batch`` — run inside
``jax.shard_map``), local ids are rebased to global ids, and the per-shard
top-k are merged with an ``all_gather`` over ICI followed by one ``lax.top_k``
(k entries per shard — merge traffic is tiny; SURVEY.md §7 risk note).

Sharded search is bit-equivalent to single-device search over the union of the
shards (gated in tests/test_sharded.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sqe_tpu.config import HNSWConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.index import hnsw_build
from sqe_tpu.index.flat import flat_topk
from sqe_tpu.index.hnsw import hnsw_search_batch
from sqe_tpu.ops.distance import l2_normalize


def _to_meta(m: Dict[str, Any] | Chunk) -> Dict[str, Any]:
    return {"doc_id": m.doc_id, "text": m.text} if isinstance(m, Chunk) else dict(m)


def _pad_to(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    if x.shape[0] >= n:
        return x[:n]
    pad = np.full((n - x.shape[0],) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


class ShardedFlatIndex:
    """Exact cosine top-k sharded over a 1-D mesh axis."""

    def __init__(
        self,
        mesh: Mesh,
        embed_dim: int = 1024,
        axis: str = "shard",
        block_n: int = 131072,
        approx_topk: bool = False,
    ):
        self.mesh = mesh
        self.axis = axis
        self.embed_dim = embed_dim
        self.block_n = block_n
        self.approx_topk = approx_topk
        self.n_shards = mesh.shape[axis]
        self.metas: List[Dict[str, Any]] = []
        self._vectors: Optional[jax.Array] = None  # [n_shards*S, D] sharded
        self._shard_rows = 0                       # S: rows per shard (padded)
        self._n = 0                                # real rows (global)
        self._search_fn = None

    def __len__(self) -> int:
        return self._n

    def has_any_data(self) -> bool:
        return self._n > 0

    def build(self, embeddings: np.ndarray, metas: Sequence[Dict[str, Any] | Chunk]):
        emb = np.asarray(embeddings, dtype=np.float32)
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
        n = emb.shape[0]
        ns = self.n_shards
        # Shard-major contiguous layout, padded so every shard holds S rows.
        s = -(-n // ns)
        s = max(8, s)
        padded = _pad_to(emb, ns * s)
        sharding = NamedSharding(self.mesh, P(self.axis, None))
        self._vectors = jax.device_put(jnp.asarray(padded), sharding)
        self._emb_host = emb
        self._shard_rows = s
        self._n = n
        self.metas = [_to_meta(m) for m in metas]
        self._search_fn = None

    def add(self, embeddings: np.ndarray, metas: Sequence[Dict[str, Any] | Chunk]):
        """Incremental insert: extend and re-shard (contiguous shard-major
        layout means appends change shard boundaries; corpus-scale rebuilds
        are one device_put)."""
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.size == 0:
            return
        old_metas = list(self.metas)
        base = self._emb_host if self._n else np.zeros((0, emb.shape[1]), np.float32)
        self.build(np.concatenate([base, emb]), old_metas + [_to_meta(m) for m in metas])

    def valid_vectors(self) -> Optional[np.ndarray]:
        return self._emb_host if self._n else None

    def _make_search(self, k: int):
        s = self._shard_rows
        ns = self.n_shards
        n_real = self._n
        axis = self.axis
        block = min(self.block_n, s)
        # Valid rows per shard: shard i owns global rows [i*s, min((i+1)*s, n)).
        def local(q, vecs):
            shard = jax.lax.axis_index(axis)
            base = shard * s
            valid_local = jnp.clip(n_real - base, 0, s)
            scores, ids = flat_topk(q, vecs, valid_local, k=k, block_n=block,
                                    exact=False,
                                    approx_topk=self.approx_topk)
            gids = jnp.where(ids >= 0, ids + base, -1)
            all_s = jax.lax.all_gather(scores, axis, axis=1, tiled=True)
            all_i = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            ms, sel = jax.lax.top_k(all_s, k)
            mi = jnp.take_along_axis(all_i, sel, axis=1)
            return ms, mi

        fn = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(), P(self.axis, None)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search_ids(self, query_emb, k: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._n == 0:
            b = np.asarray(query_emb).shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        k_eff = min(k, self._shard_rows)
        if self._search_fn is None or self._search_fn[0] != k_eff:
            self._search_fn = (k_eff, self._make_search(k_eff))
        q = l2_normalize(jnp.asarray(query_emb, dtype=jnp.float32))
        q = jax.device_put(q, NamedSharding(self.mesh, P()))
        scores, ids = self._search_fn[1](q, self._vectors)
        return np.asarray(scores)[:, :k], np.asarray(ids)[:, :k]

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

    Each shard owns a contiguous slice of the corpus with its own C++-built
    graph and pivot sample; a query beam-searches every shard concurrently and
    the per-shard top-k are merged on device. Per-shard ef keeps work per chip
    constant as shards are added — corpus scale-out is the scaling axis
    (SURVEY.md §5 long-context row).
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
        self.metas: List[Dict[str, Any]] = []
        self._vectors: Optional[jax.Array] = None   # [ns*S, D] sharded
        self._graph: Optional[jax.Array] = None     # [ns*S, M0] sharded (local ids)
        self._pivots: Optional[jax.Array] = None    # [ns*P] sharded (local ids)
        self._nbr_vecs: Optional[jax.Array] = None  # [ns*S, M0, D] fused layout
        self._nbr_scales: Optional[jax.Array] = None
        self._shard_rows = 0
        self._n = 0
        self._search_fn = None
        self._emb_host: Optional[np.ndarray] = None

    def add(self, embeddings: np.ndarray, metas, force_numpy_builder: bool = False):
        """Incremental insert by re-sharding + per-shard rebuild (shard-major
        contiguous layout; ingestion batches amortize the rebuild)."""
        emb = np.asarray(embeddings, dtype=np.float32)
        if emb.size == 0:
            return
        old_metas = list(self.metas)
        base = self._emb_host if self._n else np.zeros((0, emb.shape[1]), np.float32)
        self.build(
            np.concatenate([base, emb]),
            old_metas + [_to_meta(m) for m in metas],
            force_numpy_builder=force_numpy_builder,
        )

    def valid_vectors(self) -> Optional[np.ndarray]:
        return self._emb_host if self._n else None

    def _use_fused(self) -> bool:
        if self.layout == "plain":
            return False
        platform = next(iter(self.mesh.devices.flatten())).platform
        if platform != "tpu":
            return False
        if self.layout == "fused":
            return True
        per_shard = (
            self._shard_rows * self.cfg.M0 * self.embed_dim
            * jnp.dtype(self.fused_dtype).itemsize
        )
        return per_shard <= self.FUSED_LAYOUT_MAX_BYTES

    def __len__(self) -> int:
        return self._n

    def has_any_data(self) -> bool:
        return self._n > 0

    def build(
        self,
        embeddings: np.ndarray,
        metas: Sequence[Dict[str, Any] | Chunk],
        force_numpy_builder: bool = False,
    ):
        emb = np.asarray(embeddings, dtype=np.float32)
        emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
        n = emb.shape[0]
        ns = self.n_shards
        s = max(8, -(-n // ns))
        m0 = self.cfg.M0
        p = min(self.n_pivots, s)
        rng = np.random.default_rng(self.cfg.seed)

        vec_blocks, graph_blocks, pivot_blocks = [], [], []
        for i in range(ns):
            lo, hi = i * s, min((i + 1) * s, n)
            local = emb[lo:hi]
            if local.shape[0] == 0:
                # Empty shard: single zero row pointing nowhere.
                vec_blocks.append(np.zeros((s, emb.shape[1]), np.float32))
                graph_blocks.append(np.full((s, m0), -1, np.int32))
                pivot_blocks.append(np.zeros((p,), np.int32))
                continue
            graph, _levels = hnsw_build.build_graph(
                local, M=self.cfg.M, ef_construction=self.cfg.ef_construction,
                seed=self.cfg.seed + i, force_numpy=force_numpy_builder,
            )
            n_local = local.shape[0]
            piv = rng.choice(n_local, size=min(p, n_local), replace=False).astype(np.int32)
            piv = _pad_to(piv, p, fill=0)
            vec_blocks.append(_pad_to(local, s))
            graph_blocks.append(_pad_to(graph, s, fill=-1))
            pivot_blocks.append(piv)

        vsh = NamedSharding(self.mesh, P(self.axis, None))
        psh = NamedSharding(self.mesh, P(self.axis))
        self._vectors = jax.device_put(
            jnp.asarray(np.concatenate(vec_blocks), dtype=self.vector_dtype), vsh
        )
        self._graph = jax.device_put(jnp.asarray(np.concatenate(graph_blocks)), vsh)
        self._pivots = jax.device_put(jnp.asarray(np.concatenate(pivot_blocks)), psh)
        self._emb_host = emb
        self._shard_rows = s
        self._n = n
        self.metas = [_to_meta(m) for m in metas]
        self._search_fn = None
        self._nbr_vecs = None
        self._nbr_scales = None
        if self._use_fused():
            # Per-shard neighbor-materialized layout: the gather uses LOCAL
            # graph ids, so it must run shard-locally under shard_map.
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

    def _make_search(self, k: int, ef: int, n_seeds: int, max_iters: int,
                     expand: int = 4):
        s = self._shard_rows
        n_real = self._n
        axis = self.axis
        fused = self._nbr_vecs is not None

        quantized = self._nbr_scales is not None

        def local(q, vecs, graph, pivots, nbr_vecs=None, nbr_scales=None):
            shard = jax.lax.axis_index(axis)
            base = shard * s
            scores, ids = hnsw_search_batch(
                q, vecs, graph, pivots, nbr_vecs, nbr_scales,
                k=k, ef=ef, max_iters=max_iters, n_seeds=n_seeds,
                expand=expand, fused_gather=fused,
            )
            # Mask pad rows (global id >= n_real) and rebase to global ids.
            gids = jnp.where(ids >= 0, ids + base, -1)
            ok = (gids >= 0) & (gids < n_real)
            scores = jnp.where(ok, scores, -jnp.inf)
            gids = jnp.where(ok, gids, -1)
            all_s = jax.lax.all_gather(scores, axis, axis=1, tiled=True)
            all_i = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            ms, sel = jax.lax.top_k(all_s, k)
            mi = jnp.take_along_axis(all_i, sel, axis=1)
            return ms, mi

        in_specs = [P(), P(self.axis, None), P(self.axis, None), P(self.axis)]
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
        ef = ef or self.cfg.ef_search
        k_eff = min(k, self._shard_rows)
        ef = max(k_eff, min(ef, self._shard_rows))
        n_seeds = min(32, ef)
        expand = max(1, min(8, ef))
        max_iters = ef // expand + 32
        key = (k_eff, ef, n_seeds, max_iters, expand)
        if self._search_fn is None or self._search_fn[0] != key:
            self._search_fn = (key, self._make_search(*key))
        q = l2_normalize(jnp.asarray(query_emb, dtype=jnp.float32))
        q = jax.device_put(q, NamedSharding(self.mesh, P()))
        args = (q, self._vectors, self._graph, self._pivots)
        if self._nbr_vecs is not None:
            args = args + (self._nbr_vecs,)
            if self._nbr_scales is not None:
                args = args + (self._nbr_scales,)
        scores, ids = self._search_fn[1](*args)
        return np.asarray(scores)[:, :k], np.asarray(ids)[:, :k]

    def search(self, query_emb: np.ndarray, k: int = 3):
        if np.asarray(query_emb).size == 0 or self._n == 0:
            return []
        scores, ids = self.search_ids(np.asarray(query_emb), k)
        return [
            (self.metas[int(i)], float(sc))
            for sc, i in zip(scores[0], ids[0])
            if i >= 0
        ]
