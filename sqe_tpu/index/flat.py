"""Exact flat cosine index: the brute-force oracle and stage-1 retrieval path.

Replaces the reference's OpenSearch k-NN query (app/main.py:347-373) with a
device-resident vector matrix and a blocked matmul + running top-k: scores are
computed block-by-block over N with ``lax.scan`` so HBM working-set stays
bounded, each block's top-k is merged into the running top-k with a single
``lax.top_k`` over 2k candidates. This is also the recall oracle the HNSW
index is gated against (BASELINE.json config 2).

Search results follow the reference's contract: a list of
``(source_dict, score)`` pairs where ``source_dict`` has ``doc_id`` and
``text`` (app/main.py:361-370).
"""

from __future__ import annotations

import functools
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.ops.distance import l2_normalize
from sqe_tpu.ops.fused_scan import (
    fused_scan_topk,
    fused_scan_topk_int8,
    pick_bn,
)
from sqe_tpu.ops.fused_scan2 import (
    fused_scan2_topk,
    fused_scan2_topk_int8,
)
from sqe_tpu.ops.gather_dot import gather_dot
from sqe_tpu.utils import dispatch


def _gather_dot_chunked(plane_g, gids, qf, *, interpret,
                        smem_budget: int = 524288):
    """gather_dot with the query dim chunked to fit the SMEM id table.

    gather_dot scalar-prefetches its whole ``ids [B, R]`` i32 table into
    SMEM, lane-padded to >=128 columns — B x max(R,128) x 4 bytes against
    a 1 MB SMEM budget. B=1024/R<=128 fits (512 KB, every measured rerank
    row), but B=4096 is 2 MB and fails to compile (hit by bench.py's 1M
    B=4096 rerank row). Chunks of <=``smem_budget`` bytes run as a
    sequential lax.map — each chunk is still >=1024 full-width queries, so
    the DMA pipeline stays saturated and the measured cost is additive."""
    b, r = gids.shape
    lanes = max(r, 128)
    bc = b
    while bc * lanes * 4 > smem_budget and bc % 2 == 0 and bc > 8:
        bc //= 2
    if bc == b:
        return gather_dot(plane_g, gids, qf, interpret=interpret)

    def one(args):
        idc, qc = args
        return gather_dot(plane_g, idc, qc, interpret=interpret)

    out = jax.lax.map(one, (gids.reshape(b // bc, bc, r),
                            qf.reshape(b // bc, bc, qf.shape[1])))
    return out.reshape(b, out.shape[-1])


@functools.partial(jax.jit,
                   static_argnames=("k", "use_kernel", "interpret"))
def int8_rerank_topk(
    queries: jax.Array,     # [B, D] f32 (normalized)
    cand_i: jax.Array,      # [B, R] int32 candidate ids (-1 = pad)
    primary: jax.Array,     # [N, D] int8
    pscales: jax.Array,     # [N, 1] f32
    residual: jax.Array,    # [N, D] int8 (quantized primary reconstruction err)
    rscales: jax.Array,     # [N, 1] f32
    *,
    k: int,
    use_kernel: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact-precision rerank of the int8 scan's top-R candidates.

    Residual refinement: ``x ~= p*ps + r*rs`` with per-element error
    <= ps/508 — reconstruction noise ~1e-8 on the cosine, far below the
    1e-5 epsilon-recall gate, so the rerank ordering is effectively the
    bf16-exact ordering. Each candidate costs two contiguous 1 KB row DMAs
    (gather_dot with M0=1 over each plane); total rerank traffic is
    B*R*2*D bytes, independent of N. Returns (scores [B, k], ids [B, k]).
    """
    n, d = primary.shape
    ids = jnp.maximum(cand_i, 0)
    qf = queries.astype(jnp.float32)
    if use_kernel and n % 8 == 0:
        # The kernel casts gathered int8 rows to f32 in VMEM and dots with
        # the f32 query block — same arithmetic as the XLA path below.
        # Mosaic tiles int8 memrefs at (8,128) sublanes x lanes (with 4-way
        # sublane packing), so an [N, 1, D] layout cannot be sliced one row
        # at a time and VMEM slices along the row dim must be multiples of
        # 8. Gather tile-aligned GROUPS of 8 rows ([N/8, 8, D], group id =
        # id // 8) and select the wanted row's similarity after the kernel.
        # 8x the gather bytes, but rerank traffic is independent of N and
        # an 8 KB group DMA runs near the DMA engine's peak where the 1 KB
        # single row would not; measured cost at B=1024/R=128 is ~2 GB
        # (~3 ms), amortized away by the scan at multi-million N.
        g = 8
        sub = (ids % g)[..., None]

        def grouped(plane):
            sims = _gather_dot_chunked(plane.reshape(n // g, g, d),
                                       ids // g, qf,
                                       interpret=interpret)  # [B, R*g]
            sims = sims.reshape(ids.shape[0], ids.shape[1], g)
            return jnp.take_along_axis(sims, sub, axis=2)[..., 0]

        s1 = grouped(primary)                              # [B, R]
        s2 = grouped(residual)
    else:
        # XLA fallback (CPU tests): f32 accumulate; gather_dot_reference is
        # unsuitable here — it casts queries to the GATHERED dtype (int8).
        s1 = jnp.einsum("bd,brd->br", qf, primary[ids].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        s2 = jnp.einsum("bd,brd->br", qf, residual[ids].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    score = s1 * pscales[ids, 0] + s2 * rscales[ids, 0]
    score = jnp.where(cand_i >= 0, score, -jnp.inf)
    k_eff = min(k, score.shape[1])
    ms, sel = jax.lax.top_k(score, k_eff)
    mi = jnp.take_along_axis(cand_i, sel, axis=1)
    mi = jnp.where(jnp.isfinite(ms), mi, -1)
    if k_eff < k:
        pad = k - k_eff
        ms = jnp.pad(ms, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        mi = jnp.pad(mi, ((0, 0), (0, pad)), constant_values=-1)
    return ms, mi


@functools.partial(jax.jit,
                   static_argnames=("k", "use_kernel", "interpret"))
def int8_residual_rerank_topk(
    queries: jax.Array,     # [B, D] f32 (normalized)
    cand_s: jax.Array,      # [B, R] f32 scan scores (calibrated ~cosine)
    cand_i: jax.Array,      # [B, R] int32 candidate ids (-1 = pad)
    residual: jax.Array,    # [N, D] int8
    rscales: jax.Array,     # [N, 1] f32
    *,
    k: int,
    use_kernel: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Residual-ONLY rerank: score = scan score + q . r*rs.

    Gathers half the bytes and issues half the DMAs of the full rerank
    (int8_rerank_topk) by reusing the scan's calibrated candidate scores
    for the primary term instead of re-gathering the primary plane. Two
    error terms ride along (the full rerank recomputes q_f32 . p exactly
    and has neither):

    - query-quantization noise on the primary term, per-score std
      ~ qs/(2*sqrt(3)) ~ 3e-4 cosine for normalized 1024-d queries;
    - the packed bin/column selection's mantissa clearing: fused-scan
      kernels bitcast the candidate index into the score's low mantissa
      bits, quantizing the reused scan score by 2^bits * ulp(4.0)
      (~1e-3 at multi-million N with the v2 kernel's wider bin field).

    Use when the candidate margin comfortably exceeds the SUM of both
    (~1.5e-3 at 2M+ rows); measured against the full mode in
    scripts/rerank_ab.py, which interprets its recall deltas against
    these terms."""
    n, d = residual.shape
    ids = jnp.maximum(cand_i, 0)
    qf = queries.astype(jnp.float32)
    if use_kernel and n % 8 == 0:
        g = 8
        sub = (ids % g)[..., None]
        sims = _gather_dot_chunked(residual.reshape(n // g, g, d),
                                   ids // g, qf, interpret=interpret)
        sims = sims.reshape(ids.shape[0], ids.shape[1], g)
        s2 = jnp.take_along_axis(sims, sub, axis=2)[..., 0]
    else:
        s2 = jnp.einsum("bd,brd->br", qf, residual[ids].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    score = cand_s + s2 * rscales[ids, 0]
    score = jnp.where(cand_i >= 0, score, -jnp.inf)
    k_eff = min(k, score.shape[1])
    ms, sel = jax.lax.top_k(score, k_eff)
    mi = jnp.take_along_axis(cand_i, sel, axis=1)
    mi = jnp.where(jnp.isfinite(ms), mi, -1)
    if k_eff < k:
        pad = k - k_eff
        ms = jnp.pad(ms, ((0, 0), (0, pad)), constant_values=-jnp.inf)
        mi = jnp.pad(mi, ((0, 0), (0, pad)), constant_values=-1)
    return ms, mi


@functools.partial(
    jax.jit,
    static_argnames=("k", "r", "bn", "use_kernel", "interpret", "scan2",
                     "mode"),
)
def int8_scan_rerank_topk(
    queries: jax.Array,
    primary: jax.Array,
    pscales: jax.Array,
    residual: jax.Array,
    rscales: jax.Array,
    valid_n: jax.Array,
    *,
    k: int,
    r: int,
    bn: int,
    use_kernel: bool = True,
    interpret: bool = False,
    scan2: bool = False,
    mode: str = "full",
) -> Tuple[jax.Array, jax.Array]:
    """One device program: int8 fused scan -> top-r candidates -> exact
    residual rerank -> top-k. The int8 engine's recall-restoring serving
    path (VERDICT r02 #2). ``scan2`` selects the v2 column-max kernel
    (ops/fused_scan2.py) for the candidate stage. ``mode="residual"``
    gathers only the residual plane and reuses the scan's candidate
    scores for the primary term (half the rerank DMAs; see
    int8_residual_rerank_topk for the noise tradeoff)."""
    assert mode in ("full", "residual")
    if scan2:
        cand_s, cand_i = fused_scan2_topk_int8(
            queries, primary, pscales, valid_n, k=r, interpret=interpret
        )
    else:
        cand_s, cand_i = fused_scan_topk_int8(
            queries, primary, pscales, valid_n, k=r, bn=bn,
            interpret=interpret
        )
    if mode == "residual":
        return int8_residual_rerank_topk(
            queries, cand_s, cand_i, residual, rscales,
            k=k, use_kernel=use_kernel, interpret=interpret,
        )
    return int8_rerank_topk(
        queries, cand_i, primary, pscales, residual, rscales,
        k=k, use_kernel=use_kernel, interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("k", "block_n", "exact", "approx_topk"))
def flat_topk(
    queries: jax.Array,      # [B, D] normalized
    vectors: jax.Array,      # [N, D] normalized (N padded to block_n; pad rows are 0)
    valid_n: jax.Array,      # scalar int32: number of real rows
    *,
    k: int,
    block_n: int = 131072,
    exact: bool = True,
    approx_topk: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Blocked exact top-k by cosine. Returns (scores [B,k], ids [B,k]).

    ``exact=True`` forces full-f32 multiplication (Precision.HIGHEST): on TPU
    the default f32 matmul decomposes into bf16 passes whose ~1e-3 noise is
    fine for serving but not for a ground-truth oracle — near-ties between
    corpus vectors would make "exact" ids nondeterministic.

    ``approx_topk=True`` selects per-block candidates with the TPU-optimized
    ``lax.approx_max_k`` aggregation instead of the sort-based ``top_k``
    (~30% faster at 100k scale, measured id overlap vs exact 0.9993); the
    cross-block merge stays exact.
    """
    n = vectors.shape[0]
    b = queries.shape[0]
    nb = n // block_n
    qf = queries.astype(jnp.float32)
    precision = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT

    def scan_body(carry, blk):
        top_s, top_i = carry
        block_vecs, base = blk
        s = jax.lax.dot_general(
            qf, block_vecs.astype(jnp.float32),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )                                                  # [B, block_n]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, (b, block_n), 1)
        s = jnp.where(ids < valid_n, s, -jnp.inf)
        if approx_topk:
            bs, bi_local = jax.lax.approx_max_k(s, k, recall_target=0.99)
        else:
            bs, bi_local = jax.lax.top_k(s, k)
        bi = jnp.take_along_axis(ids, bi_local, axis=1)
        cat_s = jnp.concatenate([top_s, bs], axis=1)
        cat_i = jnp.concatenate([top_i, bi], axis=1)
        ms, sel = jax.lax.top_k(cat_s, k)
        mi = jnp.take_along_axis(cat_i, sel, axis=1)
        return (ms, mi), None

    init = (
        jnp.full((b, k), -jnp.inf, dtype=jnp.float32),
        jnp.full((b, k), -1, dtype=jnp.int32),
    )
    blocks = vectors.reshape(nb, block_n, vectors.shape[1])
    bases = (jnp.arange(nb, dtype=jnp.int32) * block_n)
    (top_s, top_i), _ = jax.lax.scan(scan_body, init, (blocks, bases))
    return top_s, top_i


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=())
def _insert_rows(buffer: jax.Array, rows: jax.Array, start: jax.Array) -> jax.Array:
    """In-place (donated) row insertion into the preallocated vector buffer."""
    return jax.lax.dynamic_update_slice(
        buffer, rows.astype(buffer.dtype), (start, 0)
    )


@jax.jit
def _dequantize(vals: jax.Array, scales: jax.Array) -> jax.Array:
    return vals.astype(jnp.float32) * scales


@jax.jit
def _dequantize2(vals, scales, rvals, rscales) -> jax.Array:
    """Primary + residual reconstruction (near-exact; see int8_rerank_topk)."""
    return (vals.astype(jnp.float32) * scales
            + rvals.astype(jnp.float32) * rscales)


class FlatIndex:
    """Device-resident exact cosine index with host-side chunk metadata."""

    def __init__(
        self,
        embed_dim: int = 1024,
        block_n: int = 131072,
        dtype: Any = jnp.float32,
        device: Optional[jax.Device] = None,
        exact: bool = True,
        scan_impl: str = "auto",
        rerank: Optional[bool] = None,
        rerank_depth: int = 32,
    ):
        """``exact=True`` scores at Precision.HIGHEST (the ground-truth oracle
        mode); ``exact=False`` uses the MXU's native bf16-pass f32 matmul —
        the serving mode, ~20% faster with ranking identical up to
        sub-1e-3 score ties.

        ``scan_impl`` selects the serving scan for ``exact=False``:
        ``"fused"`` = the Pallas fused matmul+bin-top-1 kernel
        (ops/fused_scan.py — never writes scores to HBM), ``"fused2"`` =
        the v2 column-max-accumulation kernel (ops/fused_scan2.py — no
        cross-lane work in the hot loop; 5.9x v1 at 2M rows, B=1024,
        scripts/rerank_ab_results.json), ``"blocked"`` = the XLA blocked
        scan, ``"auto"`` = measured-surface routing on TPU when shapes
        allow, else blocked. Auto prefers v2 for the int8+rerank serving
        path — the rerank stage restores the recall v2's residue-class
        binning sheds at multi-million N (0.9984 at 2M with R=32 vs
        0.9992 for v1, both over the >=0.95 gate) — and keeps v1 for
        bf16/scan-only modes, whose v2 recall decays below the gate at
        4M (0.9211, scripts/fused_ab_large_results.json) with no rerank
        stage to recover it. The oracle mode always uses the blocked
        exact scan.

        ``dtype=jnp.int8`` stores symmetric per-row-quantized vectors plus
        f32 row scales: half the HBM of bf16 and the int8 MXU rate via the
        int8 fused kernel (DESIGN.md §2b). Scan-only int8 sheds recall at
        scale (0.946 at 1M, below the >=0.95 gate — VERDICT r02), so by
        default (``rerank=None`` -> True for int8) the index ALSO stores an
        int8 RESIDUAL plane (total 2 bytes/dim — bf16 memory parity) and
        reranks the scan's top ``rerank_depth`` candidates at effectively
        exact precision (int8_rerank_topk): bf16-class recall at the int8
        scan's speed. ``rerank=False`` keeps the half-memory scan-only mode
        for capacity-bound deployments that accept its measured recall.
        CPU/non-fused searches dequantize and use the blocked scan.
        Incompatible with ``exact=True``."""
        assert scan_impl in ("auto", "fused", "fused2", "blocked")
        self.embed_dim = embed_dim
        self.block_n = block_n
        self.dtype = dtype
        self.device = device
        self.exact = exact
        self.scan_impl = scan_impl
        self._int8 = jnp.dtype(dtype) == jnp.int8
        assert not (self._int8 and exact), "int8 storage has no oracle mode"
        self.rerank = bool(rerank) if rerank is not None else self._int8
        assert not (self.rerank and not self._int8), \
            "rerank applies to int8 storage (bf16/f32 scans are near-exact)"
        self.rerank_depth = rerank_depth
        self._scales: Optional[jax.Array] = None   # [N_padded, 1] f32 (int8)
        self._residual: Optional[jax.Array] = None  # [N_padded, D] int8
        self._rscales: Optional[jax.Array] = None   # [N_padded, 1] f32
        self.metas: List[Dict[str, Any]] = []
        self._vectors: Optional[jax.Array] = None   # [N_padded, D] on device
        self._n = 0
        # Guards add() (which DONATES the live buffer) against a concurrent
        # capture-then-dispatch of _vectors from another thread (the fused
        # pipeline / batcher). Hold across capture + dispatch; execution
        # after dispatch is stream-ordered and needs no lock.
        self.lock = threading.RLock()

    # -- reference API parity: OpenSearchIndexer.has_any_data (main.py:300-307)
    def has_any_data(self) -> bool:
        return self._n > 0

    def __len__(self) -> int:
        return self._n

    @property
    def vectors(self) -> Optional[jax.Array]:
        return self._vectors

    def valid_vectors(self) -> Optional[jax.Array]:
        """Valid rows as float (dequantized for int8 storage) — the
        checkpoint/serialization view."""
        with self.lock:
            if self._vectors is None:
                return None
            if self._int8:
                base = (
                    self._vectors[: self._n].astype(jnp.float32)
                    * self._scales[: self._n]
                )
                if self.rerank:
                    base = base + (
                        self._residual[: self._n].astype(jnp.float32)
                        * self._rscales[: self._n]
                    )
                return base
            return self._vectors[: self._n]

    def add(
        self,
        embeddings: np.ndarray,
        metas: Sequence[Dict[str, Any] | Chunk],
    ) -> None:
        """Insert rows (normalized on device). Mirrors add_embeddings
        (app/main.py:309-338) minus the HTTP bulk batching.

        The device buffer is preallocated with doubling growth; inserts write
        rows in place (donated dynamic_update_slice) instead of re-uploading
        the corpus, so incremental ingestion (the /upload_text path) costs
        O(new rows), not O(index size)."""
        if embeddings.size == 0:
            return
        assert embeddings.shape[0] == len(metas)
        emb = np.asarray(embeddings, dtype=np.float32)
        emb = np.asarray(l2_normalize(jnp.asarray(emb)))
        new_metas = [
            {"doc_id": m.doc_id, "text": m.text} if isinstance(m, Chunk) else dict(m)
            for m in metas
        ]
        with self.lock:
            self._add_locked(emb, new_metas)

    @staticmethod
    def _quantize_host(emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        scales = np.maximum(
            np.max(np.abs(emb), axis=1, keepdims=True) / 127.0, 1e-12
        ).astype(np.float32)
        vals = np.clip(np.round(emb / scales), -127, 127).astype(np.int8)
        return vals, scales

    @staticmethod
    def _quantize_residual_host(
        emb: np.ndarray, vals: np.ndarray, scales: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Second-stage int8 of the reconstruction error: per-element error
        drops to <= scale/508 — cosine noise ~1e-8, i.e. exact for ranking."""
        r = emb - vals.astype(np.float32) * scales
        rscales = np.maximum(
            np.max(np.abs(r), axis=1, keepdims=True) / 127.0, 1e-12
        ).astype(np.float32)
        rvals = np.clip(np.round(r / rscales), -127, 127).astype(np.int8)
        return rvals, rscales

    def _add_locked(self, emb: np.ndarray, new_metas: List[Dict[str, Any]]) -> None:
        n_new = emb.shape[0]
        needed = self._n + n_new
        cap = 0 if self._vectors is None else self._vectors.shape[0]
        if self._int8:
            new_vals, new_scales = self._quantize_host(emb)
            if self.rerank:
                new_rvals, new_rscales = self._quantize_residual_host(
                    emb, new_vals, new_scales
                )
        if needed > cap:
            # Grow: power-of-two doubling (always divisible by block_n once
            # past it, so the blocked scan needs no re-padding).
            new_cap = max(8, cap)
            while new_cap < needed:
                new_cap *= 2
            if self._int8:
                buf = np.zeros((new_cap, self.embed_dim), np.int8)
                sbuf = np.zeros((new_cap, 1), np.float32)
                if self._n:
                    buf[: self._n] = np.asarray(self._vectors[: self._n])
                    sbuf[: self._n] = np.asarray(self._scales[: self._n])
                buf[self._n : needed] = new_vals
                sbuf[self._n : needed] = new_scales
                self._vectors = self._put(jnp.asarray(buf))
                self._scales = self._put(jnp.asarray(sbuf))
                if self.rerank:
                    rbuf = np.zeros((new_cap, self.embed_dim), np.int8)
                    rsbuf = np.full((new_cap, 1), 1e-12, np.float32)
                    if self._n:
                        rbuf[: self._n] = np.asarray(self._residual[: self._n])
                        rsbuf[: self._n] = np.asarray(self._rscales[: self._n])
                    rbuf[self._n : needed] = new_rvals
                    rsbuf[self._n : needed] = new_rscales
                    self._residual = self._put(jnp.asarray(rbuf))
                    self._rscales = self._put(jnp.asarray(rsbuf))
            else:
                buf = np.zeros((new_cap, self.embed_dim), np.float32)
                if self._n:
                    buf[: self._n] = np.asarray(
                        self._vectors[: self._n], dtype=np.float32
                    )
                buf[self._n : needed] = emb
                self._vectors = self._put(jnp.asarray(buf, dtype=self.dtype))
        else:
            if self._int8:
                self._vectors = _insert_rows(
                    self._vectors, self._put(jnp.asarray(new_vals)),
                    jnp.int32(self._n),
                )
                self._scales = _insert_rows(
                    self._scales, self._put(jnp.asarray(new_scales)),
                    jnp.int32(self._n),
                )
                if self.rerank:
                    self._residual = _insert_rows(
                        self._residual, self._put(jnp.asarray(new_rvals)),
                        jnp.int32(self._n),
                    )
                    self._rscales = _insert_rows(
                        self._rscales, self._put(jnp.asarray(new_rscales)),
                        jnp.int32(self._n),
                    )
            else:
                update = self._put(jnp.asarray(emb, dtype=self.dtype))
                self._vectors = _insert_rows(
                    self._vectors, update, jnp.int32(self._n)
                )
        self._n = needed
        self.metas.extend(new_metas)

    def _put(self, arr: jax.Array) -> jax.Array:
        return jax.device_put(arr, self.device) if self.device is not None else arr

    def _rerank_r(self, k_eff: int) -> int:
        """Candidate depth for the rerank stage: enough that the true top-k
        survives int8 selection noise, clamped to the index size. The 2M
        R-sweep (scripts/rerank_ab_results.json) measured recall FLAT across
        R=32..128 for both scans (v1 0.9992, v2 0.9984) while B=1024 cost
        grows ~18%/R-doubling — depth 32 is the knee."""
        return max(k_eff, min(self.rerank_depth, self._n))

    def scan_plan(self, k_eff: int) -> Tuple[str, int]:
        """The scorer this index would use for a k_eff search: (scan,
        block_n) with scan in {"int8_rerank", "int8_rerank2", "int8",
        "int8_2", "fused", "fused2", "dequant", "blocked"}. Single source
        of truth shared by search_ids and the fused serving frontend
        (serving/pipeline.py) so both rank identically."""
        length = self._vectors.shape[0]
        block = min(self.block_n, length)
        if length % block:
            # Capacity grows in powers of two; fall back to the largest
            # power-of-two block that divides it.
            block = 1 << (min(self.block_n, length).bit_length() - 1)
        # Auto routes int8+rerank through the v2 scan (5.9x v1 at 2M,
        # recall restored by the rerank stage — see __init__ docstring);
        # everything else keeps v1 under auto. "fused2" forces v2.
        v2 = self.scan_impl == "fused2"
        if self._int8 and self._use_fused(length, k_eff):
            if self.rerank:
                v2_auto = v2 or self.scan_impl == "auto"
                return ("int8_rerank2" if v2_auto else "int8_rerank"), block
            return ("int8_2" if v2 else "int8"), block
        if self._use_fused(length, k_eff):
            return ("fused2" if v2 else "fused"), block
        if self._int8:
            # Non-fused int8 fallback (CPU tests / tiny indices): dequantize
            # (with the residual plane when present — near-exact) and run
            # the blocked scan.
            return "dequant", block
        return "blocked", block

    def search_ids(
        self, query_emb: np.ndarray | jax.Array, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, row ids) for normalized or raw query embeddings [B, D]."""
        if self._vectors is None:
            b = np.asarray(query_emb).shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        q = l2_normalize(jnp.asarray(query_emb, dtype=jnp.float32))
        dispatch.program("query_normalize")
        with self.lock:   # capture+dispatch must exclude a concurrent donate
            k_eff = min(k, self._n)
            length = self._vectors.shape[0]
            scan, block = self.scan_plan(k_eff)
            if scan in ("int8_rerank", "int8_rerank2"):
                scores, ids = int8_scan_rerank_topk(
                    q, self._vectors, self._scales,
                    self._residual, self._rscales, jnp.int32(self._n),
                    k=k_eff, r=self._rerank_r(k_eff), bn=pick_bn(length),
                    scan2=scan.endswith("2"),
                )
            elif scan == "int8":
                scores, ids = fused_scan_topk_int8(
                    q, self._vectors, self._scales, jnp.int32(self._n),
                    k=k_eff, bn=pick_bn(length),
                )
            elif scan == "int8_2":
                scores, ids = fused_scan2_topk_int8(
                    q, self._vectors, self._scales, jnp.int32(self._n),
                    k=k_eff,
                )
            elif scan == "fused":
                scores, ids = fused_scan_topk(
                    q, self._vectors, jnp.int32(self._n), k=k_eff,
                    bn=pick_bn(length),
                )
            elif scan == "fused2":
                scores, ids = fused_scan2_topk(
                    q, self._vectors, jnp.int32(self._n), k=k_eff,
                )
            elif scan == "dequant":
                if self.rerank:
                    deq = _dequantize2(self._vectors, self._scales,
                                       self._residual, self._rscales)
                else:
                    deq = _dequantize(self._vectors, self._scales)
                scores, ids = flat_topk(
                    q, deq, jnp.int32(self._n), k=k_eff,
                    block_n=block, exact=False,
                )
            else:
                scores, ids = flat_topk(
                    q, self._vectors, jnp.int32(self._n), k=k_eff,
                    block_n=block, exact=self.exact,
                )
            dispatch.program("index_scan")
        out = np.asarray(scores), np.asarray(ids)
        dispatch.sync("index_scan")
        return out

    def _use_fused(self, length: int, k: int) -> bool:
        if self.exact or self.scan_impl == "blocked":
            return False
        if not self._int8 and self._vectors.dtype != jnp.bfloat16:
            return False
        try:
            platform = next(iter(self._vectors.devices())).platform
        except Exception:  # noqa: BLE001
            platform = jax.default_backend()
        if platform != "tpu":
            return False
        bn = pick_bn(length)
        # Need >> k bins for the bin-top-1 approximation to hold recall.
        return bn >= 128 and length // 128 >= 16 * k

    def search(
        self, query_emb: np.ndarray, k: int = 3
    ) -> List[Tuple[Dict[str, Any], float]]:
        """Reference-contract search: [(source_dict, score)] (app/main.py:347-373)."""
        if np.asarray(query_emb).size == 0 or self._n == 0:
            return []
        scores, ids = self.search_ids(np.asarray(query_emb), k)
        out: List[Tuple[Dict[str, Any], float]] = []
        for score, idx in zip(scores[0], ids[0]):
            if idx < 0:
                continue
            out.append((self.metas[int(idx)], float(score)))
        return out
