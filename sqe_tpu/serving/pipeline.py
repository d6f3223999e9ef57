"""Fused retrieval front-end: embed -> cache probe -> search, one device program.

The reference's per-query path crossed four process boundaries (Ollama HTTP,
Redis, OpenSearch HTTP, LLM HTTP — SURVEY.md §3.2). The unfused engine already
collapses that to three device calls; this module collapses it to ONE jitted
program per request batch:

    token ids -> transformer forward -> L2-normed embeddings
              -> cache-key matmul + argmax (hit flags + slots)
              -> HNSW beam search (scores + ids)

Query embeddings never leave the device between stages, and the host pays a
single dispatch per micro-batch. Cache frequency bumps and response lookup
resolve on the host afterwards (strings live host-side), via
``DeviceLFUCache.resolve_external_probe``.

Used by ``RetrievalBatcher`` when engine components are colocated and the
index is a single-device HNSW index.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from sqe_tpu.index.hnsw import hnsw_search_batch
from sqe_tpu.models.embedder import embed_forward
from sqe_tpu.utils import dispatch


def _pack_outputs(emb, hit, slot, scores, out_ids) -> jax.Array:
    """Pack the front half's five outputs into ONE f32 buffer
    [B, D + 2 + 2k] so the host pays a single device->host transfer instead
    of five (each blocking materialization is a ~29 ms tunnel round-trip —
    utils/dispatch.py). Slots (< cache capacity) and row ids (< index size,
    measured ceiling ~4M/chip) are exact in f32 below 2^24."""
    return jnp.concatenate(
        [
            emb.astype(jnp.float32),
            hit[:, None].astype(jnp.float32),
            slot[:, None].astype(jnp.float32),
            scores.astype(jnp.float32),
            out_ids.astype(jnp.float32),
        ],
        axis=1,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "k", "ef", "max_iters", "n_seeds",
                     "expand", "fused_gather"),
)
def retrieval_program(
    params,
    ids: jax.Array,            # [B, L] int32
    mask: jax.Array,           # [B, L] f32
    cache_keys: jax.Array,     # [C, D]
    cache_valid: jax.Array,    # [C] bool
    cache_threshold: jax.Array,
    vectors: jax.Array,
    graph: jax.Array,
    pivots: jax.Array,
    nbr_vecs: Optional[jax.Array],
    nbr_scales: Optional[jax.Array],
    *,
    cfg,
    attn_impl: str,
    k: int,
    ef: int,
    max_iters: int,
    n_seeds: int,
    expand: int,
    fused_gather: bool,
) -> jax.Array:
    """Returns the packed [B, D+2+2k] buffer (see ``_pack_outputs``)."""
    emb = embed_forward(params, ids, mask, cfg=cfg, attn_impl=attn_impl)

    sims = jax.lax.dot_general(
        emb.astype(jnp.float32), cache_keys.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    sims = jnp.where(cache_valid[None, :], sims, -jnp.inf)
    slot = jnp.argmax(sims, axis=1).astype(jnp.int32)
    hit = jnp.max(sims, axis=1) >= cache_threshold

    scores, out_ids = hnsw_search_batch(
        emb, vectors, graph, pivots, nbr_vecs, nbr_scales,
        k=k, ef=ef, max_iters=max_iters, n_seeds=n_seeds, expand=expand,
        fused_gather=fused_gather,
    )
    return _pack_outputs(emb, hit, slot, scores, out_ids)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "k", "block_n", "exact", "scan",
                     "rerank_r"),
)
def retrieval_program_flat(
    params,
    ids: jax.Array,
    mask: jax.Array,
    cache_keys: jax.Array,
    cache_valid: jax.Array,
    cache_threshold: jax.Array,
    vectors: jax.Array,
    scales: Optional[jax.Array],   # [N, 1] f32 per-row scales (int8 storage)
    valid_n: jax.Array,
    residual: Optional[jax.Array] = None,  # [N, D] int8 (rerank plane)
    rscales: Optional[jax.Array] = None,   # [N, 1] f32
    *,
    cfg,
    attn_impl: str,
    k: int,
    block_n: int,
    exact: bool,
    scan: str = "blocked",
    rerank_r: int = 0,
) -> jax.Array:
    """Flat-index variant: embed -> cache probe -> MXU scan.
    Returns the packed [B, D+2+2k] buffer (see ``_pack_outputs``).

    ``scan`` mirrors FlatIndex.search_ids' scorer choice so the fused
    program ranks identically to the index's own search: "int8_rerank"
    (int8 kernel -> top-rerank_r -> exact residual rerank), "fused" (bf16
    Pallas kernel), "int8" (int8 kernel, scales applied in-VMEM),
    "dequant" (int8 storage below the fused kernel's shape floor:
    dequantize + blocked scan — with the residual plane when present),
    "blocked" (XLA blocked scan). The "2"-suffixed variants use the v2
    column-max kernels (ops/fused_scan2.py).
    """
    from sqe_tpu.index.flat import (
        _dequantize2,
        flat_topk,
        int8_scan_rerank_topk,
    )
    from sqe_tpu.ops.fused_scan import (
        fused_scan_topk,
        fused_scan_topk_int8,
        pick_bn,
    )
    from sqe_tpu.ops.fused_scan2 import (
        fused_scan2_topk,
        fused_scan2_topk_int8,
    )

    emb = embed_forward(params, ids, mask, cfg=cfg, attn_impl=attn_impl)
    sims = jax.lax.dot_general(
        emb.astype(jnp.float32), cache_keys.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    sims = jnp.where(cache_valid[None, :], sims, -jnp.inf)
    slot = jnp.argmax(sims, axis=1).astype(jnp.int32)
    hit = jnp.max(sims, axis=1) >= cache_threshold
    if scan in ("int8_rerank", "int8_rerank2"):
        scores, out_ids = int8_scan_rerank_topk(
            emb, vectors, scales, residual, rscales, valid_n,
            k=k, r=rerank_r, bn=pick_bn(vectors.shape[0]),
            scan2=scan.endswith("2"),
        )
    elif scan == "int8":
        scores, out_ids = fused_scan_topk_int8(
            emb, vectors, scales, valid_n, k=k, bn=pick_bn(vectors.shape[0])
        )
    elif scan == "int8_2":
        scores, out_ids = fused_scan2_topk_int8(
            emb, vectors, scales, valid_n, k=k
        )
    elif scan == "fused":
        scores, out_ids = fused_scan_topk(
            emb, vectors, valid_n, k=k, bn=pick_bn(vectors.shape[0])
        )
    elif scan == "fused2":
        scores, out_ids = fused_scan2_topk(emb, vectors, valid_n, k=k)
    elif scan == "dequant":
        if residual is not None:
            deq = _dequantize2(vectors, scales, residual, rscales)
        else:
            deq = vectors.astype(jnp.float32) * scales
        scores, out_ids = flat_topk(emb, deq, valid_n, k=k, block_n=block_n,
                                    exact=False)
    else:
        scores, out_ids = flat_topk(emb, vectors, valid_n, k=k,
                                    block_n=block_n, exact=exact)
    return _pack_outputs(emb, hit, slot, scores, out_ids)


class FusedFrontend:
    """Binds an embedder + cache + flat or HNSW index into one-call retrieval."""

    def __init__(self, embedder, cache, index, k: int = 3,
                 ef: Optional[int] = None, expand: int = 8):
        self.embedder = embedder
        self.cache = cache
        self.index = index
        self.k = k
        self.ef = ef
        self.expand = expand

    def supported(self) -> bool:
        from sqe_tpu.index.flat import FlatIndex
        from sqe_tpu.index.hnsw import HNSWIndex

        return (
            isinstance(self.index, (HNSWIndex, FlatIndex))
            and self.index.has_any_data()
        )

    def retrieve(self, texts, k: Optional[int] = None,
                 n_real: Optional[int] = None):
        """Returns (emb [B, D] np, cached list[str|None], results list[list]).

        One device dispatch for the whole batch front half. ``n_real`` bounds
        the rows that count (the tail may be padding for bucketed compiles);
        padding rows never touch cache counters.
        """
        import numpy as np

        from sqe_tpu.index.flat import FlatIndex

        k = k or self.k
        n_real = len(texts) if n_real is None else n_real
        idx = self.index
        n = len(idx)
        ids, mask = self.embedder.tokenizer.encode_batch(texts)
        # Length-bucket the forward (embeddings are padding-invariant).
        longest = int(mask.sum(axis=1).max())
        full_len = ids.shape[1]
        bucket = next(
            (b for b in self.embedder.LEN_BUCKETS if longest <= b <= full_len),
            full_len,
        )
        ids, mask = ids[:, :bucket], mask[:, :bucket]
        keys, valid, threshold = self.cache.device_arrays()
        if isinstance(idx, FlatIndex):
            # idx.add() donates the live vector buffer; hold the index lock
            # across capture + dispatch so an insert can't delete it
            # mid-dispatch (execution itself is stream-ordered).
            with idx.lock:
                k_eff = min(k, n)
                # The index's own scorer choice — one source of truth.
                scan, block = idx.scan_plan(k_eff)
                packed = retrieval_program_flat(
                    self.embedder.params, ids, mask,
                    keys, valid, threshold,
                    idx._vectors, idx._scales, jnp.int32(n),
                    idx._residual, idx._rscales,
                    cfg=self.embedder.cfg,
                    attn_impl=self.embedder.attn_impl,
                    k=k_eff,
                    block_n=block,
                    exact=idx.exact,
                    scan=scan,
                    rerank_r=idx._rerank_r(k_eff)
                    if scan.startswith("int8_rerank") else 0,
                )
        else:
            from sqe_tpu.index.hnsw import plan_fused_gather

            ef = self.ef or idx.cfg.ef_search
            ef = max(k, min(ef, n))
            expand = max(1, min(self.expand, ef))
            fused_gather = idx._nbr_vecs is not None
            if fused_gather:
                _, m0, d = idx._nbr_vecs.shape
                expand, fused_gather = plan_fused_gather(
                    ids.shape[0], m0, d, idx._nbr_vecs.dtype.itemsize, expand
                )
            k_eff = min(k, n)
            packed = retrieval_program(
                self.embedder.params, ids, mask,
                keys, valid, threshold,
                idx._vectors, idx._graph, idx._pivots,
                idx._nbr_vecs if fused_gather else None,
                idx._nbr_scales if fused_gather else None,
                cfg=self.embedder.cfg,
                attn_impl=self.embedder.attn_impl,
                k=k_eff,
                ef=ef,
                max_iters=ef // expand + 32,
                n_seeds=min(32, ef, n),
                expand=expand,
                fused_gather=fused_gather,
            )
        dispatch.program("fused_front")
        # ONE blocking materialization for the whole front half.
        packed_np = np.asarray(packed)
        dispatch.sync("fused_front")
        d = self.embedder.cfg.embed_dim
        emb_np = packed_np[:n_real, :d]
        hit_np = packed_np[:n_real, d] > 0.5
        slot_np = packed_np[:n_real, d + 1].astype(np.int32)
        cached = self.cache.resolve_external_probe(hit_np, slot_np)
        scores_np = packed_np[:, d + 2 : d + 2 + k_eff]
        ids_np = packed_np[:, d + 2 + k_eff :].astype(np.int32)
        results = []
        for row in range(n_real):
            if cached[row] is not None:
                results.append([])
                continue
            hits = [
                (idx.metas[int(i)], float(s))
                for s, i in zip(scores_np[row], ids_np[row])
                if i >= 0
            ]
            results.append(hits[:k])
        return emb_np, cached, results
