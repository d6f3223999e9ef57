"""Request micro-batching: concurrent queries share device programs.

The reference handled each request independently — every /ask paid its own
Ollama round-trip, Redis scan, and OpenSearch query (app/main.py:467-548).
Here concurrent requests are coalesced: requests arriving within a small
window are embedded in ONE transformer forward, probed against the cache in
ONE matmul, and searched in ONE batched beam search. This is what makes the
B=1024 query-stream throughput of BASELINE.json config 3 reachable from the
serving path, not just from offline benchmarks.

The batcher owns the embed->cache->search front half; generation (per-request,
external) stays outside. Single-writer cache semantics are preserved because
probes happen on the batcher's single flush task.
"""

from __future__ import annotations

import asyncio
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from sqe_tpu.utils.logging import get_logger

log = get_logger("serving.batcher")


@dataclass
class RetrievalResult:
    query_emb: np.ndarray                       # [1, D]
    cached: Optional[str]                       # cache hit -> the response
    results: List[Tuple[Dict[str, Any], float]]  # retrieval hits (miss path)


class RetrievalBatcher:
    """Coalesces embed + cache-probe + search across concurrent requests."""

    def __init__(
        self,
        embedder,
        cache,
        index,
        *,
        max_batch: int = 64,
        flush_ms: float = 3.0,
        top_k: int = 3,
    ):
        self.embedder = embedder
        self.cache = cache
        self.index = index
        self.max_batch = max_batch
        self.flush_ms = flush_ms
        self.top_k = top_k
        self._fused = None
        self._fused_checked = False
        self._fused_index = None
        self._queue: Optional[asyncio.Queue] = None
        self._task: Optional[asyncio.Task] = None
        self._loop = None
        self.batches = 0
        self.requests = 0

    async def start(self) -> None:
        loop = asyncio.get_running_loop()
        if self._task is None or self._loop is not loop:
            # A fresh event loop (e.g. a new asyncio.run) needs a fresh queue:
            # asyncio primitives bind to the loop they were first used on.
            self._queue = asyncio.Queue()
            self._loop = loop
            self._task = asyncio.create_task(self._run())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    def prewarm_sync(self) -> int:
        """Compile the fused front-half for every (batch bucket x length
        bucket) pair before traffic arrives — first requests otherwise pay
        the compiles (observed as multi-second p99 on cold start). Distinct
        length buckets are distinct programs, so warming only empty strings
        (the 64-token bucket) would leave the 128/256/512 buckets cold.
        Returns the number of programs warmed."""
        fused = self._get_fused()
        if fused is None:
            return 0
        sizes = [1]
        while sizes[-1] < self.max_batch:
            sizes.append(sizes[-1] * 2)
        max_len = self.embedder.tokenizer.max_len
        lengths = [b for b in self.embedder.LEN_BUCKETS if b <= max_len] or [max_len]
        warmed = 0
        for lb in lengths:
            # lb-1 words + CLS tokenize to exactly lb tokens -> bucket lb.
            text = " ".join(["warm"] * (lb - 1))
            for bsize in sizes:
                fused.retrieve([text] * bsize, k=self.top_k, n_real=0)
                warmed += 1
        self._prewarmed = True
        return warmed

    async def retrieve(self, query: str, top_k: Optional[int] = None) -> RetrievalResult:
        await self.start()
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self._queue.put((query, top_k or self.top_k, fut))
        return await fut

    async def _run(self) -> None:
        while True:
            first = await self._queue.get()
            batch = [first]
            deadline = asyncio.get_running_loop().time() + self.flush_ms / 1000.0
            while len(batch) < self.max_batch:
                timeout = deadline - asyncio.get_running_loop().time()
                if timeout <= 0:
                    break
                try:
                    batch.append(
                        await asyncio.wait_for(self._queue.get(), timeout=timeout)
                    )
                except asyncio.TimeoutError:
                    break
            try:
                await asyncio.to_thread(self._flush, batch)
            except Exception as exc:  # noqa: BLE001
                log.exception("batch flush failed")
                for _q, _k, fut in batch:
                    if not fut.done():
                        fut.set_exception(exc)

    def _resolve_index(self):
        """Unwrap a router AutoIndex to its materialized engine (the fused
        frontend binds to the concrete engine's device arrays)."""
        inner = getattr(self.index, "inner", None)
        return inner if inner is not None else self.index

    def _get_fused(self):
        """Fused single-dispatch front half (serving/pipeline.py), when the
        index supports it. Re-binds when the concrete engine changes (an
        AutoIndex crossover rebuild swaps the inner index object) and
        re-checks while unbound — a first batch served before the corpus
        ingest must not latch the slow path forever (supported() is False on
        an empty index, but the same index object later has data)."""
        idx = self._resolve_index()
        if (not self._fused_checked or idx is not self._fused_index
                or self._fused is None):
            self._fused_checked = True
            self._fused_index = idx
            self._fused = None
            try:
                from sqe_tpu.serving.pipeline import FusedFrontend

                fe = FusedFrontend(self.embedder, self.cache, idx,
                                   k=self.top_k)
                if fe.supported():
                    self._fused = fe
            except Exception:  # noqa: BLE001 - fall back to the 3-call path
                log.exception("fused frontend unavailable; using unfused path")
        return self._fused

    def _flush(self, batch) -> None:
        texts = [q for q, _k, _f in batch]
        ks = [k for _q, k, _f in batch]
        k_max = max(ks)
        n_real = len(texts)
        # Pad to a power-of-two bucket so device programs compile once per
        # bucket, not once per distinct batch size.
        bucket = 1
        while bucket < n_real:
            bucket *= 2
        bucket = min(bucket, self.max_batch)
        texts = texts + [""] * (max(bucket, n_real) - n_real)
        results: Dict[int, list] = {i: [] for i in range(len(batch))}
        fused = self._get_fused()
        if fused is not None:
            embs, cached, fused_results = fused.retrieve(
                texts, k=k_max, n_real=n_real
            )
            for i in range(len(batch)):
                results[i] = fused_results[i][: ks[i]]
        else:
            embs = self.embedder.embed_texts(texts, batch_size=max(len(texts), 1))
            embs = embs[:n_real]
            cached = self.cache.get_batch(embs)
            miss_rows = [i for i, c in enumerate(cached) if c is None]
            if miss_rows and self.index is not None and self.index.has_any_data():
                scores, ids = self.index.search_ids(embs[miss_rows], k_max)
                for row, i in enumerate(miss_rows):
                    hits = []
                    for s, idx_id in zip(scores[row], ids[row]):
                        if idx_id < 0:
                            continue
                        hits.append((self.index.metas[int(idx_id)], float(s)))
                    results[i] = hits[: ks[i]]
        self.batches += 1
        self.requests += len(batch)
        loop = None
        for i, (_q, _k, fut) in enumerate(batch):
            res = RetrievalResult(
                query_emb=embs[i : i + 1],
                cached=cached[i],
                results=results[i],
            )
            if loop is None:
                loop = fut.get_loop()
            loop.call_soon_threadsafe(
                lambda f=fut, r=res: (not f.done()) and f.set_result(r)
            )
