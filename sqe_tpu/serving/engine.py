"""The RAG engine: one pipeline, two transports.

Unifies the reference's duplicated /ask and /ws/ask pipelines
(app/main.py:467-548 vs :650-735 — SURVEY.md §3.3) into a single flow:

    embed query (on-device forward)
    -> semantic-cache probe (device matmul; hit ends the request)
    -> index search (flat exact or HNSW beam search, optionally sharded)
    -> context merge + prompt build
    -> generation backend (non-streaming or streaming)
    -> chat memory save + cache fill

Differences from the reference are deliberate fixes, not drift:
- chat memory works (B1: the reference crashed on an uninitialized store);
- both transports share retrieval/prompt code (the reference copy-pasted);
- cache hits also bump LFU frequency on the streaming path.

Namespaces give multi-tenant isolation: the default namespace holds the main
corpus; ``/upload_text`` ingests into per-user namespaces, mirroring the
reference's per-user OpenSearch indices (embedding_gen.py:83-122).
"""

from __future__ import annotations

import asyncio
import os
from typing import Any, AsyncGenerator, Dict, List, Optional, Tuple

import numpy as np

from sqe_tpu.cache import DeviceLFUCache
from sqe_tpu.config import EngineConfig
from sqe_tpu.data.corpus import Chunk, chunk_document, load_corpus
from sqe_tpu.index import FlatIndex, HNSWIndex
from sqe_tpu.models import Embedder
from sqe_tpu.serving.generation import EchoBackend, GenerationBackend
from sqe_tpu.serving.memory import ChatMemoryStore
from sqe_tpu.serving.prompts import SYSTEM_MESSAGE, build_prompt, merge_context, render_context
from sqe_tpu.utils import Metrics, StageTimer
from sqe_tpu.utils import checkpoint as ckpt
from sqe_tpu.utils.logging import get_logger

log = get_logger("serving.engine")

DEFAULT_NAMESPACE = "default"


class RAGEngine:
    def __init__(
        self,
        cfg: Optional[EngineConfig] = None,
        embedder: Optional[Embedder] = None,
        index: Optional[Any] = None,
        cache: Optional[DeviceLFUCache] = None,
        backend: Optional[GenerationBackend] = None,
        stream_backend: Optional[GenerationBackend] = None,
        device: Optional[Any] = None,
        batching: bool = False,
        mesh: Optional[Any] = None,
    ):
        self.cfg = cfg or EngineConfig()
        self.device = device
        # Multi-chip serving: a mesh (or cfg.mesh_shape) shards the index
        # across devices; per-shard search + all-gather top-k merge
        # (parallel/sharded_index.py). Embedder/cache stay replicated-free on
        # the default device (queries are small; the index is the big state).
        if mesh is None and self.cfg.mesh_shape:
            from sqe_tpu.parallel import make_mesh

            shape = self.cfg.mesh_shape
            if isinstance(shape, int):  # e.g. --mesh_shape=8 from the CLI
                shape = (shape,)
            mesh = make_mesh(tuple(shape), ("shard",))
        self.mesh = mesh
        self.embedder = embedder or Embedder(self.cfg.model, device=device)
        if index is None:
            index = self._new_index()
        self.indices: Dict[str, Any] = {DEFAULT_NAMESPACE: index}
        self.cache = cache or DeviceLFUCache(self.cfg.cache, device=device)
        self._wire_cache_bump_journal()
        self.backend: GenerationBackend = backend or EchoBackend()
        self.stream_backend: GenerationBackend = stream_backend or self.backend
        self.memory = ChatMemoryStore(self.cfg.serve.chat_memory_max_turns)
        self.metrics = Metrics()
        self._embed_lock = asyncio.Lock()
        self.batching = batching
        self._batcher = None

    # ------------------------------------------------------------------ index

    def _new_index(self) -> Any:
        if self.mesh is not None:
            from sqe_tpu.parallel import ShardedFlatIndex, ShardedHNSWIndex

            if self.cfg.index_kind in ("flat", "auto"):
                # Sharding already divides N per chip; the per-shard fused
                # scan is the measured winner at every per-chip scale a mesh
                # produces (DESIGN.md §8), so "auto" means flat here.
                import jax as _jax
                import jax.numpy as _jnp

                on_tpu = _jax.default_backend() == "tpu"
                return ShardedFlatIndex(
                    self.mesh, embed_dim=self.cfg.model.embed_dim,
                    vector_dtype=_jnp.bfloat16 if on_tpu else _jnp.float32,
                    # int8_vectors composes with the mesh: int8 + residual
                    # rerank per shard (bf16 memory parity, restored recall;
                    # int8_rerank=False scan-only capacity mode is a
                    # single-device option — sharding already IS the
                    # capacity mode here).
                    storage=("int8_rerank" if self.cfg.int8_vectors
                             else "dense"),
                )
            return ShardedHNSWIndex(
                self.mesh, self.cfg.hnsw, embed_dim=self.cfg.model.embed_dim
            )
        if self.cfg.index_kind == "auto":
            from sqe_tpu.index import AutoIndex

            return AutoIndex(
                self._make_index_of_kind,
                embed_dim=self.cfg.model.embed_dim,
                int8=self.cfg.int8_vectors,
                int8_rerank=self.cfg.int8_rerank,
            )
        return self._make_index_of_kind(self.cfg.index_kind)

    def _make_index_of_kind(self, kind: str) -> Any:
        if kind == "flat":
            import jax as _jax
            import jax.numpy as _jnp

            dev = self.device or _jax.devices()[0]
            on_tpu = dev.platform == "tpu"
            # Serving mode: bf16 storage + native matmul precision on TPU
            # (exact ranking up to sub-1e-3 ties); the oracle mode stays
            # available via FlatIndex(exact=True) directly. int8_vectors
            # opts into quantized storage (DESIGN.md §2b).
            if self.cfg.int8_vectors:
                dtype = _jnp.int8
            elif on_tpu:
                dtype = _jnp.bfloat16
            else:
                dtype = _jnp.float32
            return FlatIndex(
                embed_dim=self.cfg.model.embed_dim,
                device=self.device,
                dtype=dtype,
                exact=not on_tpu and not self.cfg.int8_vectors,
                rerank=(self.cfg.int8_rerank if self.cfg.int8_vectors
                        else None),
            )
        if kind == "ivf":
            from sqe_tpu.index import IVFIndex

            return IVFIndex(
                embed_dim=self.cfg.model.embed_dim, device=self.device
            )
        return HNSWIndex(
            self.cfg.hnsw, embed_dim=self.cfg.model.embed_dim, device=self.device
        )

    @property
    def index(self) -> Any:
        return self.indices[DEFAULT_NAMESPACE]

    def get_index(self, namespace: str = DEFAULT_NAMESPACE, create: bool = False) -> Any:
        idx = self.indices.get(namespace)
        if idx is None and create:
            idx = self._new_index()
            self.indices[namespace] = idx
        return idx

    # ------------------------------------------------------------ corpus build

    def build_from_corpus(
        self,
        corpus_dir: Optional[str] = None,
        limit_files: Optional[int] = None,
        prefix: str = "PMC",
    ) -> int:
        """Chunk + embed + index the corpus (reference
        build_embeddings_from_scratch, app/main.py:413-456). Skips when the
        index already has data (app/main.py:422-424)."""
        if self.index.has_any_data():
            log.info("index already has data; skipping corpus build")
            return len(self.index)
        corpus_dir = corpus_dir or self.cfg.corpus_dir
        if not os.path.isdir(corpus_dir):
            log.warning("corpus dir %s missing; nothing to index", corpus_dir)
            return 0
        chunks = load_corpus(corpus_dir, self.cfg.chunk_size, prefix=prefix,
                             limit_files=limit_files)
        if not chunks:
            log.warning("no text found in %s", corpus_dir)
            return 0
        return self.ingest_chunks(chunks)

    def ingest_chunks(
        self, chunks: List[Chunk], namespace: str = DEFAULT_NAMESPACE
    ) -> int:
        log.info("embedding %d chunks", len(chunks))
        with self.metrics.time_stage("corpus_embed"):
            embs = self.embedder.embed_texts(
                [c.text for c in chunks], batch_size=self.cfg.batch_size
            )
        idx = self.get_index(namespace, create=True)
        with self.metrics.time_stage("index_build"):
            if hasattr(idx, "build") and not idx.has_any_data():
                idx.build(embs, chunks)
            else:
                idx.add(embs, chunks)
        log.info("indexed %d chunks into namespace %s", len(chunks), namespace)
        return len(chunks)

    def _journal(self) -> Optional[ckpt.IngestJournal]:
        if not self.cfg.checkpoint_dir:
            return None
        if getattr(self, "_journal_obj", None) is None:
            self._journal_obj = ckpt.IngestJournal(self.cfg.checkpoint_dir)
        return self._journal_obj

    def _cache_journal(self) -> Optional[ckpt.CacheJournal]:
        if not self.cfg.checkpoint_dir:
            return None
        if getattr(self, "_cache_journal_obj", None) is None:
            self._cache_journal_obj = ckpt.CacheJournal(self.cfg.checkpoint_dir)
        return self._cache_journal_obj

    def _wire_cache_bump_journal(self) -> None:
        """Journal LFU frequency bumps so a restart reproduces the exact
        eviction order (Redis kept frequencies durable, app/main.py:92-96;
        the snapshot alone forgot bumps since the last checkpoint)."""
        if not self.cfg.checkpoint_dir:
            return
        cj = self._cache_journal()
        if cj is not None:
            self.cache.on_bump = cj.append_bumps

    def _cache_put(self, query_emb: np.ndarray, answer: str) -> None:
        """Cache an answer and journal it for restart parity (the reference's
        Redis kept cached answers durable across restarts, app/main.py:53-128;
        the checkpoint snapshot alone would forget puts since the last save)."""
        self.cache.put(query_emb, answer)
        cj = self._cache_journal()
        if cj is not None:
            cj.append(np.asarray(query_emb, np.float32).reshape(-1), answer,
                      model_fp=self._model_fingerprint())

    def replay_cache_journal(self) -> int:
        """Re-apply journaled cache puts on top of the restored snapshot.

        Runs on EVERY load path — including a failed/absent index checkpoint
        (a corpus rebuild follows, and the save at its end compacts the
        journal; skipping replay there would silently destroy the fsync'd
        answers the journal exists to preserve). Entries are filtered by the
        embedder fingerprint: cache keys from a different model's geometry
        would match nonsense queries."""
        cj = self._cache_journal()
        if cj is None:
            return 0
        fp = self._model_fingerprint()
        n = 0
        # Replay must not re-journal: puts/bumps being replayed are already
        # in the file, and duplicating them would double-apply on the NEXT
        # restart. The hook is restored afterwards.
        saved_hook, self.cache.on_bump = self.cache.on_bump, None
        slots_exact = True   # bump records are slot-indexed vs the live run
        try:
            for rec in cj.entries():
                if "bumps" in rec:
                    # Slot-indexed: exact relative to the snapshot + puts
                    # replayed so far. Once any put record has been filtered
                    # out (model change), replayed entries land in DIFFERENT
                    # slots than they occupied live — applying the recorded
                    # slot indices would credit bumps to the wrong entries,
                    # so stop applying them (frequencies degrade to put-order,
                    # never to corruption).
                    if slots_exact:
                        self.cache.apply_bumps(rec["bumps"])
                    continue
                if rec["emb"].shape[0] != self.cfg.model.embed_dim:
                    slots_exact = False   # journaled under another config
                    continue
                if rec.get("fp") is not None and rec["fp"] != fp:
                    slots_exact = False   # journaled under another model
                    continue
                self.cache.put(rec["emb"], rec["response"])
                n += 1
        finally:
            self.cache.on_bump = saved_hook
        if n:
            log.info("replayed %d journaled cache entries", n)
        return n

    def ingest_document(
        self,
        doc_id: str,
        text: str,
        namespace: str = DEFAULT_NAMESPACE,
        journal: bool = True,
    ) -> int:
        """Chunk + embed + index one document (the /upload_text path,
        embedding_gen.py:374-407). With a checkpoint dir configured the
        document is journaled (write-ahead, fsync) before any device work, so
        a crash mid-ingest loses nothing: startup replays the journal."""
        chunks = chunk_document(doc_id, text, self.cfg.chunk_size)
        if not chunks:
            return 0
        jr = self._journal() if journal else None
        if jr is not None:
            jr.append(namespace, doc_id, text)
        embs = self.embedder.embed_texts(
            [c.text for c in chunks], batch_size=self.cfg.batch_size
        )
        idx = self.get_index(namespace, create=True)
        idx.add(embs, chunks)
        return len(chunks)

    def replay_journal(self) -> int:
        """Re-ingest journaled documents missing from the restored indices
        (crash recovery). Returns the number of documents replayed."""
        jr = self._journal()
        if jr is None:
            return 0
        replayed = 0
        for rec in jr.entries():
            ns = rec.get("namespace", DEFAULT_NAMESPACE)
            idx = self.get_index(ns)
            if idx is not None and any(
                m.get("doc_id") == rec["doc_id"] for m in idx.metas
            ):
                continue
            self.ingest_document(rec["doc_id"], rec["text"], namespace=ns,
                                 journal=False)
            replayed += 1
        if replayed:
            log.info("replayed %d journaled documents", replayed)
        return replayed

    # ------------------------------------------------------------- checkpoints

    def _model_fingerprint(self) -> str:
        from sqe_tpu.models.embedder import params_fingerprint

        if getattr(self, "_model_fp", None) is None:
            self._model_fp = params_fingerprint(self.embedder.params)
        return self._model_fp

    def _save_one_index(self, idx: Any, path: str) -> None:
        graph = getattr(idx, "_graph_host", None)
        levels = getattr(idx, "_levels_host", None)
        vectors = (
            idx._vectors_host if graph is not None else np.asarray(idx.valid_vectors())
        )
        ckpt.save_index(
            path, vectors, idx.metas, graph=graph, levels=levels,
            extra={"index_kind": self.cfg.index_kind,
                   "model_fp": self._model_fingerprint()},
        )

    def _restore_one_index(self, state: dict) -> Any:
        idx = self._new_index()
        if "graph" in state and hasattr(idx, "_graph_host"):
            idx._vectors_host = state["vectors"]
            idx._graph_host = state["graph"]
            idx._levels_host = state.get("levels")
            idx.metas = state["metas"]
            idx._refresh_device()
        else:
            idx.add(state["vectors"], state["metas"])
        return idx

    def save_checkpoint(self, path: Optional[str] = None) -> None:
        """Persist ALL namespaces: the default corpus index at the checkpoint
        root (round-1 layout, unchanged) and each per-user namespace under
        ``namespaces/<ns>/`` — so documents ingested via /upload_text survive
        a restart (the reference kept per-user indices durable inside
        OpenSearch, embedding_gen.py:83-122)."""
        path = path or self.cfg.checkpoint_dir
        assert path, "no checkpoint dir configured"
        import dataclasses as _dc

        from sqe_tpu.data.tokenizer import tokenizer_to_dict

        ckpt.save_model(
            path, self.embedder.params, _dc.asdict(self.cfg.model),
            tokenizer_state=tokenizer_to_dict(self.embedder.tokenizer),
        )
        self._save_one_index(self.index, path)
        for ns, idx in self.indices.items():
            if ns == DEFAULT_NAMESPACE or idx is None or not idx.has_any_data():
                continue
            self._save_one_index(idx, os.path.join(path, "namespaces", ns))
        ckpt.save_cache(path, self.cache.snapshot())
        if path == self.cfg.checkpoint_dir:
            jr = self._journal()
            if jr is not None:
                jr.compact()   # everything journaled is now durably saved
            cj = self._cache_journal()
            if cj is not None:
                cj.compact()   # cache snapshot covers every journaled put
        log.info("checkpoint saved to %s (%d namespaces)", path, len(self.indices))

    def save_namespace(self, namespace: str, path: Optional[str] = None) -> None:
        """Persist one namespace's index (cheap: O(namespace), not O(corpus)).
        The upload route calls this after each successful ingest so uploaded
        documents are durable without rewriting the main corpus index."""
        path = path or self.cfg.checkpoint_dir
        if not path or namespace == DEFAULT_NAMESPACE:
            return
        idx = self.indices.get(namespace)
        if idx is None or not idx.has_any_data():
            return
        self._save_one_index(idx, os.path.join(path, "namespaces", namespace))
        log.info("namespace %s checkpointed (%d vectors)", namespace, len(idx))

    def load_model_checkpoint(self, path: Optional[str] = None) -> bool:
        """Restore a trained embedder (params + tokenizer) from a checkpoint —
        the deploy path for train/fit.py output. Returns True if a model was
        loaded."""
        path = path or self.cfg.checkpoint_dir
        if not path:
            return False
        model = ckpt.load_model(path)
        if model is None:
            return False
        from sqe_tpu.config import ModelConfig
        from sqe_tpu.data.tokenizer import tokenizer_from_dict
        from sqe_tpu.models.embedder import params_from_leaves

        mcfg = ModelConfig(**model["model_cfg"])
        params = params_from_leaves(mcfg, model["leaves"])
        tokenizer = tokenizer_from_dict(
            model["tokenizer_state"], mcfg.vocab_size, mcfg.max_len
        )
        self.embedder = Embedder(
            mcfg, params=params, device=self.device, tokenizer=tokenizer
        )
        if mcfg != self.cfg.model:
            # The checkpointed model wins: downstream dims (index, cache)
            # must follow it, so serve needs no matching --model.* flags.
            import dataclasses as _dc

            self.cfg = self.cfg.with_overrides(
                model=mcfg,
                cache=_dc.replace(self.cfg.cache, embed_dim=mcfg.embed_dim),
            )
            if self.cache.cfg.embed_dim != mcfg.embed_dim:
                self.cache = DeviceLFUCache(self.cfg.cache, device=self.device)
                self._wire_cache_bump_journal()
            if not self.index.has_any_data():
                self.indices[DEFAULT_NAMESPACE] = self._new_index()
        self._model_fp = None
        self._batcher = None   # rebind to the new embedder
        log.info("model checkpoint loaded from %s (fp %s)",
                 path, self._model_fingerprint())
        return True

    def load_checkpoint(self, path: Optional[str] = None) -> bool:
        path = path or self.cfg.checkpoint_dir
        if not path:
            return False
        ok = self._load_checkpoint_inner(path)
        if path == self.cfg.checkpoint_dir:
            # Even when the index load failed (missing/corrupt snapshot or
            # model mismatch -> corpus rebuild follows, and save_checkpoint
            # will compact the journal), journaled cache answers matching
            # the current model must survive into the new cache.
            self.replay_cache_journal()
        return ok

    def _load_checkpoint_inner(self, path: str) -> bool:
        self.load_model_checkpoint(path)
        state = ckpt.load_index(path)
        if state is None:
            return False
        saved_fp = state["manifest"].get("model_fp")
        if saved_fp is not None and saved_fp != self._model_fingerprint():
            # Vectors were embedded by a different model: serving them against
            # this embedder's query vectors would give garbage similarities.
            # Report no-index so the caller re-embeds the corpus.
            log.warning(
                "index checkpoint was built by model %s but current model is "
                "%s; discarding index (corpus will be re-embedded)",
                saved_fp, self._model_fingerprint(),
            )
            return False
        idx = self._restore_one_index(state)
        self.indices[DEFAULT_NAMESPACE] = idx
        ns_root = os.path.join(path, "namespaces")
        if os.path.isdir(ns_root):
            for ns in sorted(os.listdir(ns_root)):
                ns_state = ckpt.load_index(os.path.join(ns_root, ns))
                if ns_state is not None:
                    self.indices[ns] = self._restore_one_index(ns_state)
        cache_state = ckpt.load_cache(path)
        if cache_state is not None:
            self.cache.restore(cache_state)
        log.info(
            "checkpoint loaded from %s (%d vectors, %d namespaces)",
            path, len(idx), len(self.indices),
        )
        return True

    # ---------------------------------------------------------------- pipeline

    async def _embed_query(self, query: str) -> np.ndarray:
        # The device program is serialized behind a lock; the forward itself
        # releases the GIL inside XLA, so to_thread keeps the event loop live.
        async with self._embed_lock:
            return await asyncio.to_thread(self.embedder.embed_query, query)

    def _search(
        self, query_emb: np.ndarray, top_k: int, namespace: str
    ) -> List[Tuple[Dict[str, Any], float]]:
        idx = self.get_index(namespace)
        if idx is None or not idx.has_any_data():
            return []
        return idx.search(query_emb, k=top_k)

    async def _prepare(
        self,
        query: str,
        top_k: int,
        chat_history: str = "",
        namespace: str = DEFAULT_NAMESPACE,
        timer: Optional[StageTimer] = None,
    ) -> Tuple[Optional[str], Optional[np.ndarray], Optional[str]]:
        """Shared front half: embed -> cache probe -> retrieve -> prompt.

        Returns (cached_response, query_emb, prompt). If cached_response is
        not None the request is complete.
        """
        timer = timer or StageTimer(self.metrics)
        if self.batching and namespace == DEFAULT_NAMESPACE:
            # Coalesced path: embed + cache probe + search shared with other
            # concurrent requests (serving/batcher.py).
            with timer.stage("retrieve_batched"):
                res = await self._get_batcher().retrieve(query, top_k)
            if res.cached is not None:
                self.metrics.inc("cache_hits")
                return res.cached, res.query_emb, None
            self.metrics.inc("cache_misses")
            results = res.results
            query_emb = res.query_emb
        else:
            with timer.stage("embed"):
                query_emb = await self._embed_query(query)
            with timer.stage("cache_probe"):
                cached = self.cache.get(query_emb)
            if cached is not None:
                self.metrics.inc("cache_hits")
                return cached, query_emb, None
            self.metrics.inc("cache_misses")
            with timer.stage("search"):
                results = await asyncio.to_thread(
                    self._search, query_emb, top_k, namespace
                )
        context_text = render_context(merge_context(results))
        prompt = build_prompt(query, context_text, chat_history)
        return None, query_emb, prompt

    def _get_batcher(self):
        if self._batcher is None:
            from sqe_tpu.serving.batcher import RetrievalBatcher

            self._batcher = RetrievalBatcher(
                self.embedder, self.cache, self.index,
                top_k=self.cfg.serve.top_k_default,
            )
        return self._batcher

    async def ask(
        self,
        query: str,
        chat_id: Optional[str] = None,
        top_k: Optional[int] = None,
        namespace: str = DEFAULT_NAMESPACE,
    ) -> str:
        """Full non-streaming pipeline (reference RAGModel.ask, app/main.py:467-548)."""
        answer, _meta = await self.ask_with_meta(
            query, chat_id=chat_id, top_k=top_k, namespace=namespace)
        return answer

    async def ask_with_meta(
        self,
        query: str,
        chat_id: Optional[str] = None,
        top_k: Optional[int] = None,
        namespace: str = DEFAULT_NAMESPACE,
    ) -> Tuple[str, dict]:
        """``ask`` plus per-answer generation metadata. Backends that
        report it (TPUDecoderBackend.generate_with_meta) contribute e.g.
        ``forced_citation`` — the answer's citation was imposed by the
        grammar tail, not produced by the model — so /ask consumers can
        tell attribution quality apart (round-4 advisor finding). Cache
        hits and backends without metadata return ``{}``."""
        if not query.strip():
            return "[ERROR] Empty query.", {}
        top_k = top_k or self.cfg.serve.top_k_default
        timer = StageTimer(self.metrics)
        self.metrics.inc("queries")

        memory = self.memory.get(chat_id) if chat_id else None
        chat_history = memory.buffer_as_str if memory else ""

        cached, query_emb, prompt = await self._prepare(
            query, top_k, chat_history, namespace, timer
        )
        if cached is not None:
            return cached, {}

        gen_meta: dict = {}
        with timer.stage("generate"):
            if hasattr(self.backend, "generate_with_meta"):
                answer, gen_meta = await self.backend.generate_with_meta(
                    prompt, SYSTEM_MESSAGE)
            else:
                answer = await self.backend.generate(prompt, SYSTEM_MESSAGE)
        if not answer:
            return "Error: No response was generated. Please try later!", {}

        if memory is not None:
            memory.save_context(query, answer)
        self._cache_put(query_emb, answer)
        return answer, gen_meta

    async def ask_stream(
        self,
        query: str,
        top_k: Optional[int] = None,
        namespace: str = DEFAULT_NAMESPACE,
        chat_id: Optional[str] = None,
    ) -> AsyncGenerator[str, None]:
        """Streaming pipeline (reference WS path, app/main.py:650-735): yields
        chunks; a cache hit yields the full cached answer as one chunk; the
        completed answer is cached after the stream ends. Chat memory is
        opt-in via ``chat_id`` (the reference's WS path had none — B6)."""
        if not query.strip():
            yield "[ERROR] Empty query."
            return
        top_k = top_k or self.cfg.serve.top_k_default
        timer = StageTimer(self.metrics)
        self.metrics.inc("queries")

        memory = self.memory.get(chat_id) if chat_id else None
        chat_history = memory.buffer_as_str if memory else ""

        cached, query_emb, prompt = await self._prepare(
            query, top_k, chat_history, namespace, timer
        )
        if cached is not None:
            yield cached
            return

        chunks: List[str] = []
        with timer.stage("generate"):
            async for chunk in self.stream_backend.stream(prompt, SYSTEM_MESSAGE):
                chunks.append(chunk)
                yield chunk
        final = "".join(chunks)
        if final.strip() and not final.startswith("[ERROR]"):
            if memory is not None:
                memory.save_context(query, final)
            self._cache_put(query_emb, final)

    def stats(self) -> dict:
        out = self.metrics.summary()
        out["index"] = {
            ns: len(idx) for ns, idx in self.indices.items()
        }
        # With index_kind="auto" the router's actual choice is the useful fact.
        out["index_kind"] = getattr(self.index, "kind", None) or self.cfg.index_kind
        out["cache"] = {
            "size": len(self.cache),
            "hits": self.cache.hits,
            "misses": self.cache.misses,
        }
        if self._batcher is not None:
            out["batcher"] = {
                "requests": self._batcher.requests,
                "device_batches": self._batcher.batches,
                "fused": self._batcher._fused is not None,
            }
        # On-chip generation micro-batcher (serving/generation.py
        # TPUDecoderBackend): how well concurrent decodes coalesced.
        gen = self.backend
        if hasattr(gen, "batches") and hasattr(gen, "requests"):
            out["decode_batcher"] = {
                "requests": gen.requests,
                "device_batches": gen.batches,
                "forced_tails": getattr(gen, "forced_tails", 0),
            }
        return out
