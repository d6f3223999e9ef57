"""End-to-end engine pipeline with the offline generation backend
(SURVEY.md §4 'integration' — the LLM call is the only stubbed dependency)."""

import asyncio

import numpy as np
import pytest

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.engine import RAGEngine
from sqe_tpu.serving.generation import EchoBackend


@pytest.fixture(scope="module")
def engine(small_engine_cfg, cpu_device):
    eng = RAGEngine(small_engine_cfg, device=cpu_device, backend=EchoBackend())
    chunks = [
        Chunk(f"PMC{i}.txt", 0, f"medical document {i} about organ{i} function")
        for i in range(24)
    ]
    eng.ingest_chunks(chunks)
    return eng


def test_ask_answers_with_citations(engine):
    answer = asyncio.run(engine.ask("tell me about organ3", chat_id="c1"))
    assert "Document PMC" in answer
    assert ".txt" not in answer  # extension-free citation contract


def test_empty_query_guard(engine):
    assert asyncio.run(engine.ask("   ", chat_id="c1")) == "[ERROR] Empty query."


def test_cache_hit_on_repeat(engine):
    q = "a very specific question about organ7"
    first = asyncio.run(engine.ask(q, chat_id="c2"))
    hits_before = engine.cache.hits
    second = asyncio.run(engine.ask(q, chat_id="c2"))
    assert second == first
    assert engine.cache.hits == hits_before + 1


def test_chat_memory_accumulates(engine):
    asyncio.run(engine.ask("unique question alpha zulu", chat_id="mem1"))
    mem = engine.memory.get("mem1")
    assert "unique question alpha zulu" in mem.buffer_as_str


def test_ask_without_chat_id_skips_memory(engine):
    n = len(engine.memory)
    answer = asyncio.run(engine.ask("stateless question bravo"))
    assert answer
    assert len(engine.memory) == n


def test_stream_yields_chunks_and_caches(engine):
    async def collect():
        return [c async for c in engine.ask_stream("streaming question charlie")]

    chunks = asyncio.run(collect())
    assert len(chunks) > 1
    full = "".join(chunks)
    # Stream result is cached: a repeat ask returns the joined answer.
    again = asyncio.run(engine.ask("streaming question charlie", chat_id="x"))
    assert again == full


def test_failed_generation_message(small_engine_cfg, cpu_device):
    class NoneBackend:
        async def generate(self, prompt, system_msg=""):
            return None

        async def stream(self, prompt, system_msg=""):
            yield "[ERROR] nope"

    eng = RAGEngine(small_engine_cfg, device=cpu_device, backend=NoneBackend())
    eng.ingest_chunks([Chunk("PMC0.txt", 0, "text")])
    answer = asyncio.run(eng.ask("q", chat_id="c"))
    assert answer == "Error: No response was generated. Please try later!"


def test_stats_shape(engine):
    stats = engine.stats()
    assert "index" in stats and "cache" in stats and "stages" in stats
    assert stats["index"]["default"] == 24


def test_checkpoint_roundtrip(engine, tmp_path):
    path = str(tmp_path / "ckpt")
    engine.save_checkpoint(path)
    eng2 = RAGEngine(engine.cfg, device=None, backend=EchoBackend())
    assert eng2.load_checkpoint(path)
    assert len(eng2.index) == len(engine.index)
    q = np.asarray(engine.embedder.embed_query("organ5 function"))
    r1 = engine.index.search(q, k=3)
    r2 = eng2.index.search(q, k=3)
    assert [m["doc_id"] for m, _ in r1] == [m["doc_id"] for m, _ in r2]


def test_checkpoint_preserves_namespaces(engine, tmp_path):
    """Documents ingested into per-user namespaces (the /upload_text path)
    must survive a save/load cycle — the reference kept per-user indices
    durable inside OpenSearch (embedding_gen.py:83-122)."""
    path = str(tmp_path / "ckpt_ns")
    engine.ingest_document("usernote_1", "private note about zeta receptor",
                           namespace="u42")
    engine.save_checkpoint(path)
    eng2 = RAGEngine(engine.cfg, device=None, backend=EchoBackend())
    assert eng2.load_checkpoint(path)
    assert "u42" in eng2.indices
    assert len(eng2.get_index("u42")) == len(engine.get_index("u42"))
    answer = asyncio.run(
        eng2.ask("zeta receptor", chat_id="c9", namespace="u42")
    )
    assert "usernote_1" in answer


def test_ask_unknown_namespace_degrades(engine):
    """Querying a namespace with no data returns an answer with no context,
    not an exception (reference empty-index degrade, app/main.py:462-464)."""
    answer = asyncio.run(engine.ask("anything", chat_id="c1", namespace="ghost"))
    assert isinstance(answer, str) and answer


def test_model_checkpoint_roundtrip_and_mismatch(small_engine_cfg, cpu_device,
                                                 tmp_path):
    """save_checkpoint persists the embedder; load_checkpoint restores it and
    rejects an index built by a different model (forcing a re-embed) instead
    of serving mismatched vectors."""
    import jax

    from sqe_tpu.models.embedder import init_embedder_params, params_fingerprint

    path = str(tmp_path / "ckpt_model")
    trained_params = init_embedder_params(
        small_engine_cfg.model, key=jax.random.PRNGKey(123)
    )
    from sqe_tpu.models import Embedder

    eng = RAGEngine(
        small_engine_cfg, device=cpu_device, backend=EchoBackend(),
        embedder=Embedder(small_engine_cfg.model, params=trained_params,
                          attn_impl="xla", device=cpu_device),
    )
    eng.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i} organ{i}") for i in range(8)])
    eng.save_checkpoint(path)

    eng2 = RAGEngine(small_engine_cfg, device=cpu_device, backend=EchoBackend())
    assert eng2.load_checkpoint(path)
    assert params_fingerprint(eng2.embedder.params) == params_fingerprint(trained_params)
    assert len(eng2.index) == 8

    # Corrupt the stored model fingerprint -> index must be rejected.
    import json
    import os

    man = os.path.join(path, "manifest.json")
    with open(man) as f:
        m = json.load(f)
    m["model_fp"] = "deadbeefdeadbeef"
    with open(man, "w") as f:
        json.dump(m, f)
    eng3 = RAGEngine(small_engine_cfg, device=cpu_device, backend=EchoBackend())
    assert not eng3.load_checkpoint(path)   # model loaded, index discarded
    assert params_fingerprint(eng3.embedder.params) == params_fingerprint(trained_params)
    assert len(eng3.index) == 0


def test_ingest_journal_replay_after_crash(small_engine_cfg, cpu_device,
                                           tmp_path):
    """Kill-during-ingest semantics: the journal record lands (fsync) before
    any device work, so a process that died mid-/upload_text is recovered by
    replay_journal() on the next startup."""
    cfg = small_engine_cfg.with_overrides(checkpoint_dir=str(tmp_path / "cj"))
    eng = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    eng.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i}") for i in range(4)])
    eng.save_checkpoint()

    # Simulate the crash window: journal the doc but never index it
    # (equivalent to SIGKILL right after the WAL append).
    eng._journal().append("u5", "crashdoc", "kappa receptor binding study")

    eng2 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    assert eng2.load_checkpoint()
    assert eng2.replay_journal() == 1
    assert any(m["doc_id"] == "crashdoc" for m in eng2.get_index("u5").metas)

    # Replay is idempotent; a full checkpoint compacts the journal.
    assert eng2.replay_journal() == 0
    eng2.save_checkpoint()
    assert eng2._journal().entries() == []
    eng3 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    assert eng3.load_checkpoint()
    assert eng3.replay_journal() == 0
    assert any(m["doc_id"] == "crashdoc" for m in eng3.get_index("u5").metas)


def test_cache_journal_restart_parity(small_engine_cfg, cpu_device, tmp_path):
    """Answers cached between checkpoints survive a restart via the cache
    journal: SIGKILL after an /ask still leaves the cached answer durable."""
    cfg = small_engine_cfg.with_overrides(checkpoint_dir=str(tmp_path / "cc"))
    eng = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    eng.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i} about gene{i}")
                       for i in range(8)])
    eng.save_checkpoint()

    # Two asks AFTER the checkpoint: snapshot alone would forget them.
    q = "what regulates gene3"
    first = asyncio.run(eng.ask(q, chat_id="c1"))
    asyncio.run(eng.ask("tell me about gene5", chat_id="c1"))
    assert len(eng._cache_journal().entries()) == 2

    # "Restart": a fresh engine restores snapshot + replays the journal.
    eng2 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    assert eng2.load_checkpoint()
    assert len(eng2.cache) == 2
    hits_before = eng2.cache.hits
    assert asyncio.run(eng2.ask(q, chat_id="cX")) == first
    assert eng2.cache.hits == hits_before + 1   # served from cache, no misses

    # A full checkpoint compacts the journal; entries stay in the snapshot.
    eng2.save_checkpoint()
    assert eng2._cache_journal().entries() == []
    eng3 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    assert eng3.load_checkpoint()
    assert len(eng3.cache) == 2


def test_lfu_bump_journal_eviction_order_parity(small_engine_cfg, cpu_device,
                                                tmp_path):
    """LFU bumps between checkpoints are journaled (batched fsync), so a
    killed-and-restarted cache reproduces the EXACT eviction order the
    original would have used — the reference's Redis kept frequencies
    durable (app/main.py:92-96); ROADMAP r02 #5."""
    from sqe_tpu.config import CacheConfig

    d = small_engine_cfg.model.embed_dim
    cfg = small_engine_cfg.with_overrides(
        checkpoint_dir=str(tmp_path / "cb"),
        cache=CacheConfig(capacity=3, embed_dim=d),
    )
    eng = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    keys = np.eye(4, d, dtype=np.float32)     # orthogonal -> no cross hits
    for i in range(3):                        # fill the cache
        eng._cache_put(keys[i], f"answer {i}")
    # Bumps AFTER the last put: only the journal can know about them.
    assert eng.cache.get(keys[0]) == "answer 0"
    assert eng.cache.get(keys[2]) == "answer 2"
    assert eng.cache.get(keys[2]) == "answer 2"

    # Crash + restart (no snapshot was ever written -> journal-only replay).
    eng2 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    eng2.load_checkpoint()
    np.testing.assert_array_equal(
        np.asarray(eng2.cache._freqs), np.asarray(eng.cache._freqs)
    )

    # The next insert must evict the same least-frequent slot in both
    # (slot 1: freq 1 vs bumped slots 0 and 2).
    eng._cache_put(keys[3], "answer 3")
    eng2._cache_put(keys[3], "answer 3")
    assert eng.cache._responses == eng2.cache._responses
    assert eng.cache.get(keys[1]) is None
    assert eng2.cache.get(keys[1]) is None
    assert eng2.cache.get(keys[3]) == "answer 3"


def test_cache_snapshot_isolated_from_later_bumps(small_engine_cfg,
                                                  cpu_device):
    """snapshot() must COPY the host freqs: a hit landing between snapshot
    and the checkpoint write would otherwise bake its bump into the snapshot
    while the bump's journal record survives — double-applied on restore."""
    eng = RAGEngine(small_engine_cfg, device=cpu_device, backend=EchoBackend())
    d = small_engine_cfg.model.embed_dim
    key = np.eye(1, d, dtype=np.float32)[0]
    eng._cache_put(key, "answer")
    snap = eng.cache.snapshot()
    before = snap["freqs"].copy()
    assert eng.cache.get(key) == "answer"     # bump after the snapshot
    np.testing.assert_array_equal(snap["freqs"], before)


def test_bump_replay_skipped_after_filtered_put(small_engine_cfg, cpu_device,
                                                tmp_path):
    """Slot-indexed bump records are only exact while every journaled put
    replays; once a put is filtered (model fingerprint change) the slots
    diverge, and applying recorded indices would credit bumps to the WRONG
    entries. Replay must stop applying bumps at that point."""
    cfg = small_engine_cfg.with_overrides(checkpoint_dir=str(tmp_path / "cf"))
    eng = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    d = cfg.model.embed_dim
    keys = np.eye(2, d, dtype=np.float32)
    cj = eng._cache_journal()
    # Journal: put (STALE fp) -> put (current fp) -> bumps for live slot 1.
    cj.append(keys[0], "stale-model answer", model_fp="other-model")
    cj.append(keys[1], "current answer", model_fp=eng._model_fingerprint())
    cj.append_bumps({1: 5})

    eng2 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    eng2.load_checkpoint()
    # The surviving put replays into slot 0; the {1: 5} bump belonged to it
    # live but must NOT be applied (slot 1 is empty now).
    assert eng2.cache._responses[0] == "current answer"
    assert int(eng2.cache._freqs[0]) == 1
    assert int(eng2.cache._freqs[1]) == 0


def test_build_index_cli_uses_trained_model(small_engine_cfg, cpu_device,
                                            tmp_path, monkeypatch):
    """`python -m sqe_tpu build-index` must embed with the checkpointed
    (trained) model, not random-init params — otherwise the serve-time
    fingerprint check discards the index and re-embeds the corpus."""
    import json
    import os

    from sqe_tpu.__main__ import main as cli_main

    ckpt = tmp_path / "ck"
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    (corpus / "PMC1.txt").write_text("alpha beta gamma " * 40)

    # "Trained" model = save params under the checkpoint dir (as `fit` does).
    cfg = small_engine_cfg.with_overrides(checkpoint_dir=str(ckpt),
                                          corpus_dir=str(corpus))
    eng = RAGEngine(cfg, device=cpu_device)
    import dataclasses

    from sqe_tpu.data.tokenizer import tokenizer_to_dict
    from sqe_tpu.utils import checkpoint as ckpt_mod

    ckpt_mod.save_model(str(ckpt), eng.embedder.params,
                        dataclasses.asdict(cfg.model),
                        tokenizer_state=tokenizer_to_dict(eng.embedder.tokenizer))
    trained_fp = eng._model_fingerprint()

    monkeypatch.setenv("EMB_DIR", str(corpus))
    monkeypatch.setenv("SQE_CHECKPOINT_DIR", str(ckpt))
    monkeypatch.setenv("EMBED_DIM", str(cfg.model.embed_dim))
    cli_main(["build-index",
              f"--corpus_dir={corpus}", f"--checkpoint_dir={ckpt}",
              f"--model.d_model={cfg.model.d_model}",
              f"--model.n_layers={cfg.model.n_layers}",
              f"--model.n_heads={cfg.model.n_heads}",
              f"--model.d_ff={cfg.model.d_ff}",
              f"--model.max_len={cfg.model.max_len}",
              f"--model.vocab_size={cfg.model.vocab_size}",
              f"--model.embed_dim={cfg.model.embed_dim}"])
    manifest = json.loads((ckpt / "manifest.json").read_text())
    assert manifest["model_fp"] == trained_fp

    # And a serve-style load accepts it (no fingerprint discard).
    eng2 = RAGEngine(cfg, device=cpu_device)
    assert eng2.load_checkpoint()
    assert len(eng2.index) > 0


def test_cache_journal_survives_failed_index_load(small_engine_cfg,
                                                  cpu_device, tmp_path):
    """A missing/corrupt index checkpoint must NOT void the cache journal:
    the rebuild path replays matching entries before its save compacts the
    journal (the fsync'd answers are the journal's whole point)."""
    import os

    cfg = small_engine_cfg.with_overrides(checkpoint_dir=str(tmp_path / "cx"))
    eng = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    eng.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i} about path{i}")
                       for i in range(8)])
    eng.save_checkpoint()
    q = "what is path3"
    first = asyncio.run(eng.ask(q, chat_id="c1"))
    assert len(eng._cache_journal().entries()) == 1

    # Simulate index-checkpoint corruption: delete the snapshot files.
    os.remove(tmp_path / "cx" / "index.npz")
    os.remove(tmp_path / "cx" / "manifest.json")

    eng2 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    assert not eng2.load_checkpoint()      # index gone -> rebuild needed
    assert len(eng2.cache) == 1            # ...but the journal replayed
    eng2.ingest_chunks([Chunk(f"PMC{i}.txt", 0, f"doc {i} about path{i}")
                        for i in range(8)])
    eng2.save_checkpoint()                 # compacts the journal
    assert eng2._cache_journal().entries() == []
    hits = eng2.cache.hits
    assert asyncio.run(eng2.ask(q, chat_id="c9")) == first
    assert eng2.cache.hits == hits + 1

    # Entries journaled under a DIFFERENT model fingerprint are skipped.
    eng2._cache_journal().append(
        np.zeros(cfg.model.embed_dim, np.float32), "stale", model_fp="beef"
    )
    eng3 = RAGEngine(cfg, device=cpu_device, backend=EchoBackend())
    assert eng3.load_checkpoint()
    assert all(r != "stale" for r in eng3.cache.snapshot()["responses"])
