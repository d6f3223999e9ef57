"""Engine serving over a device mesh (sharded index end-to-end)."""

import asyncio

import pytest

from sqe_tpu.config import CacheConfig, EngineConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.engine import RAGEngine


@pytest.fixture(scope="module", params=["flat", "hnsw"])
def engine(request, small_model_cfg, cpu_mesh):
    cfg = EngineConfig(
        model=small_model_cfg,
        cache=CacheConfig(capacity=16, embed_dim=small_model_cfg.embed_dim),
        index_kind=request.param,
    )
    eng = RAGEngine(cfg, mesh=cpu_mesh)
    eng.ingest_chunks(
        [Chunk(f"PMC{i}.txt", 0, f"trial {i} of drug{i} efficacy") for i in range(32)]
    )
    return eng


def test_sharded_engine_ask(engine):
    answer = asyncio.run(engine.ask("what about drug7", chat_id="c"))
    assert "Document PMC" in answer


def test_sharded_engine_incremental_add(engine):
    before = len(engine.index)
    n = engine.ingest_document(
        "newdoc", "a new study about immunotherapy " * 30
    )
    assert n >= 1
    assert len(engine.index) == before + n
    answer = asyncio.run(engine.ask("immunotherapy study", chat_id="c2"))
    assert answer


def test_sharded_engine_checkpoint(engine, tmp_path):
    path = str(tmp_path / "ckpt")
    engine.save_checkpoint(path)
    eng2 = RAGEngine(engine.cfg, mesh=engine.mesh)
    assert eng2.load_checkpoint(path)
    assert len(eng2.index) == len(engine.index)


def test_sharded_engine_int8_storage(small_model_cfg, cpu_mesh, tmp_path):
    """cfg.int8_vectors over a mesh selects int8_rerank sharded storage
    (quantized planes per shard, DESIGN.md §8d) and the full serve loop —
    ask, incremental ingest, checkpoint roundtrip — still works."""
    cfg = EngineConfig(
        model=small_model_cfg,
        cache=CacheConfig(capacity=16, embed_dim=small_model_cfg.embed_dim),
        index_kind="flat",
        int8_vectors=True,
    )
    eng = RAGEngine(cfg, mesh=cpu_mesh)
    eng.ingest_chunks(
        [Chunk(f"PMC{i}.txt", 0, f"trial {i} of drug{i} efficacy")
         for i in range(32)]
    )
    assert eng.index.storage == "int8_rerank"
    assert eng.index._residual is not None
    answer = asyncio.run(eng.ask("what about drug7", chat_id="c"))
    assert "Document PMC" in answer
    n = eng.ingest_document("newdoc", "a new study about immunotherapy " * 30)
    assert len(eng.index) == 32 + n

    path = str(tmp_path / "ckpt8")
    eng.save_checkpoint(path)
    eng2 = RAGEngine(cfg, mesh=cpu_mesh)
    assert eng2.load_checkpoint(path)
    assert len(eng2.index) == len(eng.index)
    assert eng2.index.storage == "int8_rerank"
