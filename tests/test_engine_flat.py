"""Engine with the default (flat exact scan) index."""

import asyncio

import pytest

from sqe_tpu.config import CacheConfig, EngineConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.serving.engine import RAGEngine


@pytest.fixture(scope="module")
def engine(small_model_cfg, cpu_device):
    cfg = EngineConfig(
        model=small_model_cfg,
        cache=CacheConfig(capacity=16, embed_dim=small_model_cfg.embed_dim),
        index_kind="flat",
    )
    eng = RAGEngine(cfg, device=cpu_device, batching=True)
    eng.ingest_chunks(
        [Chunk(f"PMC{i}.txt", 0, f"paper {i} about enzyme{i}") for i in range(10)]
    )
    return eng


def test_flat_default_ask(engine):
    from sqe_tpu.index import FlatIndex

    assert isinstance(engine.index, FlatIndex)
    answer = asyncio.run(engine.ask("what about enzyme4", chat_id="c"))
    assert "Document PMC" in answer


def test_flat_fused_frontend_used(engine):
    async def main():
        answers = await asyncio.gather(
            *(engine.ask(f"enzyme{i} role", chat_id=f"c{i}") for i in range(4))
        )
        await engine._get_batcher().stop()
        return answers

    answers = asyncio.run(main())
    assert all("Document" in a or "lack the context" in a for a in answers)
    assert engine._get_batcher()._fused is not None


def test_flat_incremental_upload(engine):
    n = engine.ingest_document("up1", "uploaded text about transplants " * 40,
                               namespace="userx")
    assert n >= 1
    assert len(engine.get_index("userx")) == n


def test_engine_ivf_kind(small_engine_cfg, cpu_device):
    """index_kind='ivf' serves end-to-end through the engine."""
    import asyncio

    from sqe_tpu.data.corpus import Chunk
    from sqe_tpu.serving.engine import RAGEngine

    cfg = small_engine_cfg.with_overrides(index_kind="ivf")
    eng = RAGEngine(cfg, device=cpu_device)
    eng.ingest_chunks([
        Chunk(f"PMC{i}.txt", 0, f"medical note {i} about enzyme{i}")
        for i in range(64)
    ])
    answer = asyncio.run(eng.ask("enzyme12", chat_id="c1"))
    assert "Document PMC" in answer
