"""Engine router: measured-surface choice + AutoIndex crossover rebuild."""

import asyncio

import numpy as np
import pytest

from sqe_tpu.index import AutoIndex, FlatIndex, IVFIndex, choose_index_kind
from sqe_tpu.index.router import scan_b1_ms, scan_batch_ms


def test_choose_flat_at_config_scales():
    # Every BASELINE config scale stays on the exact scan (DESIGN.md §8).
    for n in (32_717, 100_000, 1_000_000):
        assert choose_index_kind(n) == "flat"
    # config 4: 10M sharded over 8 chips = 1.25M/chip -> still flat.
    assert choose_index_kind(10_000_000, n_devices=8) == "flat"


def test_choose_ivf_past_hbm_budget():
    # 5M bf16 x 1024-d = 10 GB > the 8 GB vector budget -> ivf even with a
    # generous latency budget (HBM is the binding constraint here).
    assert choose_index_kind(5_000_000, scan_budget_ms=1000) == "ivf"
    # int8 WITH the default recall-restoring rerank plane costs bf16-parity
    # bytes — still over budget; the scan-only capacity mode (explicitly
    # accepting its measured sub-0.95 recall) halves bytes/row and fits.
    assert choose_index_kind(5_000_000, int8=True, scan_budget_ms=1000) == "ivf"
    assert choose_index_kind(5_000_000, int8=True, int8_rerank=False,
                             scan_budget_ms=1000) == "flat"
    # ...and sharding divides it below the budget.
    assert choose_index_kind(5_000_000, n_devices=8, scan_budget_ms=1000) == "flat"
    # At 8M/chip both HBM and the default latency contract exclude the scan.
    assert choose_index_kind(8_000_000) == "ivf"


def test_choose_ivf_past_latency_budget():
    # A tight single-query latency contract forces ivf even when HBM fits.
    assert choose_index_kind(1_000_000, scan_budget_ms=5.0) == "ivf"
    assert scan_batch_ms(1_000_000) == pytest.approx(17.7)
    # Measured anchors: B=1 scan at 4M is ~20.6 ms — inside the default
    # 50 ms contract, so at 1024-d the HBM wall binds before latency.
    assert scan_b1_ms(4_194_304) == pytest.approx(20.6, abs=2.0)
    # int8 scan is cheaper per row on both axes.
    assert scan_batch_ms(1_000_000, int8=True) < scan_batch_ms(1_000_000)
    assert scan_b1_ms(4_000_000, int8=True) < scan_b1_ms(4_000_000)


def _make(kind: str):
    if kind == "flat":
        return FlatIndex(embed_dim=32)
    assert kind == "ivf"
    return IVFIndex(embed_dim=32, n_clusters=4, n_probe=4, kmeans_iters=2)


def _rows(n, d=32, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def test_auto_index_picks_flat_and_matches_contract():
    idx = AutoIndex(_make, embed_dim=32)
    assert not idx.has_any_data() and len(idx) == 0
    assert idx.search(_rows(1), k=3) == []
    vecs = _rows(64)
    idx.build(vecs, [{"doc_id": str(i), "text": f"t{i}"} for i in range(64)])
    assert idx.kind == "flat" and isinstance(idx.inner, FlatIndex)
    scores, ids = idx.search_ids(vecs[:4], k=1)
    assert (ids[:, 0] == np.arange(4)).all()
    assert idx.search(vecs[:1], k=2)[0][0]["doc_id"] == "0"


def test_auto_index_crossover_rebuild():
    # Force a tiny crossover so insert growth flips the router's choice.
    idx = AutoIndex(
        _make, embed_dim=32, scan_budget_ms=scan_b1_ms(100, embed_dim=32)
    )
    vecs = _rows(64)
    idx.add(vecs, [{"doc_id": str(i), "text": ""} for i in range(64)])
    assert idx.kind == "flat"
    more = _rows(64, seed=1)
    idx.add(more, [{"doc_id": str(64 + i), "text": ""} for i in range(64)])
    assert idx.kind == "ivf" and isinstance(idx.inner, IVFIndex)
    assert len(idx) == 128
    # Every row survived the rebuild and is still findable.
    _, ids = idx.search_ids(np.concatenate([vecs[:2], more[:2]]), k=1)
    assert set(ids[:, 0].tolist()) == {0, 1, 64, 65}


def test_engine_auto_kind(small_engine_cfg, cpu_device):
    """index_kind='auto' serves end-to-end; stats report the routed kind."""
    from sqe_tpu.data.corpus import Chunk
    from sqe_tpu.serving.engine import RAGEngine

    cfg = small_engine_cfg.with_overrides(index_kind="auto")
    eng = RAGEngine(cfg, device=cpu_device)
    eng.ingest_chunks([
        Chunk(f"PMC{i}.txt", 0, f"medical note {i} about enzyme{i}")
        for i in range(16)
    ])
    assert eng.index.kind == "flat"
    answer = asyncio.run(eng.ask("enzyme3", chat_id="c1"))
    assert "Document PMC" in answer
    assert eng.stats()["index_kind"] == "flat"


def test_auto_index_fused_frontend(small_engine_cfg, cpu_device):
    """The batcher's fused front half binds through the AutoIndex wrapper to
    the concrete engine (index_kind='auto' keeps single-dispatch retrieval)."""
    from sqe_tpu.data.corpus import Chunk
    from sqe_tpu.serving.engine import RAGEngine

    cfg = small_engine_cfg.with_overrides(index_kind="auto")
    eng = RAGEngine(cfg, device=cpu_device, batching=True)
    eng.ingest_chunks([
        Chunk(f"PMC{i}.txt", 0, f"note {i} about receptor{i}")
        for i in range(12)
    ])

    async def main():
        answers = await asyncio.gather(
            *(eng.ask(f"receptor{i} binding", chat_id=f"c{i}") for i in range(3))
        )
        await eng._get_batcher().stop()
        return answers

    answers = asyncio.run(main())
    assert all("Document" in a or "lack the context" in a for a in answers)
    assert eng._get_batcher()._fused is not None
