"""Engine router: pick the retrieval engine from the measured operating surface.

The reference hard-wires one ANN engine (OpenSearch nmslib HNSW,
app/main.py:263-281).  On TPU the measured picture (DESIGN.md §8, all engines
benchmarked in one session at 131k and 1M x 1024-d) is inverted: the fused
Pallas exact scan runs at the raw-matmul bound and beats every ANN engine at
every operating point we can hold on one chip — its cost is linear in corpus
bytes, so the only regimes where an ANN engine earns its recall loss are
(a) corpora too big for the chip's HBM and (b) corpora so large that the
linear scan exceeds the latency budget even though it still fits.

``choose_index_kind`` encodes exactly that surface:

- **flat** while the per-device corpus fits the HBM budget and the projected
  single-query scan latency meets the serve contract.  Measured anchors
  (DESIGN.md §8/§8c): B=1024 batches cost ~17.7 ms/M rows; B=1 latency is
  ~4.2 ms + 4.1 ms/M rows (bf16) — 20.6 ms at 4M, still inside the <50 ms
  contract, so at 1024-d the HBM wall arrives before the latency wall.
- **ivf** beyond that: probed-bytes search scales with ~n_probe/C of the
  corpus rather than N (DESIGN.md §8b).  Measured at 131k/1M/2M, IVF lost
  to the fused scans at every recall-matched operating point, so the router
  only sends traffic there when the scan cannot hold the latency contract
  or the corpus exceeds the per-device HBM budget (where it is best-effort:
  the real beyond-HBM answers are mesh sharding or int8 storage).
- **hnsw** is never auto-selected: it is contract parity with the reference's
  engine, measured 3-30x behind the scans on TPU (DESIGN.md §8).

``AutoIndex`` defers the choice until the first build/insert (when N is
known), keeps re-evaluating as inserts grow the corpus, and rebuilds into the
recommended engine when the surface says so (vectors are retained host-side
by every engine, so a rebuild needs no re-embedding).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from sqe_tpu.utils.logging import get_logger

log = get_logger("index.router")

# Measured fused-scan anchors (DESIGN.md §8/§8c, one v5e chip, 1024-d):
# B=1024 batch: 17.7 ms at 1M, 34.6 at 2M, 63.6 at 4M (bf16) — linear in N.
FUSED_SCAN_MS_PER_MROW_B1024 = 17.7
# int8 kernel: 13.8 / 25.7 / 45.0 ms at the same points.
INT8_SCAN_MS_PER_MROW_B1024 = 13.8
# B=1 device latency: ~3.9 ms at 131k, 13.0 at 2M, 20.6 at 4M (bf16);
# int8 10.5 at 2M, 15.3 at 4M. Linear fit: base + slope * Mrow.
SCAN_B1_BASE_MS, SCAN_B1_MS_PER_MROW = 4.2, 4.1
INT8_B1_BASE_MS, INT8_B1_MS_PER_MROW = 4.2, 2.8
# Per-device HBM budget for resident corpus vectors: v5e has 16 GB; leave
# headroom for the embedder, cache, score tiles and XLA workspace.
HBM_VECTOR_BUDGET_BYTES = 8 << 30


def scan_batch_ms(n_rows: int, *, embed_dim: int = 1024,
                  int8: bool = False) -> float:
    """Projected fused-scan latency (ms) for one 1024-query batch, linear
    extrapolation from the measured anchors."""
    per_mrow = INT8_SCAN_MS_PER_MROW_B1024 if int8 else FUSED_SCAN_MS_PER_MROW_B1024
    return (n_rows / 1e6) * per_mrow * (embed_dim / 1024.0)


def scan_b1_ms(n_rows: int, *, embed_dim: int = 1024,
               int8: bool = False) -> float:
    """Projected single-query scan latency (ms) — the serve-contract number
    (a request retrieves once; batch throughput is a different axis)."""
    base, slope = ((INT8_B1_BASE_MS, INT8_B1_MS_PER_MROW) if int8
                   else (SCAN_B1_BASE_MS, SCAN_B1_MS_PER_MROW))
    return base + (n_rows / 1e6) * slope * (embed_dim / 1024.0)


def choose_index_kind(
    n_rows: int,
    *,
    n_devices: int = 1,
    embed_dim: int = 1024,
    int8: bool = False,
    int8_rerank: bool = True,
    scan_budget_ms: float = 50.0,
    hbm_budget_bytes: int = HBM_VECTOR_BUDGET_BYTES,
) -> str:
    """Return "flat" or "ivf" for a corpus of ``n_rows`` over ``n_devices``.

    ``scan_budget_ms`` is the single-query retrieval latency contract
    (default: the BASELINE <50 ms end-to-end serve target — retrieval may
    not spend more than the whole budget).  The exact scan is kept while it
    fits HBM and that contract — which, measured through 4M rows/chip
    (DESIGN.md §8c), it always does: B=1 scan latency is ~20.6 ms at 4M and
    the HBM wall arrives before the latency wall at 1024-d.  Past either
    bound the router moves to IVF, whose probed-bytes search cost stays
    roughly flat in N (note the honest caveat: past the HBM wall no
    single-device layout fits either — the real answer is mesh sharding
    (DESIGN.md §6) or int8 storage; IVF is the best-effort single-device
    fallback and the latency engine if a sub-scan budget is demanded).
    """
    per_dev = -(-n_rows // max(1, n_devices))
    # int8 WITH the recall-restoring residual rerank plane costs 2 bytes/dim
    # (bf16 memory parity); scan-only int8 (the capacity mode that accepts
    # its measured sub-0.95 recall at 1M+) is the only 1-byte/dim layout.
    bytes_per_row = embed_dim * (1 if (int8 and not int8_rerank) else 2)
    if per_dev * bytes_per_row > hbm_budget_bytes:
        log.warning(
            "%d rows/device exceeds the %d GB HBM vector budget; routing to "
            "ivf best-effort — prefer mesh sharding or int8 storage",
            per_dev, hbm_budget_bytes >> 30,
        )
        return "ivf"
    if scan_b1_ms(per_dev, embed_dim=embed_dim, int8=int8) > scan_budget_ms:
        return "ivf"
    return "flat"


class AutoIndex:
    """Deferred-choice index: materializes the engine the router recommends
    at first build/insert, re-evaluates as the corpus grows, and rebuilds
    into the recommended engine on a crossover.

    Same contract as FlatIndex/IVFIndex/HNSWIndex (has_any_data / add /
    build / search / search_ids / metas / valid_vectors — reference indexer
    surface, app/main.py:291-373).
    """

    def __init__(
        self,
        make_index: Callable[[str], Any],
        *,
        n_devices: int = 1,
        embed_dim: int = 1024,
        int8: bool = False,
        int8_rerank: bool = True,
        scan_budget_ms: float = 50.0,
        hbm_budget_bytes: int = HBM_VECTOR_BUDGET_BYTES,
        auto_rebuild: bool = True,
    ):
        self._make_index = make_index
        self._router_kw = dict(
            n_devices=n_devices, embed_dim=embed_dim, int8=int8,
            int8_rerank=int8_rerank,
            scan_budget_ms=scan_budget_ms, hbm_budget_bytes=hbm_budget_bytes,
        )
        self.auto_rebuild = auto_rebuild
        self._inner: Optional[Any] = None
        self.kind: Optional[str] = None

    # ------------------------------------------------------------- delegation

    @property
    def inner(self) -> Optional[Any]:
        return self._inner

    @property
    def metas(self) -> List[Dict[str, Any]]:
        return self._inner.metas if self._inner is not None else []

    def __len__(self) -> int:
        return len(self._inner) if self._inner is not None else 0

    def has_any_data(self) -> bool:
        return self._inner is not None and self._inner.has_any_data()

    def valid_vectors(self):
        return self._inner.valid_vectors() if self._inner is not None else None

    # ------------------------------------------------------------ construction

    def _materialize(self, kind: str) -> Any:
        idx = self._make_index(kind)
        self.kind = kind
        return idx

    def build(self, embeddings, metas: Sequence[Any]) -> None:
        kind = choose_index_kind(len(np.asarray(embeddings)), **self._router_kw)
        self._inner = self._materialize(kind)
        log.info("router chose %s for %d rows", kind, len(metas))
        if hasattr(self._inner, "build"):
            self._inner.build(embeddings, metas)
        else:
            self._inner.add(embeddings, metas)

    def add(self, embeddings, metas: Sequence[Any]) -> None:
        if self._inner is None:
            self.build(embeddings, metas)
            return
        self._inner.add(embeddings, metas)
        self._maybe_rebuild()

    def _maybe_rebuild(self) -> None:
        if not self.auto_rebuild or self._inner is None:
            return
        want = choose_index_kind(len(self._inner), **self._router_kw)
        if want == self.kind:
            return
        vecs = self._inner.valid_vectors()
        if vecs is None:
            return
        metas = list(self._inner.metas)
        log.info(
            "router crossover at %d rows: rebuilding %s -> %s",
            len(metas), self.kind, want,
        )
        new = self._materialize(want)
        if hasattr(new, "build"):
            new.build(np.asarray(vecs, dtype=np.float32), metas)
        else:
            new.add(np.asarray(vecs, dtype=np.float32), metas)
        self._inner = new

    # ----------------------------------------------------------------- search

    def search_ids(self, query_emb, k: int, **kw) -> Tuple[np.ndarray, np.ndarray]:
        if self._inner is None:
            b = np.asarray(query_emb).shape[0]
            return np.zeros((b, 0), np.float32), np.zeros((b, 0), np.int32)
        return self._inner.search_ids(query_emb, k, **kw)

    def search(self, query_emb, k: int = 3) -> List[Tuple[Dict[str, Any], float]]:
        if self._inner is None:
            return []
        return self._inner.search(query_emb, k)
