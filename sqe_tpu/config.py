"""Typed configuration for the whole engine.

The reference configures itself through module-level constants read from a
`.env` file (reference app/main.py:22-50, app/embedding_gen.py:21-49) with no
validation and no CLI. Here every subsystem has a frozen dataclass; defaults
mirror the reference's observable constants where one exists:

- chunk_size=512 words          (main.py:37)
- embed_dim=1024                (main.py:38)
- batch_size=64                 (main.py:36)
- cache capacity=1000           (main.py:42)
- cache similarity tau=0.96     (main.py:44)
- retrieval top_k default=3     (main.py:467, :601)
- HNSW m=64, ef_construction=500 (main.py:276) — the *gate* config uses
  M=16/ef_construction=200/ef_search=100 per BASELINE.json config 2.

``from_env`` keeps drop-in compatibility with the reference's environment
variables, and ``cli_overrides`` applies ``--key=value`` flags.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass(frozen=True)
class ModelConfig:
    """Embedding transformer hyperparameters (replaces mxbai-embed-large)."""

    vocab_size: int = 32768
    d_model: int = 512
    n_layers: int = 6
    n_heads: int = 4            # head_dim 128 keeps QK^T tiles MXU-aligned
    d_ff: int = 2048
    max_len: int = 512          # covers a full 512-word chunk
    embed_dim: int = 1024       # output dim; matches reference EMBED_DIM (main.py:38)
    dtype: str = "bfloat16"     # compute dtype on TPU (MXU-friendly)
    param_dtype: str = "float32"
    dropout: float = 0.0
    seed: int = 0

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads


@dataclass(frozen=True)
class HNSWConfig:
    """HNSW graph parameters.

    Reference mapping used m=64/ef_construction=500 (main.py:276); BASELINE.json
    gate config 2 is M=16/ef_construction=200/ef_search=100.
    """

    M: int = 16                  # max neighbors per node on upper levels
    ef_construction: int = 200
    ef_search: int = 100
    max_level_cap: int = 8
    seed: int = 42

    @property
    def M0(self) -> int:
        """Level-0 degree (standard HNSW uses 2*M)."""
        return 2 * self.M


@dataclass(frozen=True)
class CacheConfig:
    """Device-resident semantic query cache (replaces Redis LFU, main.py:53-128)."""

    capacity: int = 1000         # REDIS_MAX_ITEMS (main.py:42)
    sim_threshold: float = 0.96  # CACHE_SIM_THRESHOLD (main.py:44)
    embed_dim: int = 1024


@dataclass(frozen=True)
class ServeConfig:
    host: str = "0.0.0.0"
    port: int = 8000
    upload_port: int = 9001      # reference's upload microservice port (embedding_gen.py:413)
    top_k_default: int = 3       # reference default (main.py:467)
    max_generate_concurrency: int = 5   # MAX_BLUEHIVE_CONCURRENCY (main.py:31)
    chat_memory_max_turns: int = 16
    upload_dir: str = "uploads"  # reference BASE_UPLOAD_DIR (embedding_gen.py:26)


@dataclass(frozen=True)
class EngineConfig:
    """Top-level engine configuration."""

    model: ModelConfig = field(default_factory=ModelConfig)
    hnsw: HNSWConfig = field(default_factory=HNSWConfig)
    cache: CacheConfig = field(default_factory=CacheConfig)
    serve: ServeConfig = field(default_factory=ServeConfig)

    corpus_dir: str = "PMC"      # reference defaulted to "notes" but filtered PMC*.txt (B4)
    chunk_size: int = 512        # words per chunk (main.py:37)
    batch_size: int = 64         # embed batch (main.py:36)
    # "flat" (exact MXU scan — the winning TPU design up to ~4M vectors/chip,
    # recall 1.0; DESIGN.md §8) | "ivf" (MXU k-means clusters + Pallas probed
    # scoring — beyond the scan's HBM/latency envelope; DESIGN.md §8b) |
    # "hnsw" (graph ANN, kept for parity with the reference's nmslib engine)
    # | "auto" (router: flat while the per-device corpus fits HBM and the
    # scan meets the latency contract, ivf past that — index/router.py).
    index_kind: str = "flat"
    # int8 flat-index storage: the int8 MXU rate + halved scan traffic via
    # the fused int8 scan kernel. With int8_rerank (default) an int8
    # RESIDUAL plane restores bf16-class recall by exact-reranking the
    # scan's top candidates (2 bytes/dim total — bf16 memory parity);
    # int8_rerank=False is the half-memory capacity mode at the scan-only
    # measured recall (0.946-0.966 — below the 0.95 gate at 1M, DESIGN §8).
    int8_vectors: bool = False
    int8_rerank: bool = True
    checkpoint_dir: Optional[str] = None
    mesh_shape: Optional[tuple] = None  # e.g. (8,) to shard the index over 8 chips

    @staticmethod
    def from_env(env: Optional[dict] = None) -> "EngineConfig":
        """Build a config from environment variables (reference compatibility)."""
        e = dict(os.environ if env is None else env)
        model = ModelConfig(
            embed_dim=int(e.get("EMBED_DIM", 1024)),
        )
        return EngineConfig(
            model=model,
            corpus_dir=e.get("EMB_DIR", "PMC"),
            chunk_size=int(e.get("CHUNK_SIZE", 512)),
            batch_size=int(e.get("BATCH_SIZE", 64)),
            checkpoint_dir=e.get("SQE_CHECKPOINT_DIR") or None,
        )

    def with_overrides(self, **kwargs: Any) -> "EngineConfig":
        return dataclasses.replace(self, **kwargs)


def cli_overrides(cfg: EngineConfig, argv: list[str]) -> EngineConfig:
    """Apply ``--dotted.key=value`` CLI flags onto a config.

    Example: ``--hnsw.M=32 --chunk_size=256 --index_kind=flat``.
    """
    updates: dict[str, Any] = {}
    nested: dict[str, dict[str, Any]] = {}
    for arg in argv:
        if not arg.startswith("--") or "=" not in arg:
            continue
        key, _, raw = arg[2:].partition("=")
        value: Any = raw
        for cast in (int, float):
            try:
                value = cast(raw)
                break
            except ValueError:
                continue
        if raw in ("true", "false", "True", "False"):
            value = raw.lower() == "true"
        if "." in key:
            section, _, subkey = key.partition(".")
            nested.setdefault(section, {})[subkey] = value
        else:
            updates[key] = value
    for section, fields in nested.items():
        sub = getattr(cfg, section)
        updates[section] = dataclasses.replace(sub, **fields)
    return cfg.with_overrides(**updates) if updates else cfg
