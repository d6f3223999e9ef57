"""sqe_tpu — a TPU-native semantic retrieval and RAG serving framework.

Rebuilds the capabilities of the reference (NeuralRevenant/semantic-query-engine:
a FastAPI RAG pipeline delegating to Ollama embeddings, OpenSearch HNSW, Redis
LFU cache, and external LLM APIs — see /root/reference/app/main.py) as a single
in-process JAX/XLA/Pallas stack:

- ``sqe_tpu.models``   — in-process JAX embedding transformer (1024-d), replacing
  the Ollama `mxbai-embed-large` HTTP calls (reference main.py:131-180).
- ``sqe_tpu.index``    — exact flat cosine top-k and an HNSW graph index stored as
  flattened neighbor arrays on HBM, searched by a batched beam search, replacing
  OpenSearch's nmslib HNSW engine (reference main.py:245-373).
- ``sqe_tpu.cache``    — device-resident semantic query cache (matmul top-1 probe
  + LFU eviction), replacing the Redis list scan (reference main.py:53-128).
- ``sqe_tpu.parallel`` — mesh/sharding utilities: index sharded over the ICI mesh,
  per-shard search, all-gather top-k merge.
- ``sqe_tpu.serving``  — the RAG engine and a native asyncio HTTP/WebSocket server
  exposing the reference's API surface (`POST /ask`, `WS /ws/ask`,
  `POST /upload_text` — reference main.py:587-735, embedding_gen.py:315-409).
- ``sqe_tpu.train``    — contrastive (InfoNCE) training for the embedder, sharded
  with pjit over a device mesh (capability the reference delegates to Ollama).
"""

__version__ = "0.1.0"

from sqe_tpu.config import (  # noqa: F401
    CacheConfig,
    EngineConfig,
    HNSWConfig,
    ModelConfig,
    ServeConfig,
)
