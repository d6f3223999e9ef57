"""Retrieval-quality evaluation: held-out query -> source-chunk accuracy.

The reference's retrieval quality rested on a pretrained external embedding
model (mxbai-embed-large, app/main.py:29,38) and was never measured. Here the
embedder is owned and trainable, so quality is measured directly: sample a
random word span from a chunk as a "query" (with an RNG stream disjoint from
training's) and check whether exact top-k cosine retrieval over all chunk
embeddings returns the source chunk. Reported by the ``fit`` CLI and gated in
tests/test_fit.py.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from sqe_tpu.data.corpus import Chunk


def retrieval_eval(
    embedder,
    chunks: Sequence[Chunk],
    n_queries: int = 256,
    k: int = 5,
    seed: int = 9999,
    span_min: int = 6,
    span_max: int = 24,
    batch_size: int = 64,
) -> Dict[str, float]:
    """Returns {"acc@1", "acc@k", "n_queries", "n_chunks"}."""
    rng = np.random.default_rng(seed)
    texts = [c.text for c in chunks]
    emb = embedder.embed_texts(texts, batch_size=batch_size)

    n_queries = min(n_queries, len(chunks))
    rows = rng.choice(len(chunks), size=n_queries, replace=False)
    queries = []
    for r in rows:
        words = texts[r].split()
        span = int(rng.integers(span_min, span_max + 1))
        span = min(span, len(words))
        start = int(rng.integers(0, max(1, len(words) - span + 1)))
        queries.append(" ".join(words[start : start + span]))
    qe = embedder.embed_texts(queries, batch_size=batch_size)

    sims = qe @ emb.T                                     # [Q, N]
    topk = np.argsort(-sims, axis=1)[:, :k]
    acc1 = float(np.mean(topk[:, 0] == rows))
    acck = float(np.mean([rows[i] in topk[i] for i in range(n_queries)]))
    return {
        "acc@1": acc1,
        f"acc@{k}": acck,
        "n_queries": float(n_queries),
        "n_chunks": float(len(chunks)),
    }
