"""Retrieval-quality evaluation: held-out query -> source-chunk accuracy.

The reference's retrieval quality rested on a pretrained external embedding
model (mxbai-embed-large, app/main.py:29,38) and was never measured. Here the
embedder is owned and trainable, so quality is measured directly, with two
query styles (both RNG-disjoint from training):

- **span** (``retrieval_eval``): a verbatim contiguous word span from the
  chunk. Upper-bounds lexical matching — a model that only learned n-gram
  overlap still scores here.
- **question** (``question_eval``): a templated natural-language question
  built from informative terms of ONE sentence of the chunk — terms are
  non-contiguous, order-shuffled, and wrapped in question boilerplate that
  appears in no chunk. This is the shape of the reference's actual workload
  (free-form questions, app/main.py:467) and cannot be solved by contiguous
  n-gram matching alone.

Both are reported by the ``fit`` CLI and gated in tests/test_fit.py.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sqe_tpu.data.corpus import Chunk

# Function words excluded from question-term sampling; everything here is
# boilerplate the templates themselves may also use.
_STOPWORDS = frozenset(
    """a an the and or but nor if then than that this these those of in on at
    to for from with within without by as is are was were be been being it
    its their his her they them we you i not no do does did done can could
    may might will would shall should must have has had having about into
    over under between among during after before above below up down out off
    again further once here there when where why how what which who whom all
    any both each few more most other some such only own same so too very
    also per via et al fig figure table study studies results other using
    used use shown show shows found significantly significant""".split()
)

# Each template consumes one comma-joined term list. The surrounding words
# are deliberately corpus-generic so the retrieval signal must come from the
# terms, not the template.
_TEMPLATES = (
    "what does the literature say about {}?",
    "how are {} related to each other?",
    "why might {} be important in this context?",
    "which findings involve {}?",
    "can you summarize what is known about {}?",
    "what is the reported relationship between {}?",
    "what role do {} play according to the text?",
)


def embed_chunk_texts(embedder, chunks: Sequence[Chunk],
                      batch_size: int = 64) -> np.ndarray:
    """Embed every chunk's full text once; shared across eval styles."""
    return embedder.embed_texts([c.text for c in chunks],
                                batch_size=batch_size)


def _accuracy(qe: np.ndarray, emb: np.ndarray, rows: np.ndarray,
              k: int) -> Dict[str, float]:
    sims = qe @ emb.T                                     # [Q, N]
    topk = np.argsort(-sims, axis=1)[:, :k]
    acc1 = float(np.mean(topk[:, 0] == rows))
    acck = float(np.mean([rows[i] in topk[i] for i in range(len(rows))]))
    return {"acc@1": acc1, f"acc@{k}": acck}


def retrieval_eval(
    embedder,
    chunks: Sequence[Chunk],
    n_queries: int = 256,
    k: int = 5,
    seed: int = 9999,
    span_min: int = 6,
    span_max: int = 24,
    batch_size: int = 64,
    chunk_emb: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Verbatim-span queries. Returns {"acc@1", "acc@k", ...}.

    Pass ``chunk_emb`` (from :func:`embed_chunk_texts`) to reuse chunk
    embeddings across eval styles."""
    rng = np.random.default_rng(seed)
    texts = [c.text for c in chunks]
    emb = chunk_emb if chunk_emb is not None else embed_chunk_texts(
        embedder, chunks, batch_size)

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
    return {
        **_accuracy(qe, emb, rows, k),
        "n_queries": float(n_queries),
        "n_chunks": float(len(chunks)),
    }


def _fold_word(w: str) -> str:
    return w.strip(".,;:!?()[]{}\"'`").lower()


def build_doc_freq(chunks: Sequence[Chunk]) -> Counter:
    """Corpus document-frequency counter over folded words — the ONE
    implementation shared by the question generator's callers (question_eval,
    train/lm_sft.sft_batches, scripts/lm_eval.py) so question semantics never
    diverge between training and its evals."""
    doc_freq: Counter = Counter()
    for c in chunks:
        doc_freq.update({_fold_word(w) for w in c.text.split()})
    return doc_freq


def _informative_terms(sentence_words: List[str],
                       doc_freq: Counter) -> List[str]:
    """Content words of one sentence, rarest-in-corpus first."""
    seen = set()
    terms = []
    for w in sentence_words:
        f = _fold_word(w)
        if len(f) < 4 or f in _STOPWORDS or f in seen:
            continue
        if not any(ch.isalpha() for ch in f):
            continue
        seen.add(f)
        terms.append(f)
    terms.sort(key=lambda t: (doc_freq[t], t))
    return terms


def make_question(chunk_text: str, rng: np.random.Generator,
                  doc_freq: Counter, n_terms: int = 4) -> Optional[str]:
    """A templated question from informative terms of one random sentence.

    Terms come from a single sentence (so the question is answerable by one
    passage region), are sampled from the sentence's rarest content words,
    and are SHUFFLED before templating — the query shares vocabulary with
    its source the way a real question does, but no contiguous n-gram."""
    q, _sent = make_question_with_source(chunk_text, rng, doc_freq, n_terms)
    return q


def make_question_with_source(
    chunk_text: str, rng: np.random.Generator,
    doc_freq: Counter, n_terms: int = 4,
) -> Tuple[Optional[str], str]:
    """Like make_question, but also returns the source sentence the terms
    came from — the grounded-answer target for LM instruction tuning
    (train/lm_sft.py)."""
    sentences = [s.split() for s in chunk_text.replace("\n", " ").split(".")]
    sentences = [s for s in sentences if len(s) >= 8]
    if not sentences:
        sentences = [chunk_text.split()]
    sent = sentences[int(rng.integers(0, len(sentences)))]
    sent_text = " ".join(sent).strip()
    terms = _informative_terms(sent, doc_freq)
    if len(terms) < 2:
        terms = _informative_terms(chunk_text.split(), doc_freq)
    if not terms:
        return None, sent_text
    pool = terms[: max(n_terms * 3, 8)]
    take = min(len(pool), int(rng.integers(3, n_terms + 2)))
    # Real questions anchor on the passage's distinctive subject: the rarest
    # term is always included, the rest sample uniformly from the pool, and
    # the final order is shuffled (no contiguity with the source).
    rest = rng.choice(len(pool) - 1, size=take - 1, replace=False) + 1 \
        if take > 1 else np.zeros(0, np.int64)
    chosen = [pool[0]] + [pool[i] for i in rest]
    chosen = [chosen[i] for i in rng.permutation(len(chosen))]
    joined = (", ".join(chosen[:-1]) + " and " + chosen[-1]
              if len(chosen) > 1 else chosen[0])
    template = _TEMPLATES[int(rng.integers(0, len(_TEMPLATES)))]
    return template.format(joined), sent_text


def question_eval(
    embedder,
    chunks: Sequence[Chunk],
    n_queries: int = 256,
    k: int = 5,
    seed: int = 7777,
    batch_size: int = 64,
    chunk_emb: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Natural-language-question queries (VERDICT r02 #1): templated
    questions over shuffled informative terms of one sentence. Returns
    {"acc@1", "acc@k", ...}."""
    rng = np.random.default_rng(seed)
    texts = [c.text for c in chunks]
    emb = chunk_emb if chunk_emb is not None else embed_chunk_texts(
        embedder, chunks, batch_size)

    doc_freq = build_doc_freq(chunks)

    n_queries = min(n_queries, len(chunks))
    order = rng.permutation(len(chunks))
    rows, queries = [], []
    for r in order:
        q = make_question(texts[r], rng, doc_freq)
        if q is None:
            continue
        rows.append(int(r))
        queries.append(q)
        if len(rows) >= n_queries:
            break
    rows = np.asarray(rows)
    qe = embedder.embed_texts(queries, batch_size=batch_size)
    return {
        **_accuracy(qe, emb, rows, k),
        "n_queries": float(len(rows)),
        "n_chunks": float(len(chunks)),
    }
