"""Self-supervised training pairs from a raw corpus.

The reference's embedding quality came from a pretrained external model
(mxbai-embed-large via Ollama); this framework owns its embedder and can adapt
it to the corpus with no labels: **in-chunk span pairs** — two random
non-overlapping word spans from the same chunk form a positive pair, other
chunks in the batch are negatives (the Inverse Cloze Task family of
objectives used to train retrieval embedders).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.data.tokenizer import HashingTokenizer


def span_pair(words: List[str], rng: np.random.Generator,
              min_len: int = 16, max_len: int = 64) -> Tuple[str, str]:
    """Two random word spans from one chunk; disjoint when length permits."""
    n = len(words)
    if n < 2 * min_len:
        half = max(1, n // 2)
        return " ".join(words[:half]), " ".join(words[half:] or words[:half])
    l1 = int(rng.integers(min_len, min(max_len, n // 2) + 1))
    l2 = int(rng.integers(min_len, min(max_len, n - l1) + 1))
    s1 = int(rng.integers(0, n - l1 + 1))
    # try to sample the second span outside the first
    for _ in range(4):
        s2 = int(rng.integers(0, n - l2 + 1))
        if s2 + l2 <= s1 or s2 >= s1 + l1:
            break
    return " ".join(words[s1 : s1 + l1]), " ".join(words[s2 : s2 + l2])


def query_span(words: List[str], rng: np.random.Generator,
               min_len: int = 4, max_len: int = 24) -> str:
    """A short random word span — the shape of a real serving query."""
    n = len(words)
    span = int(rng.integers(min_len, max_len + 1))
    span = min(span, n)
    start = int(rng.integers(0, max(1, n - span + 1)))
    return " ".join(words[start : start + span])


def pair_batches(
    chunks: Sequence[Chunk],
    tokenizer: HashingTokenizer,
    batch_size: int = 64,
    max_len: int = 128,
    seed: int = 0,
    epochs: int = 1,
    style: str = "sym",
    q_max_len: int = 32,
    q_dropout: float = 0.0,
    q_shuffle: float = 0.0,
    hard_neighbors=None,
    hard_group: int = 16,
    hard_frac: float = 0.5,
) -> Iterator[dict]:
    """Yields train-step batches: {q_ids, q_mask, p_ids, p_mask}.

    ``style="sym"``: two medium spans from one chunk (shapes [B, max_len]
    both). ``style="asym"``: a SHORT query span (4-24 words, shape
    [B, q_max_len]) against the FULL chunk text (shape [B, max_len]) —
    matching the serving distribution, where users send short questions and
    the index holds 512-word chunks. Queries and passages go through separate
    forwards, so asymmetric shapes cost nothing.

    ``q_dropout`` (asym only) drops each query-span token with that
    probability (keeping at least one) and compacts the survivors: the query
    stops being a verbatim contiguous n-gram of its passage, pushing the
    model toward bag-of-content-words matching — the shape of real
    natural-language questions (see train/eval.py question_eval).

    ``q_shuffle`` (asym only) permutes the surviving query tokens with that
    per-example probability: real questions mention a passage's terms in
    their own order, not the passage's. Together dropout+shuffle make the
    training query distribution order- and contiguity-free — the question
    workload's shape — while remaining fully self-supervised (no reuse of
    the eval's templates).

    ``hard_neighbors`` (asym only) is an ``[len(chunks), k]`` int array of
    mined nearest-neighbor chunk indices (train/mine.py, -1 padded). When
    given, the first ``hard_frac`` of every batch is assembled as
    seed-plus-neighbor groups of size ``hard_group``, so each example's
    in-batch negative pool contains its ``hard_group - 1`` most confusable
    corpus chunks instead of only random ones; the rest of the batch stays
    random (mined neighborhoods carry false-negative risk — an all-hard
    batch would amplify it).
    """
    rng = np.random.default_rng(seed)
    if style == "asym":
        # Tokenize every chunk ONCE and sample query spans in TOKEN space:
        # the naive path re-tokenized the same full chunks every epoch
        # (~3M redundant tokenizations for a 12k-step fit over 32.7k
        # chunks), leaving training host-bound on the 1-core dev VM. Query
        # spans are contiguous slices of the chunk's token row (CLS
        # re-prepended), so batch assembly is pure array indexing.
        texts = [c.text for c in chunks if c.text.strip()]
        if not texts:
            return
        from sqe_tpu.data.tokenizer import CLS_ID

        p_all_ids, p_all_mask = [], []
        for s0 in range(0, len(texts), 1024):
            i_, m_ = tokenizer.encode_batch(texts[s0:s0 + 1024],
                                            max_len=max_len)
            p_all_ids.append(i_)
            p_all_mask.append(m_)
        p_all_ids = np.concatenate(p_all_ids)
        p_all_mask = np.concatenate(p_all_mask)
        tok_lens = p_all_mask.sum(axis=1).astype(np.int64) - 1  # minus CLS

        hn = None
        if hard_neighbors is not None and hard_frac > 0.0 and hard_group > 1:
            # hard_neighbors indexes the UNfiltered chunks sequence; remap
            # into filtered-text positions, dropping neighbors whose chunk
            # was filtered out.
            keep_idx = [i for i, c in enumerate(chunks) if c.text.strip()]
            pos = np.full(len(chunks), -1, np.int64)
            pos[keep_idx] = np.arange(len(keep_idx))
            hard_neighbors = np.asarray(hard_neighbors)
            hn = np.where(
                hard_neighbors < 0, -1,
                pos[np.clip(hard_neighbors, 0, len(chunks) - 1)],
            )[keep_idx]
        n_hard = min(batch_size, int(round(batch_size * hard_frac)))
        if n_hard <= 0:
            # A zero hard quota would leave the seed pointer stuck (the
            # group loop below only advances it while filling hard slots).
            hn = None

        def _row_batches():
            """Row-index arrays, one per batch. Plain: a permutation walk
            (each chunk once per epoch, tail dropped). Mined: the first
            ``n_hard`` slots fill as seed+neighbor groups, the rest (and any
            epoch-tail shortfall) fill with distinct random rows."""
            for _ in range(epochs):
                order = rng.permutation(len(texts))
                if hn is None:
                    for start in range(0, len(order) - batch_size + 1,
                                       batch_size):
                        yield order[start : start + batch_size]
                    continue
                ptr = 0
                while ptr < len(order):
                    rows: List[int] = []
                    taken = set()
                    while len(rows) < n_hard and ptr < len(order):
                        seed_row = int(order[ptr])
                        ptr += 1
                        if seed_row in taken:
                            continue
                        rows.append(seed_row)
                        taken.add(seed_row)
                        room = min(hard_group - 1, n_hard - len(rows))
                        if room <= 0:
                            continue
                        nbrs = hn[seed_row]
                        # Uniform over the mined k (not always the top few):
                        # keeps the hard pool varied across epochs.
                        for nb in rng.permutation(nbrs[nbrs >= 0]):
                            if room <= 0:
                                break
                            nb = int(nb)
                            if nb not in taken:
                                rows.append(nb)
                                taken.add(nb)
                                room -= 1
                    if not rows:
                        continue
                    if len(rows) < batch_size:
                        for r in rng.permutation(len(texts)):
                            if len(rows) >= batch_size:
                                break
                            r = int(r)
                            if r not in taken:
                                rows.append(r)
                                taken.add(r)
                    if len(rows) == batch_size:
                        yield np.asarray(rows)

        for rows in _row_batches():
            q_ids = np.zeros((batch_size, q_max_len), np.int32)
            q_mask = np.zeros((batch_size, q_max_len), np.float32)
            for j, r in enumerate(rows):
                n_tok = max(1, int(tok_lens[r]))
                span = min(int(rng.integers(4, 25)), n_tok,
                           q_max_len - 1)
                s = int(rng.integers(0, n_tok - span + 1))
                toks = p_all_ids[r, 1 + s : 1 + s + span]
                if q_dropout > 0.0 and span > 1:
                    keep = rng.random(span) >= q_dropout
                    if not keep.any():
                        keep[int(rng.integers(0, span))] = True
                    toks = toks[keep]
                    span = len(toks)
                if q_shuffle > 0.0 and span > 1 \
                        and rng.random() < q_shuffle:
                    toks = toks[rng.permutation(span)]
                q_ids[j, 0] = CLS_ID
                q_ids[j, 1 : 1 + span] = toks
                q_mask[j, : 1 + span] = 1.0
            yield {"q_ids": q_ids, "q_mask": q_mask,
                   "p_ids": p_all_ids[rows], "p_mask": p_all_mask[rows]}
        return
    texts = [c.text.split() for c in chunks if c.text.strip()]
    if not texts:
        return
    for _ in range(epochs):
        order = rng.permutation(len(texts))
        for start in range(0, len(order) - batch_size + 1, batch_size):
            rows = order[start : start + batch_size]
            qs, ps = [], []
            for r in rows:
                a, b = span_pair(texts[r], rng)
                qs.append(a)
                ps.append(b)
            q_ids, q_mask = tokenizer.encode_batch(qs, max_len=max_len)
            p_ids, p_mask = tokenizer.encode_batch(ps, max_len=max_len)
            yield {"q_ids": q_ids, "q_mask": q_mask,
                   "p_ids": p_ids, "p_mask": p_mask}
