"""Slot-based citation markers for the on-TPU decoder.

The serve contract (reference 6-rule system message, app/main.py:519-528)
requires answers to cite ``Document <id>``. The word-level tokenizer cannot
represent corpus doc ids: ``PMC529461`` is a single [a-z0-9]+ word that
falls into the hashed OOV tail — no dedicated embedding row, no inverse
mapping, shared bucket with unrelated rare words. Round 3's first SFT run
proved the consequence (ckpt_trained/lm/lm_eval.json: cites_valid 0.0 after
2000 steps): the citation target was literally unlearnable.

Fix: citations are *slot* references, not id strings. Each context section
header is rewritten to carry one of ``N_SLOTS`` dedicated marker words
(``citemark0`` …), the SFT target cites the source section's marker, and
the decode loop expands an emitted marker back to that slot's real doc id.
The LM's job collapses from "spell a 3,027-way unhashable id" to "name the
section the answer came from" — 8 learnable tokens that generalize to
corpora the model never saw. The rendered answer still reads
``Document PMC529461`` exactly as rule 1 demands.

Marker ids live in the learned vocabulary so ``build_inverse_vocab`` and
the native tokenizer table see them; when the vocab is full the least
frequent words (highest ids, by VocabTokenizer.train construction) are
evicted to the hash tail.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from sqe_tpu.data.tokenizer import N_SPECIAL, VocabTokenizer
from sqe_tpu.utils.logging import get_logger

log = get_logger("serving.citations")

N_SLOTS = 8
MARKER_WORDS: List[str] = [f"citemark{i}" for i in range(N_SLOTS)]

# render_context's exact section header (serving/prompts.py; parity with
# app/main.py:500-513). Doc ids are word-ish tokens (filename stems).
_DOC_HEADER_RE = re.compile(r"--- Document ID: (\S+) ---")


def marker_word(slot: int) -> str:
    return MARKER_WORDS[slot]


def ensure_marker_ids(tokenizer, *, expect_present: bool = False) -> Dict[str, int]:
    """Give every marker word a dedicated vocab id; return word -> id.

    Idempotent: markers already present (e.g. a post-SFT checkpoint's saved
    tokenizer state) keep their ids. New markers take free ids below the
    hash tail, evicting the least-frequent vocab words when full. The
    native lookup table is invalidated so the C fast path stays identical.

    ``expect_present`` marks serve/eval-time callers loading a trained LM
    checkpoint: fit-lm persists the marker-bearing tokenizer after SFT, so
    fresh registration there means the checkpoint predates slot markers —
    the model never learned to emit them and the new id assignment is
    drift, not training state. Warn instead of silently reassigning
    (round-3 advisor finding).
    """
    if not isinstance(tokenizer, VocabTokenizer):
        raise TypeError(
            "citation markers need a learned vocabulary (VocabTokenizer); "
            f"got {type(tokenizer).__name__}"
        )
    vocab = tokenizer.vocab
    missing = [w for w in MARKER_WORDS if w not in vocab]
    if missing and expect_present:
        log.warning(
            "registering %d citation marker ids on a loaded LM tokenizer "
            "that lacks them: this checkpoint predates slot markers — the "
            "model was trained without them and will not cite; evicted "
            "rare words now re-tokenize into the hash tail",
            len(missing),
        )
    if missing:
        used = set(vocab.values())
        free = [i for i in range(N_SPECIAL, tokenizer._tail_base)
                if i not in used]
        if len(free) < len(missing):
            # Evict least-frequent entries: VocabTokenizer.train assigns ids
            # in descending frequency order, so highest id = rarest word.
            evict = sorted(
                ((tid, w) for w, tid in vocab.items()
                 if w not in MARKER_WORDS),
                reverse=True,
            )[: len(missing) - len(free)]
            for tid, w in evict:
                del vocab[w]
                free.append(tid)
        free.sort()
        for w, tid in zip(missing, free):
            vocab[w] = tid
        tokenizer._table = None  # rebuild the native lookup table
    return {w: vocab[w] for w in MARKER_WORDS}


_HEADER_SPLIT_RE = re.compile(r"(--- Document ID: [^\n]+ ---\n)")
_END_OF_CONTEXT = "--- End of context ---"


def _waterfill(sizes: List[int], total: int) -> List[int]:
    """Allocate ``total`` words across sections: short sections keep all
    their words, the surplus splits evenly among the longer ones."""
    if sum(sizes) <= total:
        return list(sizes)
    out = [0] * len(sizes)
    order = sorted(range(len(sizes)), key=lambda i: sizes[i])
    left, remaining = total, len(sizes)
    for i in order:
        share = left // remaining
        out[i] = min(sizes[i], share)
        left -= out[i]
        remaining -= 1
    return out


def word_budget(token_budget: int) -> int:
    """Word budget for ``clip_context_sections`` given a TOKEN budget.

    The clipper counts whitespace-split words but the decoder budget is in
    tokens, and a word can span several [a-z0-9]+ token runs ("is6110-based"
    -> 2 tokens): clipping to the full token budget overshoots, and the
    subsequent ``head_tail_truncate`` middle-drops exactly the section
    markers the clip preserved (round-4 advisor finding). A 10% margin
    makes the truncate a no-op in the common case; it still runs after as
    the hard guarantee."""
    return max(16, token_budget - token_budget // 10)


def clip_context_sections(prompt: str, budget: int) -> str:
    """Header-preserving prompt budget for the on-TPU decoder.

    ``head_tail_truncate`` (models/decoder.py) drops the MIDDLE of an
    overlong prompt — which for a two-section context is usually the
    second section's header and its slot marker, so the model literally
    cannot cite that section (round-4 lm_eval: cites_src sat at ~0.5 of
    cites_valid, chance level for two sections). Here the query, the
    instruction tail, and EVERY section header survive: only section
    BODIES are clipped, each to a waterfilled share of the remaining word
    budget, middle-dropped per section (extractive answers live near
    sentence starts/ends more often than mid-chunk). Used by both the
    decode loop (serving/generation.py) and SFT data building
    (train/lm_sft.py) so train matches serve; head_tail_truncate still
    runs after as the hard token guarantee."""
    parts = _HEADER_SPLIT_RE.split(prompt)
    if len(parts) < 3:
        return prompt
    pre, headers, bodies = parts[0], parts[1::2], list(parts[2::2])
    tail = ""
    cut = bodies[-1].find(_END_OF_CONTEXT)
    if cut >= 0:
        tail = bodies[-1][cut:]
        bodies[-1] = bodies[-1][:cut]
    fixed = (len(pre.split()) + len(tail.split())
             + sum(len(h.split()) for h in headers))
    body_words = [b.split() for b in bodies]
    if fixed + sum(len(w) for w in body_words) <= budget:
        return prompt
    alloc = _waterfill([len(w) for w in body_words],
                       max(0, budget - fixed))
    clipped = []
    for ws, m in zip(body_words, alloc):
        if len(ws) > m:
            h = m // 2
            ws = ws[:h] + ws[len(ws) - (m - h):]
        clipped.append(" ".join(ws))
    return (pre
            + "".join(h + b + "\n\n" for h, b in zip(headers, clipped))
            + tail)


def mark_citations(prompt: str) -> Tuple[str, List[str]]:
    """Rewrite context headers to carry slot markers.

    Returns (marked_prompt, slots) where ``slots[i]`` is the doc id whose
    section carries ``citemark{i}``. Sections beyond ``N_SLOTS`` are left
    unmarked (the serve path retrieves top_k=5 chunks -> <=5 docs; 8 slots
    is headroom). Repeated headers for one doc id share a slot.
    """
    slots: List[str] = []

    def _sub(m: re.Match) -> str:
        doc_id = m.group(1)
        if doc_id in slots:
            i = slots.index(doc_id)
        elif len(slots) < N_SLOTS:
            slots.append(doc_id)
            i = len(slots) - 1
        else:
            return m.group(0)
        return f"--- Document ID: {doc_id} {marker_word(i)} ---"

    return _DOC_HEADER_RE.sub(_sub, prompt), slots
