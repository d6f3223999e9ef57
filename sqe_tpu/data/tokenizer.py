"""Deterministic in-process tokenizer for the embedding model.

The reference has no tokenizer — it ships raw text over HTTP to Ollama
(app/main.py:134-145) and the tokenizer lives inside llama.cpp. The TPU-native
build embeds in-process, so tokenization is done here with a hashing-trick
vocabulary: each lowercased word token is mapped to a bucket via FNV-1a. This
is fully deterministic, needs no downloaded vocabulary (zero-egress
environment), has O(1) memory, and produces the static shapes XLA requires.

Token ids: 0 = PAD, 1 = CLS (prepended), 2 = UNK (empty token), hashed words
occupy [N_SPECIAL, vocab_size).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

PAD_ID = 0
CLS_ID = 1
UNK_ID = 2
N_SPECIAL = 3

_WORD_RE = re.compile(r"[a-z0-9]+")

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv1a_64(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV_PRIME) & _MASK64
    return h


class HashingTokenizer:
    """Word-level hashing tokenizer with static-shape batch encoding."""

    def __init__(self, vocab_size: int = 32768, max_len: int = 512):
        assert vocab_size > N_SPECIAL
        self.vocab_size = vocab_size
        self.max_len = max_len
        self._cache: Dict[str, int] = {}

    def _word_id(self, word: str) -> int:
        tid = self._cache.get(word)
        if tid is None:
            tid = N_SPECIAL + fnv1a_64(word.encode("utf-8")) % (
                self.vocab_size - N_SPECIAL
            )
            # Bound the memo cache so long-running ingestion can't grow without
            # limit; hashing is cheap enough to recompute on overflow.
            if len(self._cache) < 1_000_000:
                self._cache[word] = tid
        return tid

    def tokenize(self, text: str) -> List[int]:
        words = _WORD_RE.findall(text.lower())
        if not words:
            return [UNK_ID]
        return [self._word_id(w) for w in words]

    def encode(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        ids, mask = self.encode_batch([text])
        return ids[0], mask[0]

    def encode_batch(
        self, texts: Sequence[str], max_len: int | None = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Encode to fixed-shape ``[B, L]`` int32 ids and float32 mask.

        A CLS token is prepended; sequences are truncated/padded to ``max_len``.
        """
        L = self.max_len if max_len is None else max_len
        B = len(texts)
        ids = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = [CLS_ID] + self.tokenize(text)
            toks = toks[:L]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1.0
        return ids, mask
