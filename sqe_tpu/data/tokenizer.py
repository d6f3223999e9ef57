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

import ctypes
import os
import re
import subprocess
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD_ID = 0
CLS_ID = 1
UNK_ID = 2
N_SPECIAL = 3

# ASCII-only case fold, byte-identical to the C scanner (text_prep.cc):
# Python's str.lower() maps some non-ASCII codepoints INTO ASCII word chars
# (U+212A Kelvin sign -> 'k', U+0130 -> 'i' + combining dot), which the
# byte-level native path never sees — tokenizing the corpus natively and a
# query via the Python fallback would then disagree. Folding only A-Z keeps
# both paths identical on every input.
_ASCII_LOWER = bytes(
    c + 32 if 65 <= c <= 90 else c for c in range(256)
)
_WORD_BYTES_RE = re.compile(rb"[a-z0-9]+")


def _words(text: str) -> List[str]:
    """Lowercased ASCII word runs, identical to the native scanner."""
    folded = text.encode("utf-8").translate(_ASCII_LOWER)
    return [w.decode("ascii") for w in _WORD_BYTES_RE.findall(folded)]

_NATIVE_LOCK = threading.Lock()
_NATIVE: Optional[ctypes.CDLL] = None
_NATIVE_FAILED = False
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)


def _native_lib() -> Optional[ctypes.CDLL]:
    global _NATIVE, _NATIVE_FAILED
    with _NATIVE_LOCK:
        if _NATIVE is not None or _NATIVE_FAILED:
            return _NATIVE
        src = os.path.join(_NATIVE_DIR, "text_prep.cc")
        so = os.path.join(_NATIVE_DIR, "libtext_prep.so")
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", src, "-o", so],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
            lib.hash_tokenize_batch.restype = ctypes.c_int
            lib.hash_tokenize_batch.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ]
            lib.vocab_tokenize_batch.restype = ctypes.c_int
            lib.vocab_tokenize_batch.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ]
            _NATIVE = lib
        except Exception:
            _NATIVE_FAILED = True
        return _NATIVE


def _encode_batch_native(
    lib: ctypes.CDLL, texts: Sequence[str], max_len: int, vocab_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    blobs = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(blobs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    data = b"".join(blobs)
    b = len(texts)
    ids = np.zeros((b, max_len), dtype=np.int32)
    mask = np.zeros((b, max_len), dtype=np.float32)
    rc = lib.hash_tokenize_batch(
        data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, max_len, vocab_size,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise RuntimeError(f"hash_tokenize_batch failed: {rc}")
    return ids, mask

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
    """Word-level hashing tokenizer with static-shape batch encoding.

    Batch encoding uses the native fast path (native/text_prep.cc, ctypes)
    when a compiler is available — identical output, ~30x the throughput for
    corpus-scale ingestion — and falls back to the pure-Python implementation
    otherwise (parity gated in tests/test_tokenizer.py).
    """

    def __init__(self, vocab_size: int = 32768, max_len: int = 512,
                 use_native: bool = True):
        assert vocab_size > N_SPECIAL
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.use_native = use_native
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
        words = _words(text)
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
        if self.use_native:
            native = _native_lib()
            if native is not None:
                return _encode_batch_native(
                    native, texts, L, self.vocab_size
                )
        return self._encode_batch_python(texts, L)

    def _encode_batch_python(
        self, texts: Sequence[str], L: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        B = len(texts)
        ids = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = [CLS_ID] + self.tokenize(text)
            toks = toks[:L]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1.0
        return ids, mask


class VocabTokenizer:
    """Learned-vocabulary tokenizer: frequent corpus words get dedicated ids.

    The pure hashing tokenizer gives every word a usable id but collides
    frequent words into shared buckets, capping what corpus-fit training can
    learn (DESIGN.md §10). Here the top ``vocab_size - N_SPECIAL - hash_tail``
    corpus words (by frequency) own a private embedding row; everything else
    hashes into the reserved tail, so unseen words still tokenize
    deterministically (zero-egress: no downloaded vocabulary, reference used
    llama.cpp's in-server tokenizer via Ollama, app/main.py:134-145).

    Same ``encode_batch`` contract as HashingTokenizer: ``[B, L]`` int32 ids
    (CLS prepended) + float32 mask.
    """

    def __init__(self, vocab: Dict[str, int], vocab_size: int = 32768,
                 max_len: int = 512, hash_tail: int = 4096,
                 use_native: bool = True):
        assert vocab_size > N_SPECIAL + hash_tail
        self.vocab = vocab
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.hash_tail = hash_tail
        self._tail_base = vocab_size - hash_tail
        self.use_native = use_native
        self._table: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def _native_table(self) -> Tuple[np.ndarray, np.ndarray]:
        """Open-addressing (linear probe) lookup table for the C fast path:
        FNV-1a(word) -> token id, power-of-two size ~4x the vocab. Word
        identity is the 64-bit hash — a false vocab hit needs an FNV
        collision against a ~29k-word table (~1e-15 per OOV word)."""
        if self._table is None:
            t = 1 << max(4, (4 * max(1, len(self.vocab)) - 1).bit_length())
            hashes = np.zeros(t, np.uint64)
            tids = np.full(t, -1, np.int32)
            tmask = t - 1
            for w, tid in self.vocab.items():
                h = fnv1a_64(w.encode("utf-8"))
                idx = h & tmask
                while tids[idx] >= 0:
                    idx = (idx + 1) & tmask
                hashes[idx] = h
                tids[idx] = tid
            self._table = (hashes, tids)
        return self._table

    @classmethod
    def train(cls, texts: Sequence[str], vocab_size: int = 32768,
              max_len: int = 512, hash_tail: int = 4096) -> "VocabTokenizer":
        """Build the vocabulary from corpus word frequencies. The hashed OOV
        tail shrinks automatically for small vocab sizes (1/8 of the space)."""
        from collections import Counter

        hash_tail = max(1, min(hash_tail, vocab_size // 8))
        counts: Counter = Counter()
        for t in texts:
            counts.update(_words(t))
        n_words = vocab_size - N_SPECIAL - hash_tail
        vocab = {
            w: N_SPECIAL + i
            for i, (w, _c) in enumerate(counts.most_common(n_words))
        }
        return cls(vocab, vocab_size=vocab_size, max_len=max_len,
                   hash_tail=hash_tail)

    def _word_id(self, word: str) -> int:
        tid = self.vocab.get(word)
        if tid is not None:
            return tid
        return self._tail_base + fnv1a_64(word.encode("utf-8")) % self.hash_tail

    def tokenize(self, text: str) -> List[int]:
        words = _words(text)
        if not words:
            return [UNK_ID]
        return [self._word_id(w) for w in words]

    def encode(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        ids, mask = self.encode_batch([text])
        return ids[0], mask[0]

    def encode_batch(
        self, texts: Sequence[str], max_len: int | None = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        L = self.max_len if max_len is None else max_len
        if self.use_native:
            lib = _native_lib()
            if lib is not None:
                return self._encode_batch_native(lib, texts, L)
        B = len(texts)
        ids = np.zeros((B, L), dtype=np.int32)
        mask = np.zeros((B, L), dtype=np.float32)
        for i, text in enumerate(texts):
            toks = [CLS_ID] + self.tokenize(text)
            toks = toks[:L]
            ids[i, : len(toks)] = toks
            mask[i, : len(toks)] = 1.0
        return ids, mask

    def _encode_batch_native(
        self, lib, texts: Sequence[str], max_len: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        hashes, tids = self._native_table()
        blobs = [t.encode("utf-8") for t in texts]
        offsets = np.zeros(len(blobs) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in blobs], out=offsets[1:])
        data = b"".join(blobs)
        b = len(texts)
        ids = np.zeros((b, max_len), dtype=np.int32)
        mask = np.zeros((b, max_len), dtype=np.float32)
        rc = lib.vocab_tokenize_batch(
            data, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            b, max_len,
            hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            tids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(tids), self._tail_base, self.hash_tail,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"vocab_tokenize_batch failed: {rc}")
        return ids, mask

    # ------------------------------------------------------------ persistence

    def to_dict(self) -> dict:
        return {
            "kind": "vocab",
            "vocab_size": self.vocab_size,
            "max_len": self.max_len,
            "hash_tail": self.hash_tail,
            "vocab": self.vocab,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "VocabTokenizer":
        return cls(dict(d["vocab"]), vocab_size=int(d["vocab_size"]),
                   max_len=int(d["max_len"]), hash_tail=int(d["hash_tail"]))


def tokenizer_from_dict(d: Optional[dict], vocab_size: int, max_len: int):
    """Restore a tokenizer from checkpoint state (None -> hashing default)."""
    if d is None or d.get("kind") != "vocab":
        return HashingTokenizer(vocab_size, max_len)
    return VocabTokenizer.from_dict(d)


def tokenizer_to_dict(tok) -> Optional[dict]:
    return tok.to_dict() if isinstance(tok, VocabTokenizer) else None


def build_inverse_vocab(tok: "VocabTokenizer") -> Dict[int, str]:
    return {tid: w for w, tid in tok.vocab.items()}
