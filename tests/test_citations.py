"""Slot-based citation markers (serving/citations.py).

Round 3's first SFT run proved the word-level tokenizer cannot represent
doc ids (they hash into the OOV tail — cites_valid 0.0 in lm_eval.json),
so citations are slot markers: dedicated vocab words tag each context
section, the LM cites a marker, the decode loop expands it to the real id
(the rule-1 'Document XYZ' contract, app/main.py:519-528).
"""

import numpy as np
import pytest

from sqe_tpu.data.tokenizer import (
    N_SPECIAL,
    HashingTokenizer,
    VocabTokenizer,
)
from sqe_tpu.serving.citations import (
    MARKER_WORDS,
    N_SLOTS,
    ensure_marker_ids,
    mark_citations,
    marker_word,
)


def _hdr(doc_id: str, body: str = "text") -> str:
    return f"--- Document ID: {doc_id} ---\n{body}\n\n"


def test_ensure_marker_ids_free_space():
    tok = VocabTokenizer.train(["alpha beta gamma delta"], 256, 64,
                               hash_tail=16)
    ids = ensure_marker_ids(tok)
    assert set(ids) == set(MARKER_WORDS)
    # Dedicated ids: inside the learned-vocab range, below the hash tail.
    for tid in ids.values():
        assert N_SPECIAL <= tid < tok._tail_base
    assert len(set(ids.values())) == N_SLOTS
    # Idempotent: a second call (e.g. checkpoint reload) keeps the ids.
    assert ensure_marker_ids(tok) == ids
    # Markers tokenize to their dedicated ids.
    for w, tid in ids.items():
        assert tok.tokenize(w) == [tid]


def test_ensure_marker_ids_full_vocab_evicts_rarest():
    # Fill the vocab: capacity = 64 - 3 - 8 = 53 words, word0 most frequent.
    words = [f"w{i}" for i in range(53)]
    texts = [" ".join(words[: i + 1]) for i in range(53)]
    tok = VocabTokenizer.train(texts, 64, 64, hash_tail=8)
    assert len(tok.vocab) == 53
    rarest = sorted(tok.vocab, key=tok.vocab.get)[-N_SLOTS:]
    ids = ensure_marker_ids(tok)
    # The least-frequent words fell to the hash tail; markers own their ids.
    for w in rarest:
        assert w not in tok.vocab
        assert tok.tokenize(w)[0] >= tok._tail_base
    for tid in ids.values():
        assert tid < tok._tail_base
    # Frequent words keep their ids.
    assert tok.tokenize("w0") == [3]


def test_ensure_marker_ids_native_python_parity():
    tok = VocabTokenizer.train(["alpha beta gamma"], 256, 16, hash_tail=16)
    ensure_marker_ids(tok)   # must invalidate the native lookup table
    text = "alpha citemark0 beta citemark7 zebra"
    ids_n, mask_n = tok.encode_batch([text])
    tok_py = VocabTokenizer(dict(tok.vocab), vocab_size=256, max_len=16,
                            hash_tail=16, use_native=False)
    ids_p, mask_p = tok_py.encode_batch([text])
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_ensure_marker_ids_rejects_hashing_tokenizer():
    with pytest.raises(TypeError):
        ensure_marker_ids(HashingTokenizer(256, 16))


def test_mark_citations_rewrites_headers_in_order():
    prompt = ("User Query:\nq\n\nContext:\n" + _hdr("PMC1") + _hdr("PMC2")
              + "--- End of context ---\n\nProvide your concise answer now.")
    marked, slots = mark_citations(prompt)
    assert slots == ["PMC1", "PMC2"]
    assert "--- Document ID: PMC1 citemark0 ---" in marked
    assert "--- Document ID: PMC2 citemark1 ---" in marked
    # Non-header text untouched.
    assert marked.endswith("Provide your concise answer now.")


def test_mark_citations_dedups_and_caps_slots():
    prompt = "".join(_hdr(f"D{i}") for i in range(N_SLOTS + 2)) + _hdr("D0")
    marked, slots = mark_citations(prompt)
    assert slots == [f"D{i}" for i in range(N_SLOTS)]
    # Sections beyond the slot budget stay unmarked.
    assert f"--- Document ID: D{N_SLOTS} ---" in marked
    # A repeated doc id shares its first slot.
    assert marked.count("--- Document ID: D0 citemark0 ---") == 2


def test_backend_expands_marker_to_doc_id():
    """_emit_tokens maps a decoded marker id to the prompt's real doc id."""
    from sqe_tpu.models.decoder import DecoderConfig, init_decoder_params
    from sqe_tpu.serving.generation import TPUDecoderBackend

    tok = VocabTokenizer.train(
        ["this is known document answer from"], 256, 64, hash_tail=16)
    cfg = DecoderConfig(vocab_size=256, d_model=32, n_layers=1, n_heads=2,
                        d_ff=64, max_len=64, dtype="float32")
    backend = TPUDecoderBackend(init_decoder_params(cfg), cfg, tok)
    _, slots = mark_citations(_hdr("PMC529461") + _hdr("PMC42"))
    out = []
    toks = [tok.tokenize("known")[0],
            tok.tokenize("document")[0],
            tok.vocab[marker_word(1)],
            0]                                   # PAD -> stop
    stop = backend._emit_tokens(np.asarray(toks, np.int32), slots, out.append)
    assert stop
    assert "".join(out).strip() == "known document PMC42"
    # Marker beyond the prompt's slot table is suppressed: the internal
    # marker word must never leak into a served answer.
    out2: list = []
    backend._emit_tokens(
        np.asarray([tok.vocab[marker_word(5)],
                    tok.tokenize("answer")[0]], np.int32), slots, out2.append)
    assert out2 == ["answer "]


def test_clip_context_sections_preserves_headers():
    from sqe_tpu.serving.citations import clip_context_sections
    from sqe_tpu.serving.prompts import build_prompt, render_context

    body_a = " ".join(f"alpha{i}" for i in range(300))
    body_b = " ".join(f"beta{i}" for i in range(300))
    prompt = build_prompt("what is alpha7?",
                          render_context({"PMCA": body_a, "PMCB": body_b}))
    out = clip_context_sections(prompt, 200)
    # both headers, the query, and the instruction tail survive
    assert "--- Document ID: PMCA ---" in out
    assert "--- Document ID: PMCB ---" in out
    assert "what is alpha7?" in out
    assert "Provide your concise answer now." in out
    assert "--- End of context ---" in out
    # bodies were clipped to roughly the shared budget
    assert len(out.split()) <= 220
    # each body keeps its head AND tail words (per-section middle drop)
    assert "alpha0" in out and "alpha299" in out
    assert "beta0" in out and "beta299" in out


def test_clip_context_sections_noop_cases():
    from sqe_tpu.serving.citations import clip_context_sections

    assert clip_context_sections("no sections here", 10) == "no sections here"
    short = ("--- Document ID: X ---\nsmall body\n\n"
             "--- End of context ---\n\nanswer.")
    assert clip_context_sections(short, 1000) == short


def test_clip_context_sections_waterfill_unequal():
    from sqe_tpu.serving.citations import clip_context_sections

    tiny = " ".join(f"t{i}" for i in range(10))
    huge = " ".join(f"h{i}" for i in range(1000))
    prompt = (f"--- Document ID: T ---\n{tiny}\n\n"
              f"--- Document ID: H ---\n{huge}\n\n"
              "--- End of context ---\n")
    out = clip_context_sections(prompt, 120)
    # the short section keeps everything; only the long one is clipped
    for i in range(10):
        assert f"t{i}" in out
    assert len(out.split()) <= 140
