"""Grounded-answer instruction tuning: data format, masking, truncation.

The serve-time contract being trained is the reference's 6-rule system
message (app/main.py:519-528): extract from the provided context, cite
'Document <id>' without extensions, refuse when the context is unrelated.
"""

from collections import Counter

import numpy as np
import pytest

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.data.tokenizer import PAD_ID, VocabTokenizer
from sqe_tpu.models.decoder import DecoderConfig, head_tail_truncate
from sqe_tpu.train.eval import _fold_word, make_question_with_source
from sqe_tpu.train.lm_sft import (
    REFUSAL,
    build_example,
    fit_lm_sft,
    sft_batches,
    sft_loss,
)


def _corpus():
    rng = np.random.default_rng(3)
    words = [f"zq{i}" for i in range(200)]
    chunks = []
    for d in range(8):
        sents = []
        for s in range(5):
            picks = rng.choice(200, size=10, replace=False)
            sents.append(" ".join(words[p] for p in picks))
        chunks.append(Chunk(f"PMC{d}.txt", 0, ". ".join(sents) + "."))
    return chunks


@pytest.fixture(scope="module")
def setup():
    chunks = _corpus()
    # Include the contract strings so the tiny vocab covers them (the real
    # vocab is trained on PMC English and covers them naturally).
    extra = [REFUSAL, "Document PMC0 PMC1 PMC2 PMC3 PMC4 PMC5 PMC6 PMC7"]
    tok = VocabTokenizer.train([c.text for c in chunks] + extra, 4096, 512)
    doc_freq = Counter()
    for c in chunks:
        doc_freq.update({_fold_word(w) for w in c.text.split()})
    return chunks, tok, doc_freq


def test_head_tail_truncate_keeps_query_and_instruction():
    toks = list(range(100))
    out = head_tail_truncate(toks, 20)
    assert len(out) == 20
    assert out[:10] == list(range(10))          # head (the user query)
    assert out[-10:] == list(range(90, 100))    # tail (the instruction)
    assert head_tail_truncate(toks, 200) == toks


def test_grounded_example_masks_prompt_targets_answer(setup):
    chunks, tok, doc_freq = setup
    rng = np.random.default_rng(0)
    ex = build_example(chunks[0], [chunks[1]], rng, doc_freq, tok,
                       seq_len=256)
    assert ex is not None
    ids, weights, copy_mask = ex
    assert ids.shape == (257,) and weights.shape == (256,)
    assert copy_mask.shape == (256,) and copy_mask.dtype == np.bool_
    # The supervised span decodes to the answer: source sentence + citation.
    sup = [int(ids[t + 1]) for t in range(256) if weights[t] > 0]
    inv = {v: k for k, v in tok.vocab.items()}
    answer_words = [inv.get(t, "?") for t in sup if t != PAD_ID]
    assert "document" in answer_words           # the citation token
    # Doc ids are untokenizable, so the target cites the source section's
    # slot MARKER (serving/citations.py); the decode loop expands it.
    assert answer_words[-1].startswith("citemark")
    # Exactly one EOS position is supervised (the first PAD after answer).
    assert sup.count(PAD_ID) == 1
    # Prompt positions carry zero weight: the first supervised index is far
    # past the start.
    first = int(np.argmax(weights > 0))
    assert first > 32


def test_grounded_example_cites_source_slot(setup):
    """The cited marker is consistent with the prompt's slot table (the
    marker's section header precedes the source text in the prompt), and
    the source's slot varies across examples (shuffled sections — a
    slot-0-always shortcut is not available in training)."""
    chunks, tok, doc_freq = setup
    inv = {v: k for k, v in tok.vocab.items()}
    seen_slots = set()
    for seed in range(12):
        rng = np.random.default_rng(seed)
        ex = build_example(chunks[0], [chunks[1]], rng, doc_freq, tok,
                           seq_len=512)
        if ex is None:
            continue
        ids, weights, _copy = ex
        sup = [int(ids[t + 1]) for t in range(512) if weights[t] > 0]
        marker = inv[sup[-2]]                   # last word before EOS
        assert marker.startswith("citemark")
        slot = int(marker[len("citemark"):])
        seen_slots.add(slot)
        # In the tokenized prompt, the cited marker id must appear right
        # after the source doc's id word "pmc0" in its header:
        # "--- Document ID: pmc0 citemark<slot> ---".
        a_start = int(np.argmax(weights > 0)) + 1   # answer token index
        prompt_ids = [int(t) for t in ids[:a_start]]
        pmc0_id = tok.tokenize("PMC0")[0]
        pairs = list(zip(prompt_ids, prompt_ids[1:]))
        assert (pmc0_id, tok.vocab[marker]) in pairs
    assert seen_slots == {0, 1}                 # shuffle exercised both


def test_refusal_example_targets_rule3_string(setup):
    chunks, tok, doc_freq = setup
    rng = np.random.default_rng(1)
    ex = build_example(chunks[0], [chunks[1]], rng, doc_freq, tok,
                       seq_len=256, refusal=True)
    ids, weights, _copy = ex
    sup = [int(ids[t + 1]) for t in range(256) if weights[t] > 0]
    inv = {v: k for k, v in tok.vocab.items()}
    got = " ".join(inv.get(t, "?") for t in sup if t != PAD_ID)
    from sqe_tpu.data.tokenizer import _words

    # Tokenizer-folded equality: the supervised span IS the refusal string.
    assert got == " ".join(_words(REFUSAL))


def test_sft_batches_shapes_and_mix(setup):
    chunks, tok, _ = setup
    it = sft_batches(chunks, tok, batch_size=8, seq_len=256, seed=0,
                     refusal_frac=0.5)
    ids, weights, copy_mask = next(it)
    assert ids.shape == (8, 257) and weights.shape == (8, 256)
    assert copy_mask.shape == (8, 256)
    assert (weights.sum(axis=1) > 0).all()


def test_copy_mask_covers_context_only(setup):
    """The copy mask marks exactly the context-section token region:
    section headers (slot markers included — they must stay copyable) and
    bodies, but neither the system message / query before the first header
    nor the end-of-context instruction tail the round-4 checkpoint spliced
    into answers (VERDICT r04 weak #3), nor the answer span."""
    chunks, tok, doc_freq = setup
    rng = np.random.default_rng(0)
    ex = build_example(chunks[0], [chunks[1]], rng, doc_freq, tok,
                       seq_len=512)
    ids, weights, copy_mask = ex
    inv = {v: k for k, v in tok.vocab.items()}
    a_start = int(np.argmax(weights > 0)) + 1   # first answer token index
    # Context region is a single contiguous True run inside the prompt.
    marked = np.flatnonzero(copy_mask)
    assert marked.size > 0
    assert marked[-1] < a_start                  # never the answer span
    assert (np.diff(marked) == 1).all()          # contiguous
    # Slot markers sit inside the masked region.
    marker_pos = [t for t in marked
                  if inv.get(int(ids[t]), "").startswith("citemark")]
    assert marker_pos
    # The instruction tail ('provide your concise answer now') and the
    # system message ('you are a helpful ai assistant') are NOT copyable
    # (token-id comparison: these words live in the hash tail of the tiny
    # test vocab, so names are unavailable but ids are deterministic).
    provide_id, helpful_id = (tok.tokenize(w)[0] for w in ("provide",
                                                           "helpful"))
    unmasked_ids = {int(ids[t]) for t in range(a_start) if not copy_mask[t]}
    masked_ids = {int(ids[t]) for t in marked}
    assert provide_id in unmasked_ids and helpful_id in unmasked_ids
    assert provide_id not in masked_ids and helpful_id not in masked_ids


def test_copy_masked_decode_cannot_copy_instruction_tokens():
    """Under cfg.copy_mask='context', a token id present ONLY in the
    instruction region gets zero copy mass at decode: with the generator
    head biased off (p_gen -> 0 via a huge negative gate bias), its
    mixture probability stays at the 1e-9 floor, while context-body
    tokens receive real copy mass."""
    import jax.numpy as jnp

    from sqe_tpu.models.decoder import (
        init_decoder_params,
        init_kv_cache,
        prefill,
    )

    cfg = DecoderConfig(vocab_size=64, d_model=32, n_layers=1, n_heads=2,
                        d_ff=64, max_len=32, pointer=True,
                        copy_mask="context")
    params = init_decoder_params(cfg)
    # Force the mixture fully onto the copy head.
    params["ptr_gate"]["b"] = params["ptr_gate"]["b"] - 1e4
    ids = np.zeros((1, 16), np.int32)
    ids[0, :8] = [5, 6, 7, 8, 9, 10, 11, 12]
    copy_ok = np.zeros((1, 16), np.bool_)
    copy_ok[0, 2:6] = True                      # "context" = ids 7..10
    cache = init_kv_cache(cfg, batch=1)
    cache, logits = prefill(params, jnp.asarray(ids), cache,
                            jnp.asarray(np.array([8], np.int32)),
                            cfg=cfg, copy_ok=jnp.asarray(copy_ok))
    probs = np.exp(np.asarray(logits))[0]
    # Tokens only outside the mask (5, 6 at pos 0-1; 11, 12 at pos 6-7)
    # carry (near-)zero probability; masked-region tokens carry the mass.
    assert probs[[7, 8, 9, 10]].sum() > 0.999
    assert probs[[5, 6, 11, 12]].max() < 1e-6


def test_sft_loss_decreases_on_tiny_fit(setup):
    chunks, tok, _ = setup
    cfg = DecoderConfig(vocab_size=tok.vocab_size, d_model=64, n_layers=1,
                        n_heads=2, d_ff=128, max_len=256)
    from sqe_tpu.models.decoder import init_decoder_params

    params = init_decoder_params(cfg)
    params, losses = fit_lm_sft(params, chunks, cfg, tok, steps=30,
                                batch_size=4, seq_len=128, lr=3e-3,
                                log_every=1000)
    assert len(losses) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_question_with_source_returns_sentence(setup):
    chunks, _, doc_freq = setup
    rng = np.random.default_rng(5)
    q, sent = make_question_with_source(chunks[0].text, rng, doc_freq)
    assert q is not None
    assert sent and sent in chunks[0].text.replace("\n", " ")
