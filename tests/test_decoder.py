"""Decoder LM: KV-cache decode parity, LM training, on-TPU backend contract."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sqe_tpu.data.corpus import Chunk
from sqe_tpu.data.tokenizer import PAD_ID, VocabTokenizer
from sqe_tpu.models.decoder import (
    DecoderConfig,
    decode_step,
    decoder_forward,
    init_decoder_params,
    init_kv_cache,
    prefill,
    sample_token,
)

CFG = DecoderConfig(vocab_size=256, d_model=64, n_layers=2, n_heads=2,
                    d_ff=128, max_len=32, dtype="float32")


def test_kv_cache_matches_full_forward():
    """Greedy decode through prefill+decode_step must equal greedy decode by
    full-forward recompute at every step (the KV cache is exact, not an
    approximation)."""
    params = init_decoder_params(CFG, jax.random.PRNGKey(1))
    prompt = np.array([[5, 9, 17, 3]], np.int32)
    length = prompt.shape[1]

    # Oracle: grow the sequence, full forward each step, take argmax.
    seq = prompt.copy()
    oracle_tokens = []
    for _ in range(6):
        logits = decoder_forward(params, jnp.asarray(seq), cfg=CFG)
        nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
        oracle_tokens.append(nxt)
        seq = np.concatenate([seq, [[nxt]]], axis=1)

    # KV-cache path.
    ids = np.zeros((1, 16), np.int32)
    ids[0, :length] = prompt[0]
    cache = init_kv_cache(CFG, batch=1)
    cache, logits = prefill(params, jnp.asarray(ids), cache,
                            jnp.asarray([length], np.int32), cfg=CFG)
    got_tokens = []
    pos = length
    for _ in range(6):
        nxt = int(np.asarray(jnp.argmax(logits[0])))
        got_tokens.append(nxt)
        cache, logits = decode_step(params, jnp.asarray([nxt], jnp.int32),
                                    cache, jnp.asarray([pos], jnp.int32),
                                    cfg=CFG)
        pos += 1

    assert got_tokens == oracle_tokens


def test_decode_chunk_matches_per_token_loop():
    """decode_chunk (N steps per device program) must emit the EXACT token
    sequence the per-token sample/step loop produces for the same seed —
    key-split chain included — up to the first PAD, after which it pads."""
    from sqe_tpu.models.decoder import decode_chunk

    params = init_decoder_params(CFG, jax.random.PRNGKey(4))
    prompt = np.array([[7, 2, 11]], np.int32)
    length = prompt.shape[1]
    ids = np.zeros((1, 8), np.int32)
    ids[0, :length] = prompt[0]
    n_new, temp, top_k = 12, 0.8, 8

    def run_loop():
        cache = init_kv_cache(CFG, batch=1)
        cache, logits = prefill(params, jnp.asarray(ids), cache,
                                jnp.asarray([length], np.int32), cfg=CFG)
        key = jax.random.PRNGKey(123)
        out, pos = [], length
        for _ in range(n_new):
            key, sub = jax.random.split(key)
            tok = int(np.asarray(sample_token(logits, sub, temp, top_k))[0])
            if tok == PAD_ID:
                break
            out.append(tok)
            cache, logits = decode_step(params, jnp.asarray([tok], jnp.int32),
                                        cache, jnp.asarray([pos], jnp.int32),
                                        cfg=CFG)
            pos += 1
            if pos >= CFG.max_len:
                break
        return out

    def run_chunked(chunk):
        cache = init_kv_cache(CFG, batch=1)
        cache, logits = prefill(params, jnp.asarray(ids), cache,
                                jnp.asarray([length], np.int32), cfg=CFG)
        key = jax.random.PRNGKey(123)
        pos = jnp.asarray([length], jnp.int32)
        out, emitted = [], 0
        while emitted < n_new:
            n = min(chunk, n_new - emitted)
            cache, logits, pos, key, toks = decode_chunk(
                params, cache, logits, pos, key, jnp.float32(temp),
                cfg=CFG, n_tokens=n, top_k=top_k, pad_id=PAD_ID)
            stop = False
            for t in np.asarray(toks)[0]:
                if int(t) == PAD_ID:
                    stop = True
                    break
                out.append(int(t))
            emitted += n
            if stop:
                break
        return out

    expect = run_loop()
    assert expect, "degenerate test: loop emitted nothing"
    for chunk in (1, 4, 12):
        assert run_chunked(chunk) == expect, f"chunk={chunk}"


ROPE_PTR_CFG = DecoderConfig(vocab_size=256, d_model=64, n_layers=2,
                             n_heads=2, d_ff=128, max_len=32,
                             dtype="float32", pos_enc="rope", pointer=True)


@pytest.mark.parametrize("cfg", [
    DecoderConfig(vocab_size=256, d_model=64, n_layers=2, n_heads=2,
                  d_ff=128, max_len=32, dtype="float32", pos_enc="rope"),
    DecoderConfig(vocab_size=256, d_model=64, n_layers=2, n_heads=2,
                  d_ff=128, max_len=32, dtype="float32", pointer=True),
    ROPE_PTR_CFG,
], ids=["rope", "pointer", "rope+pointer"])
def test_kv_cache_parity_rope_pointer(cfg):
    """The KV-cache decode path (prefill + decode_step, including the RoPE
    rotation applied at cache-write time and the pointer planes) must be
    exact against the full-forward oracle for every architecture variant."""
    params = init_decoder_params(cfg, jax.random.PRNGKey(2))
    prompt = np.array([[5, 9, 17, 3, 9]], np.int32)
    length = prompt.shape[1]

    seq = prompt.copy()
    oracle_tokens = []
    for _ in range(5):
        logits = decoder_forward(params, jnp.asarray(seq), cfg=cfg)
        nxt = int(np.asarray(jnp.argmax(logits[0, -1])))
        oracle_tokens.append(nxt)
        seq = np.concatenate([seq, [[nxt]]], axis=1)

    ids = np.zeros((1, 16), np.int32)
    ids[0, :length] = prompt[0]
    cache = init_kv_cache(cfg, batch=1)
    cache, logits = prefill(params, jnp.asarray(ids), cache,
                            jnp.asarray([length], np.int32), cfg=cfg)
    got_tokens = []
    pos = length
    for _ in range(5):
        nxt = int(np.asarray(jnp.argmax(logits[0])))
        got_tokens.append(nxt)
        cache, logits = decode_step(params, jnp.asarray([nxt], jnp.int32),
                                    cache, jnp.asarray([pos], jnp.int32),
                                    cfg=cfg)
        pos += 1
    assert got_tokens == oracle_tokens


def test_pointer_target_log_probs_match_full_mixture():
    """The memory-light training path (forward_target_log_probs: copy term
    evaluated at the target only) must equal indexing the full-vocabulary
    mixture (decoder_forward) at the target — the [B,L,V]-free trick is an
    algebraic identity, not an approximation."""
    from sqe_tpu.models.decoder import forward_target_log_probs

    cfg = ROPE_PTR_CFG
    params = init_decoder_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, size=(2, 12)).astype(np.int32)
    # Force repeated tokens so the copy-match mask has multi-hit rows.
    ids[:, 6:] = ids[:, :6]
    full_lp = decoder_forward(params, jnp.asarray(ids[:, :-1]), cfg=cfg)
    want = np.take_along_axis(np.asarray(full_lp), ids[:, 1:, None], 2)[..., 0]
    got = np.asarray(
        forward_target_log_probs(params, jnp.asarray(ids), cfg=cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pointer_log_probs_normalized():
    """decoder_forward for a pointer config returns log-probabilities of a
    proper distribution (the gen/copy mixture sums to 1)."""
    cfg = ROPE_PTR_CFG
    params = init_decoder_params(cfg, jax.random.PRNGKey(5))
    ids = np.array([[4, 7, 4, 9]], np.int32)
    lp = np.asarray(decoder_forward(params, jnp.asarray(ids), cfg=cfg))
    total = np.exp(lp).sum(axis=-1)
    np.testing.assert_allclose(total, 1.0, atol=1e-4)


def test_decode_chunk_constraints():
    """Constrained decode: (a) zero bias + zero penalty reproduces the
    unconstrained token stream bit-for-bit (and returns the counts carry);
    (b) a -1e9 logit_bias entry makes that token unsampleable; (c) the
    repetition penalty changes greedy argmax once a token's count exceeds
    the runner-up margin."""
    from sqe_tpu.models.decoder import decode_chunk

    params = init_decoder_params(CFG, jax.random.PRNGKey(4))
    prompt = np.array([[7, 2, 11]], np.int32)
    length = prompt.shape[1]
    ids = np.zeros((1, 8), np.int32)
    ids[0, :length] = prompt[0]

    def run(logit_bias=None, rep=0.0, counts=None, temp=0.8):
        cache = init_kv_cache(CFG, batch=1)
        cache, logits = prefill(params, jnp.asarray(ids), cache,
                                jnp.asarray([length], np.int32), cfg=CFG)
        kwargs = {}
        if logit_bias is not None or counts is not None:
            kwargs["logit_bias"] = jnp.asarray(
                logit_bias if logit_bias is not None
                else np.zeros(CFG.vocab_size, np.float32))
            kwargs["rep_penalty"] = jnp.float32(rep)
            kwargs["counts"] = jnp.asarray(
                counts if counts is not None
                else np.zeros((1, CFG.vocab_size), np.float32))
        out = decode_chunk(
            params, cache, logits, jnp.asarray([length], jnp.int32),
            jax.random.PRNGKey(123), jnp.float32(temp),
            cfg=CFG, n_tokens=10, top_k=8, pad_id=PAD_ID, **kwargs)
        toks = np.asarray(out[4])[0]
        cnts = np.asarray(out[5]) if len(out) > 5 else None
        return toks, cnts

    base, _ = run()
    neutral, cnts = run(logit_bias=np.zeros(CFG.vocab_size, np.float32))
    assert list(neutral) == list(base)
    assert cnts is not None
    emitted = [t for t in base if t != PAD_ID]
    # counts record exactly the emitted (non-PAD) tokens
    assert cnts.sum() == len(emitted)
    for t in set(emitted):
        assert cnts[0, t] == emitted.count(t)

    # (b) ban every token the unconstrained run emitted -> none may appear
    bias = np.zeros(CFG.vocab_size, np.float32)
    for t in set(emitted):
        bias[t] = -1e9
    banned, _ = run(logit_bias=bias)
    assert not (set(banned) - {PAD_ID}) & set(emitted)

    # (c) greedy + huge penalty: no immediate self-repetition
    greedy, _ = run(logit_bias=np.zeros(CFG.vocab_size, np.float32),
                    rep=1e4, temp=0.0)
    live = [t for t in greedy if t != PAD_ID]
    assert all(a != b for a, b in zip(live, live[1:]))


def test_sample_token_modes():
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
    key = jax.random.PRNGKey(0)
    assert int(sample_token(logits, key, 0.0, top_k=3)[0]) == 1  # greedy
    # sampling stays within top-k support
    for i in range(5):
        t = int(sample_token(logits, jax.random.PRNGKey(i), 1.0, top_k=2)[0])
        assert t in (1, 2)


@pytest.fixture(scope="module")
def tiny_lm():
    """Train a tiny LM on a looping corpus so next-word structure is learnable."""
    from sqe_tpu.train.lm import fit_lm

    text = " ".join(["alpha beta gamma delta epsilon"] * 40)
    chunks = [Chunk(f"d{i}", 0, text) for i in range(8)]
    tok = VocabTokenizer.train([text], vocab_size=64, max_len=64, hash_tail=8)
    cfg = DecoderConfig(vocab_size=64, d_model=64, n_layers=2, n_heads=2,
                        d_ff=128, max_len=64, dtype="float32")
    params, losses = fit_lm(chunks, cfg, tok, steps=60, batch_size=8,
                            seq_len=24, lr=3e-3)
    return params, losses, cfg, tok


def test_fit_lm_learns(tiny_lm):
    params, losses, cfg, tok = tiny_lm
    assert losses[-1] < losses[0] * 0.5
    # the cycle is deterministic: greedy continuation of "alpha beta" is "gamma"
    ids = np.zeros((1, 8), np.int32)
    toks = tok.tokenize("alpha beta")
    ids[0, :len(toks)] = toks
    cache = init_kv_cache(cfg, batch=1)
    _, logits = prefill(params, jnp.asarray(ids), cache,
                        jnp.asarray([len(toks)], np.int32), cfg=cfg)
    nxt = int(np.asarray(jnp.argmax(logits[0])))
    assert nxt == tok.tokenize("gamma")[0]


def test_tpu_decoder_backend_contract(tiny_lm):
    from sqe_tpu.serving.generation import TPUDecoderBackend

    params, _losses, cfg, tok = tiny_lm
    backend = TPUDecoderBackend(params, cfg, tok, temperature=0.0,
                                max_new_tokens=8)
    answer = asyncio.run(backend.generate("alpha beta"))
    assert answer and answer.split()[0] == "gamma"

    async def collect():
        return [c async for c in backend.stream("alpha beta")]

    chunks = asyncio.run(collect())
    assert chunks and chunks[0].strip() == "gamma"


def test_forced_citation_tail():
    """An answer that exhausts its token budget without citing gets the
    grammar-constrained tail: '... document <doc-id>' with the id drawn
    from the prompt's marked sections (rule 2: every answer must end with
    a reference)."""
    from sqe_tpu.serving.generation import TPUDecoderBackend

    text = " ".join(f"w{i}" for i in range(40)) + " document "
    tok = VocabTokenizer.train([text + " citemark0 citemark1"],
                               vocab_size=128, max_len=256, hash_tail=8)
    cfg = DecoderConfig(vocab_size=128, d_model=32, n_layers=1, n_heads=2,
                        d_ff=64, max_len=256, dtype="float32",
                        pos_enc="rope", pointer=True)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    # Make EOS(PAD) and the marker words unreachable for the free-running
    # phase by construction: a strong negative lm_head column for PAD.
    params["lm_head"] = params["lm_head"].at[:, PAD_ID].add(-100.0)
    backend = TPUDecoderBackend(params, cfg, tok, temperature=0.0,
                                max_new_tokens=10)
    prompt = ("--- Document ID: PMCX ---\n" + text + "\n\n"
              "--- Document ID: PMCY ---\nother words here\n\n"
              "--- End of context ---\n")
    answer, meta = asyncio.run(backend.generate_with_meta(prompt))
    assert answer, "no answer"
    words = answer.split()
    assert words[-1] in ("PMCX", "PMCY"), answer
    assert words[-2] == "document", answer
    # The grammar-imposed citation is flagged per-response (round-4
    # advisor finding) and counted in the backend stat.
    assert meta.get("forced_citation") is True
    assert backend.forced_tails == 1


def test_backend_close_fails_pending_and_rebinds():
    """close() cancels the worker and drains queued futures; the backend
    still serves after (a fresh worker rebinds on next submit)."""
    from sqe_tpu.serving.generation import TPUDecoderBackend

    tok = VocabTokenizer.train(["alpha beta gamma delta"],
                               vocab_size=64, max_len=32, hash_tail=8)
    cfg = DecoderConfig(vocab_size=64, d_model=16, n_layers=1, n_heads=2,
                        d_ff=32, max_len=32, dtype="float32",
                        pos_enc="rope", pointer=True)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    backend = TPUDecoderBackend(params, cfg, tok, temperature=0.0,
                                max_new_tokens=4)

    async def go():
        first = await backend.generate("alpha beta")
        await backend.close()
        assert backend._worker is None
        second = await backend.generate("alpha beta")   # rebinds cleanly
        return first, second

    first, second = asyncio.run(go())
    assert first == second


def test_batched_decode_matches_sequential():
    """The decode micro-batcher: N concurrent generate() calls decode as
    ONE batched device loop (batches counter == 1), and each row's answer
    is identical to running that request alone at greedy temperature."""
    from sqe_tpu.serving.generation import TPUDecoderBackend

    text = " ".join(f"w{i}" for i in range(60)) + " document "
    tok = VocabTokenizer.train([text + " citemark0 citemark1"],
                               vocab_size=128, max_len=256, hash_tail=8)
    cfg = DecoderConfig(vocab_size=128, d_model=32, n_layers=1, n_heads=2,
                        d_ff=64, max_len=256, dtype="float32",
                        pos_enc="rope", pointer=True)
    params = init_decoder_params(cfg, jax.random.PRNGKey(0))
    prompts = [
        ("--- Document ID: PMCA ---\n" + text + "\n\n--- End of context ---\n"
         "\nwhat is w3?"),
        ("--- Document ID: PMCB ---\nother words entirely\n\n"
         "--- End of context ---\n\nwhat is here?"),
        ("--- Document ID: PMCC ---\n" + text[::-1] + "\n\n"
         "--- End of context ---\n\nreversed?"),
    ]

    seq_backend = TPUDecoderBackend(params, cfg, tok, temperature=0.0,
                                    max_new_tokens=8, decode_batch=1)
    expect = [asyncio.run(seq_backend.generate(p)) for p in prompts]

    batch_backend = TPUDecoderBackend(params, cfg, tok, temperature=0.0,
                                      max_new_tokens=8, decode_batch=8)

    async def run_all():
        return await asyncio.gather(*(batch_backend.generate(p)
                                      for p in prompts))

    got = asyncio.run(run_all())
    assert batch_backend.batches == 1, batch_backend.batches
    assert batch_backend.requests == 3
    assert got == expect
