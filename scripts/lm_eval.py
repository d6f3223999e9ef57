"""Decoder LM quality bar (VERDICT r02 #4): perplexity + grounded answers.

The round-2 evidence for the on-TPU generation backend was a loss curve
only. This script gives it a measurable quality bar:

1. **Perplexity** on a deterministic eval slice of corpus chunks
   (``idx % 50 == 0``). If the deployed checkpoint's ``lm_fit.json``
   records that this slice was held out of training (round-3 fit-lm does;
   the round-2 checkpoint trained on everything), the number is honest
   held-out perplexity and ``held_out`` is true; otherwise it is
   train-distribution perplexity and labeled as such.

2. **Grounded-answer sampling with mechanical citation checks.** N
   question-style queries (train/eval.py question templates) are paired
   with their source chunk plus one distractor rendered exactly as the
   serve path renders context (serving/prompts.py), and the decoder
   generates an answer under the reference's 6-rule system message
   (app/main.py:519-528). Each answer is checked mechanically:

   - ``cites``        — contains 'Document <id>' (rule 1/2)
   - ``cites_valid``  — every cited id is one of the context's doc ids
                        (rule 4: never cite outside the provided context)
   - ``cites_clean``  — no '.txt' extension in citations (rule 1)
   - ``ends_with_ref``— a citation appears in the final sentence (rule 2)

   Sampled answers are recorded verbatim so the claim is auditable.

Counts are platform-independent; run on CPU to stay off the device claim:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/lm_eval.py \
      [--checkpoint_dir=ckpt_trained] [--corpus_dir=/root/reference/PMC] \
      [--n_ppl_batches=24] [--n_samples=12] \
      [--out=<checkpoint_dir>/lm/lm_eval.json]
"""

from __future__ import annotations

import asyncio
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EVAL_SLICE_MOD = 50  # chunk idx % 50 == 0 -> eval slice (must match fit-lm)


def load_lm(checkpoint_dir: str):
    from sqe_tpu.data.tokenizer import tokenizer_from_dict
    from sqe_tpu.models.decoder import DecoderConfig, decoder_params_from_leaves
    from sqe_tpu.utils import checkpoint as ckpt

    lm_dir = os.path.join(checkpoint_dir, "lm")
    state = ckpt.load_model(lm_dir)
    assert state is not None, f"no LM checkpoint under {lm_dir}"
    cfg = DecoderConfig(**state["model_cfg"])
    params = decoder_params_from_leaves(cfg, state["leaves"])
    tokenizer = tokenizer_from_dict(
        state["tokenizer_state"], cfg.vocab_size, cfg.max_len
    )
    fit_meta = {}
    fit_path = os.path.join(lm_dir, "lm_fit.json")
    if os.path.exists(fit_path):
        with open(fit_path) as f:
            fit_meta = json.load(f)
    return params, cfg, tokenizer, fit_meta


def perplexity(params, cfg, tokenizer, chunks, n_batches: int) -> dict:
    import jax.numpy as jnp

    from sqe_tpu.train.lm import lm_batches, lm_loss

    eval_chunks = [c for i, c in enumerate(chunks) if i % EVAL_SLICE_MOD == 0]
    ces = []
    for bi, batch in enumerate(
        lm_batches(eval_chunks, tokenizer, batch_size=16, seq_len=256,
                   seed=123, epochs=max(1, n_batches))
    ):
        if bi >= n_batches:
            break
        ces.append(float(lm_loss(params, jnp.asarray(batch), cfg=cfg)))
    ce = float(np.mean(ces))
    return {
        "eval_slice": f"idx %% {EVAL_SLICE_MOD} == 0",
        "n_eval_chunks": len(eval_chunks),
        "n_batches": len(ces),
        "cross_entropy": round(ce, 4),
        "perplexity": round(float(np.exp(ce)), 2),
    }


_CITE_RE = re.compile(r"[Dd]ocument[:\s]+([A-Za-z0-9_\-\.]+)")


def check_answer(answer: str, context_ids: list, src_id: str = "") -> dict:
    cited = [m.rstrip(".,;:") for m in _CITE_RE.findall(answer)]
    ctx = set(context_ids)
    sentences = [s for s in re.split(r"(?<=[.!?])\s+", answer.strip()) if s]
    last = sentences[-1] if sentences else ""
    return {
        "cites": bool(cited),
        "cites_valid": bool(cited) and all(c in ctx for c in cited),
        "cites_clean": bool(cited) and not any(c.endswith(".txt") for c in cited),
        "ends_with_ref": bool(_CITE_RE.search(last)),
        # Stronger than cites_valid: cited the TRUE source document, not
        # just any in-context id (context order is shuffled, so a model
        # that always cites slot 0 scores ~0.5 here, not 1.0).
        "cites_src": bool(src_id) and src_id in cited,
        "cited_ids": cited,
    }


async def grounded_samples(params, cfg, tokenizer, chunks, n_samples: int) -> dict:
    from collections import Counter

    from sqe_tpu.serving.generation import TPUDecoderBackend
    from sqe_tpu.serving.prompts import (
        SYSTEM_MESSAGE,
        build_prompt,
        render_context,
    )
    from sqe_tpu.train.eval import build_doc_freq, make_question

    backend = TPUDecoderBackend(params, cfg, tokenizer, seed=11)
    rng = np.random.default_rng(2024)
    doc_freq = build_doc_freq(chunks)

    order = rng.permutation(len(chunks))
    samples, agg = [], Counter()
    for r in order:
        if len(samples) >= n_samples:
            break
        src = chunks[int(r)]
        q = make_question(src.text, rng, doc_freq)
        if q is None:
            continue
        # Distractor must be a DIFFERENT document or the eval's
        # wrong-context robustness is absent for that sample.
        distractor = src
        for off in range(13, 13 + len(order)):
            cand = chunks[int(order[(len(samples) * 7 + off) % len(order)])]
            if cand.doc_id != src.doc_id:
                distractor = cand
                break
        ordered = [src, distractor]
        if rng.random() < 0.5:   # source slot varies (see check_answer)
            ordered.reverse()
        ctx_map = {}
        for c in ordered:
            did = c.doc_id.replace(".txt", "")
            ctx_map[did] = (ctx_map.get(did, "") + "\n" + c.text).strip()
        prompt = build_prompt(q, render_context(ctx_map))
        answer, meta = await backend.generate_with_meta(prompt, SYSTEM_MESSAGE)
        answer = answer or ""
        forced = bool(meta.get("forced_citation"))
        checks = check_answer(answer, list(ctx_map),
                              src_id=src.doc_id.replace(".txt", ""))
        agg.update({k: int(v) for k, v in checks.items()
                    if isinstance(v, bool) and v})
        # Unforced (learned) variant of every rate: a citation that only
        # exists because the grammar tail walked the model through it does
        # NOT count — these are the rates the model earned, and the ones
        # the round-5 gates are set on (VERDICT r04 next #4; the grammar
        # tail stays as a serve-time fallback, not an eval crutch).
        agg.update({f"{k}_unforced": int(v and not forced)
                    for k, v in checks.items() if isinstance(v, bool) and v})
        agg["answered"] += int(bool(answer.strip()))
        agg["answered_unforced"] += int(bool(answer.strip()))
        samples.append({
            "question": q,
            "context_ids": list(ctx_map),
            "answer": answer,
            "forced_citation": forced,
            **{k: v for k, v in checks.items() if k != "cited_ids"},
            "cited_ids": checks["cited_ids"],
        })
    n = max(1, len(samples))
    keys = ("answered", "cites", "cites_valid",
            "cites_clean", "ends_with_ref", "cites_src")
    return {
        "n_samples": len(samples),
        # As-served rates: the grammar-forced tail included (what a client
        # of /ask observes).
        "rates": {k: round(agg.get(k, 0) / n, 3) for k in keys},
        # Learned rates: forced-tail citations do not count.
        "rates_unforced": {k: round(agg.get(f"{k}_unforced", 0) / n, 3)
                           for k in keys},
        # How many answers needed the grammar-forced tail vs citing
        # naturally (serving/generation.py): separates "learned to cite"
        # from "was made to cite".
        "forced_tail_rate": round(
            getattr(backend, "forced_tails", 0) / n, 3),
        "samples": samples,
    }


async def main() -> None:
    checkpoint_dir, corpus_dir = "ckpt_trained", "/root/reference/PMC"
    n_ppl_batches, n_samples, out = 24, 12, None
    for a in sys.argv[1:]:
        k, _, v = a.lstrip("-").partition("=")
        if k == "checkpoint_dir":
            checkpoint_dir = v
        elif k == "corpus_dir":
            corpus_dir = v
        elif k == "n_ppl_batches":
            n_ppl_batches = int(v)
        elif k == "n_samples":
            n_samples = int(v)
        elif k == "out":
            out = v
    out = out or os.path.join(checkpoint_dir, "lm", "lm_eval.json")

    from sqe_tpu.data.corpus import load_corpus

    params, cfg, tokenizer, fit_meta = load_lm(checkpoint_dir)
    # Reproduce the training run's chunking exactly — the holdout slice is
    # defined over chunk INDICES, so a different chunk_size/corpus would
    # silently evaluate train text while claiming held_out.
    hc = fit_meta.get("holdout_corpus") or {}
    chunk_size = int(hc.get("chunk_size", 512))
    chunks = load_corpus(corpus_dir, chunk_size)
    assert chunks, f"no corpus under {corpus_dir}"

    ppl = perplexity(params, cfg, tokenizer, chunks, n_ppl_batches)
    ppl["held_out"] = bool(
        fit_meta.get("holdout_slice")
        and hc.get("corpus_dir") in (None, corpus_dir)
    )
    if fit_meta.get("holdout_slice") and hc.get("corpus_dir") not in (
            None, corpus_dir):
        ppl["held_out_note"] = (
            f"trained on {hc.get('corpus_dir')}, evaluated on {corpus_dir}"
        )
    gen = await grounded_samples(params, cfg, tokenizer, chunks, n_samples)

    result = {
        "checkpoint": os.path.join(checkpoint_dir, "lm"),
        "fit_steps": fit_meta.get("steps"),
        "perplexity": ppl,
        "grounded_generation": gen,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    slim = {**result,
            "grounded_generation": {**gen, "samples": f"{len(gen['samples'])} recorded in {out}"}}
    print(json.dumps(slim, indent=2))


if __name__ == "__main__":
    asyncio.run(main())
