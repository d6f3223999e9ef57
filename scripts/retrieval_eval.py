"""Evaluate a checkpointed embedder's retrieval quality (span + question).

Standalone so deployed checkpoints can be (re-)measured without re-fitting:

    python scripts/retrieval_eval.py --checkpoint_dir=ckpt_trained \
        --corpus_dir=PMC [--n_queries=256] [--n_chunks=4096] [--out=path.json]

Reports both eval styles (train/eval.py): verbatim-span retrieval (the
round-2 ladder metric) and natural-language-question retrieval (the
reference's actual workload shape, app/main.py:467 — VERDICT r02 #1).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    flags = {"checkpoint_dir": "ckpt_trained", "corpus_dir": "PMC",
             "n_queries": 256, "n_chunks": 4096, "out": ""}
    for arg in argv:
        key, _, raw = arg.lstrip("-").partition("=")
        if key in flags:
            flags[key] = type(flags[key])(raw)

    import jax

    from sqe_tpu.config import ModelConfig
    from sqe_tpu.data.corpus import load_corpus
    from sqe_tpu.data.tokenizer import tokenizer_from_dict
    from sqe_tpu.models import Embedder
    from sqe_tpu.models.embedder import params_from_leaves
    from sqe_tpu.train.eval import (
        embed_chunk_texts,
        question_eval,
        retrieval_eval,
    )
    from sqe_tpu.utils import checkpoint as ckpt
    from sqe_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    model = ckpt.load_model(flags["checkpoint_dir"])
    assert model is not None, f"no model under {flags['checkpoint_dir']}"
    mcfg = ModelConfig(**model["model_cfg"])
    params = params_from_leaves(mcfg, model["leaves"])
    tokenizer = tokenizer_from_dict(model["tokenizer_state"],
                                    mcfg.vocab_size, mcfg.max_len)
    attn_impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    embedder = Embedder(mcfg, params=params, attn_impl=attn_impl,
                        tokenizer=tokenizer)

    all_chunks = load_corpus(flags["corpus_dir"], 512)
    assert all_chunks, f"no corpus under {flags['corpus_dir']}"
    chunks = all_chunks[: flags["n_chunks"]]
    print(f"model: {flags['checkpoint_dir']}  eval chunks: {len(chunks)} "
          f"(full pool: {len(all_chunks)})")

    # Embed the FULL corpus once; the n_chunks ladder pool is its prefix, so
    # its embeddings are the same rows (the forward is batch-invariant).
    emb_full = embed_chunk_texts(embedder, all_chunks)
    emb = emb_full[: len(chunks)]
    report = {
        "checkpoint_dir": flags["checkpoint_dir"],
        "n_chunks": len(chunks),
        # Ladder pool (round-2 protocol, DESIGN §10): comparable to the
        # 128/256/512-way rows.
        "span": retrieval_eval(embedder, chunks,
                               n_queries=flags["n_queries"], chunk_emb=emb),
        "question": question_eval(embedder, chunks,
                                  n_queries=flags["n_queries"], chunk_emb=emb),
        # Serving-realistic pool: the query must find its chunk among the
        # whole corpus, exactly what /ask retrieval does.
        "n_chunks_full": len(all_chunks),
        "span_full": retrieval_eval(embedder, all_chunks,
                                    n_queries=flags["n_queries"],
                                    chunk_emb=emb_full),
        "question_full": question_eval(embedder, all_chunks,
                                       n_queries=flags["n_queries"],
                                       chunk_emb=emb_full),
    }
    print(json.dumps(report, indent=2))
    if flags["out"]:
        with open(flags["out"], "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {flags['out']}")
    return report


if __name__ == "__main__":
    main()
