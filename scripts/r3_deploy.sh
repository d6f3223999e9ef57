#!/bin/bash
# Deploy a fitted embedder checkpoint as the serving model: copy the model
# (+ its tokenizer + eval trail) into ckpt_trained and rebuild the corpus
# index under the new model (TPU, ~5-10 min). Run only after
# r3_harvest_decide.py recommends it and the TPU is free.
set -eu
SRC=${1:-ckpt_r3_b1024}
cd /root/repo
test -e "$SRC/model.npz"
cp "$SRC/model.npz" "$SRC/model_manifest.json" "$SRC/tokenizer.json" ckpt_trained/
EVAL=${2:-scripts/r3_b1024_eval.json}   # the candidate's retrieval-eval trail
[ -e "$SRC/fit_eval.json" ] && cp "$SRC/fit_eval.json" ckpt_trained/
[ -e "$EVAL" ] && cp "$EVAL" ckpt_trained/retrieval_eval.json
timeout 1800 python -m sqe_tpu build-index \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_trained
echo "deployed $SRC -> ckpt_trained"
