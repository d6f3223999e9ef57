#!/bin/bash
# Round-4 TPU queue, leg a (VERDICT r03 #1): retrain the generation LM with
# the slot-marker SFT fix (commit 9acd6ce) that round 3 never re-ran, then
# re-evaluate the citation contract on CPU (no device claim).
#
# Scaled vs round 3 (which trained d384/L4 x 3000+2000 steps in ~7 min wall):
# bigger decoder (d512/L6/h8) + 8000 base / 4000 SFT steps — targets both
# judge criticisms: held-out ppl 353 ("word salad") and cites_valid 0.0.
set -u
cd /root/repo
Q=/tmp/r4a_queue.log
echo "r4a start $(date -u)" > "$Q"

timeout 7200 python -m sqe_tpu fit-lm \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_trained \
  --lm_steps=8000 --lm_d_model=512 --lm_layers=6 --lm_heads=8 \
  --lm_d_ff=2048 --lm_sft_steps=4000 \
  > fit_lm_r4.log 2>&1
echo "fit-lm exit=$? $(date -u)" >> "$Q"
sleep 20

# CPU-only eval: >=50 shuffled-context samples per the round-3 verdict gate.
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 5400 \
  python scripts/lm_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --n_ppl_batches=16 --n_samples=64 \
  --out=ckpt_trained/lm/lm_eval.json >> "$Q" 2>&1
echo "lm_eval exit=$? $(date -u)" >> "$Q"

touch /tmp/r4a_queue_done
echo "r4a done $(date -u)" >> "$Q"
