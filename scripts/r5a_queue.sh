#!/bin/bash
# Round-5 TPU queue, leg a — the round's LM retrain (VERDICT r04 next #1):
# copy head masked to context-section positions (cfg.copy_mask=context),
# marker upweight x2 (down from the too-blunt x3), SFT 12000 steps (full
# cosine schedule, shorter than r4i's 16k which collapsed late). Trains to
# ckpt_r5_lm so the deployed ckpt_trained/lm is untouched until the r5
# decide step sees the eval.
set -u
cd /root/repo
Q=/tmp/r5a_queue.log
echo "r5a start $(date -u)" > "$Q"

timeout 4500 python -m sqe_tpu fit-lm \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_r5_lm \
  --lm_steps=8000 --lm_d_model=512 --lm_layers=6 --lm_heads=8 \
  --lm_d_ff=2048 --lm_sft_steps=12000 --lm_sft_batch=8 \
  > fit_lm_r5.log 2>&1
echo "fit-lm exit=$? $(date -u)" >> "$Q"
touch /tmp/r5a_fit_done
sleep 15

# Eval on CPU (off the device claim) so the TPU frees up for leg b.
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 5400 \
  python scripts/lm_eval.py --checkpoint_dir=ckpt_r5_lm \
  --corpus_dir=/root/reference/PMC --n_ppl_batches=16 --n_samples=64 \
  --out=ckpt_r5_lm/lm/lm_eval.json >> "$Q" 2>&1 &
echo $! > /tmp/r5_eval.pid
touch /tmp/r5a_queue_done
echo "r5a done (eval continues on CPU, pid $(cat /tmp/r5_eval.pid)) $(date -u)" >> "$Q"
