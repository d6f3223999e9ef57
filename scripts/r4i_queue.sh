#!/bin/bash
# Round-4 TPU queue, leg i — waits for r4g (hardft3 + evals), then refits
# the LM with the cites_src levers: marker-token upweight (x3) and a
# longer SFT phase (16k steps at B=8). The previous leg's eval passed the
# format gates outright (cites 1.0, cites_valid 0.984, ends_with_ref 1.0)
# and sat at cites_src 0.656 vs the 0.7 gate — the marker CHOICE is the
# one unlearned bit.
set -u
cd /root/repo
while [ ! -e /tmp/r4g_queue_done ]; do sleep 60; done
Q=/tmp/r4i_queue.log
echo "r4i start $(date -u)" > "$Q"

timeout 10800 python -m sqe_tpu fit-lm \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_trained \
  --lm_steps=8000 --lm_d_model=512 --lm_layers=6 --lm_heads=8 \
  --lm_d_ff=2048 --lm_sft_steps=16000 --lm_sft_batch=8 \
  > fit_lm_r4i.log 2>&1
echo "fit-lm exit=$? $(date -u)" >> "$Q"
sleep 20

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 10800 \
  python scripts/lm_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --n_ppl_batches=16 --n_samples=64 \
  --out=ckpt_trained/lm/lm_eval.json >> "$Q" 2>&1
echo "lm_eval exit=$? $(date -u)" >> "$Q"
touch /tmp/r4i_queue_done
echo "r4i done $(date -u)" >> "$Q"
