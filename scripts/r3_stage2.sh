#!/bin/bash
# Round-3 TPU queue, stage 2 — runs after r3_tpu_queue.sh touches
# /tmp/r3_queue_done. Sequential single-claimant jobs (CLAUDE.md):
#   1. fit-lm: fresh corpus LM with the 2% holdout + grounded-answer SFT
#      phase (VERDICT r02 #4) into ckpt_trained/lm.
#   2. post-SFT lm_eval on CPU (no device claim).
#   3. ann_bench_large at 1M/2M/4M: pins the int8+rerank recall/QPS rows
#      (VERDICT r02 #2).
# Deployment of the b1024 embedder and serve_bench are decided manually
# from the stage-1 eval artifacts.
set -u
cd /root/repo
while [ ! -e /tmp/r3_queue_done ]; do sleep 30; done
echo "stage2 start $(date -u)" > /tmp/r3_stage2.log

timeout 4500 python -m sqe_tpu fit-lm \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_trained \
  > fit_lm_r3.log 2>&1
echo "fit-lm exit=$? $(date -u)" >> /tmp/r3_stage2.log
sleep 20

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 1800 \
  python scripts/lm_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --n_ppl_batches=16 --n_samples=12 \
  --out=ckpt_trained/lm/lm_eval.json >> /tmp/r3_stage2.log 2>&1 &
LM_EVAL_PID=$!   # CPU-only: safe to overlap with the device jobs below

timeout 3600 python scripts/ann_bench_large.py 1 2 4 \
  > /tmp/ann_large_r3.log 2>&1
echo "ann_bench_large exit=$? $(date -u)" >> /tmp/r3_stage2.log

wait "$LM_EVAL_PID"
echo "lm_eval exit=$? $(date -u)" >> /tmp/r3_stage2.log
touch /tmp/r3_stage2_done
echo "stage2 done $(date -u)" >> /tmp/r3_stage2.log
