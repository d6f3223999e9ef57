#!/bin/bash
# Round-3 TPU queue, leg e (r3e) — runs after r3d touches
# /tmp/r3d_queue_done. Sequential single-claimant jobs (CLAUDE.md):
#   1. fit-lm: fresh corpus LM with the 2% holdout + grounded-answer SFT
#      phase (VERDICT r02 #4) into ckpt_trained/lm — the missing half of
#      the decoder quality bar (only the pre-SFT baseline exists).
#   2. post-SFT lm_eval on CPU (no device claim, overlapped with #3).
#   3. fused_scan_profile at 2M and 131k: same-session attribution of the
#      ROADMAP #0 utilization gap (selection vs merge vs session variance).
set -u
cd /root/repo
while [ ! -e /tmp/r3d_queue_done ]; do sleep 30; done
Q=/tmp/r3e_queue.log
echo "r3e start $(date -u)" > "$Q"

timeout 5400 python -m sqe_tpu fit-lm \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_trained \
  > fit_lm_r3.log 2>&1
echo "fit-lm exit=$? $(date -u)" >> "$Q"
sleep 20

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 2400 \
  python scripts/lm_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --n_ppl_batches=16 --n_samples=12 \
  --out=ckpt_trained/lm/lm_eval.json >> "$Q" 2>&1 &
LM_EVAL_PID=$!   # CPU-only: safe to overlap with the device jobs below

timeout 1800 python scripts/fused_scan_profile.py 2097152 \
  > /tmp/scan_profile_2m.log 2>&1
echo "profile 2M exit=$? $(date -u)" >> "$Q"
sleep 20
timeout 1200 python scripts/fused_scan_profile.py 131072 \
  > /tmp/scan_profile_131k.log 2>&1
echo "profile 131k exit=$? $(date -u)" >> "$Q"

wait "$LM_EVAL_PID"
echo "lm_eval exit=$? $(date -u)" >> "$Q"
touch /tmp/r3e_queue_done
echo "r3e done $(date -u)" >> "$Q"
