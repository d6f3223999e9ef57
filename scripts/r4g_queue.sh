#!/bin/bash
# Round-4 TPU queue, leg g — sequential single-claimant jobs (CLAUDE.md):
#   1. LM retrain #2 (rope+pointer arch from leg e, PLUS the round-4 SFT
#      fixes: header-preserving section clipping, seq_len 1024 = serve
#      prefill budget, 1-3 distractors). Eval leg runs on CPU overlapped
#      with the next device job, 64 shuffled-context samples (the
#      VERDICT r03 #1 gate: cites_valid >= 0.9, cites_src >= 0.7 — the
#      forced tail guarantees the first, the marker-association training
#      must earn the second).
#   2. sharded_v2_smoke: the per-shard v2 rerank routing on the real chip
#      (kernel path inside shard_map; CPU tests only cover the fallback).
#   3. Embedder ladder round 3 (VERDICT r03 #4): third hard-negative
#      fine-tune, mined with the deployed hardft2 model's own residual
#      confusions (same recipe as r3d: k=32, group=16, frac=0.5).
#   4. Same-session 2-way retrieval eval (candidate vs deployed — the
#      chip's 5x run-to-run variance makes same-session mandatory).
set -u
cd /root/repo
Q=/tmp/r4g_queue.log
echo "r4g start $(date -u)" > "$Q"

timeout 10800 python -m sqe_tpu fit-lm \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_trained \
  --lm_steps=8000 --lm_d_model=512 --lm_layers=6 --lm_heads=8 \
  --lm_d_ff=2048 --lm_sft_steps=8000 --lm_sft_batch=8 \
  > fit_lm_r4g.log 2>&1
echo "fit-lm exit=$? $(date -u)" >> "$Q"
sleep 20

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 10800 \
  python scripts/lm_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --n_ppl_batches=16 --n_samples=64 \
  --out=ckpt_trained/lm/lm_eval.json >> "$Q" 2>&1 &
LM_EVAL_PID=$!   # CPU-only: safe to overlap with the device jobs below

timeout 2400 python scripts/sharded_v2_smoke.py > /tmp/sharded_v2.log 2>&1
echo "sharded_v2_smoke exit=$? $(date -u)" >> "$Q"
sleep 20

timeout 7200 python -m sqe_tpu fit \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_r4_hardft3 \
  --init_from=ckpt_r3_hardft2 --hard_k=32 --hard_group=16 --hard_frac=0.5 \
  --fit_batch=1024 --q_shuffle=0.5 --steps=1500 --lr=5e-5 --ckpt_every=500 \
  --eval_queries=0 \
  > fit_hardft3_r4.log 2>&1
echo "hardft3 fit exit=$? $(date -u)" >> "$Q"
sleep 20

for pair in "ckpt_r4_hardft3:r4_hardft3_eval" "ckpt_trained:r4_deployed_eval"; do
  ckpt=${pair%%:*}; out=${pair##*:}
  if [ -e "$ckpt/model.npz" ]; then
    timeout 2400 python scripts/retrieval_eval.py --checkpoint_dir="$ckpt" \
      --corpus_dir=/root/reference/PMC --out="scripts/${out}.json" \
      >> "$Q" 2>&1
    echo "eval $ckpt exit=$? $(date -u)" >> "$Q"
    sleep 20
  fi
done

wait "$LM_EVAL_PID"
echo "lm_eval exit=$? $(date -u)" >> "$Q"
touch /tmp/r4g_queue_done
echo "r4g done $(date -u)" >> "$Q"
