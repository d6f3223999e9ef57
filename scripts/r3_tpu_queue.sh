#!/bin/bash
# Round-3 TPU queue (one device claimant at a time, CLAUDE.md):
#   1. 1024-way-negative contrastive fit with question-shuffle augmentation
#      (VERDICT r02 #1) — periodic checkpoints every 1k steps bound the loss
#      from a dev-chip stall to ~16 min.
#   2. Same-session retrieval evals of the new and the deployed checkpoints
#      (run-to-run device variance makes same-session comparison mandatory).
# Stages tolerate a fit crash: a periodic checkpoint under ckpt_r3_b1024 is
# deployable, so the evals still run against whatever the fit last saved.
set -u
cd /root/repo
echo "queue start $(date -u)" > /tmp/r3_queue.log

timeout 16200 python -m sqe_tpu fit \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_r3_b1024 \
  --fit_batch=1024 --q_shuffle=0.5 --steps=10000 --ckpt_every=1000 \
  > fit_b1024_r3.log 2>&1
echo "fit exit=$? $(date -u)" >> /tmp/r3_queue.log
sleep 20   # let the device claim release

if [ -e ckpt_r3_b1024/model.npz ]; then
  timeout 2400 python scripts/retrieval_eval.py --checkpoint_dir=ckpt_r3_b1024 \
    --corpus_dir=/root/reference/PMC --out=scripts/r3_b1024_eval.json \
    >> /tmp/r3_queue.log 2>&1
  echo "b1024 eval exit=$? $(date -u)" >> /tmp/r3_queue.log
  sleep 20
fi

timeout 2400 python scripts/retrieval_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --out=scripts/r3_deployed_eval.json \
  >> /tmp/r3_queue.log 2>&1
echo "deployed eval exit=$? $(date -u)" >> /tmp/r3_queue.log
touch /tmp/r3_queue_done
echo "queue done $(date -u)" >> /tmp/r3_queue.log
