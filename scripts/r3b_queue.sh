#!/bin/bash
# Round-3 TPU queue, restart (r3b) — the original r3_tpu_queue.sh fit died
# with the session at step 7300/10000; ckpt_r3_b1024 holds the step-7000
# periodic checkpoint. Rather than replay the last 3k steps of the cosine
# schedule, warm-start from it WITH mined hard negatives (ROADMAP #4's
# queued next lever) — one 2500-step fine-tune buys both the schedule tail
# and the new lever. Then same-session 3-way retrieval evals (device
# throughput varies 5x run-to-run; comparisons must share a session).
set -u
cd /root/repo
echo "r3b start $(date -u)" > /tmp/r3b_queue.log

timeout 5400 python -m sqe_tpu fit \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_r3_hardft \
  --init_from=ckpt_r3_b1024 --hard_k=32 --hard_group=16 --hard_frac=0.5 \
  --fit_batch=1024 --q_shuffle=0.5 --steps=2500 --lr=1e-4 --ckpt_every=500 \
  --eval_queries=0 \
  > fit_hardft_r3.log 2>&1
echo "hardft fit exit=$? $(date -u)" >> /tmp/r3b_queue.log
sleep 20   # let the device claim release

for pair in "ckpt_r3_hardft:r3_hardft_eval" "ckpt_r3_b1024:r3_b1024_eval" \
            "ckpt_trained:r3_deployed_eval"; do
  ckpt=${pair%%:*}; out=${pair##*:}
  if [ -e "$ckpt/model.npz" ]; then
    timeout 2400 python scripts/retrieval_eval.py --checkpoint_dir="$ckpt" \
      --corpus_dir=/root/reference/PMC --out="scripts/${out}.json" \
      >> /tmp/r3b_queue.log 2>&1
    echo "$out exit=$? $(date -u)" >> /tmp/r3b_queue.log
    sleep 20
  fi
done
touch /tmp/r3b_queue_done
echo "r3b done $(date -u)" >> /tmp/r3b_queue.log
