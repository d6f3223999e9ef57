#!/bin/bash
# Round-3 TPU queue, leg d (r3d) — after the int8-rerank Mosaic fix landed:
# 1. re-measure the 2M and 4M scales, EACH IN A FRESH PROCESS (the 2M IVF
#    phase OOMed in-process after the rerank phase's delete/regen cycle and
#    a failed scale poisons the allocator for the next one);
# 2. re-run the fused-scan v2 A/B whose rerank rows were Mosaic errors;
# 3. finish the mined-hard-negative fine-tune (died at 1250/2500; resume
#    from the step-1000 checkpoint with the schedule tail's lr);
# 4. same-session 3-way retrieval eval (throughput varies 5x run-to-run,
#    comparisons must share a session) + gated deploy of the winner.
# Run detached (setsid) so a dead session cannot kill the queue.
set -u
cd /root/repo
Q=/tmp/r3d_queue.log
echo "r3d start $(date -u)" > "$Q"

for m in 2 4; do
  timeout 2400 python scripts/ann_bench_large.py "$m" \
    > "/tmp/ann_large_${m}m.log" 2>&1
  echo "ann_bench_large ${m}M exit=$? $(date -u)" >> "$Q"
  sleep 20
done

timeout 1200 python scripts/fused_scan2_bench.py > /tmp/fused_scan2_ab.log 2>&1
echo "fused_scan2_bench exit=$? $(date -u)" >> "$Q"
sleep 20

timeout 3600 python -m sqe_tpu fit \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_r3_hardft2 \
  --init_from=ckpt_r3_hardft --hard_k=32 --hard_group=16 --hard_frac=0.5 \
  --fit_batch=1024 --q_shuffle=0.5 --steps=1500 --lr=5e-5 --ckpt_every=500 \
  --eval_queries=0 \
  > fit_hardft2_r3.log 2>&1
echo "hardft2 fit exit=$? $(date -u)" >> "$Q"
sleep 20

for pair in "ckpt_r3_hardft2:r3_hardft2_eval" "ckpt_r3_hardft:r3_hardft_eval" \
            "ckpt_trained:r3_deployed_eval"; do
  ckpt=${pair%%:*}; out=${pair##*:}
  if [ -e "$ckpt/model.npz" ]; then
    timeout 1800 python scripts/retrieval_eval.py --checkpoint_dir="$ckpt" \
      --corpus_dir=/root/reference/PMC --out="scripts/${out}.json" \
      >> "$Q" 2>&1
    echo "$out exit=$? $(date -u)" >> "$Q"
    sleep 20
  fi
done

# Decision: primary = question_full acc@1 (NL questions over the whole
# corpus ARE the serving workload); guard = span acc@1 must not crater.
WINNER=$(python - <<'EOF'
import json
def load(p):
    try: return json.load(open(p))
    except Exception: return None
dep = load("scripts/r3_deployed_eval.json")
cands = {"ckpt_r3_hardft2": load("scripts/r3_hardft2_eval.json"),
         "ckpt_r3_hardft": load("scripts/r3_hardft_eval.json")}
def q(r): return r.get("question_full", r.get("question", {})).get("acc@1", -1)
def s(r): return r.get("span", {}).get("acc@1", -1)
best, best_q = "", -1
for name, r in cands.items():
    if r and q(r) > best_q:
        best, best_q = name, q(r)
if dep and best and best_q >= q(dep) + 0.01 and s(cands[best]) >= s(dep) - 0.05:
    print(best)
EOF
)
echo "winner='$WINNER' $(date -u)" >> "$Q"

if [ -n "$WINNER" ]; then
  EVAL="scripts/r3_hardft2_eval.json"
  [ "$WINNER" = "ckpt_r3_hardft" ] && EVAL="scripts/r3_hardft_eval.json"
  timeout 1800 bash scripts/r3_deploy.sh "$WINNER" "$EVAL" >> "$Q" 2>&1
  echo "deploy exit=$? $(date -u)" >> "$Q"
fi

touch /tmp/r3d_queue_done
echo "r3d done $(date -u)" >> "$Q"
