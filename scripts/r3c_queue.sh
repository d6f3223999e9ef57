#!/bin/bash
# Round-3 TPU queue, final leg (r3c). The r3b fine-tune died with its
# session at step 1250/2500; ckpt_r3_hardft holds the step-1000 periodic
# checkpoint. With the round's wall-clock nearly spent, evidence beats
# marginal training: evaluate the two round-3 candidates against the
# deployed model in ONE session (device throughput varies 5x run-to-run —
# CLAUDE.md), auto-deploy the winner under the question_full-primary gate
# (scripts/r3_harvest_decide.py's rule), then pin the int8+rerank scale
# rows (VERDICT r02 #2) and the fused-scan v2 A/B.
# Run detached (setsid) so a dead session cannot kill the queue.
set -u
cd /root/repo
Q=/tmp/r3c_queue.log
echo "r3c start $(date -u)" > "$Q"

for pair in "ckpt_r3_hardft:r3_hardft_eval" "ckpt_r3_b1024:r3_b1024_eval" \
            "ckpt_trained:r3_deployed_eval"; do
  ckpt=${pair%%:*}; out=${pair##*:}
  timeout 1500 python scripts/retrieval_eval.py --checkpoint_dir="$ckpt" \
    --corpus_dir=/root/reference/PMC --out="scripts/${out}.json" \
    >> "$Q" 2>&1
  echo "$out exit=$? $(date -u)" >> "$Q"
  sleep 15
done

# Decision: primary = question_full acc@1 (the serving workload is NL
# questions over the whole corpus); guard = span acc@1 must not crater.
WINNER=$(python - <<'EOF'
import json
def load(p):
    try: return json.load(open(p))
    except Exception: return None
dep = load("scripts/r3_deployed_eval.json")
cands = {"ckpt_r3_hardft": load("scripts/r3_hardft_eval.json"),
         "ckpt_r3_b1024": load("scripts/r3_b1024_eval.json")}
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
  timeout 1800 bash scripts/r3_deploy.sh "$WINNER" >> "$Q" 2>&1
  echo "deploy exit=$? $(date -u)" >> "$Q"
  sleep 15
fi

timeout 2400 python scripts/ann_bench_large.py 1 2 4 \
  > /tmp/ann_large_r3.log 2>&1
echo "ann_bench_large exit=$? $(date -u)" >> "$Q"
sleep 15

timeout 900 python scripts/fused_scan2_bench.py > /tmp/fused_scan2_ab.log 2>&1
echo "fused_scan2_bench exit=$? $(date -u)" >> "$Q"

touch /tmp/r3c_queue_done
echo "r3c done $(date -u)" >> "$Q"
