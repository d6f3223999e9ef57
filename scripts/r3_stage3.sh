#!/bin/bash
# Round-3 TPU queue, stage 3 — perf artifacts after stage 2:
#   1. serve_bench: percentiles + per-phase dispatch counts under the fused
#      single-round-trip serve path (VERDICT r02 #3's re-measurement).
#   2. bench.py: the round headline (BENCH_r03 source).
#   3. b2048 remat probe: 20 steps pins steps/s + fits-or-OOMs, closing
#      VERDICT r02 #1's "2048-way if it fits" clause with a measurement.
set -u
cd /root/repo
echo "stage3 start $(date -u)" > /tmp/r3_stage3.log

timeout 1800 python scripts/serve_bench.py > /tmp/serve_bench_r3.log 2>&1
echo "serve_bench exit=$? $(date -u)" >> /tmp/r3_stage3.log
sleep 20

timeout 1200 python bench.py > /tmp/bench_r3.json 2>/tmp/bench_r3.log
echo "bench exit=$? $(date -u)" >> /tmp/r3_stage3.log
sleep 20

timeout 1500 python -m sqe_tpu fit \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=/tmp/ckpt_b2048_probe \
  --fit_batch=2048 --steps=20 --eval_queries=0 --ckpt_every=100000 \
  > /tmp/fit_b2048_probe.log 2>&1
echo "b2048 probe exit=$? $(date -u)" >> /tmp/r3_stage3.log
touch /tmp/r3_stage3_done
echo "stage3 done $(date -u)" >> /tmp/r3_stage3.log
