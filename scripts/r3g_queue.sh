#!/bin/bash
# Round-3 TPU queue, leg g — runs after r3f touches /tmp/r3f_queue_done.
# Re-measures the serve-path percentiles with the round-3 defaults (fused
# micro-batched front half, single blocking round-trip per miss): DESIGN
# §9's e2e table still shows the round-2 unfused-path numbers. Also
# refreshes the stage table with the exact-reservoir percentiles.
set -u
cd /root/repo
while [ ! -e /tmp/r3f_queue_done ]; do sleep 30; done
Q=/tmp/r3g_queue.log
echo "r3g start $(date -u)" > "$Q"
timeout 2400 python scripts/serve_bench.py --n_chunks=20000 \
  --n_requests=512 --concurrency=64 --batching=true \
  > /tmp/serve_bench_r3.log 2>&1
echo "serve_bench exit=$? $(date -u)" >> "$Q"
sleep 20
# Control run: the headline bench in the same session window, so the
# driver's end-of-round BENCH_r03 has a same-day in-repo reference point.
timeout 1200 python bench.py > /tmp/bench_r3_control.log 2>&1
echo "bench.py exit=$? $(date -u)" >> "$Q"
touch /tmp/r3g_queue_done
echo "r3g done $(date -u)" >> "$Q"
