#!/bin/bash
# Round-3 TPU queue, leg h (lowest priority) — runs after r3g. The 1M
# block of ann_bench_large_results.json was measured in a degraded device
# window (its int8 scan-only row is 2x slower than the same engine at 2M),
# which reads as a regression; re-measure the scale in a clean process.
set -u
cd /root/repo
while [ ! -e /tmp/r3g_queue_done ]; do sleep 30; done
Q=/tmp/r3h_queue.log
echo "r3h start $(date -u)" > "$Q"
timeout 2400 python scripts/ann_bench_large.py 1 > /tmp/ann_large_1m_redo.log 2>&1
echo "ann_bench_large 1M redo exit=$? $(date -u)" >> "$Q"
touch /tmp/r3h_queue_done
echo "r3h done $(date -u)" >> "$Q"
