#!/bin/bash
# Round-3 TPU queue, leg f — runs after r3e touches /tmp/r3e_queue_done.
# rerank gather-strategy A/B + depth sweep at 2M then 131k: decides the
# int8+rerank defaults (kernel vs XLA gather, rerank_depth) from
# measurements instead of the current guess.
set -u
cd /root/repo
while [ ! -e /tmp/r3e_queue_done ]; do sleep 30; done
Q=/tmp/r3f_queue.log
echo "r3f start $(date -u)" > "$Q"
timeout 2400 python scripts/rerank_ab.py 2097152 > /tmp/rerank_ab_2m.log 2>&1
echo "rerank_ab 2M exit=$? $(date -u)" >> "$Q"
cp scripts/rerank_ab_results.json scripts/rerank_ab_2m.json 2>/dev/null
sleep 20
timeout 1800 python scripts/rerank_ab.py 131072 > /tmp/rerank_ab_131k.log 2>&1
echo "rerank_ab 131k exit=$? $(date -u)" >> "$Q"
cp scripts/rerank_ab_results.json scripts/rerank_ab_131k.json 2>/dev/null
touch /tmp/r3f_queue_done
echo "r3f done $(date -u)" >> "$Q"
