#!/bin/bash
# Round-4 TPU queue, leg b (VERDICT r03 #2 and #3): the fused-scan v1-vs-v2
# A/B at 1M/2M/4M (same session, same timing method as the DESIGN §8c
# tables) and the rerank strategy/depth sweep at 2M. Starts as soon as leg
# a's fit-lm releases the chip — leg a's lm_eval is CPU-only and overlaps.
set -u
cd /root/repo
while ! grep -q "fit-lm exit=" /tmp/r4a_queue.log 2>/dev/null; do sleep 30; done
sleep 40   # device-claim release margin after the trainer exits
Q=/tmp/r4b_queue.log
echo "r4b start $(date -u)" > "$Q"

timeout 7200 python scripts/fused_ab_large.py 1 2 4 \
  > /tmp/fused_ab_large.log 2>&1
echo "fused_ab_large exit=$? $(date -u)" >> "$Q"
sleep 20

timeout 3600 python scripts/rerank_ab.py > /tmp/rerank_ab.log 2>&1
echo "rerank_ab exit=$? $(date -u)" >> "$Q"

touch /tmp/r4b_queue_done
echo "r4b done $(date -u)" >> "$Q"
