#!/bin/bash
# Round-5 TPU queue, leg b — the dropped r4h hardware evidence (VERDICT
# r04 next #2), then the 4M v2 operating point (#5), then the b2048
# embedder probe (#3). Waits for the r5a LM fit to release the chip.
set -u
cd /root/repo
while [ ! -e /tmp/r5a_fit_done ]; do sleep 30; done
sleep 20
Q=/tmp/r5b_queue.log
echo "r5b start $(date -u)" > "$Q"
OUT=/tmp/r5_verify.log
echo "verify start $(date -u)" > "$OUT"

# 1. /verify drive: the REAL server with --generation=tpu (deployed LM),
#    contract probes plus 6 CONCURRENT misses so the decode micro-batcher
#    coalesces on hardware (stats counters prove it).
nohup python -m sqe_tpu serve --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --serve.port=8011 --generation=tpu \
  > /tmp/serve_r5.log 2>&1 & echo $! > /tmp/serve_r5.pid

for i in $(seq 1 120); do
  grep -q "listening on" /tmp/serve_r5.log && break
  sleep 5
done
if ! grep "listening on" /tmp/serve_r5.log >> "$OUT"; then
  echo "server never came up" >> "$OUT"; tail -20 /tmp/serve_r5.log >> "$OUT"
  kill "$(cat /tmp/serve_r5.pid)" 2>/dev/null
else
  probe() { echo "--- $1" >> "$OUT"; shift; "$@" >> "$OUT" 2>&1; echo >> "$OUT"; }
  probe health curl -s http://127.0.0.1:8011/health
  probe ask_tpu_gen curl -s -m 400 -X POST http://127.0.0.1:8011/ask \
    -H 'Content-Type: application/json' \
    -d '{"user_id":"u1","chat_id":"c1","query":"what role do T cells play in tuberculosis infection?","top_k":3}'
  probe empty curl -s -X POST http://127.0.0.1:8011/ask \
    -H 'Content-Type: application/json' \
    -d '{"user_id":"u1","chat_id":"c1","query":"","top_k":3}'
  echo "--- concurrent_batch (6 unique misses)" >> "$OUT"
  for i in 1 2 3 4 5 6; do
    curl -s -m 400 -X POST http://127.0.0.1:8011/ask \
      -H 'Content-Type: application/json' \
      -d "{\"user_id\":\"u$i\",\"chat_id\":\"b$i\",\"query\":\"question $i: what is reported about patient outcomes in study $i?\",\"top_k\":3}" \
      >> "$OUT" 2>&1 &
  done
  wait
  echo >> "$OUT"
  probe cache_hit curl -s -m 60 -X POST http://127.0.0.1:8011/ask \
    -H 'Content-Type: application/json' \
    -d '{"user_id":"u1","chat_id":"c1","query":"what role do T cells play in tuberculosis infection?","top_k":3}'
  probe stats curl -s http://127.0.0.1:8011/stats
  kill "$(cat /tmp/serve_r5.pid)" 2>/dev/null
fi
echo "verify done $(date -u)" >> "$OUT"
cp "$OUT" scripts/r5_verify_drive.log
sleep 30

# 2. serve_bench with the concurrent_cold phase, on hardware this time.
timeout 2700 python scripts/serve_bench.py > /tmp/serve_bench_r5.log 2>&1
echo "serve_bench exit=$? $(date -u)" >> "$Q"
sleep 20

# 3. 4M v2 int8+rerank operating point with only the serving working set.
timeout 1800 python scripts/ann_4m_check.py > /tmp/ann_4m_r5.log 2>&1
echo "ann_4m exit=$? $(date -u)" >> "$Q"
touch /tmp/r5b_core_done
sleep 20

# 4. b2048 remat probe (ROADMAP lever b): 20 steps pins steps/s + fits-or-OOMs.
timeout 1200 python -m sqe_tpu fit \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=/tmp/ckpt_b2048_probe \
  --fit_batch=2048 --steps=20 --eval_queries=0 --ckpt_every=100000 \
  > scripts/fit_b2048_probe.log 2>&1
echo "b2048 probe exit=$? $(date -u)" >> "$Q"
touch /tmp/r5b_queue_done
echo "r5b done $(date -u)" >> "$Q"
