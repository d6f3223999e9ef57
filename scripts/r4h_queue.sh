#!/bin/bash
# Round-4 TPU queue, leg h — waits for r4g, then:
#   1. /verify drive of the retrained LM through the REAL server with
#      --generation=tpu: contract probes plus 4 CONCURRENT /ask misses to
#      exercise the decode micro-batcher on hardware.
#   2. serve_bench with the new cache-cold phase (VERDICT r03 #5).
#   3. bench.py: full artifact with the 1M stage (the B=4096 rerank row
#      now compiles after the SMEM chunking fix).
set -u
cd /root/repo
while [ ! -e /tmp/r4i_queue_done ]; do sleep 60; done
# (b2048 probe appended as the last job below)
Q=/tmp/r4h_queue.log
echo "r4h start $(date -u)" > "$Q"
OUT=/tmp/r4_verify.log
echo "verify start $(date -u)" > "$OUT"

nohup python -m sqe_tpu serve --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --serve.port=8011 --generation=tpu \
  > /tmp/serve_r4.log 2>&1 & echo $! > /tmp/serve_r4.pid

for i in $(seq 1 120); do
  grep -q "listening on" /tmp/serve_r4.log && break
  sleep 5
done
grep "listening on" /tmp/serve_r4.log >> "$OUT" || {
  echo "server never came up" >> "$OUT"; tail -20 /tmp/serve_r4.log >> "$OUT";
  kill "$(cat /tmp/serve_r4.pid)" 2>/dev/null; exit 1; }

probe() { echo "--- $1" >> "$OUT"; shift; "$@" >> "$OUT" 2>&1; echo >> "$OUT"; }

probe health curl -s http://127.0.0.1:8011/health
probe ask_tpu_gen curl -s -m 400 -X POST http://127.0.0.1:8011/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"what role do T cells play in tuberculosis infection?","top_k":3}'
probe empty curl -s -X POST http://127.0.0.1:8011/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"","top_k":3}'
# 4 concurrent unique-query misses -> one micro-batched decode loop.
echo "--- concurrent_batch" >> "$OUT"
for i in 1 2 3 4; do
  curl -s -m 400 -X POST http://127.0.0.1:8011/ask \
    -H 'Content-Type: application/json' \
    -d "{\"user_id\":\"u$i\",\"chat_id\":\"b$i\",\"query\":\"question $i: what is reported about patient outcomes in study $i?\",\"top_k\":3}" \
    >> "$OUT" 2>&1 &
done
wait
echo >> "$OUT"
probe stats curl -s http://127.0.0.1:8011/stats
kill "$(cat /tmp/serve_r4.pid)" 2>/dev/null
echo "verify done $(date -u)" >> "$OUT"
sleep 30

timeout 3600 python scripts/serve_bench.py > /tmp/serve_bench_r4.log 2>&1
echo "serve_bench exit=$? $(date -u)" >> "$Q"
sleep 20

timeout 2400 python bench.py > /tmp/bench_r4b.json 2> /tmp/bench_r4b.log
echo "bench exit=$? $(date -u)" >> "$Q"

touch /tmp/r4h_queue_done
echo "r4h done $(date -u)" >> "$Q"

# b2048 remat probe (ROADMAP lever c): 20 steps pins steps/s + fits-or-OOMs.
timeout 1500 python -m sqe_tpu fit \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=/tmp/ckpt_b2048_probe \
  --fit_batch=2048 --steps=20 --eval_queries=0 --ckpt_every=100000 \
  > scripts/fit_b2048_probe.log 2>&1
echo "b2048 probe exit=$? $(date -u)" >> "$Q"
touch /tmp/r4h_queue_done2
