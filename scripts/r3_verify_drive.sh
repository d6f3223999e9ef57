#!/bin/bash
# /verify drive for the round-3 serve path (fused front half + batching
# default-on + chunked decode): start the real server on the deployed
# checkpoint, probe the contract surfaces, tear down by PID.
set -u
cd /root/repo
OUT=/tmp/r3_verify.log
echo "verify start $(date -u)" > "$OUT"

nohup python -m sqe_tpu serve --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --serve.port=8011 \
  > /tmp/serve_r3.log 2>&1 & echo $! > /tmp/serve_r3.pid

for i in $(seq 1 120); do
  grep -q "listening on" /tmp/serve_r3.log && break
  sleep 5
done
grep "listening on" /tmp/serve_r3.log >> "$OUT" || {
  echo "server never came up" >> "$OUT"; tail -20 /tmp/serve_r3.log >> "$OUT";
  kill "$(cat /tmp/serve_r3.pid)" 2>/dev/null; exit 1; }

probe() { echo "--- $1" >> "$OUT"; shift; "$@" >> "$OUT" 2>&1; echo >> "$OUT"; }

probe health curl -s http://127.0.0.1:8011/health
probe ask curl -s -X POST http://127.0.0.1:8011/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"what role do T cells play in tuberculosis infection?","top_k":3}'
probe ask_repeat curl -s -X POST http://127.0.0.1:8011/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"what role do T cells play in tuberculosis infection?","top_k":3}'
probe empty curl -s -X POST http://127.0.0.1:8011/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"","top_k":3}'
probe big_topk curl -s -X POST http://127.0.0.1:8011/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"gene expression in cancer cells","top_k":50}'
probe malformed curl -s -X POST http://127.0.0.1:8011/ask \
  -H 'Content-Type: application/json' -d '{"user_id": brokenjson'
probe stats curl -s http://127.0.0.1:8011/stats

kill "$(cat /tmp/serve_r3.pid)"
echo "verify done $(date -u)" >> "$OUT"
