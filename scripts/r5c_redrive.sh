#!/bin/bash
# Round-5 leg c: re-drive the real server with the DEPLOYED round-5 LM
# (the leg-b drive started before the deploy decision and served the
# round-4 checkpoint). Probes: cited TPU-decoded answer, concurrent
# misses through the decode micro-batcher, cache hit, stats.
# NOTE: probes run from a helper function, and the concurrent block
# collects explicit PIDs — `wait` with no args would also wait on the
# nohup'd server (the leg-b hang).
set -u
cd /root/repo
OUT=/tmp/r5c_verify.log
echo "r5c redrive start $(date -u)" > "$OUT"

nohup python -m sqe_tpu serve --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --serve.port=8012 --generation=tpu \
  > /tmp/serve_r5c.log 2>&1 & echo $! > /tmp/serve_r5c.pid

for i in $(seq 1 120); do
  grep -q "listening on" /tmp/serve_r5c.log && break
  sleep 5
done
if ! grep "listening on" /tmp/serve_r5c.log >> "$OUT"; then
  echo "server never came up" >> "$OUT"; tail -20 /tmp/serve_r5c.log >> "$OUT"
  kill "$(cat /tmp/serve_r5c.pid)" 2>/dev/null; exit 1
fi
probe() { echo "--- $1" >> "$OUT"; shift; "$@" >> "$OUT" 2>&1; echo >> "$OUT"; }
probe health curl -s http://127.0.0.1:8012/health
probe ask_r5_lm curl -s -m 400 -X POST http://127.0.0.1:8012/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"what is known about il 11 and decidualization of the endometrium?","top_k":3}'
echo "--- concurrent_batch (4 unique misses)" >> "$OUT"
PIDS=""
for i in 1 2 3 4; do
  curl -s -m 400 -X POST http://127.0.0.1:8012/ask \
    -H 'Content-Type: application/json' \
    -d "{\"user_id\":\"u$i\",\"chat_id\":\"r$i\",\"query\":\"question $i: what do the studies report about tuberculosis transmission route $i?\",\"top_k\":3}" \
    >> "$OUT" 2>&1 & PIDS="$PIDS $!"
done
wait $PIDS
echo >> "$OUT"
probe cache_hit curl -s -m 60 -X POST http://127.0.0.1:8012/ask \
  -H 'Content-Type: application/json' \
  -d '{"user_id":"u1","chat_id":"c1","query":"what is known about il 11 and decidualization of the endometrium?","top_k":3}'
probe stats curl -s http://127.0.0.1:8012/stats
kill "$(cat /tmp/serve_r5c.pid)" 2>/dev/null
echo "r5c redrive done $(date -u)" >> "$OUT"
cp "$OUT" scripts/r5c_redrive.log
