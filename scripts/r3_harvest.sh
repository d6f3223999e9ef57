#!/bin/bash
# Round-3 harvest watcher: wait for the b1024 fit process to exit (it holds
# the single TPU claim), then immediately evaluate the new checkpoint and
# re-evaluate the deployed one in the same session (the chip's run-to-run
# variance makes same-session comparison mandatory — CLAUDE.md).
# kill -0 sends NO signal (existence probe only): never signal a claimant.
set -u
PID=${1:?usage: r3_harvest.sh <fit_pid>}
cd /root/repo
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
sleep 15   # let the device claim release
echo "fit exited; evaluating ckpt_r3_b1024 $(date)" > /tmp/r3_harvest.log
timeout 2400 python scripts/retrieval_eval.py --checkpoint_dir=ckpt_r3_b1024 \
  --corpus_dir=/root/reference/PMC --out=scripts/r3_b1024_eval.json \
  >> /tmp/r3_harvest.log 2>&1
echo "evaluating deployed ckpt_trained $(date)" >> /tmp/r3_harvest.log
timeout 2400 python scripts/retrieval_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --out=scripts/r3_deployed_eval.json \
  >> /tmp/r3_harvest.log 2>&1
echo "harvest done $(date)" >> /tmp/r3_harvest.log
touch /tmp/r3_harvest_done
