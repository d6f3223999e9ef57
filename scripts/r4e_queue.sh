#!/bin/bash
# Round-4 TPU queue, leg e (VERDICT r03 #1, second attempt): retrain the
# generation LM with the round-4 architecture fix — RoPE + pointer-generator
# + constrained decode (commit 07a18d5) — after leg a's slot-marker-only
# retrain still failed the citation contract (cites 0.047, degenerate
# repetition; diagnosis in models/decoder.py DecoderConfig docstring).
#
# Same scale as leg a (d512/L6/h8, 8000 base + 4000 SFT) so the delta is
# attributable to the architecture, not capacity. fit-lm now defaults to
# --lm_pos_enc=rope --lm_pointer=1.
set -u
cd /root/repo
Q=/tmp/r4e_queue.log
echo "r4e start $(date -u)" > "$Q"

timeout 10800 python -m sqe_tpu fit-lm \
  --corpus_dir=/root/reference/PMC --checkpoint_dir=ckpt_trained \
  --lm_steps=8000 --lm_d_model=512 --lm_layers=6 --lm_heads=8 \
  --lm_d_ff=2048 --lm_sft_steps=4000 \
  > fit_lm_r4e.log 2>&1
echo "fit-lm exit=$? $(date -u)" >> "$Q"
sleep 20

# CPU-only eval: >=50 shuffled-context samples per the round-3 verdict gate
# (cites_valid >= 0.9, cites_src >= 0.7).
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu timeout 7200 \
  python scripts/lm_eval.py --checkpoint_dir=ckpt_trained \
  --corpus_dir=/root/reference/PMC --n_ppl_batches=16 --n_samples=64 \
  --out=ckpt_trained/lm/lm_eval.json >> "$Q" 2>&1
echo "lm_eval exit=$? $(date -u)" >> "$Q"

touch /tmp/r4e_queue_done
echo "r4e done $(date -u)" >> "$Q"
