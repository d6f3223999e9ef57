#!/usr/bin/env bash
# One-command bringup: clean TPU VM -> serving the PMC corpus.
#
# The reference deployed as docker-compose with three sidecars (app + redis +
# opensearch, docker-compose.yml:4-51); this framework is in-process, so the
# deployment unit is one script + one process. Usage on a fresh v5e TPU VM:
#
#   CORPUS_DIR=/data/PMC ./deploy/bootstrap_tpu_vm.sh
#
# Environment knobs (all optional):
#   CORPUS_DIR   corpus of *.txt files to index        (default: PMC)
#   CKPT_DIR     checkpoint directory                  (default: ckpt)
#   PORT         HTTP port                             (default: 8000)
#   SQE_FIT=1    corpus-adapt the embedder before serving (recommended;
#                adds ~10 min on v5e, much better retrieval quality)
#   FIT_STEPS    fit steps                             (default: 3000)
#   SQE_SKIP_INSTALL=1  skip venv/pip (already-provisioned image)
#   EXTRA_FLAGS  extra --key=value flags passed to serve
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CORPUS_DIR="${CORPUS_DIR:-PMC}"
CKPT_DIR="${CKPT_DIR:-ckpt}"
PORT="${PORT:-8000}"
FIT_STEPS="${FIT_STEPS:-3000}"
cd "$REPO_DIR"

if [[ "${SQE_SKIP_INSTALL:-0}" != "1" ]]; then
  echo "[bootstrap] provisioning python env"
  python3 -m venv .venv
  # shellcheck disable=SC1091
  source .venv/bin/activate
  pip install --upgrade pip
  # TPU VM: jax with the libtpu release bundle.
  pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
  pip install numpy
fi

echo "[bootstrap] building native libraries (C++ tokenizer + HNSW builder)"
make -s native || echo "[bootstrap] g++ unavailable; pure-python fallbacks active"

echo "[bootstrap] running the test suite (CPU, 8 virtual devices)"
if [[ "${SQE_SKIP_TESTS:-0}" != "1" ]]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -x -q
fi

if [[ "${SQE_FIT:-0}" == "1" ]]; then
  echo "[bootstrap] corpus-adapting the embedder (${FIT_STEPS} steps)"
  python -m sqe_tpu fit --corpus_dir="$CORPUS_DIR" \
    --checkpoint_dir="$CKPT_DIR" --steps="$FIT_STEPS"
fi

echo "[bootstrap] serving on :$PORT (first start builds + checkpoints the index)"
exec python -m sqe_tpu serve --corpus_dir="$CORPUS_DIR" \
  --checkpoint_dir="$CKPT_DIR" --serve.port="$PORT" ${EXTRA_FLAGS:-}
