"""HNSW beam search: visited-bytemap vs broadcast-compare dedup on the TPU.

Same graph, same session, pipelined device timing (per-call cost ~tens of ms,
so 4-deep pipelining amortizes the ~29 ms tunnel dispatch). Run:
    python scripts/hnsw_bytemap_bench.py [n]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from sqe_tpu.config import HNSWConfig
from sqe_tpu.index import HNSWIndex
from sqe_tpu.index.flat import flat_topk
from sqe_tpu.index.hnsw import hnsw_search_batch
from sqe_tpu.utils.compile_cache import enable


def log(m):
    print(m, file=sys.stderr, flush=True)


def timed(fn, reps=5, pipeline=4):
    np.asarray(fn()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn()
        np.asarray(out[0])
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return best * 1e3


def main():
    enable()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d, b, k = 1024, 1024, 10
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((4096, d)).astype(np.float32)
    assign = rng.integers(0, 4096, size=n + b)
    allv = centers[assign] + 0.35 * rng.standard_normal((n + b, d)).astype(np.float32)
    allv /= np.linalg.norm(allv, axis=1, keepdims=True) + 1e-9
    vecs, queries = allv[:n], allv[n:]

    dev = jax.devices()[0]
    idx = HNSWIndex(HNSWConfig(M=16), embed_dim=d,
                    vector_dtype=jnp.bfloat16, device=dev)
    t0 = time.perf_counter()
    idx.build(vecs, [{"doc_id": str(i), "text": ""} for i in range(n)],
              builder="device")
    log(f"device graph build: {time.perf_counter()-t0:.1f}s "
        f"fused_layout={idx._nbr_vecs is not None}")

    q_dev = jax.device_put(jnp.asarray(queries), dev)
    ref_s, _ = flat_topk(q_dev, idx._vectors, jnp.int32(n), k=k,
                         block_n=100_000, exact=True)
    ref_s = np.asarray(ref_s)

    def recall(ids, eps=1e-5):
        v64 = vecs.astype(np.float64)
        tot = 0.0
        for i in range(256):
            got = [int(x) for x in ids[i] if x >= 0]
            tot += np.sum(v64[got] @ queries[i].astype(np.float64)
                          >= ref_s[i, k - 1] - eps) / k
        return tot / 256

    out = {}
    # (expand=32 is not a supported gather_dot tile shape; E=16 is the
    # measured-best expansion from round 1.)
    for ef, expand in ((72, 16), (96, 16)):
        for impl in ("compare", "bytemap"):
            kwargs = dict(
                k=k, ef=ef, max_iters=ef // expand + 32, n_seeds=32,
                expand=expand, fused_gather=idx._nbr_vecs is not None,
                visited_impl=impl,
            )

            def run():
                return hnsw_search_batch(
                    q_dev, idx._vectors, idx._graph, idx._pivots,
                    idx._nbr_vecs, idx._nbr_scales, **kwargs
                )

            ms = timed(run)
            _, ids = run()
            r = recall(np.asarray(ids))
            out[f"ef{ef}_E{expand}_{impl}"] = {
                "ms": round(ms, 2), "qps": round(b / ms * 1e3),
                "recall": round(r, 4),
            }
            log(f"ef={ef} E={expand} {impl}: {ms:.1f} ms "
                f"-> {b/ms*1e3:,.0f} QPS, recall {r:.4f}")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
