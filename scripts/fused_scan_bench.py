"""Measure the fused Pallas scan kernel vs the XLA blocked scan on the TPU.

Usage: python scripts/fused_scan_bench.py [N] [B]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.index.flat import flat_topk
from sqe_tpu.ops.fused_scan import fused_scan_topk, pick_bn
from sqe_tpu.utils.compile_cache import enable


def log(m):
    print(m, file=sys.stderr, flush=True)


def epsilon_recall(v, q, ids, ref_scores, k, eps=1e-5):
    total = 0.0
    v64, q64 = v.astype(np.float64), q.astype(np.float64)
    for i in range(len(q)):
        got = [int(x) for x in ids[i] if x >= 0]
        sims = v64[got] @ q64[i]
        total += np.sum(sims >= ref_scores[i, k - 1] - eps) / k
    return total / len(q)


def timed(fn, reps=5, windows=5):
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(out[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    enable()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    d, k = 1024, 10
    dev = jax.devices()[0]
    log(f"device={dev} n={n} b={b}")

    rng = np.random.default_rng(0)
    nc = 4096
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    assign = rng.integers(0, nc, size=n + b)
    allv = centers[assign] + 0.35 * rng.standard_normal(
        (n + b, d)
    ).astype(np.float32)
    allv /= np.linalg.norm(allv, axis=1, keepdims=True) + 1e-9
    vecs, queries = allv[:n], allv[n:]

    block = 131_072
    n_pad = -(-n // block) * block
    vb = np.zeros((n_pad, d), np.float32)
    vb[:n] = vecs
    v_bf16 = jax.device_put(jnp.asarray(vb, jnp.bfloat16), dev)
    q_dev = jax.device_put(jnp.asarray(queries), dev)

    # Exact oracle for recall (f32 HIGHEST).
    v_f32 = jax.device_put(jnp.asarray(vb[: min(n_pad, 131072 * 8)]), dev)
    ref_s, _ = flat_topk(q_dev, v_f32, jnp.int32(n), k=k,
                         block_n=block, exact=True)
    ref_s = np.asarray(ref_s)
    del v_f32

    results = {}
    for tag, fn in [
        ("blocked_exactk", lambda: flat_topk(
            q_dev, v_bf16, jnp.int32(n), k=k, block_n=block,
            exact=False, approx_topk=False)),
        ("blocked_approx", lambda: flat_topk(
            q_dev, v_bf16, jnp.int32(n), k=k, block_n=block,
            exact=False, approx_topk=True)),
        ("fused_pallas", lambda: fused_scan_topk(
            q_dev, v_bf16, jnp.int32(n), k=k, bn=pick_bn(n_pad))),
        ("fused_int8", None),
    ]:
        if tag == "fused_int8":
            from sqe_tpu.ops.fused_scan import (
                fused_scan_topk_int8, quantize_rows,
            )
            v_i8, v_s = jax.jit(quantize_rows)(
                jax.device_put(jnp.asarray(vb), dev)
            )
            v_i8 = jax.block_until_ready(v_i8)
            fn = lambda: fused_scan_topk_int8(
                q_dev, v_i8, v_s, jnp.int32(n), k=k, bn=pick_bn(n_pad))
        t0 = time.perf_counter()
        s, ids = fn()
        ids = np.asarray(ids)
        log(f"{tag}: first call {time.perf_counter()-t0:.1f}s")
        r = epsilon_recall(vecs, queries, ids, ref_s, k)
        dt = timed(fn)
        qps = b / dt
        results[tag] = (dt * 1e3, qps, r)
        log(f"{tag}: {dt*1e3:.2f} ms/batch -> {qps:,.0f} QPS  recall={r:.4f}")

    print({k2: (round(a, 2), round(bq), round(c, 4))
           for k2, (a, bq, c) in results.items()})


if __name__ == "__main__":
    main()
