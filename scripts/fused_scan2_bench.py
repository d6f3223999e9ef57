"""A/B the v1 fused scan against the v2 column-max kernel on the TPU.

Measures ms/batch, QPS, and epsilon-recall@10 vs the exact oracle for the
bf16 and int8 kernels of both generations (plus the int8+rerank serving
composition) at each requested scale. Writes scripts/fused_scan2_results.json.

Ground truth is the bf16-rounded corpus scored at f32 Precision.HIGHEST
(computed blockwise on device so the 2M-row scale never materializes an
8 GB f32 corpus next to the bf16/int8 planes), with the 1e-5 epsilon band
evaluated in f64 on the host — same contract as scripts/ann_bench_large.py.

Usage: python scripts/fused_scan2_bench.py [N_millions ...]  (default: 0.1 1 2)
       B fixed at 1024 (the headline batch), plus a B=256 column at the
       first scale to pin the serving-batch point.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.index.flat import int8_scan_rerank_topk
from sqe_tpu.ops.fused_scan import (
    fused_scan_topk,
    fused_scan_topk_int8,
    pick_bn,
    quantize_rows,
)
from sqe_tpu.ops.fused_scan2 import fused_scan2_topk, fused_scan2_topk_int8
from sqe_tpu.utils.compile_cache import enable

BLOCK = 131_072


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("k",))
def _exact_block_topk(q, blk_bf16, base, k):
    s = jax.lax.dot_general(
        q, blk_bf16.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    bs, bi = jax.lax.top_k(s, k)
    return bs, bi + base


@jax.jit
def _quant_block(blk_bf16):
    f = blk_bf16.astype(jnp.float32)
    p, ps = quantize_rows(f)
    r, rs = quantize_rows(f - p.astype(jnp.float32) * ps)
    return p, ps, r, rs


def epsilon_recall(v, q, ids, ref_scores, k, eps=1e-5):
    total = 0.0
    v64, q64 = v.astype(np.float64), q.astype(np.float64)
    for i in range(len(q)):
        got = [int(x) for x in ids[i] if 0 <= x < len(v)]
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


def bench_scale(n, b, d=1024, k=10):
    rng = np.random.default_rng(0)
    nc = 4096
    centers = rng.standard_normal((nc, d)).astype(np.float32)
    assign = rng.integers(0, nc, size=n + b)
    allv = centers[assign] + 0.35 * rng.standard_normal(
        (n + b, d)).astype(np.float32)
    allv /= np.linalg.norm(allv, axis=1, keepdims=True) + 1e-9
    n_pad = -(-n // BLOCK) * BLOCK
    vb = np.zeros((n_pad, d), np.float32)
    vb[:n] = allv[:n]
    # bf16-rounded corpus IS the ground-truth corpus (see module docstring).
    vb = vb.astype(jnp.bfloat16)
    vecs_host = np.asarray(vb[:n], dtype=np.float32)
    queries = allv[n:]

    dev = jax.devices()[0]
    v_bf16 = jax.device_put(jnp.asarray(vb), dev)
    q_dev = jax.device_put(jnp.asarray(queries), dev)
    del vb, allv

    # Exact oracle: blockwise f32-HIGHEST top-k, merged on host.
    t0 = time.perf_counter()
    parts_s, parts_i = [], []
    for i in range(n_pad // BLOCK):
        bs, bi = _exact_block_topk(
            q_dev, v_bf16[i * BLOCK:(i + 1) * BLOCK], jnp.int32(i * BLOCK), k)
        parts_s.append(np.asarray(bs))
        parts_i.append(np.asarray(bi))
    all_s = np.concatenate(parts_s, axis=1)
    all_i = np.concatenate(parts_i, axis=1)
    all_s[all_i >= n] = -np.inf
    order = np.argsort(-all_s, axis=1)[:, :k]
    ref_s = np.take_along_axis(all_s, order, axis=1)
    log(f"  oracle: {time.perf_counter() - t0:.1f}s")

    # Int8 primary + residual planes, derived blockwise on device.
    t0 = time.perf_counter()
    qp, qps_, qr, qrs = zip(*[
        _quant_block(v_bf16[i * BLOCK:(i + 1) * BLOCK])
        for i in range(n_pad // BLOCK)
    ])
    v_i8 = jax.block_until_ready(jnp.concatenate(qp))
    v_s = jnp.concatenate(qps_)
    r_i8 = jnp.concatenate(qr)
    r_s = jnp.concatenate(qrs)
    log(f"  quantize: {time.perf_counter() - t0:.1f}s")

    cases = {
        "fused_v1_bf16": lambda: fused_scan_topk(
            q_dev, v_bf16, jnp.int32(n), k=k, bn=pick_bn(n_pad)),
        "fused_v2_bf16": lambda: fused_scan2_topk(
            q_dev, v_bf16, jnp.int32(n), k=k),
        "fused_v1_int8": lambda: fused_scan_topk_int8(
            q_dev, v_i8, v_s, jnp.int32(n), k=k, bn=pick_bn(n_pad)),
        "fused_v2_int8": lambda: fused_scan2_topk_int8(
            q_dev, v_i8, v_s, jnp.int32(n), k=k),
        "v1_int8_rerank": lambda: int8_scan_rerank_topk(
            q_dev, v_i8, v_s, r_i8, r_s, jnp.int32(n), k=k, r=128,
            bn=pick_bn(n_pad)),
        "v2_int8_rerank": lambda: int8_scan_rerank_topk(
            q_dev, v_i8, v_s, r_i8, r_s, jnp.int32(n), k=k, r=128,
            bn=pick_bn(n_pad), scan2=True),
    }
    out = {}
    for tag, fn in cases.items():
        try:
            t0 = time.perf_counter()
            _, ids = fn()
            ids = np.asarray(ids)
            log(f"  {tag}: first call {time.perf_counter() - t0:.1f}s")
            r = epsilon_recall(vecs_host, queries, ids, ref_s, k)
            dt = timed(fn)
            out[tag] = {"ms": round(dt * 1e3, 3),
                        "qps": round(b / dt),
                        "recall": round(r, 4)}
            log(f"  {tag}: {dt*1e3:.2f} ms  {b/dt:,.0f} QPS  recall={r:.4f}")
        except Exception as e:  # noqa: BLE001 — fault-isolate each engine
            out[tag] = {"error": f"{type(e).__name__}: {e}"[:300]}
            log(f"  {tag}: FAILED {type(e).__name__}: {e}")
    return out


def main():
    enable()
    scales = [float(a) for a in sys.argv[1:]] or [0.1, 1.0, 2.0]
    results = {"device": str(jax.devices()[0]), "d": 1024, "k": 10,
               "scales": {}}
    for s in scales:
        n = int(s * 1_000_000)
        for b in ([1024, 256] if s == scales[0] else [1024]):
            log(f"=== N={n:,} B={b}")
            results["scales"][f"n{n}_b{b}"] = bench_scale(n, b)
            with open("scripts/fused_scan2_results.json", "w") as f:
                json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
