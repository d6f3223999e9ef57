"""4M-row v2 int8+rerank operating point (VERDICT r04 next #5).

Round 4's A/B harness (scripts/fused_ab_large.py) reported v2_int8 OOM at
4M — but that harness holds the f32 source plane (16 GB), the bf16 plane
(8 GB), AND both int8 planes simultaneously; the SERVING working set at
4M is just primary+residual int8 + scales = ~8.1 GB, half of v5e HBM.
This script measures the serving path honestly:

- vectors are generated, normalized, and quantized ON DEVICE in blocks
  (jax PRNG + dynamic_update_slice) — no host f32 plane ever exists and
  nothing rides the 32 MB/s tunnel;
- ground truth is a blocked top-k over the DEQUANTIZED planes (block-wise
  dequant, 1 GB f32 peak) — reconstruction error is ~1e-8 cosine
  (index/flat.py int8_rerank_topk docstring), so this is the exact
  ordering for any margin the recall gate can see;
- the measured engine is int8_scan_rerank_topk(scan2=True) with the
  serving defaults (R=32), the scan_plan route for int8+rerank at auto.

Writes scripts/ann_4m_results.json. Needs the real TPU; ~10 min.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 4 * 1024 * 1024
D = 1024
BN = 262144            # build/oracle block
K, R = 10, 32
NQ = 1024

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ann_4m_results.json")


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4))
def _build_block(key, prim, ps, resid, rs, start):
    v = jax.random.normal(key, (BN, D), jnp.float32)
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    s = jnp.maximum(jnp.max(jnp.abs(v), axis=1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)
    r = v - q.astype(jnp.float32) * s
    rsc = jnp.maximum(jnp.max(jnp.abs(r), axis=1, keepdims=True) / 127.0,
                      1e-12)
    rq = jnp.clip(jnp.round(r / rsc), -127, 127).astype(jnp.int8)
    upd = jax.lax.dynamic_update_slice
    return (upd(prim, q, (start, 0)), upd(ps, s, (start, 0)),
            upd(resid, rq, (start, 0)), upd(rs, rsc, (start, 0)))


@functools.partial(jax.jit, static_argnames=("k",))
def _oracle_topk(queries, prim, ps, resid, rs, *, k):
    """Blocked exact top-k over the dequantized planes (1 GB f32 peak)."""
    nb = prim.shape[0] // BN
    b = queries.shape[0]

    def body(carry, blk_i):
        top_s, top_i = carry
        start = blk_i * BN
        pb = jax.lax.dynamic_slice(prim, (start, 0), (BN, D))
        sb = jax.lax.dynamic_slice(ps, (start, 0), (BN, 1))
        rb = jax.lax.dynamic_slice(resid, (start, 0), (BN, D))
        rsb = jax.lax.dynamic_slice(rs, (start, 0), (BN, 1))
        vb = pb.astype(jnp.float32) * sb + rb.astype(jnp.float32) * rsb
        s = jax.lax.dot_general(queries, vb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (b, BN), 1)
        bs, bl = jax.lax.top_k(s, k)
        bi = jnp.take_along_axis(ids, bl, axis=1)
        cs = jnp.concatenate([top_s, bs], axis=1)
        ci = jnp.concatenate([top_i, bi], axis=1)
        ms, sel = jax.lax.top_k(cs, k)
        return (ms, jnp.take_along_axis(ci, sel, axis=1)), None

    init = (jnp.full((b, k), -jnp.inf, jnp.float32),
            jnp.full((b, k), -1, jnp.int32))
    (ts, ti), _ = jax.lax.scan(body, init,
                               jnp.arange(nb, dtype=jnp.int32))
    return ts, ti


def main() -> None:
    from sqe_tpu.index.flat import int8_scan_rerank_topk
    from sqe_tpu.ops.fused_scan import pick_bn

    t0 = time.perf_counter()
    prim = jnp.zeros((N, D), jnp.int8)
    ps = jnp.zeros((N, 1), jnp.float32)
    resid = jnp.zeros((N, D), jnp.int8)
    rs = jnp.full((N, 1), 1e-12, jnp.float32)
    key = jax.random.PRNGKey(0)
    for i in range(N // BN):
        key, sub = jax.random.split(key)
        prim, ps, resid, rs = _build_block(sub, prim, ps, resid, rs,
                                           jnp.int32(i * BN))
    np.asarray(ps[:1])   # sync
    build_s = time.perf_counter() - t0
    print(f"device build: {N} rows in {build_s:.1f}s", file=sys.stderr)

    # Queries: reconstructed rows + noise, normalized (device-side).
    qkey = jax.random.PRNGKey(7)
    base = (prim[:NQ].astype(jnp.float32) * ps[:NQ]
            + resid[:NQ].astype(jnp.float32) * rs[:NQ])
    noise = 0.02 * jax.random.normal(qkey, (NQ, D), jnp.float32)
    queries = base + noise
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    t0 = time.perf_counter()
    gt_s, gt_i = _oracle_topk(queries, prim, ps, resid, rs, k=K)
    gt_i = np.asarray(gt_i)
    print(f"oracle: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    results = {"n_rows": N, "d": D, "k": K, "r": R, "n_queries": NQ,
               "build_s": round(build_s, 1)}
    for name, scan2 in (("int8_rerank2", True), ("int8_rerank", False)):
        try:
            run = lambda: int8_scan_rerank_topk(  # noqa: E731
                queries, prim, ps, resid, rs, jnp.int32(N),
                k=K, r=R, bn=pick_bn(N), scan2=scan2)
            s, ids = run()
            ids = np.asarray(ids)
            # recall@k vs the dequantized-exact oracle
            rec = float(np.mean([
                len(set(ids[q]) & set(gt_i[q])) / K for q in range(NQ)
            ]))
            # min-over-windows device timing (CLAUDE.md timing rules)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                s2, i2 = run()
                np.asarray(i2[:1])
                times.append(time.perf_counter() - t0)
            dev = min(times)
            results[name] = {
                "recall": round(rec, 4),
                "e2e_ms": round(dev * 1e3, 2),
                "qps": int(NQ / dev),
            }
            print(name, results[name], file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — record the failure mode
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(name, "FAILED:", exc, file=sys.stderr)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
