"""int8-rerank gather-strategy A/B + candidate-depth sweep on the TPU.

The rerank stage gathers B*R candidate rows from two int8 planes. Two
implementations exist (index/flat.py::int8_rerank_topk):

- ``kernel``: gather_dot Pallas kernel — one 8-row-group DMA per candidate
  per plane (Mosaic int8 tiling forces the 8x read amplification). At
  B=1024, R=128 that is 262k DMAs per batch; the 2M measurement (~25 ms
  over the scan) suggests DMA-issue-rate bound, not bandwidth bound.
- ``xla``: jnp.take + einsum — XLA's native gather, no per-candidate DMA
  issue cost, no 8x amplification, but materializes [B, R, D] f32.

This script times both at several (B, R) and reports epsilon-recall per R
so FlatIndex can pick strategy and rerank_depth from measurements.

Interpreting recall_resid vs recall: the residual-only mode keeps TWO
error terms on the primary score (index/flat.py::int8_residual_rerank_topk
docstring) — query-quantization noise (~3e-4 std) AND the fused scan's
packed bin/column selection quantum (2^bits * ulp(4.0), ~1e-3 at
multi-million N under the v2 kernel). A recall_resid deficit within what
those terms predict for K-th-place margins is expected physics, not a bug.

Run on the TPU:  python scripts/rerank_ab.py [n_rows=2097152]
Writes scripts/rerank_ab_results.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "rerank_ab_results.json")
K = 10
N_GATE = 128
R_LOOP = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from sqe_tpu.index.flat import flat_topk, int8_scan_rerank_topk
    from sqe_tpu.ops.fused_scan import pick_bn, quantize_rows
    from sqe_tpu.utils.compile_cache import enable

    enable()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_097_152
    d = 1024
    blk = 131072
    assert n % blk == 0

    @jax.jit
    def gen_blk(key, i):
        x = jax.random.normal(jax.random.fold_in(key, i), (blk, d),
                              jnp.float32)
        x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-9)
        return x.astype(jnp.bfloat16)

    @jax.jit
    def gen_all(key):
        return jax.lax.map(lambda i: gen_blk(key, i),
                           jnp.arange(n // blk)).reshape(n, d)

    log(f"N={n} on {jax.devices()[0]}")
    vecs = gen_all(jax.random.PRNGKey(0))
    queries = gen_blk(jax.random.PRNGKey(1), jnp.int32(0))[:1024].astype(
        jnp.float32)
    np.asarray(queries[0, 0])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, vals, start):
        return jax.lax.dynamic_update_slice(buf, vals, (start, 0))

    @jax.jit
    def quant_chunk(v):
        return quantize_rows(v.astype(jnp.float32))

    @jax.jit
    def resid_chunk(v, p, ps):
        return quantize_rows(v.astype(jnp.float32) - p.astype(jnp.float32) * ps)

    v_i8 = jnp.zeros((n, d), jnp.int8)
    v_s = jnp.zeros((n, 1), jnp.float32)
    r_i8 = jnp.zeros((n, d), jnp.int8)
    r_s = jnp.zeros((n, 1), jnp.float32)
    for c0 in range(0, n, blk):
        qv, qs = quant_chunk(vecs[c0:c0 + blk])
        rv, rs = resid_chunk(vecs[c0:c0 + blk], qv, qs)
        v_i8 = fill(v_i8, qv, jnp.int32(c0))
        v_s = fill(v_s, qs, jnp.int32(c0))
        r_i8 = fill(r_i8, rv, jnp.int32(c0))
        r_s = fill(r_s, rs, jnp.int32(c0))
    np.asarray(r_s[0])
    log("quantized both planes")

    gate_q = queries[:N_GATE]
    ref_s, _ = flat_topk(gate_q, vecs, jnp.int32(n), k=K, block_n=blk,
                         exact=True)
    ref_s = np.asarray(ref_s)
    log("oracle done")

    # Large arrays are ARGUMENTS, never closures: a jitted closure over the
    # 4 GB bf16 base embeds it as a compile-time constant, and the remote
    # compile service chokes on the payload (round-4 broken-pipe crash).
    @jax.jit
    def exact_scores(ids, q, base):
        safe = jnp.maximum(ids, 0)
        cand = base[safe].astype(jnp.float32)
        s = jnp.einsum("bd,bkd->bk", q, cand,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.where(ids >= 0, s, -jnp.inf)

    def eps_recall(ids):
        got = np.asarray(exact_scores(jnp.asarray(ids), gate_q, vecs))
        thresh = ref_s[:, K - 1] - 1e-5
        return float(np.mean(np.sum(got >= thresh[:, None], axis=1) / K))

    bn = pick_bn(n)

    def inloop_ms(b, r, use_kernel, mode="full", scan2=False):
        q = queries[:b]

        @functools.partial(jax.jit, static_argnames=("r2", "uk", "md", "s2"))
        def run(q, vi, vs, ri, rs, *, r2, uk, md, s2):
            def body(i, acc):
                ms, mi = int8_scan_rerank_topk(
                    q + 1e-6 * i, vi, vs, ri, rs, jnp.int32(n),
                    k=K, r=r2, bn=bn, use_kernel=uk, mode=md, scan2=s2)
                return acc + ms.sum() + mi.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, R_LOOP, body, 0.0)

        args = (q, v_i8, v_s, r_i8, r_s)
        kw = dict(r2=r, uk=use_kernel, md=mode, s2=scan2)
        np.asarray(run(*args, **kw))  # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(*args, **kw))
            best = min(best, (time.perf_counter() - t0) / R_LOOP)
        return best * 1e3

    out = {"n": n}
    # Strategies: full two-plane rerank via the Pallas gather kernel and
    # residual-only (half the DMAs, scan score reused for the primary
    # term). The XLA-gather variant and B=64 were dropped after the first
    # 2M sweep measured them within noise of the kernel/endpoints.
    # Both candidate scans are swept: v1 (fused_scan, bin-top-1) and v2
    # (fused_scan2, column-max accumulation) — v2's scan-stage recall
    # decays at multi-million N (0.9398 at 2M int8), so its rerank
    # candidate depth must be chosen from ITS recall curve, not v1's.
    strategies = (("kernel", True, "full"), ("resid", True, "residual"))
    for scan2 in (False, True):
        tag = "_v2" if scan2 else ""
        for r in (32, 64, 128):
            row = {}
            for strat, uk, mode in (("recall", False, "full"),
                                    ("recall_resid", False, "residual")):
                _, mi = int8_scan_rerank_topk(
                    gate_q, v_i8, v_s, r_i8, r_s, jnp.int32(n), k=K, r=r,
                    bn=bn, use_kernel=uk, mode=mode, scan2=scan2)
                row[strat] = round(eps_recall(np.asarray(mi)), 4)
            for b in (1, 1024):
                for strat, uk, mode in strategies:
                    try:
                        ms = inloop_ms(b, r, uk, mode, scan2)
                        row[f"b{b}_{strat}_ms"] = round(ms, 2)
                    except Exception as exc:  # noqa: BLE001
                        row[f"b{b}_{strat}_ms"] = f"FAIL {str(exc)[:80]}"
                log(f"scan2={scan2} R={r} B={b}: "
                    f"{json.dumps({k2: v for k2, v in row.items() if str(b) in k2 or 'recall' in k2})}")
            out[f"r{r}{tag}"] = row
            with open(RESULTS, "w") as f:   # progressive: crash keeps rows
                json.dump(out, f, indent=2)

    # Scan-only baselines (v1 and v2) for the rerank-overhead delta.
    from sqe_tpu.ops.fused_scan import fused_scan_topk_int8
    from sqe_tpu.ops.fused_scan2 import fused_scan2_topk_int8

    def scan_only_ms(b, scan2=False):
        q = queries[:b]

        @functools.partial(jax.jit, static_argnames=("s2",))
        def run(q, vi, vs, *, s2):
            def body(i, acc):
                if s2:
                    ms, mi = fused_scan2_topk_int8(
                        q + 1e-6 * i, vi, vs, jnp.int32(n), k=K)
                else:
                    ms, mi = fused_scan_topk_int8(
                        q + 1e-6 * i, vi, vs, jnp.int32(n), k=K, bn=bn)
                return acc + ms.sum() + mi.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, R_LOOP, body, 0.0)

        np.asarray(run(q, v_i8, v_s, s2=scan2))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run(q, v_i8, v_s, s2=scan2))
            best = min(best, (time.perf_counter() - t0) / R_LOOP)
        return best * 1e3

    out["scan_only"] = {f"b{b}_ms": round(scan_only_ms(b), 2)
                        for b in (1, 1024)}
    out["scan_only_v2"] = {f"b{b}_ms": round(scan_only_ms(b, True), 2)
                           for b in (1, 1024)}
    log(json.dumps(out))
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {RESULTS}")


if __name__ == "__main__":
    main()
