"""Break down fused-scan cost: kernel candidates vs final merge."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.ops.fused_scan import fused_scan_candidates, fused_scan_topk, pick_bn
from sqe_tpu.utils.compile_cache import enable


def timed(fn, reps=5, windows=5):
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = np.asarray(out[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    enable()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    b = 1024
    d = 1024
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    # Generate ON DEVICE: a host->device f32 corpus at 2M would be 8 GB
    # through a ~32 MB/s tunnel (minutes) and OOM next to the bf16 copy.
    blk = min(131072, n)

    @jax.jit
    def gen_blk(key, i):
        x = jax.random.normal(jax.random.fold_in(key, i), (blk, d),
                              jnp.float32)
        x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-9)
        return x.astype(jnp.bfloat16)

    @jax.jit
    def gen_all(key):
        return jax.lax.map(
            lambda i: gen_blk(key, i), jnp.arange(n // blk)
        ).reshape(n, d)

    v_dev = gen_all(jax.random.PRNGKey(0))
    q_dev = gen_blk(jax.random.PRNGKey(1), jnp.int32(0))[:b].astype(
        jnp.float32)
    np.asarray(q_dev[0, 0])
    vn = jnp.int32(n)
    bn = pick_bn(n)

    # Pure matmul reference ceiling.
    @jax.jit
    def mm(q, v):
        return (jnp.dot(q.astype(jnp.bfloat16), v.T,
                        preferred_element_type=jnp.float32).sum(axis=1),)

    @jax.jit
    def cand_reduced(q, v, valid):
        cs, ci = fused_scan_candidates(q, v, valid, bq=256, bn=bn)
        return (cs.sum(), ci.sum())

    f = lambda: cand_reduced(q_dev, v_dev, vn)
    np.asarray(f()[0])
    print(f"candidates (device-reduced): {timed(f):.2f} ms", flush=True)

    # In-loop timings: run the op R times inside ONE jitted program so the
    # ~7 ms tunnel dispatch floor is amortized away; perturb the query with
    # the iteration index so XLA cannot CSE the iterations.
    R = 10

    def inloop(op):
        @jax.jit
        def run(q, v, valid):
            def body(i, acc):
                out = op(q + 1e-6 * i, v, valid)
                return acc + out
            return jax.lax.fori_loop(0, R, body, 0.0)
        np.asarray(run(q_dev, v_dev, vn))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(q_dev, v_dev, vn)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / R)
        return best * 1e3

    def op_cand(q, v, valid):
        cs, ci = fused_scan_candidates(q, v, valid, bq=256, bn=bn)
        return cs.sum() + ci.sum()

    def op_full(q, v, valid):
        from sqe_tpu.ops.fused_scan import fused_scan_topk as fst
        ms, mi = fst(q, v, valid, k=10, bn=bn)
        return ms.sum() + mi.sum()

    def op_mm(q, v, valid):
        return jnp.dot(q.astype(jnp.bfloat16), v.T,
                       preferred_element_type=jnp.float32).sum()

    print(f"IN-LOOP candidates: {inloop(op_cand):.2f} ms", flush=True)
    print(f"IN-LOOP full topk:  {inloop(op_full):.2f} ms", flush=True)
    print(f"IN-LOOP raw matmul: {inloop(op_mm):.2f} ms", flush=True)

    from sqe_tpu.ops.fused_scan import fused_scan_topk_int8, quantize_rows
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(0,))
    def _fill(buf, vals, start):
        return jax.lax.dynamic_update_slice(buf, vals, (start, 0))

    @jax.jit
    def _quant_chunk(vb):
        return quantize_rows(vb.astype(jnp.float32))

    v_i8 = jnp.zeros((n, d), jnp.int8)
    v_s = jnp.zeros((n, 1), jnp.float32)
    for c0 in range(0, n, blk):
        qv, qs = _quant_chunk(v_dev[c0:c0 + blk])
        v_i8 = _fill(v_i8, qv, jnp.int32(c0))
        v_s = _fill(v_s, qs, jnp.int32(c0))
    v_i8 = jax.block_until_ready(v_i8)

    @jax.jit
    def int8_loop(q, vi, vs, valid):
        def body(i, acc):
            ms, mi = fused_scan_topk_int8(q + 1e-6 * i, vi, vs, valid,
                                          k=10, bn=bn)
            return acc + ms.sum() + mi.sum()
        return jax.lax.fori_loop(0, R, body, 0.0)

    np.asarray(int8_loop(q_dev, v_i8, v_s, vn))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(int8_loop(q_dev, v_i8, v_s, vn))
        best = min(best, (time.perf_counter() - t0) / R)
    print(f"IN-LOOP fused int8: {best*1e3:.2f} ms", flush=True)

    def op_blocked(approx):
        def op(q, v, valid):
            # Cap the block: a one-block scan at 2M would materialize an
            # 8 GB [B, N] f32 score tile.
            s, ids = flat_topk(q, v, valid, k=10, block_n=min(n, 131072),
                               exact=False, approx_topk=approx)
            return s.sum() + ids.sum()
        return op

    from sqe_tpu.index.flat import flat_topk
    print(f"IN-LOOP blocked exact-k: {inloop(op_blocked(False)):.2f} ms",
          flush=True)
    print(f"IN-LOOP blocked approx:  {inloop(op_blocked(True)):.2f} ms",
          flush=True)

    # Raw int8 matmul ceiling (2x MXU rate): the bound the int8 kernels chase.
    def op_mm_i8(q, v, valid, vi=v_i8):
        return jax.lax.dot_general(
            jnp.round(q).astype(jnp.int8), vi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).sum().astype(jnp.float32)

    print(f"IN-LOOP raw int8 matmul: {inloop(op_mm_i8):.2f} ms", flush=True)

    # v2 (column-max accumulation) rows: selection cost moves from per-tile
    # cross-lane reductions (v1) to one XLA top_k over [B, C]; at large N the
    # merge shrinks N/128 -> C. Same-session A/B against the v1 rows above.
    from sqe_tpu.ops.fused_scan2 import fused_scan2_topk, fused_scan2_topk_int8

    for c, bn_cap in [(2048, 1024), (2048, 2048), (4096, 2048)]:
        if n % min(bn_cap, n, c):
            pass
        def op_v2(q, v, valid, c=c, bn_cap=bn_cap):
            ms, mi = fused_scan2_topk(q, v, valid, k=10, c=c, bn_cap=bn_cap)
            return ms.sum() + mi.sum()
        try:
            print(f"IN-LOOP fused2 c={c} bn_cap={bn_cap}: "
                  f"{inloop(op_v2):.2f} ms", flush=True)
        except Exception as e:
            print(f"IN-LOOP fused2 c={c} bn_cap={bn_cap}: FAIL {str(e)[:120]}",
                  flush=True)

    @jax.jit
    def int8v2_loop(q, vi, vs, valid):
        def body(i, acc):
            ms, mi = fused_scan2_topk_int8(q + 1e-6 * i, vi, vs, valid, k=10)
            return acc + ms.sum() + mi.sum()
        return jax.lax.fori_loop(0, R, body, 0.0)

    try:
        np.asarray(int8v2_loop(q_dev, v_i8, v_s, vn))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(int8v2_loop(q_dev, v_i8, v_s, vn))
            best = min(best, (time.perf_counter() - t0) / R)
        print(f"IN-LOOP fused2 int8: {best*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"IN-LOOP fused2 int8: FAIL {str(e)[:120]}", flush=True)

    # Merge-alone for the v1 candidate width at this N (top_k over [B, N/128])
    # vs the v2 width (top_k over [B, C=2048]): the N-dependent part of v1.
    for cols, tag in [(n // 128, "v1 width"), (2048, "v2 width")]:
        cs_m = jnp.asarray(rng.standard_normal((b, cols)), jnp.float32)
        ci_m = jnp.zeros((b, cols), jnp.int32)

        def op_merge(q, v, valid, cs_m=cs_m, ci_m=ci_m):
            # q varies per loop iteration -> the top_k cannot be hoisted.
            ms, sel = jax.lax.top_k(cs_m + q[0, 0] * 1e-9, 10)
            return ms.sum() + jnp.take_along_axis(ci_m, sel, axis=1).sum()

        print(f"IN-LOOP merge alone [{b},{cols}] ({tag}): "
              f"{inloop(op_merge):.2f} ms", flush=True)

    for bq, bnv in [(128, 2048), (256, 1024), (512, 1024), (128, 4096)]:
        if n % bnv:
            continue
        def op(q, v, valid, bq=bq, bnv=bnv):
            from sqe_tpu.ops.fused_scan import fused_scan_topk as fst
            ms, mi = fst(q, v, valid, k=10, bq=bq, bn=bnv)
            return ms.sum() + mi.sum()
        try:
            print(f"IN-LOOP fused bq={bq} bn={bnv}: {inloop(op):.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"IN-LOOP fused bq={bq} bn={bnv}: FAIL {str(e)[:120]}",
                  flush=True)

    g = lambda: fused_scan_topk(q_dev, v_dev, vn, k=10, bn=bn)
    np.asarray(g()[0])
    print(f"full topk:  {timed(g):.2f} ms", flush=True)

    np.asarray(mm(q_dev, v_dev)[0])
    print(f"raw matmul+rowsum: {timed(lambda: mm(q_dev, v_dev)):.2f} ms", flush=True)

    # Merge alone.
    cs, ci = fused_scan_candidates(q_dev, v_dev, vn, bn=bn)
    cs, ci = jax.block_until_ready(cs), jax.block_until_ready(ci)

    @jax.jit
    def merge(cs, ci):
        ms, sel = jax.lax.top_k(cs, 10)
        return ms, jnp.take_along_axis(ci, sel, axis=1)

    h = lambda: merge(cs, ci)
    np.asarray(h()[0])
    print(f"merge alone ([{cs.shape}] top_k): {timed(h):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
