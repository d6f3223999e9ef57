"""Scan-vs-ANN crossover at large single-chip N (2M, 4M x 1024-d).

Extends scripts/ann_bench.py past 1M to test DESIGN.md §8's claim that ANN's
remaining niche on TPU starts at "several million vectors per chip" — the
regime where the exact scan's linear cost meets the serve latency contract
and the HBM wall (the router constants in index/router.py encode the result).

Memory discipline at this scale (v5e: 16 GB HBM):

- the corpus is generated ON DEVICE directly in bf16, blockwise (a full-f32
  intermediate would be 16 GB at 4M and not fit);
- the recall oracle is the Precision.HIGHEST exact scan over the SAME bf16
  base (at 4M no f32 copy can exist; the oracle is exact w.r.t. the stored
  vectors, which is the contract every engine here is gated on);
- IVF runs at 2M only: its cluster-major layout is an extra ~1.25x corpus
  copy, and building it next to the 8 GB bf16 base at 4M would exceed HBM.
  Its cost model (probed bytes ~ n_probe/C of the corpus, C = 4*sqrt(N))
  is validated at 131k/1M/2M and extrapolated in DESIGN.md §8c.

Writes scripts/ann_bench_large_results.json. Run on the TPU:
    python scripts/ann_bench_large.py [n_millions ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ann_bench_large_results.json")
K = 10
N_GATE = 128
BATCHES = (1, 1024)
REPS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


GEN_BLOCK = 131072


def _block_fn(key, d, n_centers=1024, spread=0.25, block=GEN_BLOCK):
    """Jitted deterministic per-block generator: ``f(i) -> [block, d] bf16``.
    Exposing the block lets the rerank phase REGENERATE the base for recall
    scoring after deleting it — at 4M the bf16 base cannot coexist with the
    2-byte/dim rerank layout on one chip's HBM."""
    import jax
    import jax.numpy as jnp

    kc, ka = jax.random.split(key)

    @jax.jit
    def blk(i):
        centers = jax.random.normal(kc, (n_centers, d), jnp.float32)
        k1, k2 = jax.random.split(jax.random.fold_in(ka, i))
        a = jax.random.randint(k1, (block,), 0, n_centers)
        v = centers[a] + spread * jax.random.normal(
            k2, (block, d), jnp.float32
        )
        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-9)
        return v.astype(jnp.bfloat16)

    return blk


def gen_device_bf16(key, n, d, n_centers=1024, spread=0.25, block=GEN_BLOCK):
    """Clustered normalized corpus generated blockwise straight to bf16
    (peak extra memory: one f32 block, not the corpus)."""
    import jax
    import jax.numpy as jnp

    kc, ka = jax.random.split(key)
    assert n % block == 0

    @jax.jit
    def gen():
        centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

        def blk(i):
            k1, k2 = jax.random.split(jax.random.fold_in(ka, i))
            a = jax.random.randint(k1, (block,), 0, n_centers)
            v = centers[a] + spread * jax.random.normal(
                k2, (block, d), jnp.float32
            )
            v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-9)
            return v.astype(jnp.bfloat16)

        return jax.lax.map(blk, jnp.arange(n // block)).reshape(n, d)

    return gen()


def _sync(out):
    np.asarray(out[0])


def time_search(fn_dev, reps=REPS, pipeline=4):
    _sync(fn_dev())  # compile + warm
    e2e = min(_timed_once(fn_dev) for _ in range(reps))
    dev_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn_dev()
        _sync(out)
        dev_times.append((time.perf_counter() - t0) / pipeline)
    return e2e, min(dev_times)


def _timed_once(fn_dev):
    t0 = time.perf_counter()
    _sync(fn_dev())
    return time.perf_counter() - t0


def eps_recall(ref_scores, got_scores_exact, k=K, eps=1e-5):
    thresh = ref_scores[:, k - 1] - eps
    return float(np.mean(np.sum(got_scores_exact >= thresh[:, None], axis=1) / k))


def exact_scores_for(vecs_dev, queries_dev, ids):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(v, q, i):
        safe = jnp.maximum(i, 0)
        cand = v[safe].astype(jnp.float32)
        s = jnp.einsum("bd,bkd->bk", q.astype(jnp.float32), cand,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.where(i >= 0, s, -jnp.inf)

    return np.asarray(f(vecs_dev, queries_dev, jnp.asarray(ids)))


def run_scale(n, d=1024, with_ivf=True):
    import jax
    import jax.numpy as jnp

    from sqe_tpu.index.flat import flat_topk, int8_scan_rerank_topk
    from sqe_tpu.index.ivf import IVFIndex, ivf_search
    from sqe_tpu.ops.fused_scan import (
        fused_scan_topk, fused_scan_topk_int8, pick_bn, quantize_rows,
    )

    dev = jax.devices()[0]
    log(f"=== N={n} d={d} on {dev} (bf16 base: {n*d*2/2**30:.1f} GB) ===")
    t0 = time.perf_counter()
    vecs = gen_device_bf16(jax.random.PRNGKey(11), n, d)
    queries = gen_device_bf16(jax.random.PRNGKey(12), 131072, d)[:max(BATCHES)]
    queries = queries.astype(jnp.float32)
    np.asarray(queries[0, 0])
    log(f"gen: {time.perf_counter()-t0:.1f}s")
    gate_q = queries[:N_GATE]

    t0 = time.perf_counter()
    ref_s, _ = flat_topk(gate_q, vecs, jnp.int32(n), k=K,
                         block_n=131072, exact=True)
    ref_s = np.asarray(ref_s)
    log(f"oracle (HIGHEST over bf16 base): {time.perf_counter()-t0:.1f}s")

    out = {}
    bn = pick_bn(n)
    assert bn, n

    rows = {}
    for b in BATCHES:
        q = queries[:b]
        e2e, devt = time_search(
            lambda q=q: fused_scan_topk(q, vecs, jnp.int32(n), k=K, bn=bn)
        )
        rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                   "dev_ms": round(devt * 1e3, 2), "qps": round(b / devt)}
    _, i = fused_scan_topk(gate_q, vecs, jnp.int32(n), k=K, bn=bn)
    got = exact_scores_for(vecs, gate_q, np.asarray(i))
    rows["recall"] = round(eps_recall(ref_s, got), 4)
    out["fused_bf16"] = rows
    log(f"fused_bf16: {json.dumps(rows)}")

    # int8: quantize blockwise on device (quantize_rows over the full corpus
    # would make an f32 intermediate; do it in chunks — at 4M the bf16 base
    # (8 GB) + int8 copy (4 GB) leave <4 GB headroom, so chunks stay small).
    t0 = time.perf_counter()
    chunk = 131072

    @jax.jit
    def quant_chunk(v):
        return quantize_rows(v.astype(jnp.float32))

    # Donated in-place fill: exactly ONE int8 buffer ever exists (a
    # concatenate of chunk outputs would briefly double it -> OOM at 4M).
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, vals, start):
        return jax.lax.dynamic_update_slice(buf, vals, (start, 0))

    v_i8 = jnp.zeros((n, d), jnp.int8)
    v_s = jnp.zeros((n, 1), jnp.float32)
    for c0 in range(0, n, chunk):
        qv, qs = quant_chunk(vecs[c0:c0 + chunk])
        v_i8 = fill(v_i8, qv, jnp.int32(c0))
        v_s = fill(v_s, qs, jnp.int32(c0))
    np.asarray(v_s[0])
    log(f"int8 quantize: {time.perf_counter()-t0:.1f}s")

    rows = {}
    for b in BATCHES:
        q = queries[:b]
        e2e, devt = time_search(
            lambda q=q: fused_scan_topk_int8(q, v_i8, v_s, jnp.int32(n),
                                             k=K, bn=bn)
        )
        rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                   "dev_ms": round(devt * 1e3, 2), "qps": round(b / devt)}
    _, i = fused_scan_topk_int8(gate_q, v_i8, v_s, jnp.int32(n), k=K, bn=bn)
    got = exact_scores_for(vecs, gate_q, np.asarray(i))
    rows["recall"] = round(eps_recall(ref_s, got), 4)
    out["fused_int8"] = rows
    log(f"fused_int8: {json.dumps(rows)}")

    # int8 + exact residual rerank (VERDICT r02 #2): the recall-restoring
    # serving path. 2 bytes/dim total — bf16 memory parity — so the bf16
    # base is DELETED before the residual plane materializes (production
    # does not hold both; at 4M they cannot coexist in HBM anyway) and
    # regenerated blockwise for recall scoring. First unattended execution
    # of this phase at >1M: isolate failures so the session's earlier rows
    # (and the later scales) survive an exception here.
    r_i8 = r_s = None
    try:
        blk_fn = _block_fn(jax.random.PRNGKey(11), d)

        @jax.jit
        def resid_chunk(v, p, ps):
            err = v.astype(jnp.float32) - p.astype(jnp.float32) * ps
            return quantize_rows(err)

        # Delete the base BEFORE allocating the residual plane: at 4M the
        # base (8 GB) + int8 plane (4 GB) + residual plane (4 GB) would hit
        # the 16 GB HBM ceiling exactly and the allocation fails.
        vecs.delete()
        r_i8 = jnp.zeros((n, d), jnp.int8)
        r_s = jnp.zeros((n, 1), jnp.float32)
        assert chunk == GEN_BLOCK
        for bi, c0 in enumerate(range(0, n, chunk)):
            rv, rs = resid_chunk(blk_fn(jnp.int32(bi)),
                                 v_i8[c0:c0 + chunk], v_s[c0:c0 + chunk])
            r_i8 = fill(r_i8, rv, jnp.int32(c0))
            r_s = fill(r_s, rs, jnp.int32(c0))
        np.asarray(r_s[0])
        log(f"residual quantize (base deleted): {time.perf_counter()-t0:.1f}s")

        R = 128  # FlatIndex rerank_depth default
        rows = {"rerank_depth": R}
        for b in BATCHES:
            q = queries[:b]
            e2e, devt = time_search(
                lambda q=q: int8_scan_rerank_topk(
                    q, v_i8, v_s, r_i8, r_s, jnp.int32(n), k=K, r=R, bn=bn)
            )
            rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                       "dev_ms": round(devt * 1e3, 2), "qps": round(b / devt)}
        _, i = int8_scan_rerank_topk(gate_q, v_i8, v_s, r_i8, r_s,
                                     jnp.int32(n), k=K, r=R, bn=bn)
        ids_np = np.asarray(i)

        # Blockwise exact scoring against the regenerated base.
        @jax.jit
        def score_block(v_blk, q, ids, c0):
            local = ids - c0
            inside = (local >= 0) & (local < v_blk.shape[0])
            cand = v_blk[jnp.clip(local, 0, v_blk.shape[0] - 1)] \
                .astype(jnp.float32)
            s = jnp.einsum("bd,bkd->bk", q.astype(jnp.float32), cand,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.where(inside & (ids >= 0), s, -jnp.inf)

        got = np.full(ids_np.shape, -np.inf, np.float32)
        for bi, c0 in enumerate(range(0, n, chunk)):
            s = np.asarray(score_block(blk_fn(jnp.int32(bi)), gate_q,
                                       jnp.asarray(ids_np), jnp.int32(c0)))
            got = np.maximum(got, s)
        rows["recall"] = round(eps_recall(ref_s, got), 4)
        out["int8_rerank"] = rows
        log(f"int8_rerank: {json.dumps(rows)}")
    except Exception as exc:  # noqa: BLE001 — recorded, run continues
        out["int8_rerank"] = {"error": f"{type(exc).__name__}: {exc}"}
        log(f"int8_rerank FAILED: {exc}")

    for buf in (r_i8, r_s, v_i8, v_s):
        try:
            if buf is not None:
                buf.delete()
        except Exception:
            pass
    # Regenerate the base for the phases below (IVF) — the rerank phase
    # deleted it to fit the residual plane. Fault-isolated like the rerank
    # phase: an OOM here (allocator fragmentation after the delete/regen
    # cycle has been observed at 2M) must not clobber the measured rows.
    try:
        if with_ivf:
            vecs = gen_device_bf16(jax.random.PRNGKey(11), n, d)
            np.asarray(vecs[0, 0])
            _run_ivf(out, vecs, queries, gate_q, ref_s, n)
    except Exception as exc:  # noqa: BLE001 — recorded, rows survive
        out["ivf_error"] = f"{type(exc).__name__}: {exc}"
        log(f"ivf FAILED: {exc}")
    return out


def _run_ivf(out, vecs, queries, gate_q, ref_s, n):
    import jax
    import jax.numpy as jnp

    from sqe_tpu.index.ivf import IVFIndex, ivf_search

    if True:
        idx = IVFIndex(embed_dim=vecs.shape[1], vector_dtype=jnp.bfloat16,
                       kmeans_iters=10, seed=3)
        t0 = time.perf_counter()
        idx.build_from_device(vecs)
        np.asarray(idx._gids[0, 0])
        c = idx._centers.shape[0]
        log(f"ivf build: {time.perf_counter()-t0:.1f}s C={c} "
            f"Smax={idx._smax} ovf={idx._ovf_n/n:.3f}")
        for n_probe in (16, 32, 64):
            rows = {"n_probe": n_probe, "C": c, "Smax": idx._smax}
            for b in BATCHES:
                q = queries[:b]

                def run(q=q):
                    return ivf_search(
                        q, idx._centers, idx._clusters, idx._gids,
                        idx._counts_dev, idx._ovf_vecs, idx._ovf_gids,
                        jnp.int32(idx._ovf_n),
                        n_probe=n_probe, k=K, use_pallas=True)

                try:
                    e2e, devt = time_search(run)
                    rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                               "dev_ms": round(devt * 1e3, 2),
                               "qps": round(b / devt)}
                except Exception as exc:  # noqa: BLE001
                    rows[b] = {"error": str(exc)[:160]}
            _, i = ivf_search(gate_q, idx._centers, idx._clusters, idx._gids,
                              idx._counts_dev, idx._ovf_vecs, idx._ovf_gids,
                              jnp.int32(idx._ovf_n),
                              n_probe=n_probe, k=K, use_pallas=True)
            got = exact_scores_for(vecs, gate_q, np.asarray(i))
            rows["recall"] = round(eps_recall(ref_s, got), 4)
            out[f"ivf_p{n_probe}"] = rows
            log(f"ivf_p{n_probe}: {json.dumps(rows)}")

    return out


if __name__ == "__main__":
    from sqe_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    millions = [int(a) for a in sys.argv[1:]] or [2, 4]
    results = {}
    for m in millions:
        n = m * 1_048_576
        # IVF's extra ~1.25x cluster copy next to the bf16 base only fits
        # through 2M on one chip.
        try:
            results[str(n)] = run_scale(n, with_ivf=(m <= 2))
        except Exception as exc:  # noqa: BLE001 — keep the other scales
            results[str(n)] = {"error": f"{type(exc).__name__}: {exc}"}
            log(f"scale {n} FAILED: {exc}")
        data = {}
        if os.path.exists(RESULTS):
            with open(RESULTS) as f:
                data = json.load(f)
        data.update(results)
        with open(RESULTS, "w") as f:
            json.dump(data, f, indent=2)
        log(f"wrote {RESULTS}")
