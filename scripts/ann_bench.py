"""ANN engine comparison on the real TPU: exact/approx MXU scan vs IVF.

Measures, at N in {131072, 1M} x batch in {1, 8, 64, 1024}:

- flat exact scan (bf16 storage, native-precision matmul)
- flat approx-topk scan (lax.approx_max_k per block)
- IVF (MXU k-means build, Pallas probed-cluster scoring) at several n_probe

with epsilon-recall@10 gates vs the Precision.HIGHEST f32 oracle. All data is
GENERATED ON DEVICE (host<->device runs ~32 MB/s through this environment's
tunnel; a 4 GB upload would dominate the session). HNSW beam numbers for the
same scales come from bench.py / BENCH_r01 (18.5k QPS at 100k, 1.85k at 1M
B=1024) — the graph path this engine supersedes.

Writes scripts/ann_bench_results.json. Run: python scripts/ann_bench.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ann_bench_results.json")
K = 10
N_GATE = 128            # oracle/recall query count
BATCHES = (1, 8, 64, 1024)
REPS = 5


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def gen_device(key, n, d, n_centers=1024, spread=0.25):
    import jax
    import jax.numpy as jnp

    k1, k2, k3 = jax.random.split(key, 3)

    @jax.jit
    def gen():
        centers = jax.random.normal(k1, (n_centers, d), jnp.float32)
        assign = jax.random.randint(k2, (n,), 0, n_centers)
        v = centers[assign] + spread * jax.random.normal(k3, (n, d), jnp.float32)
        return v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-9)

    return gen()


def _sync(out):
    np.asarray(out[0])


def time_search(fn_dev, reps=REPS, pipeline=8):
    """(e2e_s, device_s): e2e = dispatch+execute+sync per call (the tunnel
    adds ~29 ms dispatch + sync overhead); device = per-call time with
    ``pipeline`` calls in flight and ONE sync (device work serializes on the
    stream, so this is the true device-side batch latency)."""
    _sync(fn_dev())  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn_dev())
        times.append(time.perf_counter() - t0)
    e2e = min(times)
    dev_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(pipeline):
            out = fn_dev()
        _sync(out)
        dev_times.append((time.perf_counter() - t0) / pipeline)
    return e2e, min(dev_times)


def eps_recall(ids, ref_scores, got_scores_exact, k=K, eps=1e-5):
    """ids count when their exact score >= kth exact ref score - eps."""
    thresh = ref_scores[:, k - 1] - eps
    return float(np.mean(np.sum(got_scores_exact >= thresh[:, None], axis=1) / k))


def exact_scores_for(vecs_dev, queries_dev, ids):
    """Exact f32 HIGHEST score of each returned id (device gather+dot)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(v, q, i):
        safe = jnp.maximum(i, 0)
        cand = v[safe]                                       # [B, k, D]
        s = jnp.einsum("bd,bkd->bk", q, cand,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.where(i >= 0, s, -jnp.inf)

    return np.asarray(f(vecs_dev, queries_dev, jnp.asarray(ids)))


def run_scale(n, d=1024):
    import jax
    import jax.numpy as jnp

    from sqe_tpu.index.flat import flat_topk
    from sqe_tpu.index.ivf import IVFIndex, ivf_search

    dev = jax.devices()[0]
    log(f"=== N={n} d={d} on {dev} ===")
    key = jax.random.PRNGKey(11)
    vecs = gen_device(key, n, d)                             # f32 on device
    qkey = jax.random.PRNGKey(12)
    queries = gen_device(qkey, max(BATCHES), d)              # fresh, same dist
    gate_q = queries[:N_GATE]

    # Oracle: exact HIGHEST top-k scores for the gate queries.
    t0 = time.perf_counter()
    ref_s, ref_i = flat_topk(gate_q, vecs, jnp.int32(n), k=K,
                             block_n=min(131072, n), exact=True)
    ref_s = np.asarray(ref_s)
    log(f"oracle: {time.perf_counter()-t0:.1f}s")

    vecs_bf16 = vecs.astype(jnp.bfloat16)
    out = {}

    # ---- flat scans
    for name, approx in (("flat_exact", False), ("flat_approx", True)):
        rows = {}
        for b in BATCHES:
            q = queries[:b]

            def run(q=q, b=b):
                return flat_topk(q, vecs_bf16, jnp.int32(n), k=K,
                                 block_n=min(131072, n), exact=False,
                                 approx_topk=approx)

            e2e, dev = time_search(run)
            rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                       "dev_ms": round(dev * 1e3, 2),
                       "qps": round(b / dev)}
        # recall gate at the gate batch
        s, i = flat_topk(gate_q, vecs_bf16, jnp.int32(n), k=K,
                         block_n=min(131072, n), exact=False,
                         approx_topk=approx)
        got = exact_scores_for(vecs, gate_q, np.asarray(i))
        rows["recall"] = round(eps_recall(np.asarray(i), ref_s, got), 4)
        out[name] = rows
        log(f"{name}: {json.dumps(rows)}")

    # ---- fused Pallas scans (ops/fused_scan.py)
    from sqe_tpu.ops.fused_scan import (
        fused_scan_topk, fused_scan_topk_int8, pick_bn, quantize_rows,
    )

    bn = pick_bn(n)
    if bn:
        rows = {}
        for b in BATCHES:
            q = queries[:b]

            def run(q=q):
                return fused_scan_topk(q, vecs_bf16, jnp.int32(n), k=K, bn=bn)

            e2e, devt = time_search(run)
            rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                       "dev_ms": round(devt * 1e3, 2),
                       "qps": round(b / devt)}
        s, i = fused_scan_topk(gate_q, vecs_bf16, jnp.int32(n), k=K, bn=bn)
        got = exact_scores_for(vecs, gate_q, np.asarray(i))
        rows["recall"] = round(eps_recall(np.asarray(i), ref_s, got), 4)
        out["fused_bf16"] = rows
        log(f"fused_bf16: {json.dumps(rows)}")

        v_i8, v_s = jax.jit(quantize_rows)(vecs)
        v_i8 = jax.block_until_ready(v_i8)
        rows = {}
        for b in BATCHES:
            q = queries[:b]

            def run(q=q):
                return fused_scan_topk_int8(q, v_i8, v_s, jnp.int32(n),
                                            k=K, bn=bn)

            e2e, devt = time_search(run)
            rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                       "dev_ms": round(devt * 1e3, 2),
                       "qps": round(b / devt)}
        s, i = fused_scan_topk_int8(gate_q, v_i8, v_s, jnp.int32(n), k=K,
                                    bn=bn)
        got = exact_scores_for(vecs, gate_q, np.asarray(i))
        rows["recall"] = round(eps_recall(np.asarray(i), ref_s, got), 4)
        out["fused_int8"] = rows
        log(f"fused_int8: {json.dumps(rows)}")
        v_i8.delete()
        v_s.delete()

    # ---- IVF (free the scan's bf16 copy first: HBM budget at 1M)
    vecs_bf16.delete()
    idx = IVFIndex(embed_dim=d, vector_dtype=jnp.bfloat16, kmeans_iters=10,
                   seed=3)
    t0 = time.perf_counter()
    idx.build_from_device(vecs)
    np.asarray(idx._gids[0, 0])
    c = idx._centers.shape[0]
    log(f"ivf build: {time.perf_counter()-t0:.1f}s  C={c} Smax={idx._smax} "
        f"cluster_mem={c*idx._smax/n:.2f}x ovf={idx._ovf_n/n:.3f} "
        f"(o_cap={idx._ovf_vecs.shape[0]})")
    for n_probe in (8, 16, 32):
        rows = {"n_probe": n_probe, "C": c, "Smax": idx._smax}
        for b in BATCHES:
            q = queries[:b]

            def run(q=q, b=b):
                return ivf_search(q, idx._centers, idx._clusters, idx._gids,
                                  idx._counts_dev,
                                  n_probe=n_probe, k=K, use_pallas=True)

            try:
                e2e, dev = time_search(run)
                rows[b] = {"e2e_ms": round(e2e * 1e3, 2),
                           "dev_ms": round(dev * 1e3, 2),
                           "qps": round(b / dev)}
            except Exception as exc:  # noqa: BLE001 (e.g. VMEM overflow at big B)
                rows[b] = {"error": str(exc)[:160]}
        s, i = ivf_search(gate_q, idx._centers, idx._clusters, idx._gids,
                          idx._counts_dev,
                          n_probe=n_probe, k=K, use_pallas=True)
        got = exact_scores_for(vecs, gate_q, np.asarray(i))
        rows["recall"] = round(eps_recall(np.asarray(i), ref_s, got), 4)
        out[f"ivf_p{n_probe}"] = rows
        log(f"ivf_p{n_probe}: {json.dumps(rows)}")

    return out


if __name__ == "__main__":
    results = {}
    for n in (131072, 1_048_576):
        results[str(n)] = run_scale(n)
        data = {}
        if os.path.exists(RESULTS):
            with open(RESULTS) as f:
                data = json.load(f)
        data.update(results)
        with open(RESULTS, "w") as f:
            json.dump(data, f, indent=2)
        log(f"wrote {RESULTS}")
