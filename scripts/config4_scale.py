"""BASELINE config 4 validation: 10M vectors sharded across 8 devices.

Two measured halves (matching what this environment can actually run):

1. ``--cpu``: the FULL 10M-vector sharded build + search on the virtual
   8-device CPU mesh. Host constraint honesty: this machine has ONE CPU core
   and 125 GB RAM, so D is reduced (default 64) to keep wall-clock sane —
   correctness (exact-equality recall vs numpy brute force over all 10M rows,
   incremental add, memory accounting) is what this half gates; CPU QPS is
   meaningless and not reported as a headline.

2. ``--tpu``: the per-chip operating point of config 4 (10M / 8 chips =
   1.25M x 1024-d bf16) on the real chip: flat-scan QPS at B=1024 with the
   epsilon-recall gate vs the Precision.HIGHEST oracle. ICI merge cost is not
   measurable here (one real chip); it is k x n_shards (score, id) pairs per
   query — 8 x 10 x 8 B = 640 B at k=10, orders below the per-shard scan.

Writes scripts/config4_results.json (merged across runs).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "config4_results.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def save(update: dict) -> None:
    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            data = json.load(f)
    data.update(update)
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)
    log(f"wrote {RESULTS}: {json.dumps(update)}")


def run_cpu(n=10_000_000, d=64, n_queries=8, k=10):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    from sqe_tpu.parallel import ShardedFlatIndex, make_mesh

    mesh = make_mesh((8,), ("shard",))
    rng = np.random.default_rng(4)
    log(f"generating {n} x {d} vectors")
    # Clustered geometry (embedding-like), generated in blocks to bound peak RAM.
    centers = rng.standard_normal((1024, d)).astype(np.float32)
    vecs = np.empty((n, d), np.float32)
    blk = 1_000_000
    for lo in range(0, n, blk):
        hi = min(lo + blk, n)
        assign = rng.integers(0, 1024, size=hi - lo)
        block = centers[assign] + 0.25 * rng.standard_normal(
            (hi - lo, d)
        ).astype(np.float32)
        block /= np.linalg.norm(block, axis=1, keepdims=True) + 1e-9
        vecs[lo:hi] = block

    n0 = n - 4096   # leave a tail for the incremental-add gate
    metas_stub = [{"doc_id": str(i), "text": ""} for i in range(n)]
    idx = ShardedFlatIndex(mesh, embed_dim=d, block_n=131072)
    t0 = time.perf_counter()
    idx.build(vecs[:n0], metas_stub[:n0])
    build_s = time.perf_counter() - t0
    log(f"sharded build of {n0}: {build_s:.1f}s")

    t0 = time.perf_counter()
    for lo in range(n0, n, 1024):
        hi = min(lo + 1024, n)
        idx.add(vecs[lo:hi], metas_stub[lo:hi])
    add_s = time.perf_counter() - t0
    log(f"incremental add of {n - n0} rows in 1024-batches: {add_s:.2f}s")

    queries = vecs[rng.choice(n, size=n_queries, replace=False)]
    t0 = time.perf_counter()
    scores, ids = idx.search_ids(queries, k)
    search_s = time.perf_counter() - t0

    # Exact oracle over ALL rows, float64, blocked.
    ref_ids = np.empty((n_queries, k), np.int64)
    for qi in range(n_queries):
        best_s = np.full(k, -np.inf)
        best_i = np.full(k, -1, np.int64)
        for lo in range(0, n, blk):
            s = vecs[lo : lo + blk].astype(np.float64) @ queries[qi].astype(np.float64)
            cat_s = np.concatenate([best_s, s])
            cat_i = np.concatenate([best_i, np.arange(lo, lo + len(s))])
            sel = np.argsort(-cat_s)[:k]
            best_s, best_i = cat_s[sel], cat_i[sel]
        ref_ids[qi] = best_i
    recall = np.mean(
        [len(set(ids[i].tolist()) & set(ref_ids[i].tolist())) / k
         for i in range(n_queries)]
    )
    log(f"recall@{k} vs f64 brute force over all {n} rows: {recall:.4f}")

    bytes_per_shard = idx._vectors.dtype.itemsize * idx._cap * d
    save({
        "cpu_10m": {
            "n": n, "d": d, "n_shards": 8,
            "build_s": round(build_s, 1),
            "incremental_add_rows": n - n0,
            "incremental_add_s": round(add_s, 2),
            "recall_at_10_vs_f64_bruteforce": float(recall),
            "slots_per_shard": idx._cap,
            "vector_bytes_per_shard": int(bytes_per_shard),
            "note": (
                "D reduced to fit a 1-core/125GB host; gates correctness "
                "(exact sharded top-k over 10M rows + O(new) adds), not QPS. "
                "At D=1024 the per-shard working set is 16x (5.1 GB f32 / "
                "2.6 GB bf16 per shard of 1.25M) - the TPU half measures "
                "that operating point."
            ),
        }
    })
    assert recall >= 0.99, f"10M sharded recall gate failed: {recall}"


def run_tpu(n=1_250_000, d=1024, k=10, batch=1024, n_gate_queries=32):
    import jax
    import jax.numpy as jnp

    from sqe_tpu.index.flat import FlatIndex, flat_topk

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"expected TPU, got {dev.platform}"
    rng = np.random.default_rng(5)
    log(f"generating {n} x {d} vectors (clustered)")
    centers = rng.standard_normal((1024, d)).astype(np.float32)
    assign = rng.integers(0, 1024, size=n)
    vecs = centers[assign] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9

    idx = FlatIndex(embed_dim=d, device=dev, dtype=jnp.bfloat16, exact=False)
    t0 = time.perf_counter()
    idx.add(vecs, [{"doc_id": str(i), "text": ""} for i in range(n)])
    np.asarray(idx._vectors[0, 0])   # sync through the tunnel
    build_s = time.perf_counter() - t0
    hbm_gb = idx._vectors.size * idx._vectors.dtype.itemsize / 2**30
    log(f"upload+pad {n} rows: {build_s:.1f}s, HBM {hbm_gb:.2f} GiB (bf16)")

    queries = vecs[rng.choice(n, size=batch, replace=False)].copy()
    q_dev = jax.device_put(jnp.asarray(queries), dev)

    length = idx._vectors.shape[0]
    block = min(idx.block_n, length)
    if length % block:
        block = 1 << (min(idx.block_n, length).bit_length() - 1)

    from sqe_tpu.ops.fused_scan import fused_scan_topk, pick_bn

    length = idx._vectors.shape[0]
    bn = pick_bn(length)

    def run_fused():
        return fused_scan_topk(q_dev, idx._vectors, jnp.int32(n), k=k, bn=bn)

    def run_approx():
        return flat_topk(q_dev, idx._vectors, jnp.int32(n), k=k,
                         block_n=block, exact=False, approx_topk=True)

    def best_of(fn, reps=5, pipeline=4):
        np.asarray(fn()[0])  # compile + sync
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(pipeline):
                out = fn()
            np.asarray(out[0])
            times.append((time.perf_counter() - t0) / pipeline)
        return min(times)

    best_a = best_of(run_approx)
    log(f"1.25M x 1024 bf16 approx scan: {best_a*1000:.1f} ms for B={batch} "
        f"-> {batch/best_a:,.0f} QPS/chip")
    best = best_of(run_fused)
    qps = batch / best
    log(f"1.25M x 1024 bf16 FUSED scan: {best*1000:.1f} ms for B={batch} "
        f"-> {qps:,.0f} QPS/chip")
    s, ids = (np.asarray(a) for a in run_fused())

    # Epsilon-recall gate vs f64 brute force on a query subset.
    q64 = queries[:n_gate_queries].astype(np.float64)
    v64 = vecs.astype(np.float64)
    total = 0.0
    for i in range(n_gate_queries):
        sims = v64 @ q64[i]
        kth = np.partition(sims, -k)[-k]
        got = [int(x) for x in ids[i] if x >= 0]
        total += np.sum(sims[got] >= kth - 1e-5) / k
    recall = total / n_gate_queries
    log(f"epsilon-recall@{k}: {recall:.4f}")

    save({
        "tpu_1p25m_chip": {
            "n": n, "d": d, "dtype": "bfloat16", "batch": batch,
            "best_ms": round(best * 1000, 2),
            "qps_per_chip": round(qps),
            "approx_scan_ms": round(best_a * 1000, 2),
            "approx_scan_qps": round(batch / best_a),
            "engine": "fused_pallas_scan",
            "implied_10m_v5e8_qps": round(qps),   # shards search concurrently
            "hbm_gib": round(hbm_gb, 2),
            "epsilon_recall_at_10": float(recall),
            "note": (
                "per-chip share of config 4 (10M/8). Sharded QPS equals the "
                "per-chip QPS (shards search concurrently; the all_gather "
                "merge moves k x 8 pairs/query over ICI)."
            ),
        }
    })
    assert recall >= 0.95, f"1.25M/chip recall gate failed: {recall}"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()
    if args.cpu:
        run_cpu(n=args.n or 10_000_000)
    if args.tpu:
        run_tpu(n=args.n or 1_250_000)
