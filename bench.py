"""Headline benchmark: batched retrieval on one TPU chip.

Scale from BASELINE.json config 2/3: 100k synthetic 1024-d vectors (clustered,
embedding-like geometry), batched query stream B=1024, bf16 vector storage.
Three engines are measured; the fastest recall-gated one is the headline:

- **exact MXU scan** (index/flat.py): blocked Q @ V^T + running top-k. On TPU
  this is the winning design at corpus scales up to several million vectors
  per chip — batched brute force is pure MXU work (DESIGN.md §8).
- **approx-topk MXU scan**: same matmuls, per-block candidate selection via
  the TPU-optimized ``lax.approx_max_k`` aggregation (exact cross-block merge).
- **fused Pallas scan** (ops/fused_scan.py): matmul + per-128-lane-bin top-1
  reduced in VMEM; scores never touch HBM. Measured at the raw-matmul bound
  (DESIGN.md §8). Also run at B=4096 (four batched streams per dispatch) to
  amortize the dev tunnel's per-dispatch host cost.
- **fused int8 scan**: the same kernel at the int8 MXU rate (2x bf16) over
  per-row-quantized storage, scales applied in-VMEM before selection — the
  throughput engine when its ~0.96 epsilon-recall clears the gate.
- **HNSW beam search** (index/hnsw.py, M=16): the graph-ANN engine for the
  regimes where it wins (tiny-batch latency, very large N). Best-effort
  diagnostic — its device graph build depends on a remote compile service
  with minutes-scale variance, so the headline never waits on it.
- **fused-scan v2** (ops/fused_scan2.py, bf16 + int8): column-max
  accumulation with selection deferred to one XLA top-k; time-guarded
  diagnostic rows that join the headline candidates when they pass the gate.

Every engine is gated at epsilon-recall@10 >= 0.95 against the
Precision.HIGHEST exact oracle (epsilon-recall: a returned id counts if its
float64 similarity is within 1e-5 of the true k-th similarity — the standard
ANN metric under score ties).

A second stage measures the 1M x 1024-d operating point (VERDICT r03 #6):
device-generated clustered corpus, HIGHEST-precision oracle over the bf16
base, recall+QPS rows for the v1/v2 bf16 scans, the v2 int8 scan, and the
serving-default int8+rerank (v2 scan, R=32) — recorded under ``n_1m`` in
the output JSON with the same 0.95 gate applied per row.

``vs_baseline`` normalizes against the BASELINE.json north-star throughput
(>=50k QPS on v5e-8 => 6250 QPS/chip share).

Prints exactly ONE JSON line to stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def epsilon_recall(vecs, queries, ids, ref_scores, k, eps=1e-5):
    """Fraction of returned ids whose true (f64) sim >= kth true sim - eps."""
    total = 0.0
    v64 = vecs.astype(np.float64)
    q64 = queries.astype(np.float64)
    for i in range(len(queries)):
        got = [int(x) for x in ids[i] if x >= 0]
        sims = v64[got] @ q64[i]
        thresh = float(ref_scores[i, k - 1]) - eps
        total += np.sum(sims >= thresh) / k
    return total / len(queries)


def main():
    import jax
    import jax.numpy as jnp

    from sqe_tpu.config import HNSWConfig
    from sqe_tpu.index import FlatIndex, HNSWIndex
    from sqe_tpu.index.flat import flat_topk
    from sqe_tpu.ops.distance import l2_normalize
    from sqe_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    start = time.perf_counter()

    backend = jax.default_backend()
    device = jax.devices()[0]
    log(f"backend={backend} device={device}")

    n, d, n_queries, k, ef = 100_000, 1024, 1024, 10, 72
    rng = np.random.default_rng(0)
    n_clusters = 4096
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n + n_queries)
    noise = 0.35 * rng.standard_normal((n + n_queries, d)).astype(np.float32)
    allv = centers[assign] + noise
    allv /= np.linalg.norm(allv, axis=1, keepdims=True) + 1e-9
    vecs, queries = allv[:n], allv[n:]
    metas = [{"doc_id": str(i), "text": ""} for i in range(n)]

    flat = FlatIndex(embed_dim=d, block_n=25_000, device=device)
    flat.add(vecs, metas)
    t0 = time.perf_counter()
    ref_scores, _ref_ids = flat.search_ids(queries, k)
    log(f"exact oracle scan (HIGHEST precision): {time.perf_counter()-t0:.2f}s")

    # Queries stay on device: in the serving pipeline embeddings are produced
    # there by the embedder.
    q_dev = jax.device_put(l2_normalize(jnp.asarray(queries)), device)

    # Sustained-throughput timing: dispatch R batches back-to-back (async
    # dispatch, serving-style pipelining), sync once; min over several windows
    # (the dev chip is shared/tunneled with bursty interference).
    def timed_windows(fn, tag, windows=5, reps=5):
        best = float("inf")
        for _w in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            _ = np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        log(f"{tag}: {best*1e3:.2f} ms / {n_queries} queries "
            f"=> {n_queries/best:,.0f} QPS/chip")
        return n_queries / best

    # Serving layout for the timed scans: bf16, one block when the corpus
    # fits (a [B, block] f32 score tile is the only intermediate).
    block = min(131_072, n)
    n_pad = -(-n // block) * block
    vb = np.zeros((n_pad, d), np.float32)
    vb[:n] = vecs
    vecs_bf16 = jax.device_put(jnp.asarray(vb, dtype=jnp.bfloat16), device)

    def scan_config(tag, approx):
        _fs, fids = flat_topk(q_dev, vecs_bf16, jnp.int32(n), k=k,
                              block_n=block, exact=False, approx_topk=approx)
        r = float(epsilon_recall(vecs, queries, np.asarray(fids),
                                 ref_scores, k))
        log(f"{tag} epsilon-recall@{k}: {r:.4f}")
        qps = timed_windows(
            lambda: flat_topk(q_dev, vecs_bf16, jnp.int32(n), k=k,
                              block_n=block, exact=False, approx_topk=approx),
            tag,
        )
        return qps, r

    flat_qps, flat_recall = scan_config("exact MXU scan", approx=False)
    ascan_qps, ascan_recall = scan_config("approx-topk MXU scan", approx=True)

    # Fused Pallas scan, B=1024 and B=4096 (4 batched streams per dispatch).
    # Its tile size needs N padded to a 2048 multiple (FlatIndex's
    # power-of-two capacities always satisfy this; the bench pads here).
    from sqe_tpu.ops.fused_scan import fused_scan_topk, pick_bn

    nf = -(-n // 2048) * 2048
    vf = np.zeros((nf, d), np.float32)
    vf[:n] = vecs
    vecs_fused = jax.device_put(jnp.asarray(vf, dtype=jnp.bfloat16), device)
    del vf
    bn = pick_bn(nf)
    _fs, fids = fused_scan_topk(q_dev, vecs_fused, jnp.int32(n), k=k, bn=bn)
    fused_recall = float(
        epsilon_recall(vecs, queries, np.asarray(fids), ref_scores, k)
    )
    log(f"fused Pallas scan epsilon-recall@{k}: {fused_recall:.4f}")
    fused_qps = timed_windows(
        lambda: fused_scan_topk(q_dev, vecs_fused, jnp.int32(n), k=k, bn=bn),
        "fused Pallas scan",
    )
    q4_dev = jnp.tile(q_dev, (4, 1))
    fused4_qps = 4 * timed_windows(
        lambda: fused_scan_topk(q4_dev, vecs_fused, jnp.int32(n), k=k, bn=bn),
        "fused Pallas scan B=4096 (per-1024 share x4)",
    )

    # Int8 fused engine: si8xsi8->si32 MXU dots at 2x the bf16 rate, half the
    # corpus HBM; per-row scales dequantize in-kernel before selection
    # (DESIGN.md §2b). Gated by the same epsilon-recall bar as every engine.
    from sqe_tpu.ops.fused_scan import fused_scan_topk_int8, quantize_rows

    # Quantize from the padded fused-layout copy (already [nf, D] on device).
    v_i8, v_s = jax.jit(lambda v: quantize_rows(v.astype(jnp.float32)))(
        vecs_fused
    )
    _is, iids = fused_scan_topk_int8(q_dev, v_i8, v_s, jnp.int32(n), k=k, bn=bn)
    int8_recall = float(
        epsilon_recall(vecs, queries, np.asarray(iids), ref_scores, k)
    )
    log(f"fused int8 scan epsilon-recall@{k}: {int8_recall:.4f}")
    int8_qps = timed_windows(
        lambda: fused_scan_topk_int8(q_dev, v_i8, v_s, jnp.int32(n), k=k, bn=bn),
        "fused int8 scan",
    )
    int8x4_qps = 4 * timed_windows(
        lambda: fused_scan_topk_int8(q4_dev, v_i8, v_s, jnp.int32(n), k=k, bn=bn),
        "fused int8 scan B=4096 (per-1024 share x4)",
    )

    # int8 + exact residual rerank: the recall-restoring int8 serving path
    # (index/flat.py int8_scan_rerank_topk, VERDICT r02 #2) — scan at the
    # int8 MXU rate, then near-exact rerank of the top-128 candidates.
    from sqe_tpu.index.flat import int8_scan_rerank_topk

    @jax.jit
    def _resid(v, p, ps):
        return quantize_rows(v.astype(jnp.float32) - p.astype(jnp.float32) * ps)

    rerank_qps, rerank_recall = 0.0, 0.0
    R100K = 32   # serving default since the 2M R-sweep (rerank_ab_results)
    try:
        r_i8, r_s = _resid(vecs_fused, v_i8, v_s)
        _rs, rids = int8_scan_rerank_topk(q_dev, v_i8, v_s, r_i8, r_s,
                                          jnp.int32(n), k=k, r=R100K, bn=bn)
        rerank_recall = float(
            epsilon_recall(vecs, queries, np.asarray(rids), ref_scores, k)
        )
        log(f"fused int8+rerank epsilon-recall@{k}: {rerank_recall:.4f}")
        rerank_qps = timed_windows(
            lambda: int8_scan_rerank_topk(q_dev, v_i8, v_s, r_i8, r_s,
                                          jnp.int32(n), k=k, r=R100K, bn=bn),
            "fused int8+rerank",
        )
    except Exception as exc:  # noqa: BLE001 — a diagnostic row must never
        log(f"int8+rerank FAILED: {exc}")  # kill the headline bench


    # HNSW graph path: ALWAYS measured and recorded in the artifact
    # (VERDICT r02 #5 — the round-2 skip was silent under time pressure).
    # A failure is recorded in the output JSON, never swallowed to stderr
    # only. The engine is formally demoted to reference status (DESIGN §8:
    # the fused scan beats it at every measured operating point) but its
    # recall/QPS row stays pinned here so a regression is visible.
    hnsw_qps, hnsw_recall = 0.0, 0.0
    hnsw_status = "ok"
    if time.perf_counter() - start < 560:
        try:
            from sqe_tpu.index.hnsw import hnsw_search_batch

            t0 = time.perf_counter()
            idx = HNSWIndex(
                HNSWConfig(M=16, ef_search=ef), embed_dim=d,
                vector_dtype=jnp.bfloat16, device=device,
            )
            idx.build(vecs, metas, builder="device")
            log(f"device graph build: {time.perf_counter()-t0:.1f}s")
            _, ids = idx.search_ids(q_dev, k, ef=ef)
            hnsw_recall = float(
                epsilon_recall(vecs, queries, ids, ref_scores, k)
            )
            log(f"hnsw epsilon-recall@{k}: {hnsw_recall:.4f}")
            expand = 16
            kwargs = dict(
                k=k, ef=ef, max_iters=ef // expand + 32, n_seeds=32,
                expand=expand, fused_gather=idx._nbr_vecs is not None,
            )
            hnsw_qps = timed_windows(
                lambda: hnsw_search_batch(
                    q_dev, idx._vectors, idx._graph, idx._pivots,
                    idx._nbr_vecs, **kwargs
                ),
                "hnsw beam search",
            )
        except Exception as exc:  # noqa: BLE001
            hnsw_status = f"failed: {exc}"
            log(f"hnsw diagnostic failed: {exc}")
    else:
        hnsw_status = "skipped: time budget"
        log("hnsw diagnostic skipped (time budget)")

    # Fused-scan v2 (ops/fused_scan2.py): column-max accumulation — no
    # cross-lane work in the corpus loop, selection deferred to one XLA
    # top-k over a [B, 2048] accumulator. Measured last (after the pinned
    # HNSW row) under its own time guard so a slow remote compile can never
    # displace the always-recorded rows; shares vecs_fused/v_i8/v_s.
    v2 = {}
    if time.perf_counter() - start < 700:
        from sqe_tpu.ops.fused_scan2 import (
            fused_scan2_topk,
            fused_scan2_topk_int8,
        )

        def v2_config(tag, fn):
            try:
                _s, ids2 = fn(q_dev)
                r = float(epsilon_recall(vecs, queries, np.asarray(ids2),
                                         ref_scores, k))
                log(f"{tag} epsilon-recall@{k}: {r:.4f}")
                qps = timed_windows(lambda: fn(q_dev), tag)
                qps4 = 4 * timed_windows(
                    lambda: fn(q4_dev), f"{tag} B=4096 (per-1024 share x4)"
                )
                v2[tag] = {"qps": round(qps, 1), "qps_b4096": round(qps4, 1),
                           "recall": round(r, 4)}
                if r >= 0.95:
                    candidates_v2.append(
                        (qps, f"{tag}_qps_100k_1024d_recall{r:.3f}"))
                    candidates_v2.append(
                        (qps4, f"{tag}_qps_100k_1024d_B4096_recall{r:.3f}"))
            except Exception as exc:  # noqa: BLE001 — diagnostic row only
                v2[tag] = f"failed: {exc}"
                log(f"{tag} FAILED: {exc}")

        candidates_v2 = []
        v2_config("fused2_scan",
                  lambda q: fused_scan2_topk(q, vecs_fused, jnp.int32(n), k=k))
        v2_config("int8_2_scan",
                  lambda q: fused_scan2_topk_int8(q, v_i8, v_s, jnp.int32(n),
                                                  k=k))
    else:
        candidates_v2 = []
        v2 = "skipped: time budget"
        log("fused-scan v2 diagnostic skipped (time budget)")

    # 1M operating point (VERDICT r03 #6): the north-star-scale rows. The
    # corpus is generated ON DEVICE (4 GB of host->device transfer at the
    # tunnel's 32 MB/s would take minutes); the oracle is the HIGHEST-
    # precision exact scan over the same bf16 base on a 128-query gate,
    # exactly the ann_bench_large.py discipline. Engines: the serving
    # default int8+rerank on the v2 scan (index/flat.py scan_plan), the v2
    # bf16 scan, the v2 int8 scan, and the v1 fused bf16 scan as the
    # round-3 reference point. Time-guarded as a block: the always-recorded
    # 100k rows and the headline never wait on a slow remote compile here.
    m1 = {}
    N_GATE_1M = 128
    if time.perf_counter() - start < 900:
        try:
            from sqe_tpu.index.flat import int8_scan_rerank_topk
            from sqe_tpu.ops.fused_scan2 import (
                fused_scan2_topk as f2_topk,
                fused_scan2_topk_int8 as f2_topk_i8,
            )

            n1 = 1_048_576
            gen_block = 131_072

            def gen_dev(seed, rows):
                kc, ka = jax.random.split(jax.random.PRNGKey(seed))

                @jax.jit
                def gen():
                    centers = jax.random.normal(kc, (1024, d), jnp.float32)

                    def blk(i):
                        k1, k2 = jax.random.split(jax.random.fold_in(ka, i))
                        a = jax.random.randint(k1, (gen_block,), 0, 1024)
                        v = centers[a] + 0.25 * jax.random.normal(
                            k2, (gen_block, d), jnp.float32)
                        v = v / (jnp.linalg.norm(v, axis=1, keepdims=True)
                                 + 1e-9)
                        return v.astype(jnp.bfloat16)

                    return jax.lax.map(
                        blk, jnp.arange(rows // gen_block)).reshape(rows, d)

                return gen()

            t0 = time.perf_counter()
            v1m = gen_dev(11, n1)
            q1m = gen_dev(12, gen_block)[:4096].astype(jnp.float32)
            np.asarray(q1m[0, 0])
            log(f"1M gen: {time.perf_counter()-t0:.1f}s")
            gate_q = q1m[:N_GATE_1M]

            t0 = time.perf_counter()
            ref1_s, _ = flat_topk(gate_q, v1m, jnp.int32(n1), k=k,
                                  block_n=131_072, exact=True)
            ref1_s = np.asarray(ref1_s)
            log(f"1M oracle: {time.perf_counter()-t0:.1f}s")

            @jax.jit
            def exact_scores(v, q, ids):
                cand = v[jnp.maximum(ids, 0)].astype(jnp.float32)
                s = jnp.einsum("bd,bkd->bk", q.astype(jnp.float32), cand,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                return jnp.where(ids >= 0, s, -jnp.inf)

            def recall_1m(ids):
                got = np.asarray(exact_scores(v1m, gate_q, jnp.asarray(ids)))
                thresh = ref1_s[:, k - 1] - 1e-5
                return float(np.mean(
                    np.sum(got >= thresh[:, None], axis=1) / k))

            # int8 + residual planes, quantized blockwise on device.
            import functools as _ft

            @jax.jit
            def _quant(v):
                return quantize_rows(v.astype(jnp.float32))

            @jax.jit
            def _resid_q(v, p, ps):
                return quantize_rows(v.astype(jnp.float32)
                                     - p.astype(jnp.float32) * ps)

            @_ft.partial(jax.jit, donate_argnums=(0,))
            def _fill(buf, vals, c0):
                return jax.lax.dynamic_update_slice(buf, vals, (c0, 0))

            p_i8 = jnp.zeros((n1, d), jnp.int8)
            p_s = jnp.zeros((n1, 1), jnp.float32)
            for c0 in range(0, n1, gen_block):
                qv, qs = _quant(v1m[c0:c0 + gen_block])
                p_i8 = _fill(p_i8, qv, jnp.int32(c0))
                p_s = _fill(p_s, qs, jnp.int32(c0))
            r_i8 = jnp.zeros((n1, d), jnp.int8)
            r_s = jnp.zeros((n1, 1), jnp.float32)
            for c0 in range(0, n1, gen_block):
                rv, rs = _resid_q(v1m[c0:c0 + gen_block],
                                  p_i8[c0:c0 + gen_block],
                                  p_s[c0:c0 + gen_block])
                r_i8 = _fill(r_i8, rv, jnp.int32(c0))
                r_s = _fill(r_s, rs, jnp.int32(c0))
            np.asarray(r_s[0])

            bn1 = pick_bn(n1)

            def timed_1m(fn, tag, b, windows=4, reps=4):
                best = float("inf")
                for _w in range(windows):
                    t0 = time.perf_counter()
                    for _ in range(reps):
                        out = fn()
                    _ = np.asarray(out[0])
                    best = min(best, (time.perf_counter() - t0) / reps)
                log(f"1M {tag} B={b}: {best*1e3:.2f} ms => {b/best:,.0f} QPS")
                return b / best

            R1M = 32   # serving default (scripts/rerank_ab_results.json)

            def row_1m(tag, make_fn, batches=(1024,)):
                try:
                    _s, ids = make_fn(gate_q)
                    r = recall_1m(np.asarray(ids))
                    log(f"1M {tag} epsilon-recall@{k}: {r:.4f}")
                    entry = {"recall": round(r, 4), "gated": r >= 0.95}
                    for b in batches:
                        q = q1m[:b]
                        entry[f"qps_b{b}"] = round(
                            timed_1m(lambda: make_fn(q), tag, b), 1)
                    m1[tag] = entry
                except Exception as exc:  # noqa: BLE001 — row-isolated
                    m1[tag] = f"failed: {exc}"
                    log(f"1M {tag} FAILED: {exc}")

            row_1m("fused_bf16",
                   lambda q: fused_scan_topk(q, v1m, jnp.int32(n1), k=k,
                                             bn=bn1))
            row_1m("fused2_bf16",
                   lambda q: f2_topk(q, v1m, jnp.int32(n1), k=k),
                   batches=(1024, 4096))
            row_1m("int8_2",
                   lambda q: f2_topk_i8(q, p_i8, p_s, jnp.int32(n1), k=k))
            row_1m("int8_rerank2",
                   lambda q: int8_scan_rerank_topk(
                       q, p_i8, p_s, r_i8, r_s, jnp.int32(n1), k=k, r=R1M,
                       bn=bn1, scan2=True),
                   batches=(1024, 4096))
            for buf in (v1m, p_i8, p_s, r_i8, r_s):
                buf.delete()
        except Exception as exc:  # noqa: BLE001 — stage-isolated
            m1 = {"error": f"{type(exc).__name__}: {exc}"}
            log(f"1M stage FAILED: {exc}")
    else:
        m1 = "skipped: time budget"
        log("1M stage skipped (time budget)")

    # Headline: fastest engine that passes the recall gate.
    candidates = []
    if flat_recall >= 0.95:
        candidates.append(
            (flat_qps, f"exact_scan_qps_100k_1024d_recall{flat_recall:.3f}")
        )
    if ascan_recall >= 0.95:
        candidates.append(
            (ascan_qps, f"approx_scan_qps_100k_1024d_recall{ascan_recall:.3f}")
        )
    if fused_recall >= 0.95:
        candidates.append(
            (fused_qps, f"fused_scan_qps_100k_1024d_recall{fused_recall:.3f}")
        )
        candidates.append(
            (fused4_qps,
             f"fused_scan_qps_100k_1024d_B4096_recall{fused_recall:.3f}")
        )
    if int8_recall >= 0.95:
        candidates.append(
            (int8_qps, f"int8_scan_qps_100k_1024d_recall{int8_recall:.3f}")
        )
        candidates.append(
            (int8x4_qps,
             f"int8_scan_qps_100k_1024d_B4096_recall{int8_recall:.3f}")
        )
    if rerank_recall >= 0.95:
        candidates.append(
            (rerank_qps,
             f"int8_rerank_qps_100k_1024d_recall{rerank_recall:.3f}")
        )
    if hnsw_recall >= 0.95:
        candidates.append(
            (hnsw_qps, f"hnsw_qps_100k_1024d_recall{hnsw_recall:.3f}")
        )
    candidates += candidates_v2
    value, metric = max(candidates) if candidates else (0.0, "no_path_passed_gate")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(value / 6250.0, 3),
        "hnsw": ({"qps": round(hnsw_qps, 1), "recall": round(hnsw_recall, 4)}
                 if hnsw_status == "ok" else hnsw_status),
        "fused2": v2,
        "n_1m": m1,
    }))


if __name__ == "__main__":
    main()
