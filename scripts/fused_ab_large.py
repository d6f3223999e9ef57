"""Same-session fused-scan v1 vs v2 A/B at large N (1M/2M/4M x 1024-d).

Round-3 left the v2 column-max kernel unmeasured past 100k rows
(fused_scan2_results.json has no 1M row; DESIGN §8c/8d's large-N tables are
all v1), and the 100k A/B disagreed across sessions (VERDICT r03 weak #2).
This script closes that: every v1/v2 pair runs back-to-back in ONE session
at each scale, with the exact timing method that produced the §8c tables
(scripts/ann_bench_large.py::time_search — 4-deep pipelined dispatch, min
over reps), so rows are directly comparable and `scan_impl` defaults can be
set from the artifact.

Memory discipline is ann_bench_large's: corpus generated ON DEVICE blockwise
straight to bf16 (no host transfer — the dev tunnel moves 32 MB/s; a 4M
corpus would take 4+ min to ship), recall gated on 128 queries against the
Precision.HIGHEST oracle over the same bf16 base, and at the rerank phase
the bf16 base is DELETED before the residual plane materializes (at 4M the
three planes cannot coexist in 16 GB HBM) and regenerated blockwise for
recall scoring.

Engines per scale, B in {1, 1024, 4096}:
  v1_bf16 / v2_bf16         fused Pallas scan, bf16 MXU rate
  v1_int8 / v2_int8         int8 planes, 2x MXU rate, half HBM read
  v1_int8_rerank / v2_...   int8 scan -> top-128 -> exact residual rerank

Writes scripts/fused_ab_large_results.json progressively (per engine), so a
timeout or OOM keeps every finished row. Run on the TPU:
    python scripts/fused_ab_large.py [n_millions ...]   (default: 1 2 4)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ann_bench_large import (  # noqa: E402  — shared large-N machinery
    GEN_BLOCK,
    _block_fn,
    eps_recall,
    exact_scores_for,
    gen_device_bf16,
    time_search,
)

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fused_ab_large_results.json")
K = 10
N_GATE = 128
BATCHES = (1024, 4096, 1)   # headline batch first: partial runs keep it
R = 128                     # FlatIndex rerank_depth default


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _save(results):
    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            data = json.load(f)
    data.update(results)
    with open(RESULTS, "w") as f:
        json.dump(data, f, indent=2)


def _bench_engine(out, results, tag, fn, queries, gate_q, recall_fn):
    """Time one engine at every batch + gate its recall; fault-isolated and
    progressively persisted so a single engine's OOM/compile stall keeps
    every other row."""
    rows = {}
    try:
        for b in BATCHES:
            q = queries[:b]
            e2e, devt = time_search(lambda q=q: fn(q))
            rows[str(b)] = {"e2e_ms": round(e2e * 1e3, 2),
                            "dev_ms": round(devt * 1e3, 2),
                            "qps": round(b / devt)}
        _, ids = fn(gate_q)
        rows["recall"] = recall_fn(np.asarray(ids))
    except Exception as exc:  # noqa: BLE001 — recorded, run continues
        rows["error"] = f"{type(exc).__name__}: {exc}"[:300]
    out[tag] = rows
    log(f"  {tag}: {json.dumps(rows)}")
    _save(results)


def run_scale(results, key, n, d=1024):
    import jax
    import jax.numpy as jnp

    from sqe_tpu.index.flat import flat_topk, int8_scan_rerank_topk
    from sqe_tpu.ops.fused_scan import (
        fused_scan_topk, fused_scan_topk_int8, pick_bn, quantize_rows,
    )
    from sqe_tpu.ops.fused_scan2 import fused_scan2_topk, fused_scan2_topk_int8

    dev = jax.devices()[0]
    log(f"=== N={n} d={d} on {dev} (bf16 base {n*d*2/2**30:.1f} GB) ===")
    t0 = time.perf_counter()
    vecs = gen_device_bf16(jax.random.PRNGKey(11), n, d)
    queries = gen_device_bf16(jax.random.PRNGKey(12), 131072, d)[:max(BATCHES)]
    queries = queries.astype(jnp.float32)
    np.asarray(queries[0, 0])
    gate_q = queries[:N_GATE]
    log(f"gen: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    ref_s = np.asarray(flat_topk(gate_q, vecs, jnp.int32(n), k=K,
                                 block_n=GEN_BLOCK, exact=True)[0])
    log(f"oracle (HIGHEST over bf16 base): {time.perf_counter()-t0:.1f}s")

    def recall_with_base(ids):
        return round(eps_recall(ref_s, exact_scores_for(vecs, gate_q, ids)), 4)

    out = {}
    results[key] = out
    bn = pick_bn(n)
    assert bn, n

    _bench_engine(out, results, "v1_bf16",
                  lambda q: fused_scan_topk(q, vecs, jnp.int32(n), k=K, bn=bn),
                  queries, gate_q, recall_with_base)
    _bench_engine(out, results, "v2_bf16",
                  lambda q: fused_scan2_topk(q, vecs, jnp.int32(n), k=K),
                  queries, gate_q, recall_with_base)

    # int8 planes, blockwise on device with a donated in-place fill (one
    # buffer ever exists — see ann_bench_large.py's 4M accounting).
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill(buf, vals, start):
        return jax.lax.dynamic_update_slice(buf, vals, (start, 0))

    @jax.jit
    def quant_chunk(v):
        return quantize_rows(v.astype(jnp.float32))

    t0 = time.perf_counter()
    v_i8 = jnp.zeros((n, d), jnp.int8)
    v_s = jnp.zeros((n, 1), jnp.float32)
    for c0 in range(0, n, GEN_BLOCK):
        qv, qs = quant_chunk(vecs[c0:c0 + GEN_BLOCK])
        v_i8 = fill(v_i8, qv, jnp.int32(c0))
        v_s = fill(v_s, qs, jnp.int32(c0))
    np.asarray(v_s[0])
    log(f"int8 quantize: {time.perf_counter()-t0:.1f}s")

    _bench_engine(out, results, "v1_int8",
                  lambda q: fused_scan_topk_int8(q, v_i8, v_s, jnp.int32(n),
                                                 k=K, bn=bn),
                  queries, gate_q, recall_with_base)
    _bench_engine(out, results, "v2_int8",
                  lambda q: fused_scan2_topk_int8(q, v_i8, v_s, jnp.int32(n),
                                                  k=K),
                  queries, gate_q, recall_with_base)

    # Rerank phase: base deleted -> residual plane -> blockwise recall
    # against the regenerated base (ann_bench_large's 4M recipe).
    try:
        blk_fn = _block_fn(jax.random.PRNGKey(11), d)

        @jax.jit
        def resid_chunk(v, p, ps):
            return quantize_rows(v.astype(jnp.float32)
                                 - p.astype(jnp.float32) * ps)

        vecs.delete()
        t0 = time.perf_counter()
        r_i8 = jnp.zeros((n, d), jnp.int8)
        r_s = jnp.zeros((n, 1), jnp.float32)
        for bi, c0 in enumerate(range(0, n, GEN_BLOCK)):
            rv, rs = resid_chunk(blk_fn(jnp.int32(bi)),
                                 v_i8[c0:c0 + GEN_BLOCK],
                                 v_s[c0:c0 + GEN_BLOCK])
            r_i8 = fill(r_i8, rv, jnp.int32(c0))
            r_s = fill(r_s, rs, jnp.int32(c0))
        np.asarray(r_s[0])
        log(f"residual quantize (base deleted): {time.perf_counter()-t0:.1f}s")

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

        def recall_regen(ids):
            got = np.full(ids.shape, -np.inf, np.float32)
            for bi, c0 in enumerate(range(0, n, GEN_BLOCK)):
                s = np.asarray(score_block(blk_fn(jnp.int32(bi)), gate_q,
                                           jnp.asarray(ids), jnp.int32(c0)))
                got = np.maximum(got, s)
            return round(eps_recall(ref_s, got), 4)

        for tag, scan2 in (("v1_int8_rerank", False), ("v2_int8_rerank", True)):
            _bench_engine(
                out, results, tag,
                lambda q, scan2=scan2: int8_scan_rerank_topk(
                    q, v_i8, v_s, r_i8, r_s, jnp.int32(n), k=K, r=R, bn=bn,
                    scan2=scan2),
                queries, gate_q, recall_regen)
    except Exception as exc:  # noqa: BLE001 — scan rows survive
        out["rerank_phase_error"] = f"{type(exc).__name__}: {exc}"[:300]
        log(f"rerank phase FAILED: {exc}")
        _save(results)


if __name__ == "__main__":
    from sqe_tpu.utils.compile_cache import enable

    enable()
    millions = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    results = {}
    for m in millions:
        n = m * 1_048_576
        try:
            run_scale(results, str(n), n)
        except Exception as exc:  # noqa: BLE001 — keep the other scales
            results[str(n)] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            log(f"scale {n} FAILED: {exc}")
            _save(results)
    log(f"wrote {RESULTS}")
