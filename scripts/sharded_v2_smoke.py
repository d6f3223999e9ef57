"""Hardware smoke + timing for the sharded int8_rerank v2 routing.

parallel/sharded_index.py now routes each shard's candidate stage through
the v2 column-max scan (scan2=True — ROADMAP #0 follow-on). The CPU-mesh
tests gate arithmetic parity via the XLA fallback; this script proves the
KERNEL path on the real chip inside shard_map: a 1-device TPU mesh holding
262,144 x 1024-d rows, searched through ShardedFlatIndex's own search_ids,
checked id-for-id against the single-device FlatIndex serving path (auto ->
int8_rerank2, the identical kernel outside shard_map) and timed at B=1024.

Writes scripts/sharded_v2_smoke_results.json. Run on the TPU:
    python scripts/sharded_v2_smoke.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sharded_v2_smoke_results.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from sqe_tpu.index.flat import FlatIndex
    from sqe_tpu.parallel.sharded_index import ShardedFlatIndex
    from sqe_tpu.utils.compile_cache import enable

    enable()
    dev = jax.devices()[0]
    mesh = jax.sharding.Mesh(np.array([dev]), ("shard",))
    n, d, b, k = 262_144, 1024, 1024, 10
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = rng.standard_normal((b, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    metas = [{"doc_id": str(i)} for i in range(n)]

    t0 = time.perf_counter()
    sharded = ShardedFlatIndex(mesh, embed_dim=d, storage="int8_rerank")
    sharded.add(vecs, metas)
    log(f"sharded add ({n} rows through the host mirror): "
        f"{time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    s_scores, s_ids = sharded.search_ids(queries, k)
    log(f"sharded search (compile + run): {time.perf_counter()-t0:.1f}s")

    flat = FlatIndex(embed_dim=d, device=dev, dtype=jnp.int8, exact=False,
                     rerank=True)
    flat.add(vecs, metas)
    f_scores, f_ids = flat.search_ids(queries, k)
    plan = flat.scan_plan(k)
    log(f"flat plan: {plan}")

    id_match = float(np.mean(s_ids == f_ids))

    def timed(fn, reps=4, windows=4):
        best = float("inf")
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn()
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    sh_ms = timed(lambda: sharded.search_ids(queries, k)) * 1e3
    fl_ms = timed(lambda: flat.search_ids(queries, k)) * 1e3
    out = {
        "n": n, "b": b, "k": k,
        "flat_plan": list(plan),
        "id_match_vs_flat": round(id_match, 4),
        "sharded_ms": round(sh_ms, 2),
        "flat_ms": round(fl_ms, 2),
        "sharded_qps": round(b / (sh_ms / 1e3)),
        "flat_qps": round(b / (fl_ms / 1e3)),
    }
    log(json.dumps(out))
    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=2)
    assert id_match > 0.99, f"sharded v2 ids diverge from flat: {id_match}"
    log("OK")


if __name__ == "__main__":
    main()
