import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.index.hnsw import _exact_rerank
from sqe_tpu.ops.quantize import dequantize_rows, quantize_rows, quantized_scores


def test_quantize_roundtrip_error(rng):
    x = rng.standard_normal((64, 128)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q, s = quantize_rows(jnp.asarray(x))
    back = np.asarray(dequantize_rows(q, s))
    # per-component error bounded by scale/2 = absmax/254
    err = np.abs(back - x).max(axis=1)
    assert (err <= np.abs(x).max(axis=1) / 253.9).all()


def test_quantized_dot_accuracy(rng):
    x = rng.standard_normal((256, 1024)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    queries = rng.standard_normal((8, 1024)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q, s = quantize_rows(jnp.asarray(x))
    approx = np.asarray(quantized_scores(jnp.asarray(queries), q, s))
    exact = queries @ x.T
    assert np.abs(approx - exact).max() < 5e-3


def test_exact_rerank_fixes_order(rng):
    vecs = rng.standard_normal((32, 16)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = vecs[:2]  # self-queries
    # candidate ids deliberately in wrong order, with a -1 pad
    ids = jnp.asarray([[5, 0, 9, -1], [7, 1, 3, -1]], jnp.int32)
    scores, out_ids = _exact_rerank(jnp.asarray(queries), jnp.asarray(vecs), ids)
    out_ids = np.asarray(out_ids)
    scores = np.asarray(scores)
    assert out_ids[0][0] == 0 and out_ids[1][0] == 1   # self-match first
    assert np.isneginf(scores[0][-1]) and out_ids[0][-1] == -1
    assert (np.diff(scores[0][:3]) <= 1e-6).all()
