"""Embedder forward throughput: fused-QKV vs per-matrix projections.

Measures the embed forward (Pallas attention) at serving/ingest shapes with
in-loop timing (R iterations inside one jit; the tunnel's dispatch floor
amortized away). The A/B control re-implements the round-1 projection form
(three [dm, dm] einsums) so both variants run in the same session on the
same chip — required because this device's throughput varies run-to-run
(CLAUDE.md measurement rules). The forward loop is replicated locally,
parameterized by the MHA implementation, so production code stays untouched;
a parity check guards that the local copy matches models/embedder.py.

Run on the TPU: python scripts/embed_bench.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from sqe_tpu.config import ModelConfig
from sqe_tpu.models.embedder import (
    _layer_norm,
    embed_forward,
    init_embedder_params,
)
from sqe_tpu.ops.attention import NEG_INF, _flash_attention_ad, multihead_attention
from sqe_tpu.ops.distance import l2_normalize
from sqe_tpu.utils.compile_cache import enable

R = 10


def unfused_mha(x, mask, wq, wk, wv, wo, *, n_heads, impl):
    """Round-1 projection form: three separate [dm, dm] contractions."""
    b, l, dm = x.shape
    h = n_heads
    dh = dm // h
    dtype = x.dtype

    def proj(w):
        y = jnp.einsum("bld,de->ble", x, w.astype(dtype))
        return y.reshape(b, l, h, dh).transpose(0, 2, 1, 3).reshape(b * h, l, dh)

    q, k, v = proj(wq), proj(wk), proj(wv)
    bias = jnp.where(mask > 0, 0.0, NEG_INF).astype(jnp.float32)
    o = _flash_attention_ad(q, k, v, bias, h)
    o = o.reshape(b, h, l, dh).transpose(0, 2, 1, 3).reshape(b, l, dm)
    return jnp.einsum("bld,de->ble", o, wo.astype(dtype))


def forward_with(params, ids, mask, *, cfg, mha):
    """Local replica of embed_forward parameterized by the MHA function."""
    dtype = jnp.dtype(cfg.dtype)
    l = ids.shape[1]
    x = params["tok_emb"][ids].astype(dtype) + \
        params["pos_emb"][:l][None].astype(dtype)
    for layer in params["layers"]:
        h = _layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
        h = mha(h, mask, layer["wq"], layer["wk"], layer["wv"], layer["wo"],
                n_heads=cfg.n_heads, impl="pallas")
        x = x + h
        h = _layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"])
        h = jnp.einsum("bld,df->blf", h, layer["w1"].astype(dtype)) + \
            layer["b1"].astype(dtype)
        h = jax.nn.gelu(h)
        h = jnp.einsum("blf,fd->bld", h, layer["w2"].astype(dtype)) + \
            layer["b2"].astype(dtype)
        x = x + h
    x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
    m = mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0
    )
    return l2_normalize(pooled @ params["out_proj"].astype(jnp.float32), axis=-1)


def time_forward(params, ids, mask, cfg, mha):
    @jax.jit
    def run(params, ids, mask):
        def body(i, acc):
            out = forward_with(params, ids + 0 * i, mask, cfg=cfg, mha=mha)
            return acc + out.sum() + 1e-6 * i
        return jax.lax.fori_loop(0, R, body, 0.0)

    np.asarray(run(params, ids, mask))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(run(params, ids, mask))
        best = min(best, (time.perf_counter() - t0) / R)
    return best * 1e3


def fused_mha(x, mask, wq, wk, wv, wo, *, n_heads, impl):
    return multihead_attention(x, mask, wq, wk, wv, wo,
                               n_heads=n_heads, impl=impl)


def main():
    enable()
    cfg = ModelConfig()
    dev = jax.devices()[0]
    params = jax.device_put(init_embedder_params(cfg), dev)
    rng = np.random.default_rng(0)

    # Parity guard: the local forward replica must match the production one.
    ids0 = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, 64)), jnp.int32)
    mask0 = jnp.ones((4, 64), jnp.int32)
    prod = embed_forward(params, ids0, mask0, cfg=cfg, attn_impl="pallas")
    local = forward_with(params, ids0, mask0, cfg=cfg, mha=fused_mha)
    assert float(jnp.max(jnp.abs(prod - local))) < 1e-5, "bench replica drift"

    for b, l in ((64, 512), (64, 64), (1, 64)):
        ids = jax.device_put(
            jnp.asarray(rng.integers(1, cfg.vocab_size, (b, l)), jnp.int32), dev
        )
        mask = jax.device_put(jnp.ones((b, l), jnp.int32), dev)
        fused = time_forward(params, ids, mask, cfg, fused_mha)
        unfused = time_forward(params, ids, mask, cfg, unfused_mha)
        print(f"B={b} L={l}: fused-QKV {fused:.2f} ms | "
              f"per-matrix {unfused:.2f} ms | "
              f"speedup {unfused / fused:.2f}x", flush=True)


if __name__ == "__main__":
    main()
