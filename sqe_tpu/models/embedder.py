"""In-process JAX embedding transformer.

Replaces the reference's per-text HTTP calls to Ollama's `mxbai-embed-large`
(1024-d output; reference app/main.py:131-180, app/embedding_gen.py:140-190)
with a jitted encoder forward that runs on the same chips as retrieval:
pre-LN transformer encoder -> masked mean pooling -> projection to 1024-d ->
L2 normalization (so downstream cosine similarity is a pure dot product,
reference convention app/main.py:315-316).

Parameters are a plain pytree (dict), making sharding with pjit/NamedSharding
and checkpointing straightforward. Compute runs in bfloat16 on the MXU with
float32 accumulation; parameters stay float32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.config import ModelConfig
from sqe_tpu.data.tokenizer import HashingTokenizer
from sqe_tpu.ops.attention import multihead_attention
from sqe_tpu.ops.distance import l2_normalize
from sqe_tpu.utils import dispatch

Params = Dict[str, Any]


def init_embedder_params(cfg: ModelConfig, key: Optional[jax.Array] = None) -> Params:
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    keys = iter(jax.random.split(key, 4 + 8 * cfg.n_layers))
    dm, dff = cfg.d_model, cfg.d_ff
    pdtype = jnp.dtype(cfg.param_dtype)

    def dense(k, fan_in, fan_out):
        scale = (2.0 / (fan_in + fan_out)) ** 0.5
        return (jax.random.normal(k, (fan_in, fan_out)) * scale).astype(pdtype)

    params: Params = {
        "tok_emb": (jax.random.normal(next(keys), (cfg.vocab_size, dm)) * 0.02).astype(pdtype),
        "pos_emb": (jax.random.normal(next(keys), (cfg.max_len, dm)) * 0.02).astype(pdtype),
        "out_proj": dense(next(keys), dm, cfg.embed_dim),
        "final_ln": {"scale": jnp.ones((dm,), pdtype), "bias": jnp.zeros((dm,), pdtype)},
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append(
            {
                "ln1": {"scale": jnp.ones((dm,), pdtype), "bias": jnp.zeros((dm,), pdtype)},
                "ln2": {"scale": jnp.ones((dm,), pdtype), "bias": jnp.zeros((dm,), pdtype)},
                "wq": dense(next(keys), dm, dm),
                "wk": dense(next(keys), dm, dm),
                "wv": dense(next(keys), dm, dm),
                "wo": dense(next(keys), dm, dm),
                "w1": dense(next(keys), dm, dff),
                "b1": jnp.zeros((dff,), pdtype),
                "w2": dense(next(keys), dff, dm),
                "b2": jnp.zeros((dm,), pdtype),
            }
        )
    return params


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def embed_forward(
    params: Params,
    ids: jax.Array,
    mask: jax.Array,
    *,
    cfg: ModelConfig,
    attn_impl: str = "xla",
    remat: bool = False,
) -> jax.Array:
    """Forward pass: [B, L] int32 ids + [B, L] mask -> [B, embed_dim] float32, L2-normed.

    ``attn_impl="auto"`` picks per sequence length (static at trace time):
    the flash kernel wins 3.2x at L=512 (no [L, L] HBM round-trip) but its
    grid overhead loses 1.5x at L=128 and ties at L=64, where XLA's fused
    attention is already optimal (measured A/B, DESIGN.md §9b). Length
    buckets are distinct programs anyway, so each bucket gets its best
    implementation for free.
    """
    dtype = jnp.dtype(cfg.dtype)
    l = ids.shape[1]
    if attn_impl == "auto":
        attn_impl = "pallas" if l >= 256 else "xla"
    x = params["tok_emb"][ids].astype(dtype) + params["pos_emb"][:l][None].astype(dtype)

    def one_layer(x, layer):
        h = _layer_norm(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
        h = multihead_attention(
            h, mask,
            layer["wq"], layer["wk"], layer["wv"], layer["wo"],
            n_heads=cfg.n_heads, impl=attn_impl,
        )
        x = x + h
        h = _layer_norm(x, layer["ln2"]["scale"], layer["ln2"]["bias"])
        h = jnp.einsum("bld,df->blf", h, layer["w1"].astype(dtype)) + layer["b1"].astype(dtype)
        h = jax.nn.gelu(h)
        h = jnp.einsum("blf,fd->bld", h, layer["w2"].astype(dtype)) + layer["b2"].astype(dtype)
        return x + h

    if remat:
        # Per-layer rematerialization: backward recomputes each layer's
        # activations from its input instead of storing them — activation
        # HBM drops from O(n_layers) to O(1) layers, buying the large
        # contrastive batches (the 512->1024 negative-pool step OOMs at
        # 30 GB without this; with it the same step fits), at ~1 extra
        # forward of FLOPs on the MXU.
        one_layer = jax.checkpoint(one_layer)
    for layer in params["layers"]:
        x = one_layer(x, layer)

    x = _layer_norm(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
    # Masked mean pooling.
    m = mask.astype(jnp.float32)[..., None]
    pooled = jnp.sum(x.astype(jnp.float32) * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1.0
    )
    emb = pooled @ params["out_proj"].astype(jnp.float32)
    return l2_normalize(emb, axis=-1)


class Embedder:
    """Tokenizer + params + jitted forward, with host-side batching.

    This is the drop-in replacement for the reference's
    ``embed_texts_in_batches`` / ``embed_query`` (app/main.py:148-180): same
    [N, 1024] float32 contract, but batched on-device instead of per-text HTTP.
    """

    def __init__(
        self,
        cfg: Optional[ModelConfig] = None,
        params: Optional[Params] = None,
        attn_impl: Optional[str] = None,
        device: Optional[jax.Device] = None,
        tokenizer: Optional[Any] = None,
    ):
        self.cfg = cfg or ModelConfig()
        self.tokenizer = tokenizer or HashingTokenizer(
            self.cfg.vocab_size, self.cfg.max_len
        )
        self.device = device
        if attn_impl is None:
            platform = (device or jax.devices()[0]).platform
            # "auto" = per-length-bucket choice (flash kernel for long
            # sequences, XLA fused attention for short — DESIGN.md §9b).
            attn_impl = "auto" if platform == "tpu" else "xla"
        self.attn_impl = attn_impl
        if params is None:
            params = init_embedder_params(self.cfg)
        if device is not None:
            params = jax.device_put(params, device)
        self.params = params
        self._fwd = jax.jit(
            functools.partial(embed_forward, cfg=self.cfg, attn_impl=self.attn_impl)
        )

    def embed_tokens(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array:
        if self.device is not None:
            ids = jax.device_put(ids, self.device)
            mask = jax.device_put(mask, self.device)
        out = self._fwd(self.params, ids, mask)
        dispatch.program("embed_forward")
        return out

    # Sequence-length buckets: embeddings are padding-invariant (masked
    # attention + masked mean pool), so short inputs run a short program.
    LEN_BUCKETS = (64, 128, 256, 512)

    def embed_texts(
        self,
        texts: Sequence[str],
        batch_size: int = 64,
        max_len: Optional[int] = None,
    ) -> np.ndarray:
        """Embed a list of texts -> [N, embed_dim] float32 (normalized rows).

        Pads the final batch to ``batch_size`` so every device program has a
        static shape; sequence length is bucketed (64/128/256/512) per batch
        so short queries don't pay full-chunk-length forwards — a ~8x latency
        win on the serving query path. Bucketing slices the tokenized arrays,
        so it's exact: no tokens are dropped relative to ``max_len``.
        """
        if not texts:
            return np.zeros((0, self.cfg.embed_dim), dtype=np.float32)
        full_len = max_len or self.cfg.max_len
        # Dispatch all batches asynchronously (device programs pipeline),
        # materialize to host once at the end.
        from sqe_tpu.utils.logging import get_logger

        log = get_logger("models.embedder")
        pending: List[tuple] = []
        n_batches = -(-len(texts) // batch_size)
        for bi, i in enumerate(range(0, len(texts), batch_size)):
            batch = list(texts[i : i + batch_size])
            n = len(batch)
            if n < batch_size:
                batch += [""] * (batch_size - n)
            ids, mask = self.tokenizer.encode_batch(batch, max_len=full_len)
            longest = int(mask.sum(axis=1).max())
            bucket = next(
                (b for b in self.LEN_BUCKETS if longest <= b <= full_len),
                full_len,
            )
            pending.append(
                (self.embed_tokens(ids[:, :bucket], mask[:, :bucket]), n)
            )
            if n_batches >= 200 and (bi + 1) % 100 == 0:
                # Corpus-scale ingest: sync the just-dispatched batch so
                # progress (and a hung device) is visible in the log instead
                # of one silent multi-minute materialization at the end.
                np.asarray(pending[-1][0][:1])
                log.info("embedded %d/%d batches", bi + 1, n_batches)
        dispatch.sync("embed_materialize", len(pending))
        return np.concatenate(
            [np.asarray(emb[:n]) for emb, n in pending], axis=0
        )

    def embed_query(self, query: str) -> np.ndarray:
        """Single-query embed -> [1, embed_dim] (reference contract app/main.py:172-180)."""
        if not query.strip():
            return np.zeros((0, self.cfg.embed_dim), dtype=np.float32)
        return self.embed_texts([query], batch_size=1)


def params_from_leaves(cfg: ModelConfig, leaves: Sequence[np.ndarray]) -> Params:
    """Rebuild the params pytree from checkpoint leaves (deterministic
    tree-leaves order for a given ModelConfig). The template is abstract
    (eval_shape) — a materialized random init would pay per-leaf RNG
    compiles at serve startup for arrays that are immediately discarded."""
    template = jax.eval_shape(lambda: init_embedder_params(cfg))
    treedef = jax.tree_util.tree_structure(template)
    shaped = jax.tree_util.tree_leaves(template)
    assert len(shaped) == len(leaves), (
        f"checkpoint has {len(leaves)} leaves, model expects {len(shaped)}"
    )
    cast = [
        jnp.asarray(leaf, dtype=ref.dtype) for leaf, ref in zip(leaves, shaped)
    ]
    return jax.tree_util.tree_unflatten(treedef, cast)


def params_fingerprint(params: Params) -> str:
    """Stable hash of the parameter values: index checkpoints record which
    embedder produced their vectors so a model/index mismatch is detected at
    load instead of silently serving garbage similarities."""
    import hashlib

    h = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(params):
        h.update(np.asarray(leaf, dtype=np.float32).tobytes())
    return h.hexdigest()[:16]
