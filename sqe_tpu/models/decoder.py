"""Causal decoder LM for on-TPU answer generation.

The reference delegates generation to external LLM APIs (BlueHive HTTP,
app/main.py:183-242; OpenAI streaming, app/main.py:611-647) and this framework
keeps those backends — but it can also generate ON the serving chip:
a word-level causal transformer with a KV cache, trained on the corpus
(train/lm.py), exposed as ``TPUDecoderBackend`` (serving/generation.py).

TPU-native decode structure:
- **Prefill**: one full-sequence forward over the prompt fills the KV cache
  (MXU-batched, padding-masked).
- **Decode**: one jitted single-token step per emitted token — the KV cache
  is donated and updated in place (no reallocation); sampling (greedy or
  temperature/top-k) happens on device. The host loop only moves one token id
  per step, which is what a streaming API needs anyway.

Weights are a plain pytree (same conventions as models/embedder.py), so the
decoder checkpoints through utils/checkpoint.save_model and shards with the
same tp partition specs if ever scaled up.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class DecoderConfig:
    """Hyperparameters (plain class: hashable static arg for jit)."""

    def __init__(self, vocab_size: int = 32768, d_model: int = 384,
                 n_layers: int = 4, n_heads: int = 6, d_ff: int = 1536,
                 max_len: int = 1024, dtype: str = "bfloat16",
                 param_dtype: str = "float32", seed: int = 0):
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.d_ff = d_ff
        self.max_len = max_len
        self.dtype = dtype
        self.param_dtype = param_dtype
        self.seed = seed

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    def _key(self):
        return (self.vocab_size, self.d_model, self.n_layers, self.n_heads,
                self.d_ff, self.max_len, self.dtype, self.param_dtype,
                self.seed)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, DecoderConfig) and self._key() == other._key()

    def to_dict(self) -> dict:
        return {k: getattr(self, k) for k in
                ("vocab_size", "d_model", "n_layers", "n_heads", "d_ff",
                 "max_len", "dtype", "param_dtype", "seed")}


def head_tail_truncate(toks: list, budget: int) -> list:
    """Fit a prompt into ``budget`` tokens by dropping the MIDDLE.

    The serve prompt is ``User Query -> Context -> End-of-context +
    instruction`` (serving/prompts.py, mirroring app/main.py:529-535), so
    an overlong prompt must keep its head (the query) and its tail (the
    instruction + most-recent context) — a keep-tail truncation silently
    drops the user's question whenever the context overflows. Used by both
    the decode loop and SFT data building so train matches serve."""
    if len(toks) <= budget:
        return list(toks)
    head = budget // 2
    return list(toks[:head]) + list(toks[-(budget - head):])


def init_decoder_params(cfg: DecoderConfig,
                        key: Optional[jax.Array] = None) -> Params:
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    keys = iter(jax.random.split(key, 4 + 8 * cfg.n_layers))
    dm, dff = cfg.d_model, cfg.d_ff
    pdtype = jnp.dtype(cfg.param_dtype)

    def dense(k, fi, fo):
        scale = (2.0 / (fi + fo)) ** 0.5
        return (jax.random.normal(k, (fi, fo)) * scale).astype(pdtype)

    params: Params = {
        "tok_emb": (jax.random.normal(next(keys), (cfg.vocab_size, dm))
                    * 0.02).astype(pdtype),
        "pos_emb": (jax.random.normal(next(keys), (cfg.max_len, dm))
                    * 0.02).astype(pdtype),
        "final_ln": {"scale": jnp.ones((dm,), pdtype),
                     "bias": jnp.zeros((dm,), pdtype)},
        "lm_head": dense(next(keys), dm, cfg.vocab_size),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "ln1": {"scale": jnp.ones((dm,), pdtype),
                    "bias": jnp.zeros((dm,), pdtype)},
            "ln2": {"scale": jnp.ones((dm,), pdtype),
                    "bias": jnp.zeros((dm,), pdtype)},
            "wq": dense(next(keys), dm, dm),
            "wk": dense(next(keys), dm, dm),
            "wv": dense(next(keys), dm, dm),
            "wo": dense(next(keys), dm, dm),
            "w1": dense(next(keys), dm, dff),
            "b1": jnp.zeros((dff,), pdtype),
            "w2": dense(next(keys), dff, dm),
            "b2": jnp.zeros((dm,), pdtype),
        })
    return params


def _ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _split_heads(x, n_heads):
    b, l, dm = x.shape
    return x.reshape(b, l, n_heads, dm // n_heads).transpose(0, 2, 1, 3)


def decoder_forward(
    params: Params,
    ids: jax.Array,      # [B, L] int32
    *,
    cfg: DecoderConfig,
) -> jax.Array:
    """Full-sequence causal forward -> logits [B, L, V] (teacher forcing /
    oracle path; training uses this)."""
    dtype = jnp.dtype(cfg.dtype)
    b, l = ids.shape
    x = params["tok_emb"][ids].astype(dtype) \
        + params["pos_emb"][:l][None].astype(dtype)
    causal = jnp.tril(jnp.ones((l, l), jnp.bool_))
    for layer in params["layers"]:
        h = _ln(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
        q = _split_heads(h @ layer["wq"].astype(dtype), cfg.n_heads)
        k = _split_heads(h @ layer["wk"].astype(dtype), cfg.n_heads)
        v = _split_heads(h @ layer["wv"].astype(dtype), cfg.n_heads)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(cfg.head_dim)
        scores = jnp.where(causal[None, None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, cfg.d_model)
        x = x + o @ layer["wo"].astype(dtype)
        h = _ln(x, layer["ln2"]["scale"], layer["ln2"]["bias"])
        h = jax.nn.gelu(h @ layer["w1"].astype(dtype)
                        + layer["b1"].astype(dtype))
        x = x + h @ layer["w2"].astype(dtype) + layer["b2"].astype(dtype)
    x = _ln(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
    return (x.astype(jnp.float32)
            @ params["lm_head"].astype(jnp.float32))       # [B, L, V] f32


# -------------------------------------------------------------- KV-cache decode


def init_kv_cache(cfg: DecoderConfig, batch: int = 1) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    shape = (cfg.n_layers, batch, cfg.n_heads, cfg.max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def prefill(
    params: Params,
    ids: jax.Array,       # [B, L_prompt] int32 (right-padded with 0)
    cache: Params,        # donated
    length: jax.Array,    # [B] int32: true prompt lengths
    *,
    cfg: DecoderConfig,
) -> Tuple[Params, jax.Array]:
    """Run the prompt through the model, filling the KV cache. Returns
    (cache, last_logits [B, V]) where last_logits correspond to each row's
    final REAL token."""
    dtype = jnp.dtype(cfg.dtype)
    b, l = ids.shape
    x = params["tok_emb"][ids].astype(dtype) \
        + params["pos_emb"][:l][None].astype(dtype)
    pos = jnp.arange(l)
    causal = pos[None, :] <= pos[:, None]                     # [L, L]
    pad_ok = (pos[None, :] < length[:, None])                 # [B, L] keys
    for li, layer in enumerate(params["layers"]):
        h = _ln(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
        q = _split_heads(h @ layer["wq"].astype(dtype), cfg.n_heads)
        k = _split_heads(h @ layer["wk"].astype(dtype), cfg.n_heads)
        v = _split_heads(h @ layer["wv"].astype(dtype), cfg.n_heads)
        cache["k"] = cache["k"].at[li, :, :, :l].set(k)
        cache["v"] = cache["v"].at[li, :, :, :l].set(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(cfg.head_dim)
        mask = causal[None, None] & pad_ok[:, None, None, :]
        scores = jnp.where(mask, scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                       preferred_element_type=jnp.float32).astype(dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, l, cfg.d_model)
        x = x + o @ layer["wo"].astype(dtype)
        h = _ln(x, layer["ln2"]["scale"], layer["ln2"]["bias"])
        h = jax.nn.gelu(h @ layer["w1"].astype(dtype)
                        + layer["b1"].astype(dtype))
        x = x + h @ layer["w2"].astype(dtype) + layer["b2"].astype(dtype)
    x = _ln(x, params["final_ln"]["scale"], params["final_ln"]["bias"])
    last = jnp.take_along_axis(
        x, (length - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]                                                   # [B, dm]
    logits = last.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32)
    return cache, logits


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def decode_step(
    params: Params,
    token: jax.Array,     # [B] int32: the token just chosen
    cache: Params,        # donated
    pos: jax.Array,       # [B] int32: position of `token` in the sequence
    *,
    cfg: DecoderConfig,
) -> Tuple[Params, jax.Array]:
    """One autoregressive step: append `token` at `pos`, return logits for
    the next token."""
    return _decode_step_body(params, token, cache, pos, cfg)


def _decode_step_body(params, token, cache, pos, cfg):
    """Traced body shared by decode_step (one dispatch per token) and
    decode_chunk (lax.scan: one dispatch per N tokens)."""
    dtype = jnp.dtype(cfg.dtype)
    b = token.shape[0]
    x = params["tok_emb"][token].astype(dtype) \
        + params["pos_emb"][pos].astype(dtype)                # [B, dm]
    key_pos = jnp.arange(cfg.max_len)
    for li, layer in enumerate(params["layers"]):
        h = _ln(x[:, None], layer["ln1"]["scale"], layer["ln1"]["bias"])[:, 0]
        q = (h @ layer["wq"].astype(dtype)).reshape(b, cfg.n_heads, cfg.head_dim)
        k = (h @ layer["wk"].astype(dtype)).reshape(b, cfg.n_heads, cfg.head_dim)
        v = (h @ layer["wv"].astype(dtype)).reshape(b, cfg.n_heads, cfg.head_dim)
        cache["k"] = cache["k"].at[li, jnp.arange(b), :, pos].set(k)
        cache["v"] = cache["v"].at[li, jnp.arange(b), :, pos].set(v)
        scores = jnp.einsum("bhd,bhkd->bhk", q, cache["k"][li],
                            preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(cfg.head_dim)
        valid = key_pos[None, :] <= pos[:, None]              # [B, max_len]
        scores = jnp.where(valid[:, None, :], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        o = jnp.einsum("bhk,bhkd->bhd", attn, cache["v"][li],
                       preferred_element_type=jnp.float32).astype(dtype)
        x = x + o.reshape(b, cfg.d_model) @ layer["wo"].astype(dtype)
        h = _ln(x[:, None], layer["ln2"]["scale"], layer["ln2"]["bias"])[:, 0]
        h = jax.nn.gelu(h @ layer["w1"].astype(dtype)
                        + layer["b1"].astype(dtype))
        x = x + h @ layer["w2"].astype(dtype) + layer["b2"].astype(dtype)
    x = _ln(x[:, None], params["final_ln"]["scale"],
            params["final_ln"]["bias"])[:, 0]
    logits = x.astype(jnp.float32) @ params["lm_head"].astype(jnp.float32)
    return cache, logits


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_token(logits: jax.Array, key: jax.Array, temperature: float,
                 top_k: int = 40) -> jax.Array:
    """Greedy when temperature <= 0 (traced-safe via where), else top-k
    temperature sampling. logits [B, V] -> [B] int32."""
    return _sample_body(logits, key, temperature, top_k)


def _sample_body(logits, key, temperature, top_k):
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    vals, idxs = jax.lax.top_k(logits, top_k)
    scaled = vals / jnp.maximum(temperature, 1e-6)
    choice = jax.random.categorical(key, scaled, axis=-1)
    sampled = jnp.take_along_axis(idxs, choice[:, None], axis=1)[:, 0]
    return jnp.where(temperature > 0, sampled.astype(jnp.int32), greedy)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_tokens", "top_k", "pad_id"),
    donate_argnums=(1,),
)
def decode_chunk(
    params: Params,
    cache: Params,        # donated
    logits: jax.Array,    # [B, V] logits for the NEXT token
    pos: jax.Array,       # [B] int32: where the next token is written
    key: jax.Array,       # PRNG key (same chain as the per-token loop)
    temperature: jax.Array,
    *,
    cfg: DecoderConfig,
    n_tokens: int,
    top_k: int = 40,
    pad_id: int = 0,
) -> Tuple[Params, jax.Array, jax.Array, jax.Array, jax.Array]:
    """``n_tokens`` autoregressive steps in ONE device program.

    The per-token decode loop costs one device round-trip per word — ~29 ms
    each through the dev tunnel (utils/dispatch.py), so a 96-token answer
    paid ~96 dispatches. Scanning N steps on-device cuts that to
    ``ceil(96/N)`` at the cost of streaming in N-word bursts, and wastes at
    most one chunk of compute past EOS (sampling PAD freezes the carry:
    position stops advancing and PAD fills the remaining slots, exactly
    what the host loop would have emitted — key-split chain included, so
    chunked output is bit-identical to the step-by-step loop for the same
    seed; gated in tests/test_decoder.py).

    Returns (cache, logits, pos, key, tokens [B, n_tokens]).
    """
    def step(carry, _):
        cache, logits, pos, key, done = carry
        key, sub = jax.random.split(key)
        tok = _sample_body(logits, sub, temperature, top_k)
        done = done | (tok == pad_id) | (pos >= cfg.max_len)
        tok = jnp.where(done, jnp.int32(pad_id), tok)
        # Frozen rows still compute (uniform control flow) but write their
        # PAD k/v at the frozen position — a slot past their last real
        # token that is never attended to by kept tokens.
        write_pos = jnp.minimum(pos, cfg.max_len - 1)
        cache, new_logits = _decode_step_body(params, tok, cache, write_pos, cfg)
        logits = jnp.where(done[:, None], logits, new_logits)
        pos = jnp.where(done, pos, pos + 1)
        return (cache, logits, pos, key, done), tok

    b = logits.shape[0]
    done0 = jnp.zeros((b,), jnp.bool_)
    (cache, logits, pos, key, _), toks = jax.lax.scan(
        step, (cache, logits, pos, key, done0), None, length=n_tokens
    )
    return cache, logits, pos, key, toks.T  # [B, n_tokens]


def decoder_params_from_leaves(cfg: DecoderConfig, leaves) -> Params:
    """Rebuild the decoder pytree from checkpoint leaves (deterministic
    tree-leaves order for a given DecoderConfig).

    The template is built ABSTRACTLY (eval_shape): materializing a random
    init would dispatch dozens of per-leaf RNG programs whose fresh shapes
    each pay the remote compile service (minutes of serve startup through
    the dev tunnel) only to be thrown away."""
    template = jax.eval_shape(lambda: init_decoder_params(cfg))
    treedef = jax.tree_util.tree_structure(template)
    shaped = jax.tree_util.tree_leaves(template)
    assert len(shaped) == len(leaves), (len(shaped), len(leaves))
    cast = [jnp.asarray(leaf, dtype=ref.dtype)
            for leaf, ref in zip(leaves, shaped)]
    return jax.tree_util.tree_unflatten(treedef, cast)
