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
    """Hyperparameters (plain class: hashable static arg for jit).

    ``pos_enc="rope"`` rotates q/k by position (rotary embedding) instead of
    adding a learned absolute-position table. The round-4 diagnosis of the
    failing citation contract (ckpt_trained/lm/lm_eval.json, cites 0.047)
    found the SFT'd model never learned to COPY from its context —
    teacher-forced content-token probability ~0.0 while the citation tail
    scored p=0.93 — and the copy/induction circuit is a *relative*-offset
    attention pattern ("attend one past the previous occurrence") that
    learned absolute positions must assemble position-by-position; RoPE
    gives it directly.

    ``pointer=True`` adds a pointer-generator copy head (See et al. 2017):
    the output distribution is ``p_gen * softmax(lm_head) + (1 - p_gen) *
    copy``, where ``copy`` is an attention distribution over the sequence's
    positions scattered onto the vocab ids sitting at those positions. For
    the serve contract — extract the answer span from retrieved context and
    cite it (app/main.py:519-528) — copying is the *primary* operation, and
    the pointer makes it a one-layer circuit instead of an emergent
    capability a 6-layer word LM never develops. Old checkpoints (no such
    keys in model_cfg) load with both features off.
    """

    def __init__(self, vocab_size: int = 32768, d_model: int = 384,
                 n_layers: int = 4, n_heads: int = 6, d_ff: int = 1536,
                 max_len: int = 1024, dtype: str = "bfloat16",
                 param_dtype: str = "float32", seed: int = 0,
                 pos_enc: str = "learned", pointer: bool = False,
                 copy_mask: str = "none"):
        assert pos_enc in ("learned", "rope")
        # ``copy_mask="context"`` restricts the pointer head's copy
        # attention to CONTEXT-SECTION token positions (section headers +
        # bodies, between the first ``--- Document ID:`` header and
        # ``--- End of context ---``). The round-4 checkpoint's copy
        # distribution crossed into the instruction/header region and
        # answers quoted prompt scaffolding verbatim ("...provide your
        # concise answer now document PMC..."); masking the keys makes
        # that leak structurally impossible while keeping slot markers
        # (which live in section headers) copyable. Recorded in model_cfg
        # so serve/eval decode applies the same mask the checkpoint was
        # trained under; old checkpoints load with "none" (bit-compatible).
        assert copy_mask in ("none", "context")
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.d_ff = d_ff
        self.max_len = max_len
        self.dtype = dtype
        self.param_dtype = param_dtype
        self.seed = seed
        self.pos_enc = pos_enc
        self.pointer = bool(pointer)
        self.copy_mask = copy_mask

    @property
    def head_dim(self) -> int:
        assert self.d_model % self.n_heads == 0
        return self.d_model // self.n_heads

    def _key(self):
        return (self.vocab_size, self.d_model, self.n_layers, self.n_heads,
                self.d_ff, self.max_len, self.dtype, self.param_dtype,
                self.seed, self.pos_enc, self.pointer, self.copy_mask)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, DecoderConfig) and self._key() == other._key()

    def to_dict(self) -> dict:
        return {k: getattr(self, k) for k in
                ("vocab_size", "d_model", "n_layers", "n_heads", "d_ff",
                 "max_len", "dtype", "param_dtype", "seed", "pos_enc",
                 "pointer", "copy_mask")}


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
    keys = iter(jax.random.split(key, 6 + 8 * cfg.n_layers))
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
    if cfg.pointer:
        # Pointer-generator copy head: query projection over final hidden
        # states + a scalar gate. Gate bias starts at 0 (p_gen = 0.5) so
        # neither mixture component is frozen out at init.
        params["ptr_q"] = dense(next(keys), dm, dm)
        params["ptr_gate"] = {"w": dense(next(keys), dm, 1),
                              "b": jnp.zeros((1,), pdtype)}
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


def _rope(x: jax.Array, positions: jax.Array) -> jax.Array:
    """Rotary position embedding over the last axis (head_dim, must be
    even). ``positions`` must broadcast against ``x.shape[:-1]``; rotation
    happens in f32 and the result is cast back to ``x.dtype``. Cached keys
    are rotated at write time, so q·k under RoPE depends only on the
    RELATIVE offset — the property the copy/induction circuit needs."""
    half = x.shape[-1] // 2
    freqs = 1.0 / (10000.0 ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1 = x[..., :half].astype(jnp.float32)
    x2 = x[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).astype(x.dtype)


def _pointer_mix_full(x_final, gen_logits, ids, params, cfg,
                      key_mask=None):  # key_mask doubles as the copy mask
    """Full-vocabulary pointer-generator mixture -> log-probs [B, L, V].

    Materializes a second [B, L, V] plane (the copy distribution), so this
    is the ORACLE/test/decode-prefill path; training uses the
    target-indexed ``forward_target_log_probs`` which never builds it.
    ``key_mask`` [B, L] (True = attendable) masks padding keys on top of
    the causal mask."""
    attn = _pointer_attn(x_final, params, cfg, key_mask)      # [B, Q, K]
    onehot = jax.nn.one_hot(ids, cfg.vocab_size, dtype=jnp.float32)
    copy_p = jnp.einsum("bqk,bkv->bqv", attn, onehot)
    p_gen = _pointer_gate(x_final, params)                    # [B, L, 1]
    gen_p = jax.nn.softmax(gen_logits, axis=-1)
    return jnp.log(p_gen * gen_p + (1.0 - p_gen) * copy_p + 1e-9)


def _pointer_attn(x_final, params, cfg, key_mask=None):
    """Causal pointer attention over final hidden states -> [B, Q, K].

    Masked keys get -1e9 (not -inf) and the post-softmax weights are
    re-zeroed under the mask: a query row whose keys are ALL masked (e.g.
    every position before the first context token under
    ``cfg.copy_mask="context"``) then contributes zero copy mass instead
    of NaN, and the mixture falls back to the generator head. Where at
    least one key survives, exp(-1e9 - max) underflows to exactly 0.0 in
    f32, so the weights are bit-identical to the -inf construction."""
    xf = x_final.astype(jnp.float32)
    pq = xf @ params["ptr_q"].astype(jnp.float32) / np.sqrt(cfg.d_model)
    scores = jnp.einsum("bqd,bkd->bqk", pq, xf)
    l = x_final.shape[1]
    pos = jnp.arange(l)
    mask = pos[None, :] <= pos[:, None]                       # [Q, K] causal
    mask = mask[None]
    if key_mask is not None:
        mask = mask & key_mask[:, None, :]
    attn = jax.nn.softmax(jnp.where(mask, scores, -1e9), axis=-1)
    return attn * mask


def _pointer_gate(x_final, params):
    """p_gen in (0, 1): how much of the next-token distribution comes from
    the generator head vs the copy head. Shape [..., 1]."""
    g = (x_final.astype(jnp.float32)
         @ params["ptr_gate"]["w"].astype(jnp.float32)
         + params["ptr_gate"]["b"].astype(jnp.float32))
    return jax.nn.sigmoid(g)


def _backbone(params, ids, cfg) -> jax.Array:
    """Full-sequence causal transformer -> final hidden states [B, L, dm]
    (post final_ln). Shared by decoder_forward and the training losses."""
    dtype = jnp.dtype(cfg.dtype)
    b, l = ids.shape
    x = params["tok_emb"][ids].astype(dtype)
    if cfg.pos_enc == "learned":
        x = x + params["pos_emb"][:l][None].astype(dtype)
    rope_pos = jnp.arange(l)[None, None]                  # [1, 1, L]
    causal = jnp.tril(jnp.ones((l, l), jnp.bool_))
    for layer in params["layers"]:
        h = _ln(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
        q = _split_heads(h @ layer["wq"].astype(dtype), cfg.n_heads)
        k = _split_heads(h @ layer["wk"].astype(dtype), cfg.n_heads)
        v = _split_heads(h @ layer["wv"].astype(dtype), cfg.n_heads)
        if cfg.pos_enc == "rope":
            q, k = _rope(q, rope_pos), _rope(k, rope_pos)
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
    return _ln(x, params["final_ln"]["scale"], params["final_ln"]["bias"])


def decoder_forward(
    params: Params,
    ids: jax.Array,      # [B, L] int32
    *,
    cfg: DecoderConfig,
    copy_mask: Optional[jax.Array] = None,   # [B, L] bool: copyable keys
) -> jax.Array:
    """Full-sequence causal forward -> [B, L, V] f32 (teacher forcing /
    oracle path). For ``cfg.pointer`` the return is the mixture's
    LOG-PROBABILITIES (normalized, so argmax/top-k/CE semantics are
    unchanged) and a second [B, L, V] plane is materialized — fine for
    tests and oracles; training goes through forward_target_log_probs.
    ``copy_mask`` (cfg.copy_mask="context") marks context-section
    positions the pointer head may copy from."""
    x = _backbone(params, ids, cfg)
    logits = (x.astype(jnp.float32)
              @ params["lm_head"].astype(jnp.float32))     # [B, L, V] f32
    if not cfg.pointer:
        return logits
    return _pointer_mix_full(x, logits, ids, params, cfg,
                             key_mask=copy_mask)


def forward_target_log_probs(
    params: Params,
    ids: jax.Array,        # [B, L+1] int32 (inputs = [:, :-1], targets = [:, 1:])
    *,
    cfg: DecoderConfig,
    copy_mask: Optional[jax.Array] = None,   # [B, L] bool over inputs
) -> jax.Array:
    """log p(target_t | prefix) for every position -> [B, L] f32.

    The training-loss path: for pointer models the copy term is evaluated
    ONLY at the target token — ``sum_j attn[t, j] * [ids[j] == target_t]``
    via a [B, L, L] match mask — so no second [B, L, V] plane exists and
    the SFT batch fits HBM at the same batch size as the plain LM.
    ``copy_mask`` restricts the copy keys (cfg.copy_mask="context")."""
    inputs, targets = ids[:, :-1], ids[:, 1:]
    x = _backbone(params, inputs, cfg)
    logits = (x.astype(jnp.float32)
              @ params["lm_head"].astype(jnp.float32))
    gen_lp = jax.nn.log_softmax(logits, axis=-1)
    gen_lp_t = jnp.take_along_axis(gen_lp, targets[..., None], axis=-1)[..., 0]
    if not cfg.pointer:
        return gen_lp_t
    attn = _pointer_attn(x, params, cfg, key_mask=copy_mask)  # [B, Q, K]
    match = (inputs[:, None, :] == targets[:, :, None])    # [B, Q, K]
    copy_p_t = jnp.sum(attn * match, axis=-1)              # [B, Q]
    p_gen = _pointer_gate(x, params)[..., 0]               # [B, L]
    return jnp.log(p_gen * jnp.exp(gen_lp_t)
                   + (1.0 - p_gen) * copy_p_t + 1e-9)


# -------------------------------------------------------------- KV-cache decode


def init_kv_cache(cfg: DecoderConfig, batch: int = 1) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    shape = (cfg.n_layers, batch, cfg.n_heads, cfg.max_len, cfg.head_dim)
    cache = {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}
    if cfg.pointer:
        # Pointer planes: the final hidden state and token id at every
        # position, so each decode step can attend over (and copy from)
        # the whole sequence so far. ~max_len*dm*2 bytes — negligible
        # beside the KV planes. ``copy_ok`` marks positions the copy head
        # may attend to: prefill fills it from its (optional) copy mask,
        # decode steps mark generated positions per cfg.copy_mask.
        cache["ptr_h"] = jnp.zeros((batch, cfg.max_len, cfg.d_model), dtype)
        cache["ids"] = jnp.zeros((batch, cfg.max_len), jnp.int32)
        cache["copy_ok"] = jnp.zeros((batch, cfg.max_len), jnp.bool_)
    return cache


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(2,))
def prefill(
    params: Params,
    ids: jax.Array,       # [B, L_prompt] int32 (right-padded with 0)
    cache: Params,        # donated
    length: jax.Array,    # [B] int32: true prompt lengths
    *,
    cfg: DecoderConfig,
    copy_ok: Optional[jax.Array] = None,   # [B, L_prompt] bool (pointer only)
) -> Tuple[Params, jax.Array]:
    """Run the prompt through the model, filling the KV cache. Returns
    (cache, last_logits [B, V]) where last_logits correspond to each row's
    final REAL token. For pointer configs last_logits are the mixture's
    log-probs (same argmax/top-k semantics) and the pointer planes
    (ptr_h/ids/copy_ok) are filled alongside k/v; ``copy_ok`` marks which
    prompt positions the copy head may attend to (default: every real
    prompt token — cfg.copy_mask="none" behavior)."""
    dtype = jnp.dtype(cfg.dtype)
    b, l = ids.shape
    x = params["tok_emb"][ids].astype(dtype)
    if cfg.pos_enc == "learned":
        x = x + params["pos_emb"][:l][None].astype(dtype)
    pos = jnp.arange(l)
    causal = pos[None, :] <= pos[:, None]                     # [L, L]
    pad_ok = (pos[None, :] < length[:, None])                 # [B, L] keys
    for li, layer in enumerate(params["layers"]):
        h = _ln(x, layer["ln1"]["scale"], layer["ln1"]["bias"])
        q = _split_heads(h @ layer["wq"].astype(dtype), cfg.n_heads)
        k = _split_heads(h @ layer["wk"].astype(dtype), cfg.n_heads)
        v = _split_heads(h @ layer["wv"].astype(dtype), cfg.n_heads)
        if cfg.pos_enc == "rope":
            q, k = _rope(q, pos[None, None]), _rope(k, pos[None, None])
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
    if cfg.pointer:
        cache["ptr_h"] = cache["ptr_h"].at[:, :l].set(x.astype(dtype))
        cache["ids"] = cache["ids"].at[:, :l].set(ids)
        ok = pad_ok if copy_ok is None else (copy_ok & pad_ok)
        cache["copy_ok"] = cache["copy_ok"].at[:, :l].set(ok)
        logits = _pointer_mix_step(last, logits, cache, length - 1, cfg,
                                   params)
    return cache, logits


def _pointer_mix_step(x_last, gen_logits, cache, pos, cfg, params):
    """Single-step pointer mixture -> log-probs [B, V]. Attends over the
    cached pointer plane at key positions <= ``pos`` (each row's current
    position) that are marked copyable (cache["copy_ok"] — every real
    position for cfg.copy_mask="none", context-section positions only for
    "context") and scatters onto the cached token ids. All-masked rows
    (softmax over a uniform -1e9 plane, re-zeroed under the mask) copy
    nothing and the mixture falls back to the generator head."""
    b = x_last.shape[0]
    xf = x_last.astype(jnp.float32)
    pq = xf @ params["ptr_q"].astype(jnp.float32) / np.sqrt(cfg.d_model)
    keys = cache["ptr_h"].astype(jnp.float32)                 # [B, M, dm]
    scores = jnp.einsum("bd,bkd->bk", pq, keys)
    valid = jnp.arange(cfg.max_len)[None, :] <= pos[:, None]
    valid = valid & cache["copy_ok"]
    attn = jax.nn.softmax(jnp.where(valid, scores, -1e9), axis=-1)
    copy_p = jnp.zeros((b, cfg.vocab_size), jnp.float32).at[
        jnp.arange(b)[:, None], cache["ids"]
    ].add(jnp.where(valid, attn, 0.0))
    p_gen = _pointer_gate(x_last, params)                     # [B, 1]
    gen_p = jax.nn.softmax(gen_logits, axis=-1)
    return jnp.log(p_gen * gen_p + (1.0 - p_gen) * copy_p + 1e-9)


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
    x = params["tok_emb"][token].astype(dtype)                # [B, dm]
    if cfg.pos_enc == "learned":
        x = x + params["pos_emb"][pos].astype(dtype)
    key_pos = jnp.arange(cfg.max_len)
    for li, layer in enumerate(params["layers"]):
        h = _ln(x[:, None], layer["ln1"]["scale"], layer["ln1"]["bias"])[:, 0]
        q = (h @ layer["wq"].astype(dtype)).reshape(b, cfg.n_heads, cfg.head_dim)
        k = (h @ layer["wk"].astype(dtype)).reshape(b, cfg.n_heads, cfg.head_dim)
        v = (h @ layer["wv"].astype(dtype)).reshape(b, cfg.n_heads, cfg.head_dim)
        if cfg.pos_enc == "rope":
            q, k = _rope(q, pos[:, None]), _rope(k, pos[:, None])
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
    if cfg.pointer:
        cache["ptr_h"] = cache["ptr_h"].at[jnp.arange(b), pos].set(
            x.astype(jnp.dtype(cfg.dtype)))
        cache["ids"] = cache["ids"].at[jnp.arange(b), pos].set(token)
        # Generated tokens are copyable under "none" (legacy behavior);
        # under "context" the copy head only ever sees context sections —
        # matching the SFT mask, where answer positions are excluded too.
        cache["copy_ok"] = cache["copy_ok"].at[jnp.arange(b), pos].set(
            cfg.copy_mask == "none")
        logits = _pointer_mix_step(x, logits, cache, pos, cfg, params)
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
    logit_bias: Optional[jax.Array] = None,   # [V] additive, f32
    rep_penalty: Optional[jax.Array] = None,  # scalar f32
    counts: Optional[jax.Array] = None,       # [B, V] f32 emitted-token counts
) -> Tuple[jax.Array, ...]:
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

    Constrained-decode controls (all optional; defaults reproduce the
    unconstrained behavior bit-for-bit):

    - ``logit_bias`` [V]: added to logits before sampling every step — the
      serve path puts -1e9 on citation-marker ids with no mapped slot for
      this prompt so a hallucinated marker can never be sampled
      (serving/citations.py).
    - ``rep_penalty`` + ``counts``: per-step ``rep_penalty * counts[tok]``
      is subtracted before sampling and counts increment with each emitted
      token. Word-level greedy decode degenerates into repetition loops
      without this (round-4 lm_eval samples); the penalty carries ACROSS
      chunk calls because counts are returned updated.

    Returns (cache, logits, pos, key, tokens [B, n_tokens]) — with
    ``counts`` appended when rep_penalty is active. The carried ``logits``
    stay raw (un-penalized); constraints apply at sampling time only.
    """
    track = counts is not None

    def step(carry, _):
        cache, logits, pos, key, done, cnts = carry
        key, sub = jax.random.split(key)
        adj = logits
        if logit_bias is not None:
            adj = adj + logit_bias
        if track:
            adj = adj - rep_penalty * cnts
        tok = _sample_body(adj, sub, temperature, top_k)
        done = done | (tok == pad_id) | (pos >= cfg.max_len)
        tok = jnp.where(done, jnp.int32(pad_id), tok)
        if track:
            live = (~done).astype(jnp.float32)
            cnts = cnts.at[jnp.arange(tok.shape[0]), tok].add(live)
        # Frozen rows still compute (uniform control flow) but write their
        # PAD k/v at the frozen position — a slot past their last real
        # token that is never attended to by kept tokens.
        write_pos = jnp.minimum(pos, cfg.max_len - 1)
        cache, new_logits = _decode_step_body(params, tok, cache, write_pos, cfg)
        logits = jnp.where(done[:, None], logits, new_logits)
        pos = jnp.where(done, pos, pos + 1)
        return (cache, logits, pos, key, done, cnts), tok

    b = logits.shape[0]
    done0 = jnp.zeros((b,), jnp.bool_)
    cnts0 = counts if track else jnp.zeros((b, 1), jnp.float32)
    (cache, logits, pos, key, _, cnts), toks = jax.lax.scan(
        step, (cache, logits, pos, key, done0, cnts0), None, length=n_tokens
    )
    out = (cache, logits, pos, key, toks.T)   # tokens [B, n_tokens]
    return out + ((cnts,) if track else ())


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
