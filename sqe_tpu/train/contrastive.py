"""Contrastive training for the embedding model.

The reference treats its embedding model as a frozen external service (Ollama
``mxbai-embed-large``); this framework owns the embedder, so it can also train
it. The objective is symmetric InfoNCE over (query, passage) pairs with
in-batch negatives — the standard recipe for retrieval embedders (and how
mxbai-class models are trained).

Distribution is mesh-native (pjit/NamedSharding, the SURVEY.md §2 checklist):

- **DP**: the batch is sharded over the ``dp`` axis; the in-batch-negative
  logit matrix needs every passage embedding, so passage embeddings are
  all-gathered over ``dp`` inside the loss — gradients flow through the local
  shard (standard distributed-InfoNCE) and are averaged by pjit's psum.
- **TP**: the big matmuls shard over the ``tp`` axis — attention projections
  column-wise (heads split), MLP w1 column-/w2 row-wise, vocab embedding
  row-sharded; XLA inserts the reduce-scatter/all-reduce collectives.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sqe_tpu.config import ModelConfig
from sqe_tpu.models.embedder import Params, embed_forward, init_embedder_params


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    schedule_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    """AdamW with grad clipping; with ``schedule_steps`` the lr follows
    linear warmup (5%) + cosine decay — measurably better than constant lr
    for the corpus fit (DESIGN.md §10)."""
    if schedule_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(1, schedule_steps // 20),
            decay_steps=schedule_steps, end_value=lr * 0.05,
        )
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def make_train_state(
    cfg: ModelConfig,
    lr: float = 1e-4,
    key: Optional[jax.Array] = None,
    schedule_steps: Optional[int] = None,
    init_params=None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """``init_params`` warm-starts from an existing checkpoint (fine-tune
    recipes: e.g. question-style augmentation on top of a span-trained
    model) instead of a fresh random init."""
    params = init_params if init_params is not None \
        else init_embedder_params(cfg, key)
    tx = make_optimizer(lr, schedule_steps=schedule_steps)
    return TrainState(params, tx.init(params), jnp.int32(0)), tx


def infonce_loss(
    q_emb: jax.Array,    # [B, D] normalized query embeddings (local shard)
    p_emb: jax.Array,    # [B, D] normalized passage embeddings (local shard)
    temperature: float = 0.05,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Symmetric InfoNCE with in-batch negatives.

    With ``axis_name`` set (inside pjit over a dp axis), passages from every
    data shard serve as negatives: p_emb is all-gathered and the positive
    target index is offset by the shard's position.
    """
    b = q_emb.shape[0]
    if axis_name is not None:
        all_p = jax.lax.all_gather(p_emb, axis_name, axis=0, tiled=True)  # [Bg, D]
        shard = jax.lax.axis_index(axis_name)
        targets = shard * b + jnp.arange(b)
    else:
        all_p = p_emb
        targets = jnp.arange(b)
    logits = (q_emb @ all_p.T) / temperature                     # [B, Bg]
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, targets)
    # Symmetric direction: passages classify their queries (local negatives).
    logits_p = (p_emb @ q_emb.T) / temperature
    loss_p = optax.softmax_cross_entropy_with_integer_labels(
        logits_p, jnp.arange(b)
    )
    return (loss_q.mean() + loss_p.mean()) / 2.0


def train_step(
    state: TrainState,
    batch: dict,
    *,
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    attn_impl: str = "xla",
    temperature: float = 0.05,
    axis_name: Optional[str] = None,
    remat: bool = False,
) -> Tuple[TrainState, jax.Array]:
    """One optimizer step on a batch of (query, passage) token ids/masks.
    ``remat`` rematerializes layer activations in the backward pass — the
    memory lever that fits 1024-way in-batch negatives on one chip."""

    def loss_fn(params):
        q_emb = embed_forward(
            params, batch["q_ids"], batch["q_mask"], cfg=cfg,
            attn_impl=attn_impl, remat=remat,
        )
        p_emb = embed_forward(
            params, batch["p_ids"], batch["p_mask"], cfg=cfg,
            attn_impl=attn_impl, remat=remat,
        )
        return infonce_loss(q_emb, p_emb, temperature, axis_name)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss


# --------------------------------------------------------------------- sharding


def param_partition_spec(cfg: ModelConfig) -> Params:
    """NamedSharding specs for tensor-parallel parameters over axis 'tp'.

    Attention QKV projections are column-sharded (heads split across tp),
    the output projection row-sharded; MLP w1 column-/w2 row-sharded; the
    token embedding is row-sharded over the vocab. Norms and biases replicate.
    """
    layer_spec = {
        "ln1": {"scale": P(), "bias": P()},
        "ln2": {"scale": P(), "bias": P()},
        "wq": P(None, "tp"),
        "wk": P(None, "tp"),
        "wv": P(None, "tp"),
        "wo": P("tp", None),
        "w1": P(None, "tp"),
        "b1": P("tp"),
        "w2": P("tp", None),
        "b2": P(),
    }
    return {
        "tok_emb": P("tp", None),
        "pos_emb": P(),
        "out_proj": P(None, "tp"),
        "final_ln": {"scale": P(), "bias": P()},
        "layers": [dict(layer_spec) for _ in range(cfg.n_layers)],
    }


def make_sharded_train_step(
    mesh: Mesh,
    cfg: ModelConfig,
    tx: optax.GradientTransformation,
    attn_impl: str = "xla",
    temperature: float = 0.05,
):
    """jit a dp×tp-sharded train step over ``mesh`` (axes 'dp' and 'tp').

    Returns (step_fn, shard_state, batch_sharding): ``shard_state`` places a
    host TrainState onto the mesh; batches shard over 'dp' on the batch dim.
    The dp collectives (all-gather of passage embeddings for in-batch
    negatives, psum of grads) and tp collectives are inserted by XLA from the
    shardings — no explicit shard_map needed for the model math.
    """
    pspec = param_partition_spec(cfg)
    param_sharding = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        pspec,
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_sharding = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())

    def step(state: TrainState, batch: dict):
        def loss_fn(params):
            q_emb = embed_forward(
                params, batch["q_ids"], batch["q_mask"], cfg=cfg, attn_impl=attn_impl
            )
            p_emb = embed_forward(
                params, batch["p_ids"], batch["p_mask"], cfg=cfg, attn_impl=attn_impl
            )
            return infonce_loss(q_emb, p_emb, temperature, axis_name=None)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def shard_state(state: TrainState) -> TrainState:
        params = jax.device_put(state.params, param_sharding)
        # Recomputing the optimizer state from the sharded params under jit
        # makes mu/nu inherit the parameters' tp sharding automatically.
        opt_state = jax.jit(tx.init)(params)
        return TrainState(params, opt_state, jax.device_put(state.step, repl))

    step_fn = jax.jit(step, donate_argnums=(0,))
    return step_fn, shard_state, batch_sharding
