"""Training driver: adapt the embedder to a corpus, self-supervised.

Single-device (or dp x tp sharded) loop over span-pair batches; returns the
trained params ready to drop into an ``Embedder`` and rebuild the index.
"""

from __future__ import annotations

import functools
import time
from typing import List, Optional, Sequence

import jax

from sqe_tpu.config import ModelConfig
from sqe_tpu.data.corpus import Chunk
from sqe_tpu.data.tokenizer import HashingTokenizer
from sqe_tpu.train.contrastive import make_train_state, train_step
from sqe_tpu.train.data import pair_batches
from sqe_tpu.utils.logging import get_logger

log = get_logger("train.fit")


def _drain_losses(device_losses) -> List[float]:
    """Materialize per-step device loss scalars in chunks: one stacked D2H
    transfer per chunk instead of one ~29 ms tunnel round-trip per scalar
    (12k steps would otherwise spend minutes draining 4-byte copies)."""
    import jax.numpy as jnp
    import numpy as np

    out: List[float] = []
    for i in range(0, len(device_losses), 512):
        chunk = device_losses[i:i + 512]
        out.extend(np.asarray(jnp.stack(chunk)).tolist())
    return out


def fit_embedder(
    chunks: Sequence[Chunk],
    cfg: Optional[ModelConfig] = None,
    *,
    steps: int = 200,
    batch_size: int = 64,
    pair_max_len: int = 128,
    lr: float = 3e-4,
    attn_impl: str = "xla",
    seed: int = 0,
    log_every: int = 50,
    tokenizer=None,
    style: str = "asym",
    q_max_len: int = 32,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 2000,
    q_dropout: float = 0.0,
    q_shuffle: float = 0.0,
    init_params=None,
    hard_neighbors=None,
    hard_group: int = 16,
    hard_frac: float = 0.5,
):
    """Train on in-chunk span pairs; returns (params, losses).

    ``tokenizer`` defaults to the hashing tokenizer; pass a corpus-trained
    ``VocabTokenizer`` so frequent words own private embedding rows.
    ``style="asym"`` (default) trains short-query -> full-chunk pairs,
    matching the serving distribution (DESIGN.md §10).

    ``ckpt_dir`` enables periodic param checkpoints every ``ckpt_every``
    steps: multi-hour fits on the tunneled dev chip have died to device
    stalls with nothing saved (DESIGN.md §10, round-2 1024-way run) — a
    periodic save bounds the loss to ``ckpt_every`` steps. ``q_dropout``
    randomly drops query-span tokens during batch assembly (see
    train/data.py). ``hard_neighbors`` ([len(chunks), k] mined indices,
    train/mine.py) groups each example with its most confusable corpus
    chunks so the in-batch negative pool stays hard (see pair_batches)."""
    cfg = cfg or ModelConfig()
    tokenizer = tokenizer or HashingTokenizer(cfg.vocab_size, cfg.max_len)
    state, tx = make_train_state(cfg, lr=lr, key=jax.random.PRNGKey(seed),
                                 schedule_steps=steps,
                                 init_params=init_params)
    # Rematerialize layer activations for big negative pools: batch 512 at
    # L=512 is the no-remat HBM ceiling on a 16 GB chip (b=1024 measured
    # 30 GB); remat trades ~1 forward of MXU FLOPs for O(1)-layer activation
    # memory.
    remat = batch_size > 512
    step_fn = jax.jit(
        functools.partial(train_step, cfg=cfg, tx=tx, attn_impl=attn_impl,
                          remat=remat),
        donate_argnums=(0,),
    )
    device_losses: List[jax.Array] = []
    t0 = time.perf_counter()
    batches = pair_batches(
        chunks, tokenizer, batch_size=batch_size, max_len=pair_max_len,
        seed=seed, epochs=max(1, steps), style=style, q_max_len=q_max_len,
        q_dropout=q_dropout, q_shuffle=q_shuffle,
        hard_neighbors=hard_neighbors, hard_group=hard_group,
        hard_frac=hard_frac,
    )
    for i, batch in enumerate(batches):
        if i >= steps:
            break
        state, loss = step_fn(state, batch)
        # Keep the loss as a device handle: a float() here would sync every
        # step (the tunnel's ~29 ms dispatch floor) and serialize host-side
        # tokenization of the NEXT batch against device compute. Syncing only
        # at log points lets the host pipeline batches ahead of the chip
        # (~2x wall-clock on the 1-core dev VM, measured in DESIGN.md §10).
        device_losses.append(loss)
        if (i + 1) % log_every == 0 or i == 0:
            log.info("step %d/%d loss %.4f (%.1fs)", i + 1, steps,
                     float(device_losses[-1]), time.perf_counter() - t0)
        if ckpt_dir and (i + 1) % ckpt_every == 0 and (i + 1) < steps:
            _periodic_save(ckpt_dir, state.params, cfg, tokenizer, i + 1)
    losses = _drain_losses(device_losses)
    return state.params, losses


def _periodic_save(ckpt_dir: str, params, cfg: ModelConfig, tokenizer,
                   step: int) -> None:
    """Persist a deployable mid-run checkpoint (params + config + tokenizer).
    One D2H of the ~36M-param tree (~4-5 s through the tunnel) every
    ``ckpt_every`` steps — cheap insurance against device stalls."""
    import dataclasses

    from sqe_tpu.data.tokenizer import tokenizer_to_dict
    from sqe_tpu.utils import checkpoint as ckpt

    t0 = time.perf_counter()
    ckpt.save_model(ckpt_dir, params, dataclasses.asdict(cfg),
                    tokenizer_state=tokenizer_to_dict(tokenizer))
    log.info("periodic checkpoint at step %d -> %s (%.1fs)",
             step, ckpt_dir, time.perf_counter() - t0)
