"""Contrastive training: loss decreases, and the dp×tp-sharded step runs on
the simulated 8-device mesh and matches the single-device step."""

import jax
import numpy as np
import pytest

from sqe_tpu.config import ModelConfig
from sqe_tpu.data.tokenizer import HashingTokenizer
from sqe_tpu.parallel import make_mesh
from sqe_tpu.train import make_sharded_train_step, make_train_state, train_step

CFG = ModelConfig(
    d_model=64, n_layers=1, n_heads=2, d_ff=128, max_len=16,
    vocab_size=512, embed_dim=64,
)


def _batch(rng, b=8):
    tok = HashingTokenizer(CFG.vocab_size, CFG.max_len)
    pairs = [
        (f"question about topic {i}", f"passage describing topic {i} in detail")
        for i in rng.integers(0, 50, size=b)
    ]
    q_ids, q_mask = tok.encode_batch([q for q, _ in pairs])
    p_ids, p_mask = tok.encode_batch([p for _, p in pairs])
    return {"q_ids": q_ids, "q_mask": q_mask, "p_ids": p_ids, "p_mask": p_mask}


def test_loss_decreases(cpu_device):
    rng = __import__("numpy").random.default_rng(321)
    import functools

    state, tx = make_train_state(CFG, lr=3e-3)
    step = jax.jit(
        functools.partial(train_step, cfg=CFG, tx=tx),
        static_argnames=(),
    )
    batch = _batch(rng)
    losses = []
    for _ in range(10):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9
    assert int(state.step) == 10


def test_sharded_step_matches_single_device(cpu_mesh):
    rng = __import__("numpy").random.default_rng(123)
    mesh = make_mesh((4, 2), ("dp", "tp"), devices=cpu_mesh.devices.flatten())
    state, tx = make_train_state(CFG, lr=1e-3)
    step_fn, shard_state, batch_sharding = make_sharded_train_step(mesh, CFG, tx)
    batch = _batch(rng, b=8)

    # Single-device reference step.
    ref_state, ref_loss = jax.jit(
        lambda s, b: train_step(s, b, cfg=CFG, tx=tx)
    )(state, batch)

    sharded = shard_state(state)
    batch_dev = {
        k: jax.device_put(v, batch_sharding) for k, v in batch.items()
    }
    new_state, loss = step_fn(sharded, batch_dev)
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=5e-3)
    # Parameters after one step agree (dp/tp decomposition is semantics-free).
    ref_w = np.asarray(ref_state.params["layers"][0]["w1"])
    new_w = np.asarray(new_state.params["layers"][0]["w1"])
    np.testing.assert_allclose(new_w, ref_w, atol=5e-3)
    # tp axis actually shards the weight.
    sh = new_state.params["layers"][0]["w1"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, "tp")
