import numpy as np

from sqe_tpu.models import Embedder


def test_embed_shapes_and_norms(small_model_cfg, cpu_device):
    emb = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    out = emb.embed_texts(["hello world", "medical text about hearts"], batch_size=2)
    assert out.shape == (2, small_model_cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


def test_embed_deterministic(small_model_cfg, cpu_device):
    e1 = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    e2 = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    a = e1.embed_texts(["same text"], batch_size=1)
    b = e2.embed_texts(["same text"], batch_size=1)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_batch_padding_invariance(small_model_cfg, cpu_device):
    """A text's embedding must not depend on batch padding (static-shape
    batching pads the final batch with empty strings)."""
    emb = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    alone = emb.embed_texts(["the liver filters blood"], batch_size=4)
    batched = emb.embed_texts(
        ["the liver filters blood", "a", "b", "c", "d"], batch_size=4
    )
    np.testing.assert_allclose(alone[0], batched[0], atol=1e-5)


def test_embed_query_contract(small_model_cfg, cpu_device):
    emb = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    q = emb.embed_query("what is hypertension")
    assert q.shape == (1, small_model_cfg.embed_dim)
    # Empty query -> empty array (reference app/main.py:176-177).
    assert emb.embed_query("   ").shape == (0, small_model_cfg.embed_dim)


def test_length_bucket_invariance(small_model_cfg, cpu_device):
    """Embeddings are identical whichever length bucket a text runs in
    (masked attention + masked mean pooling => padding-invariant)."""
    emb = Embedder(small_model_cfg, attn_impl="xla", device=cpu_device)
    text = "short question about kidneys"
    # Force the long program by batching with a long text, then alone (short).
    long_text = " ".join(f"w{i}" for i in range(60))
    together = emb.embed_texts([text, long_text], batch_size=2)
    alone = emb.embed_texts([text], batch_size=1)
    np.testing.assert_allclose(alone[0], together[0], atol=2e-5)


def test_attn_impl_auto_resolves_by_length(small_model_cfg, cpu_device):
    """attn_impl='auto' resolves per length bucket at trace time: short
    sequences use XLA fused attention, long ones the flash kernel. On CPU
    both resolve to runnable impls and match the explicit-xla forward."""
    import jax.numpy as jnp
    import numpy as np

    from sqe_tpu.models.embedder import embed_forward, init_embedder_params

    cfg = small_model_cfg
    params = init_embedder_params(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, cfg.max_len)),
                      jnp.int32)
    mask = jnp.ones((2, cfg.max_len), jnp.int32)
    # 'auto' on a short bucket -> xla: identical outputs.
    auto = embed_forward(params, ids, mask, cfg=cfg, attn_impl="auto")
    xla = embed_forward(params, ids, mask, cfg=cfg, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(xla), atol=1e-6)
