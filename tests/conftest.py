"""Test environment: force an 8-device CPU mesh regardless of TPU presence.

The reference has no tests at all (SURVEY.md §4); this suite is designed from
its behavior: chunker semantics, normalization epsilon, LFU threshold/eviction,
prompt assembly, recall gates vs the exact-scan oracle, kernel parity, and
sharded-vs-single-device equivalence on a simulated 8-device mesh.

XLA_FLAGS must be extended before the CPU backend is first touched; in this
image a TPU plugin may already own the default backend, so tests pin
``jax_default_device`` to CPU and build meshes from ``jax.devices('cpu')``.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

CPU_DEVICES = jax.devices("cpu")
jax.config.update("jax_default_device", CPU_DEVICES[0])


@pytest.fixture(scope="session")
def cpu_device():
    return CPU_DEVICES[0]


@pytest.fixture(scope="session")
def cpu_mesh():
    from sqe_tpu.parallel import make_mesh

    return make_mesh((8,), ("shard",), devices=CPU_DEVICES)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_model_cfg():
    from sqe_tpu.config import ModelConfig

    return ModelConfig(
        d_model=128,
        n_layers=2,
        n_heads=2,
        d_ff=256,
        max_len=64,
        vocab_size=2048,
        embed_dim=128,
    )


@pytest.fixture(scope="session")
def small_engine_cfg(small_model_cfg):
    from sqe_tpu.config import CacheConfig, EngineConfig, HNSWConfig

    return EngineConfig(
        model=small_model_cfg,
        hnsw=HNSWConfig(M=4, ef_construction=32, ef_search=16),
        cache=CacheConfig(capacity=16, embed_dim=small_model_cfg.embed_dim),
        index_kind="hnsw",
    )


def clustered_vectors(rng, n, d, n_clusters=32, spread=0.25):
    """Synthetic 'embedding-like' vectors: cluster centers + noise, normalized.

    Models the geometry of real text embeddings (BASELINE.json config 2 uses
    synthetic chunks) far better than uniform random vectors, which are the
    known pathological case for graph ANN.
    """
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32)
    assign = rng.integers(0, n_clusters, size=n)
    vecs = centers[assign] + spread * rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True) + 1e-9
    return vecs.astype(np.float32)


@pytest.fixture(scope="session")
def make_clustered():
    return clustered_vectors
