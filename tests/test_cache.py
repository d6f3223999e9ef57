"""Semantic cache semantics: threshold, LFU eviction, frequency bump —
mirrors reference behavior (app/main.py:53-128) without its races (B5)."""

import numpy as np

from sqe_tpu.cache import DeviceLFUCache
from sqe_tpu.config import CacheConfig


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def _cfg(capacity=4, dim=8, tau=0.96):
    return CacheConfig(capacity=capacity, embed_dim=dim, sim_threshold=tau)


def test_exact_hit_and_threshold(cpu_device):
    cache = DeviceLFUCache(_cfg(), device=cpu_device)
    e1 = _unit([1, 0, 0, 0, 0, 0, 0, 0])
    cache.put(e1, "answer one")
    assert cache.get(e1) == "answer one"
    # orthogonal query -> miss
    e2 = _unit([0, 1, 0, 0, 0, 0, 0, 0])
    assert cache.get(e2) is None
    # similar-but-below-threshold -> miss (cos = 0.9486 < 0.96)
    e3 = _unit([3, 1, 0, 0, 0, 0, 0, 0])
    assert float(e3 @ e1) < 0.96
    assert cache.get(e3) is None
    # above threshold -> hit (cos = 0.995)
    e4 = _unit([10, 1, 0, 0, 0, 0, 0, 0])
    assert float(e4 @ e1) >= 0.96
    assert cache.get(e4) == "answer one"


def test_lfu_eviction_order(cpu_device):
    cache = DeviceLFUCache(_cfg(capacity=3), device=cpu_device)
    basis = np.eye(8, dtype=np.float32)
    cache.put(basis[0], "a")
    cache.put(basis[1], "b")
    cache.put(basis[2], "c")
    # bump 'a' twice and 'c' once; 'b' stays at freq 1
    assert cache.get(basis[0]) == "a"
    assert cache.get(basis[0]) == "a"
    assert cache.get(basis[2]) == "c"
    cache.put(basis[3], "d")  # evicts least-frequent: 'b'
    assert cache.get(basis[1]) is None
    assert cache.get(basis[0]) == "a"
    assert cache.get(basis[2]) == "c"
    assert cache.get(basis[3]) == "d"
    assert len(cache) == 3


def test_batched_probe(cpu_device):
    cache = DeviceLFUCache(_cfg(capacity=8), device=cpu_device)
    basis = np.eye(8, dtype=np.float32)
    cache.put(basis[0], "zero")
    cache.put(basis[1], "one")
    out = cache.get_batch(np.stack([basis[0], basis[5], basis[1]]))
    assert out == ["zero", None, "one"]
    assert cache.hits == 2 and cache.misses == 1


def test_empty_cache_and_empty_query(cpu_device):
    cache = DeviceLFUCache(_cfg(), device=cpu_device)
    assert cache.get(np.zeros((0,), np.float32)) is None
    assert cache.get(_unit(np.ones(8))) is None


def test_snapshot_restore(cpu_device):
    cache = DeviceLFUCache(_cfg(), device=cpu_device)
    basis = np.eye(8, dtype=np.float32)
    cache.put(basis[0], "persisted")
    cache.get(basis[0])
    snap = cache.snapshot()
    cache2 = DeviceLFUCache(_cfg(), device=cpu_device)
    cache2.restore(snap)
    assert cache2.get(basis[0]) == "persisted"
    assert len(cache2) == 1
