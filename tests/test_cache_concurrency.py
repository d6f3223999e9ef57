"""Concurrent cache mutation property test.

The reference's Redis cache raced: LSET by index after a concurrent LRANGE,
and check-then-evict-then-push (app/main.py:69-128, SURVEY.md B5). The device
cache serializes mutation behind a single lock; under concurrent get/put from
many threads the invariants must hold: no exceptions, size never exceeds
capacity, inserted entries are retrievable, counters are consistent.
"""

import threading

import numpy as np

from sqe_tpu.cache import DeviceLFUCache
from sqe_tpu.config import CacheConfig


def test_concurrent_get_put(cpu_device):
    capacity, dim = 32, 16
    cache = DeviceLFUCache(
        CacheConfig(capacity=capacity, embed_dim=dim, sim_threshold=0.96),
        device=cpu_device,
    )
    rng = np.random.default_rng(0)
    keys = rng.standard_normal((64, dim)).astype(np.float32)
    keys /= np.linalg.norm(keys, axis=1, keepdims=True)

    errors = []

    def writer(tid):
        try:
            for i in range(tid, 64, 4):
                cache.put(keys[i], f"resp-{i}")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def reader(tid):
        try:
            for i in range(tid, 64, 4):
                cache.get(keys[i])
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    threads += [threading.Thread(target=reader, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    assert len(cache) <= capacity
    # Probes after the storm are consistent: any hit returns the response
    # stored for that key (keys are near-orthogonal at dim 16 with margin,
    # so a >= 0.96 match can only be the key itself).
    hits = 0
    for i in range(64):
        got = cache.get(keys[i])
        if got is not None:
            assert got == f"resp-{i}"
            hits += 1
    assert hits > 0
    assert cache.hits + cache.misses > 0
