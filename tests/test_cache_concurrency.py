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


def test_captured_device_arrays_survive_puts(cpu_device):
    """Fused-pipeline contract: arrays handed out by device_arrays() must stay
    dispatchable after concurrent put()s. put()'s _insert must therefore never
    donate keys/valid (donation would delete the captured buffers on TPU —
    'Array has been deleted' at the batcher's dispatch). CPU ignores donation,
    so this test pins the contract (donate_argnums) directly plus exercises
    the capture-then-dispatch ordering.
    """
    import jax.numpy as jnp

    cache = DeviceLFUCache(
        CacheConfig(capacity=8, embed_dim=16, sim_threshold=0.96),
        device=cpu_device,
    )
    rng = np.random.default_rng(1)
    k0 = rng.standard_normal(16).astype(np.float32)
    k0 /= np.linalg.norm(k0)
    cache.put(k0, "resp-0")

    # Capture (the batcher does this without the lock)...
    keys, valid, threshold = cache.device_arrays()
    # ...then mutate from the writer path...
    for i in range(8):
        k = rng.standard_normal(16).astype(np.float32)
        cache.put(k / np.linalg.norm(k), f"late-{i}")
    # ...then dispatch against the captured (now stale) snapshot.
    q = jnp.asarray(k0[None])
    sims = q @ keys.T
    assert np.asarray(sims).shape == (1, 8)  # no 'Array has been deleted'


def test_insert_donation_set():
    """Neither _insert nor _probe may donate anything: the fused pipeline
    captures keys/valid without the lock, and LFU freqs now live host-side
    (no device buffer to donate)."""
    from sqe_tpu.cache import semantic_cache

    assert semantic_cache._insert._jit_info.donate_argnums == ()
    assert semantic_cache._probe._jit_info.donate_argnums == ()


def test_flat_index_add_excluded_by_lock(cpu_device):
    """FlatIndex.add (which donates the live buffer) must block while another
    thread holds idx.lock for capture+dispatch."""
    from sqe_tpu.index.flat import FlatIndex

    idx = FlatIndex(embed_dim=16, block_n=8, device=cpu_device)
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((8, 16)).astype(np.float32)
    idx.add(vecs, [{"doc_id": str(i), "text": ""} for i in range(8)])

    entered = threading.Event()
    finished = threading.Event()

    def adder():
        entered.set()
        idx.add(vecs, [{"doc_id": f"b{i}", "text": ""} for i in range(8)])
        finished.set()

    with idx.lock:
        t = threading.Thread(target=adder)
        t.start()
        entered.wait(5)
        # While we hold the lock (capture+dispatch region), add can't complete.
        assert not finished.wait(0.3)
    t.join(5)
    assert finished.is_set()
    assert len(idx) == 16
