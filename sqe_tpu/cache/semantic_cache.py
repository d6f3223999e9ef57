"""Device-resident LFU semantic query cache.

Replaces the reference's Redis list cache (app/main.py:53-128), which stored
JSON ``{embedding, response, freq}`` entries and did an O(N) Python-side cosine
scan per lookup with racy LRANGE/LSET/LREM updates (SURVEY.md B5). Here:

- Cached query embeddings live in a fixed ``[capacity, D]`` device matrix; a
  probe is one matmul + argmax (the whole GET path of app/main.py:67-98 as a
  single device program).
- A hit requires cosine >= ``sim_threshold`` (0.96, app/main.py:44) and bumps
  the entry's frequency (app/main.py:92-96).
- PUT evicts the least-frequent entry once ``capacity`` (1000, app/main.py:42)
  is reached, then inserts (app/main.py:121-128). Frequencies are a device
  array; eviction picks argmin over valid slots.
- Responses (strings) stay host-side, slot-indexed. All mutation goes through
  a single writer (the engine), eliminating the reference's cache races.

Batched probe supports the B=1024 query-stream path (BASELINE.json config 3).
"""

from __future__ import annotations

import functools
import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.config import CacheConfig
from sqe_tpu.ops.distance import l2_normalize


@functools.partial(jax.jit, donate_argnums=(2,))
def _probe_and_bump(
    queries: jax.Array,    # [B, D] normalized
    keys: jax.Array,       # [C, D]
    freqs: jax.Array,      # [C] int32 (donated)
    valid: jax.Array,      # [C] bool
    threshold: jax.Array,  # scalar f32
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (hit [B] bool, slot [B] int32, updated freqs [C])."""
    sims = jax.lax.dot_general(
        queries.astype(jnp.float32), keys.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                   # [B, C]
    sims = jnp.where(valid[None, :], sims, -jnp.inf)
    slot = jnp.argmax(sims, axis=1).astype(jnp.int32)
    best = jnp.max(sims, axis=1)
    hit = best >= threshold
    bump = jax.ops.segment_sum(
        hit.astype(jnp.int32), slot, num_segments=freqs.shape[0]
    )
    return hit, slot, freqs + bump


# Only freqs are donated: every dispatch touching freqs happens under the
# cache lock, so donation is safe. keys/valid must NOT be donated — the fused
# pipeline (serving/pipeline.py) captures them via device_arrays() and
# dispatches WITHOUT the lock from the batcher thread; donating them in a
# concurrent put() would delete the captured buffers mid-flight ("Array has
# been deleted" on TPU, where donation actually aliases).
@functools.partial(jax.jit, donate_argnums=(1,))
def _insert(
    keys: jax.Array,      # [C, D]
    freqs: jax.Array,     # [C] (donated)
    valid: jax.Array,     # [C]
    new_key: jax.Array,   # [D]
    size: jax.Array,      # scalar int32: current number of valid entries
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """LFU insert: fill next free slot, else evict argmin-freq. Returns
    (keys, freqs, valid, slot)."""
    capacity = keys.shape[0]
    evict_slot = jnp.argmin(
        jnp.where(valid, freqs, jnp.iinfo(jnp.int32).max)
    ).astype(jnp.int32)
    slot = jnp.where(size < capacity, size.astype(jnp.int32), evict_slot)
    keys = keys.at[slot].set(new_key.astype(keys.dtype))
    freqs = freqs.at[slot].set(1)
    valid = valid.at[slot].set(True)
    return keys, freqs, valid, slot


class DeviceLFUCache:
    """Semantic query cache with device keys/frequencies and host responses."""

    def __init__(
        self,
        cfg: Optional[CacheConfig] = None,
        device: Optional[jax.Device] = None,
    ):
        self.cfg = cfg or CacheConfig()
        self.device = device
        c, d = self.cfg.capacity, self.cfg.embed_dim
        put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
        self._keys = put(jnp.zeros((c, d), jnp.float32))
        self._freqs = put(jnp.zeros((c,), jnp.int32))
        self._valid = put(jnp.zeros((c,), jnp.bool_))
        self._threshold = put(jnp.float32(self.cfg.sim_threshold))
        self._responses: List[Optional[str]] = [None] * c
        self._size = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0
        # Called under the cache lock with {slot: count} after every probe
        # that bumped LFU frequencies; the engine wires this to the cache
        # journal so a restart replays the exact eviction order. Writes to
        # the OS page cache — fast enough for the locked section.
        self.on_bump = None

    def __len__(self) -> int:
        return self._size

    def get_batch(self, query_embs: np.ndarray | jax.Array) -> List[Optional[str]]:
        """Batched probe: one matmul for B queries. Hit iff cos >= threshold."""
        q = l2_normalize(jnp.asarray(query_embs, dtype=jnp.float32))
        if self.device is not None:
            q = jax.device_put(q, self.device)
        with self._lock:
            if self._size == 0:
                self.misses += q.shape[0]
                return [None] * q.shape[0]
            hit, slot, new_freqs = _probe_and_bump(
                q, self._keys, self._freqs, self._valid, self._threshold
            )
            self._freqs = new_freqs
            hit_np = np.asarray(hit)
            slot_np = np.asarray(slot)
            out: List[Optional[str]] = []
            bumped: dict = {}
            for h, s in zip(hit_np, slot_np):
                if bool(h):
                    # The device program bumped this slot's frequency
                    # (regardless of response presence) — journal exactly
                    # what the device applied.
                    bumped[int(s)] = bumped.get(int(s), 0) + 1
                if bool(h) and self._responses[int(s)] is not None:
                    out.append(self._responses[int(s)])
                    self.hits += 1
                else:
                    out.append(None)
                    self.misses += 1
            if bumped and self.on_bump is not None:
                self.on_bump(bumped)
            return out

    def get(self, query_emb: np.ndarray) -> Optional[str]:
        """Single-query probe (reference lfu_cache_get contract, app/main.py:67)."""
        q = np.asarray(query_emb, dtype=np.float32)
        if q.size == 0:
            return None
        if q.ndim == 1:
            q = q[None]
        return self.get_batch(q)[0]

    def put(self, query_emb: np.ndarray, response: str) -> None:
        """Insert (reference lfu_cache_put contract, app/main.py:121-128)."""
        q = np.asarray(query_emb, dtype=np.float32)
        if q.ndim == 2:
            q = q[0]
        qn = l2_normalize(jnp.asarray(q))
        if self.device is not None:
            qn = jax.device_put(qn, self.device)
        with self._lock:
            self._keys, self._freqs, self._valid, slot = _insert(
                self._keys, self._freqs, self._valid, qn, jnp.int32(self._size)
            )
            self._responses[int(np.asarray(slot))] = response
            self._size = min(self._size + 1, self.cfg.capacity)

    # ---- fused-pipeline support (serving/pipeline.py) -----------------------

    def device_arrays(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """(keys, valid, threshold) for an externally-jitted probe."""
        return self._keys, self._valid, self._threshold

    def resolve_external_probe(
        self, hit: np.ndarray, slot: np.ndarray
    ) -> List[Optional[str]]:
        """Resolve a probe computed inside a fused device program: bump LFU
        frequencies for the hits and return the cached responses."""
        with self._lock:
            out: List[Optional[str]] = []
            bump = np.zeros(self.cfg.capacity, dtype=np.int32)
            for h, s in zip(hit, slot):
                s = int(s)
                if bool(h) and 0 <= s < self.cfg.capacity and \
                        self._responses[s] is not None:
                    out.append(self._responses[s])
                    bump[s] += 1
                    self.hits += 1
                else:
                    out.append(None)
                    self.misses += 1
            if bump.any():
                self._freqs = self._freqs + jnp.asarray(bump)
                if self.on_bump is not None:
                    self.on_bump({int(s): int(n) for s, n in
                                  enumerate(bump) if n})
            return out

    def apply_bumps(self, bumps: dict) -> None:
        """Re-apply journaled LFU bumps ({slot: count}) during replay.
        Does NOT invoke on_bump (replay must not re-journal)."""
        if not bumps:
            return
        with self._lock:
            add = np.zeros(self.cfg.capacity, dtype=np.int32)
            for s, n in bumps.items():
                if 0 <= int(s) < self.cfg.capacity:
                    add[int(s)] = int(n)
            self._freqs = self._freqs + jnp.asarray(add)

    def snapshot(self) -> dict:
        """Host-side state for checkpointing."""
        with self._lock:
            return {
                "keys": np.asarray(self._keys),
                "freqs": np.asarray(self._freqs),
                "valid": np.asarray(self._valid),
                "responses": list(self._responses),
                "size": self._size,
            }

    def restore(self, state: dict) -> None:
        put = (lambda x: jax.device_put(x, self.device)) if self.device else jnp.asarray
        with self._lock:
            self._keys = put(jnp.asarray(state["keys"], jnp.float32))
            self._freqs = put(jnp.asarray(state["freqs"], jnp.int32))
            self._valid = put(jnp.asarray(state["valid"], jnp.bool_))
            self._responses = list(state["responses"])
            self._size = int(state["size"])
