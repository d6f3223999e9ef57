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
  is reached, then inserts (app/main.py:121-128). Frequencies live HOST-side
  (every bump is observed on the host anyway for journaling), so the evict
  slot is a host argmin and the insert dispatch never syncs — a cache miss
  costs one fire-and-forget device program after generation (DESIGN §9c).
- Responses (strings) stay host-side, slot-indexed. All mutation goes through
  a single writer (the engine), eliminating the reference's cache races.

Batched probe supports the B=1024 query-stream path (BASELINE.json config 3).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sqe_tpu.config import CacheConfig
from sqe_tpu.ops.distance import l2_normalize
from sqe_tpu.utils import dispatch


@jax.jit
def _probe(
    queries: jax.Array,    # [B, D] raw (normalized in-program)
    keys: jax.Array,       # [C, D]
    valid: jax.Array,      # [C] bool
    threshold: jax.Array,  # scalar f32
) -> Tuple[jax.Array, jax.Array]:
    """Returns (hit [B] bool, slot [B] int32). Normalization happens inside
    the program so a GET is exactly one device dispatch (utils/dispatch.py)."""
    sims = jax.lax.dot_general(
        l2_normalize(queries.astype(jnp.float32)), keys.astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )                                                   # [B, C]
    sims = jnp.where(valid[None, :], sims, -jnp.inf)
    slot = jnp.argmax(sims, axis=1).astype(jnp.int32)
    hit = jnp.max(sims, axis=1) >= threshold
    return hit, slot


# Nothing is donated: the fused pipeline (serving/pipeline.py) captures
# keys/valid via device_arrays() and dispatches WITHOUT the lock from the
# batcher thread; donating them in a concurrent put() would delete the
# captured buffers mid-flight ("Array has been deleted" on TPU, where
# donation actually aliases). LFU frequencies live HOST-side (the journaled
# bump stream keeps an exact mirror), so eviction needs no device argmin and
# put() is one fire-and-forget dispatch — no device sync on the answer path.
@jax.jit
def _insert(
    keys: jax.Array,      # [C, D]
    valid: jax.Array,     # [C]
    new_key: jax.Array,   # [D] raw (normalized in-program)
    slot: jax.Array,      # scalar int32 (host-computed: fill or LFU evict)
) -> Tuple[jax.Array, jax.Array]:
    """Write one entry at ``slot``. Returns (keys, valid). Normalizes the key
    in-program so a PUT is one fire-and-forget dispatch, not a normalize
    chain + insert."""
    keys = keys.at[slot].set(l2_normalize(new_key).astype(keys.dtype))
    valid = valid.at[slot].set(True)
    return keys, valid


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
        # LFU frequencies are a HOST array: the device only ever needs them
        # for eviction argmin, and keeping them here (exact, thanks to the
        # journaled bump stream) lets put() pick the evict slot without a
        # ~29 ms device round-trip on the answer path (DESIGN §9c).
        self._freqs = np.zeros((c,), np.int32)
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
        q = jnp.asarray(query_embs, dtype=jnp.float32)
        if self.device is not None:
            q = jax.device_put(q, self.device)
        with self._lock:
            if self._size == 0:
                self.misses += q.shape[0]
                return [None] * q.shape[0]
            hit, slot = _probe(q, self._keys, self._valid, self._threshold)
            dispatch.program("cache_probe")
            hit_np = np.asarray(hit)
            slot_np = np.asarray(slot)
            dispatch.sync("cache_probe")
            out: List[Optional[str]] = []
            bumped: dict = {}
            for h, s in zip(hit_np, slot_np):
                if bool(h):
                    bumped[int(s)] = bumped.get(int(s), 0) + 1
                if bool(h) and self._responses[int(s)] is not None:
                    out.append(self._responses[int(s)])
                    self.hits += 1
                else:
                    out.append(None)
                    self.misses += 1
            for s, nb in bumped.items():
                self._freqs[s] += nb
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
        qn = jnp.asarray(q)
        if self.device is not None:
            qn = jax.device_put(qn, self.device)
        with self._lock:
            # Host-side slot choice (fill, else LFU evict over live slots —
            # slots fill sequentially so valid == arange < size). Matches the
            # old device argmin bit-for-bit and, crucially, needs no device
            # sync: the _insert dispatch below is fire-and-forget, so a miss
            # costs ONE device program on the critical path.
            cap = self.cfg.capacity
            if self._size < cap:
                slot = self._size
            else:
                slot = int(np.argmin(self._freqs[:self._size]))
            self._keys, self._valid = _insert(
                self._keys, self._valid, qn, jnp.int32(slot)
            )
            dispatch.program("cache_insert")
            self._freqs[slot] = 1
            self._responses[slot] = response
            self._size = min(self._size + 1, cap)

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
                self._freqs += bump
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
            for s, n in bumps.items():
                if 0 <= int(s) < self.cfg.capacity:
                    self._freqs[int(s)] += int(n)

    def snapshot(self) -> dict:
        """Host-side state for checkpointing."""
        with self._lock:
            return {
                "keys": np.asarray(self._keys),
                # _freqs is a HOST array mutated in place by bumps;
                # np.asarray would alias it and a hit landing between
                # snapshot() and the checkpoint write would bake a bump into
                # the snapshot while its journal record survives (double
                # apply on restore). The device arrays are immutable.
                "freqs": self._freqs.copy(),
                "valid": np.asarray(self._valid),
                "responses": list(self._responses),
                "size": self._size,
            }

    def restore(self, state: dict) -> None:
        put = (lambda x: jax.device_put(x, self.device)) if self.device else jnp.asarray
        with self._lock:
            self._keys = put(jnp.asarray(state["keys"], jnp.float32))
            self._freqs = np.asarray(state["freqs"], np.int32).copy()
            self._valid = put(jnp.asarray(state["valid"], jnp.bool_))
            self._responses = list(state["responses"])
            self._size = int(state["size"])
