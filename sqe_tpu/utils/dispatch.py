"""Device-dispatch accounting: how many device round-trips a request costs.

Through the dev tunnel every device interaction has a ~29 ms floor
(CLAUDE.md), so serve latency is dominated by the NUMBER of device
round-trips, not device compute (the fused front half itself runs in
1.4-2.5 ms on-chip — DESIGN §9). The reference paid four *process*
boundaries per request (Ollama HTTP, Redis, OpenSearch HTTP, LLM HTTP —
SURVEY.md §3.2); the equivalent budget here is device dispatches, and this
module makes that budget measurable instead of argued (VERDICT r02 #3).

Two kinds of interaction are counted, at the call sites that cause them:

- ``program(site)``   — one jitted-executable execution (async dispatch).
- ``sync(site)``      — one host-blocking device->host materialization
                        (``np.asarray`` on device values).

Counting happens at OUR dispatch sites (a call to a jitted function is
exactly one executable execution), because JAX's C++ pjit fast path bypasses
any Python-level universal hook. Sites cover every compute-path entry the
serving stack uses; ad-hoc eager ops are kept off the serve path (see
``ops.distance.l2_normalize``, which is jitted for exactly this reason).

``scripts/dispatch_audit.py`` drives one request per scenario and snapshots
the per-site deltas; ``tests/test_dispatch_count.py`` pins the budget.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from typing import Dict

__all__ = ["program", "sync", "snapshot", "reset", "delta"]

_lock = threading.Lock()
_programs: Dict[str, int] = defaultdict(int)
_syncs: Dict[str, int] = defaultdict(int)


def program(site: str, n: int = 1) -> None:
    """Record ``n`` device-program executions attributed to ``site``."""
    with _lock:
        _programs[site] += n


def sync(site: str, n: int = 1) -> None:
    """Record ``n`` host-blocking device->host materializations."""
    with _lock:
        _syncs[site] += n


def snapshot() -> dict:
    with _lock:
        return {
            "programs": dict(_programs),
            "syncs": dict(_syncs),
            "program_total": sum(_programs.values()),
            "sync_total": sum(_syncs.values()),
        }


def reset() -> None:
    with _lock:
        _programs.clear()
        _syncs.clear()


def delta(before: dict, after: dict) -> dict:
    """Per-site difference of two snapshots (for serial request audits)."""
    out = {"programs": {}, "syncs": {}}
    for kind in ("programs", "syncs"):
        keys = set(before[kind]) | set(after[kind])
        for k in sorted(keys):
            d = after[kind].get(k, 0) - before[kind].get(k, 0)
            if d:
                out[kind][k] = d
    out["program_total"] = after["program_total"] - before["program_total"]
    out["sync_total"] = after["sync_total"] - before["sync_total"]
    return out
