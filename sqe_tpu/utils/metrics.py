"""Counters and per-stage latency histograms.

Replaces the reference's nonexistent observability (print-only, SURVEY.md §5)
with: monotonic counters (QPS, cache hit rate) and fixed-bucket latency
histograms per pipeline stage (embed / cache / search / generate / total) with
p50/p95/p99 estimates.

Low-count stages report EXACT percentiles: a bucket upper bound is honest at
scale but misleading for a stage observed a handful of times (a single 17 s
corpus embed reported "p50 30.0 s" — the 30 s bucket's bound; VERDICT r02).
Each histogram keeps the first 128 raw samples and interpolates exact
quantiles from them until the sample set is no longer complete.
"""

from __future__ import annotations

import bisect
import threading
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Iterator, List

# Log-spaced bucket upper bounds in seconds (50us .. 100s).
_BUCKETS: List[float] = [
    5e-5, 1e-4, 2.5e-4, 5e-4, 1e-3, 2.5e-3, 5e-3, 1e-2, 2.5e-2, 5e-2,
    0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 100.0,
]


class Histogram:
    # While total <= EXACT_SAMPLES the raw-sample set is complete and
    # quantiles are exact; past it the log-spaced buckets take over.
    EXACT_SAMPLES = 128

    def __init__(self) -> None:
        self.counts = [0] * (len(_BUCKETS) + 1)
        self.total = 0
        self.sum = 0.0
        self._samples: List[float] = []

    def observe(self, seconds: float) -> None:
        idx = bisect.bisect_left(_BUCKETS, seconds)
        self.counts[idx] += 1
        self.total += 1
        self.sum += seconds
        if len(self._samples) < self.EXACT_SAMPLES:
            self._samples.append(seconds)

    def quantile(self, q: float) -> float:
        if self.total == 0:
            return 0.0
        if self.total <= len(self._samples):
            # Exact: linear interpolation between order statistics.
            s = sorted(self._samples)
            pos = q * (len(s) - 1)
            lo = int(pos)
            hi = min(lo + 1, len(s) - 1)
            return s[lo] + (s[hi] - s[lo]) * (pos - lo)
        target = q * self.total
        run = 0
        for i, c in enumerate(self.counts):
            run += c
            if run >= target:
                return _BUCKETS[i] if i < len(_BUCKETS) else _BUCKETS[-1]
        return _BUCKETS[-1]

    @property
    def mean(self) -> float:
        return self.sum / self.total if self.total else 0.0


class Metrics:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: Dict[str, int] = defaultdict(int)
        self.histograms: Dict[str, Histogram] = defaultdict(Histogram)

    def inc(self, name: str, value: int = 1) -> None:
        with self._lock:
            self.counters[name] += value

    def observe(self, stage: str, seconds: float) -> None:
        with self._lock:
            self.histograms[stage].observe(seconds)

    @contextmanager
    def time_stage(self, stage: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.observe(stage, time.perf_counter() - t0)

    def summary(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "stages": {
                    name: {
                        "count": h.total,
                        "mean_s": round(h.mean, 6),
                        "p50_s": h.quantile(0.5),
                        "p95_s": h.quantile(0.95),
                        "p99_s": h.quantile(0.99),
                    }
                    for name, h in self.histograms.items()
                },
            }


class StageTimer:
    """Lightweight timer for one request's stage breakdown."""

    def __init__(self, metrics: Metrics):
        self.metrics = metrics
        self.stages: Dict[str, float] = {}

    @contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = dt
            self.metrics.observe(name, dt)
