"""Device profiling helpers.

The reference had no tracing at all (print-only, SURVEY.md §5). The engine's
per-stage latency histograms live in utils/metrics.py; this module adds XLA
device traces via ``jax.profiler`` for kernel-level analysis::

    with device_trace("/tmp/sqe-trace"):
        engine.index.search_ids(queries, k=10)
    # -> TensorBoard-compatible trace under /tmp/sqe-trace

and lightweight annotation of pipeline stages that shows up inside the trace
timeline (``with stage_annotation("beam_search"): ...``).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator


@contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextmanager
def stage_annotation(name: str) -> Iterator[None]:
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
