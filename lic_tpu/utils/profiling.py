"""Tracing / profiling.

The reference's entire observability is two ``time.time()`` spans
(``eval_net.py:93-100``; SURVEY §5.1).  Here: ``jax.profiler`` trace
annotations for device timelines plus a simple wall-clock span registry.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

_SPANS: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def span(name: str) -> Iterator[None]:
    """Wall-clock span + device trace annotation."""
    with jax.profiler.TraceAnnotation(name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            _SPANS[name].append(time.perf_counter() - t0)


def span_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for name, times in _SPANS.items():
        out[name] = {
            "count": len(times),
            "total_s": sum(times),
            "mean_s": sum(times) / len(times),
        }
    return out


def reset_spans() -> None:
    _SPANS.clear()


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
