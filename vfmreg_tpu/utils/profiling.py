"""Structured timing + profiler integration.

The reference instruments with ad-hoc `std::chrono` / `time()` prints
(SURVEY.md §5). Here: a hierarchical wall-clock `Timer` registry for per-stage
telemetry and a `trace` context that wraps `jax.profiler` for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import numpy as np


class Timer:
    """Accumulating named spans: `with timer.span("icp"): ...`; `timer.report()`."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            total, n = self.totals[name], self.counts[name]
            lines.append(f"{name:<32} {total:8.3f}s  x{n:<5} avg {1e3 * total / n:8.2f}ms")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


GLOBAL_TIMER = Timer()


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Device trace via jax.profiler (view with TensorBoard / xprof)."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in device traces (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def summarize_durations(durations_s) -> Dict[str, float]:
    d = np.asarray(list(durations_s))
    if d.size == 0:
        return {}
    return {
        "mean_ms": float(d.mean() * 1e3),
        "p50_ms": float(np.percentile(d, 50) * 1e3),
        "p95_ms": float(np.percentile(d, 95) * 1e3),
        "max_ms": float(d.max() * 1e3),
        "fps": float(1.0 / d.mean()),
    }
