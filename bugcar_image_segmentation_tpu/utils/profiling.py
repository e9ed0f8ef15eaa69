"""Observability: per-stage latency/FPS metering and profiler hooks.

The reference's only instrumentation was ad-hoc prints and a commented
``@profile`` decorator (reference models.py:41, SURVEY.md §5); proving the
≥60 FPS north star needs real numbers.  :class:`StageTimer` collects
per-stage wall-clock percentiles; :class:`FPSMeter` tracks sustained
throughput over a sliding window; :func:`trace` wraps ``jax.profiler``
for XLA-level traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator, Optional

import numpy as np


class StageTimer:
    """Wall-clock percentile tracker for named pipeline stages."""

    def __init__(self, window: int = 512):
        self._samples: Dict[str, collections.deque] = \
            collections.defaultdict(lambda: collections.deque(maxlen=window))

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, samples in self._samples.items():
            arr = np.asarray(samples)
            if arr.size == 0:
                continue
            out[name] = {
                "n": int(arr.size),
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": float(np.percentile(arr, 50) * 1e3),
                "p95_ms": float(np.percentile(arr, 95) * 1e3),
                "p99_ms": float(np.percentile(arr, 99) * 1e3),
            }
        return out


class FPSMeter:
    """Sustained-throughput meter over a sliding frame window."""

    def __init__(self, window: int = 120):
        self._stamps: collections.deque = collections.deque(maxlen=window)

    def tick(self) -> None:
        self._stamps.append(time.perf_counter())

    @property
    def fps(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        span = self._stamps[-1] - self._stamps[0]
        return (len(self._stamps) - 1) / span if span > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """XLA-level profiler trace (open with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


__all__ = ["StageTimer", "FPSMeter", "trace"]
