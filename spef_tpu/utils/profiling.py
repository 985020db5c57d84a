"""Profiling / tracing helpers.

The reference only has ad-hoc wall-clock timing (SURVEY.md §5: per-predict
latency ms, TVM time_evaluator, a GUI decorator).  TPU-native equivalents:

  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable device trace (XLA op timeline, HBM usage);
  * :func:`benchmark_fn` — block_until_ready-timed throughput/latency
    statistics (p50/p95/mean) for any jitted callable;
  * :func:`measure_execution_time` — drop-in decorator counterpart of
    `gui.py:31-39`.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable, Dict, Sequence

import jax
import numpy as np

__all__ = ["trace", "benchmark_fn", "measure_execution_time"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(
    fn: Callable,
    *args,
    warmup: int = 3,
    iters: int = 20,
    items_per_call: int = 1,
) -> Dict[str, float]:
    """Latency/throughput statistics for a device callable."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    return {
        "mean_ms": float(times.mean() * 1e3),
        "p50_ms": float(np.percentile(times, 50) * 1e3),
        "p95_ms": float(np.percentile(times, 95) * 1e3),
        "min_ms": float(times.min() * 1e3),
        "items_per_sec": float(items_per_call / times.mean()),
    }


def measure_execution_time(func: Callable) -> Callable:
    """Decorator printing wall time per call (reference `gui.py:31-39`)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        result = func(*args, **kwargs)
        print(f"{func.__name__}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
        return result

    return wrapper
