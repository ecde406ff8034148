"""Timing, rays/s counters, and profiler hooks.

The reference's only observability is a UI fps label (ui/mod.rs:72-83,153);
here: structured per-pass timing via block_until_ready, Mrays/s counters,
and optional jax.profiler traces (SURVEY.md §5 "Tracing / profiling").
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


class Timer:
    """dt + total elapsed (reference src/timer.rs:20-33)."""

    def __init__(self):
        self.start = time.perf_counter()
        self.last = self.start

    def update(self) -> float:
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        return dt

    def total(self) -> float:
        return time.perf_counter() - self.start


def time_fn(fn: Callable, *args, warmup: int = 1, iters: int = 5, **kw) -> Dict:
    """Wall-time a jitted function with proper device sync.

    Returns {mean_s, min_s, runs}.  The first `warmup` calls (compile) are
    excluded.
    """
    for _ in range(warmup):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    runs = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        runs.append(time.perf_counter() - t0)
    return {"mean_s": sum(runs) / len(runs), "min_s": min(runs), "runs": runs}


def mrays_per_sec(num_rays: int, seconds: float) -> float:
    return num_rays / seconds / 1e6


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace context (view with XProf/TensorBoard)."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
