"""Profiling harness (SURVEY.md §6 tracing/profiling).

Reference: none. Here: `jax.profiler.trace` capture wrapped into a context
manager that drops a TensorBoard-profile directory (the profile plugin is
installed), plus a block_until_ready-bracketed timing helper used by bench.py
and the scaling harness.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture an XLA/TPU profile viewable in TensorBoard (profile plugin)."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, n: int = 10, warmup: int = 2, **kw) -> dict[str, float]:
    """block_until_ready-bracketed wall timing: returns mean/min seconds."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return {"mean_s": sum(times) / len(times), "min_s": min(times),
            "n": float(n)}
