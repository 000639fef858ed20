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


def fenced_theil_sen(run, windows=(300, 1200, 2400), reps: int = 2,
                     max_widen: int = 3, rel_spread_max: float = 0.35,
                     warmup: int = 60) -> tuple[float, dict]:
    """Per-step seconds of `run(n_steps) -> device array`, measured as the
    Theil–Sen (median of pairwise) SLOPE of fenced wall time vs window size.

    The instrument of record on this deployment (docs/DESIGN.md §7): the TPU
    sits behind a tunnel where block_until_ready can return early on fresh
    executables and any host value read costs a ~1.7 s round trip, and a
    single dispatch occasionally stalls for MINUTES. Each window is fenced
    by a value read; the slope's intercept absorbs RTT/dispatch constants
    and the median rejects isolated spikes.

    Round-3 lesson (DESIGN §11 addendum 2): one probe arm returned a
    NEGATIVE slope — a tunnel spike poisoned a small window set — and the
    old harness reported it anyway. Guard: if the median slope is
    non-positive, or the pairwise slopes' IQR exceeds rel_spread_max of the
    median, the window set is DOUBLED and the measurement redone, up to
    max_widen times; a probe that never stabilizes raises instead of
    reporting garbage. Returns (slope_seconds, info) where info records
    every attempt.
    """
    import numpy as np

    out = run(warmup)  # warmup / compile
    jax.block_until_ready(out)
    _fence_read(out)

    attempts = []
    warmed: set = set()
    for attempt in range(max_widen + 1):
        # every distinct window size is its own jit specialization
        # (static n_steps): compile each BEFORE timing, or the first rep
        # times XLA compilation instead of the step
        for n in windows:
            if n not in warmed:
                out = run(n)
                jax.block_until_ready(out)
                _fence_read(out)
                warmed.add(n)
        pts = []
        for _ in range(reps):
            for n in windows:
                t0 = time.perf_counter()
                out = run(n)
                jax.block_until_ready(out)
                _fence_read(out)
                pts.append((n, time.perf_counter() - t0))
        slopes = np.array([(tj - ti) / (nj - ni)
                           for i, (ni, ti) in enumerate(pts)
                           for nj, tj in pts[i + 1:] if nj != ni])
        med = float(np.median(slopes))
        q1, q3 = np.percentile(slopes, [25, 75])
        spread = float((q3 - q1) / med) if med > 0 else float("inf")
        attempts.append({"windows": list(windows), "slope_s": med,
                         "iqr_over_median": spread})
        if med > 0 and spread <= rel_spread_max:
            return med, {"attempts": attempts, "widened": attempt}
        windows = tuple(2 * w for w in windows)
    raise RuntimeError(
        f"fenced_theil_sen: no stable positive slope after {max_widen + 1} "
        f"window sets (tunnel interference?): {attempts}")


def _fence_read(out):
    """Force a host value read — the only reliable completion fence through
    the tunnel (block_until_ready alone has returned early on fresh
    executables here)."""
    import numpy as np

    if hasattr(out, "reshape"):
        return float(np.asarray(out).reshape(-1)[0])
    return float(out)


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
