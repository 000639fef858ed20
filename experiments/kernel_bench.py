"""Speed-of-light audit for the Pallas hot-op kernels (BASELINE.json
north_star: "SpMM/SDDMM and embedding-gather kernels are driven to
speed-of-light per chip").

Each kernel is iterated inside a jitted lax.scan (the iteration count is the
only host interaction) and timed with the same Theil-Sen fenced scheme as
bench.py, so the tunnel RTT cancels. Reports achieved HBM GB/s (gather,
SDDMM — both bandwidth-bound: d=128 rows are 512 B) against the v5e peak
(~819 GB/s) and TFLOP/s for the VMEM-resident fused intersection, for BOTH
the Pallas kernel and its pure-XLA reference — so the kernel-vs-XLA decision
in the model code is evidence-based, per kernel, on the real chip.

Run: python experiments/kernel_bench.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

HBM_PEAK_GBS = 819.0  # TPU v5e (v5 lite) HBM bandwidth


def slope_time(run, state, consts, reps=2, target_s=2.5):
    """Seconds per iteration: Theil-Sen slope of fenced wall time vs iters.

    Window sizes are chosen ADAPTIVELY so the largest window is ~target_s of
    device time — with fixed small windows a ~3 us kernel yields millisecond
    windows that drown in the tunnel's multi-second RTT jitter (observed:
    negative slopes)."""
    def timed(n):
        t0 = time.perf_counter()
        out = run(state, consts, jnp.int32(n))
        jax.block_until_ready(jax.tree.leaves(out)[0])
        float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]))
        return time.perf_counter() - t0

    timed(10)   # compile + warm (both window programs share the body)
    t_a, t_b = timed(200), timed(2200)
    est = max((t_b - t_a) / 2000, 1e-8)
    base = int(np.clip(target_s / est / 11, 200, 500_000))
    # spike guard (shared policy with training/profiling.py::
    # fenced_theil_sen): non-positive or high-IQR slopes mean a tunnel
    # spike poisoned the window set — widen and retry, never report them
    for attempt in range(4):
        sizes = (base, 6 * base, 11 * base)
        points = []
        for _ in range(reps):
            for n in sizes:
                points.append((n, timed(n)))
        slopes = np.array([(tj - ti) / (nj - ni)
                           for i, (ni, ti) in enumerate(points)
                           for nj, tj in points[i + 1:] if nj != ni])
        med = float(np.median(slopes))
        q1, q3 = np.percentile(slopes, [25, 75])
        if med > 0 and (q3 - q1) / med <= 0.35:
            return med
        base *= 2
    raise RuntimeError(
        f"slope_time: no stable positive slope after widening "
        f"(last median {med}) — tunnel interference")


def iterate(step):
    """Wrap (state, consts)->state as a jitted n-iteration loop. Two traps:
    big operands (the embedding table) MUST ride in `consts`, not a closure —
    closed-over arrays are embedded as literal constants in the serialized
    program, which overflows the remote-compile tunnel's request-size limit
    (HTTP 413) — and the trip count must be DYNAMIC (fori_loop, not scan
    length): a static count would recompile for every adaptive window size,
    and each remote compile costs tens of seconds through the tunnel."""
    @jax.jit
    def run(state, consts, n):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c, consts), state)
    return run


def bench_gather(n_rows=1_048_576, d=128, b=8192):
    from graphqembed_tpu.ops.kernels import (gather_normalize,
                                             gather_normalize_ref)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n_rows, d)).astype(np.float32))
    ids0 = jnp.asarray(rng.integers(0, n_rows, b).astype(np.int32))
    bytes_per = b * d * 4 * 2  # read B rows + write B rows

    def step_factory(fn):
        def step(state, consts):
            ids, acc = state
            out = fn(consts, ids)
            # chain: new random ids (LCG), data-dependent on out to stop DCE
            ids = (ids * 1664525 + 1013904223
                   + jnp.int32(out[0, 0]) * 0) % n_rows
            return ids, acc + out[0, 0]
        return step

    out = {}
    for name, fn in (("pallas", lambda t, i: gather_normalize(t, i)),
                     ("xla", gather_normalize_ref)):
        s = slope_time(iterate(step_factory(fn)), (ids0, jnp.float32(0)),
                       table)
        out[name] = {"us": round(s * 1e6, 1),
                     "GB/s": round(bytes_per / s / 1e9, 1),
                     "pct_of_peak": round(100 * bytes_per / s / 1e9
                                          / HBM_PEAK_GBS, 1)}
    return {"kernel": "gather_normalize", "B": b, "N": n_rows, "d": d, **out}


def bench_sddmm(n_rows=1_048_576, d=128, b=1024, k=64):
    from graphqembed_tpu.ops.kernels import sddmm_scores, sddmm_scores_ref
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(n_rows, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    cands0 = jnp.asarray(rng.integers(0, n_rows, (b, k)).astype(np.int32))
    bytes_per = b * k * d * 4 + b * k * 4  # read BK rows + write BK scores

    def step_factory(fn):
        def step(state, consts):
            qq, tt = consts
            cands, acc = state
            out = fn(qq, tt, cands)
            cands = (cands * 1664525 + 1013904223
                     + jnp.int32(out[0, 0]) * 0) % n_rows
            return cands, acc + out[0, 0]
        return step

    out = {}
    for name, fn in (("pallas", lambda q, t, c: sddmm_scores(q, t, c)),
                     ("xla", sddmm_scores_ref)):
        s = slope_time(iterate(step_factory(fn)), (cands0, jnp.float32(0)),
                       (q, table))
        out[name] = {"us": round(s * 1e6, 1),
                     "GB/s": round(bytes_per / s / 1e9, 1),
                     "pct_of_peak": round(100 * bytes_per / s / 1e9
                                          / HBM_PEAK_GBS, 1)}
    return {"kernel": "sddmm_scores", "B": b, "K": k, "N": n_rows, "d": d,
            **out}


def bench_intersection(b=4096, d=128, k=3):
    from graphqembed_tpu.ops.kernels import (fused_intersection,
                                             fused_intersection_ref)
    rng = np.random.default_rng(2)
    zs0 = jnp.asarray(rng.normal(size=(k, b, d)).astype(np.float32))
    pre = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) / d ** 0.5)
    post = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) / d ** 0.5)
    flops = 2 * b * d * d * (k + 1)  # k pre-matmuls + 1 post-matmul

    def step_factory(fn):
        def step(state, consts):
            p1, p2 = consts
            zs, acc = state
            out = fn(zs, p1, p2)
            # REAL data dependence (1e-30*out, not 0*out): with an invariant
            # carry XLA hoists the kernel out of the scan and the slope is
            # meaningless (observed negative times)
            return zs + 1e-30 * out[0, 0], acc + out[0, 0]
        return step

    out = {}
    for name, fn in (
            ("pallas", lambda z, p, q: fused_intersection(z, p, q, "min")),
            ("xla", lambda z, p, q: fused_intersection_ref(z, p, q, "min"))):
        s = slope_time(iterate(step_factory(fn)), (zs0, jnp.float32(0)),
                       (pre, post))
        out[name] = {"us": round(s * 1e6, 1),
                     "TFLOP/s": round(flops / s / 1e12, 2)}
    return {"kernel": "fused_intersection", "B": b, "k": k, "d": d, **out}


def bench_adam(n_rows=262_144, d=128):
    """Fused one-pass Adam kernel vs the optax chain, [N, d] leaf.
    Bandwidth bound: read p,g,mu,nu + write p,mu,nu = 7 passes."""
    import optax

    from graphqembed_tpu.ops.fused_adam import fused_adam_leaf

    rng = np.random.default_rng(3)
    p0 = jnp.asarray(rng.normal(size=(n_rows, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n_rows, d)).astype(np.float32))
    bytes_per = 7 * n_rows * d * 4

    def step_fused(state, consts):
        p, mu, nu, count, acc = state
        count = count + 1
        p, mu, nu = fused_adam_leaf(p, consts, mu, nu, count, 0.01)
        return p, mu, nu, count, acc + p[0, 0]

    opt = optax.adam(0.01)

    def step_optax(state, consts):
        p, ostate, acc = state
        up, ostate = opt.update(consts, ostate, p)
        p = optax.apply_updates(p, up)
        return p, ostate, acc + p[0, 0]

    z = jnp.zeros_like(p0)
    s1 = slope_time(iterate(step_fused),
                    (p0, z, z, jnp.int32(0), jnp.float32(0)), g)
    s2 = slope_time(iterate(step_optax), (p0, opt.init(p0), jnp.float32(0)), g)
    mk = lambda s: {"us": round(s * 1e6, 1),
                    "GB/s": round(bytes_per / s / 1e9, 1),
                    "pct_of_peak": round(100 * bytes_per / s / 1e9
                                         / HBM_PEAK_GBS, 1)}
    return {"kernel": "fused_adam", "N": n_rows, "d": d,
            "pallas": mk(s1), "xla": mk(s2)}


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for fn in (bench_gather, bench_sddmm, bench_intersection, bench_adam):
        print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()
