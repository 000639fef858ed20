"""Micro-bench: SR fused-Adam kernel vs non-SR kernel vs optax chain, per
leaf size and dtype, on the real chip. Identifies whether the bf16 SR path
is PRNG-bound, pallas-overhead-bound, or bandwidth-bound."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def slope(run, windows=(200, 800, 1600), reps=2):
    # spike-guarded shared harness (training/profiling.py): auto-widens
    # windows until the slope is positive with bounded IQR
    from graphqembed_tpu.training.profiling import fenced_theil_sen

    s, _ = fenced_theil_sen(run, windows=windows, reps=reps, warmup=50)
    return s


def main():
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.ops.fused_adam import (
        fused_adam_leaf,
        fused_adam_leaf_sr,
    )

    n_rows, d = 35200, 128

    for name, dtype in (("f32-kernel", jnp.float32),
                        ("bf16-sr-kernel", jnp.bfloat16)):
        p = jnp.ones((n_rows, d), dtype)
        g = jnp.full((n_rows, d), 1e-3, dtype)
        mu = jnp.zeros_like(p)
        nu = jnp.zeros_like(p)

        if dtype == jnp.bfloat16:
            @functools.partial(jax.jit, static_argnames=("n",),
                               donate_argnames=("p", "mu", "nu"))
            def many(p, mu, nu, g, n):
                def body(c, t):
                    p, mu, nu = c
                    p, mu, nu = fused_adam_leaf_sr(
                        p, g, mu, nu, t + 1, t.astype(jnp.int32), 0.0)
                    return (p, mu, nu), None
                c, _ = jax.lax.scan(body, (p, mu, nu), jnp.arange(n))
                return c
        else:
            @functools.partial(jax.jit, static_argnames=("n",),
                               donate_argnames=("p", "mu", "nu"))
            def many(p, mu, nu, g, n):
                def body(c, t):
                    p, mu, nu = c
                    p, mu, nu = fused_adam_leaf(p, g, mu, nu, t + 1, 0.0)
                    return (p, mu, nu), None
                c, _ = jax.lax.scan(body, (p, mu, nu), jnp.arange(n))
                return c

        state = {"c": (p, mu, nu)}

        def run(n, state=state, many=many, g=g):
            state["c"] = many(*state["c"], g, n)
            return state["c"][0][:1, :1]

        us = slope(run) * 1e6
        bpe = 2 if dtype == jnp.bfloat16 else 4
        gb = n_rows * d * bpe * 7 / 1e9  # r p,g,mu,nu + w p,mu,nu
        print(json.dumps({"kernel": name, "us": round(us, 1),
                          "GB/s": round(gb / (us / 1e6), 1)}), flush=True)

    # optax chain fp32 for the same leaf
    p = jnp.ones((n_rows, d), jnp.float32)
    g = jnp.full((n_rows, d), 1e-3, jnp.float32)
    opt = optax.adam(0.0)
    st0 = opt.init(p)

    @functools.partial(jax.jit, static_argnames=("n",),
                       donate_argnames=("p", "st"))
    def many_opt(p, st, n):
        def body(c, t):
            p, st = c
            u, st = opt.update(g, st, p)
            return (optax.apply_updates(p, u), st), None
        c, _ = jax.lax.scan(body, (p, st), jnp.arange(n))
        return c

    state = {"c": (p, st0)}

    def run(n, state=state):
        state["c"] = many_opt(*state["c"], n)
        return state["c"][0][:1, :1]

    us = slope(run) * 1e6
    gb = n_rows * d * 4 * 7 / 1e9
    print(json.dumps({"kernel": "f32-optax-xla", "us": round(us, 1),
                      "GB/s": round(gb / (us / 1e6), 1)}), flush=True)

    # bf16 optax control (what bf16 storage WOULD cost if nearest were OK)
    pb = jnp.ones((n_rows, d), jnp.bfloat16)
    gb16 = jnp.full((n_rows, d), 1e-3, jnp.bfloat16)
    stb = opt.init(pb)

    @functools.partial(jax.jit, static_argnames=("n",),
                       donate_argnames=("p", "st"))
    def many_optb(p, st, n):
        def body(c, t):
            p, st = c
            u, st = opt.update(gb16, st, p)
            return (optax.apply_updates(p, u), st), None
        c, _ = jax.lax.scan(body, (p, st), jnp.arange(n))
        return c

    state = {"c": (pb, stb)}

    def run(n, state=state):
        state["c"] = many_optb(*state["c"], n)
        return state["c"][0][:1, :1]

    us = slope(run) * 1e6
    gb2 = n_rows * d * 2 * 7 / 1e9
    print(json.dumps({"kernel": "bf16-optax-xla-nearest(control)",
                      "us": round(us, 1),
                      "GB/s": round(gb2 / (us / 1e6), 1)}), flush=True)


if __name__ == "__main__":
    main()
