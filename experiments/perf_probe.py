"""Perf attribution probe for the device-resident train step (real chip).

Ablates the scan mega-step and compares per-row bilinear projection
implementations, so kernel work is aimed at the actual bottleneck instead of
a guessed one. Uses the same difference-timing scheme as bench.py (the chip
sits behind a tunnel with ~1.7 s RTT on value reads).

Run: python experiments/perf_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax


def timed_scan(fn, state, n_base=200):
    """Difference timing: time n and 11n scan iterations, return s/iter."""
    def run(state, n):
        out = fn(state, n)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        float(jnp.sum(jax.tree.leaves(out)[0].reshape(-1)[:1]))
        return out

    state = run(state, n_base)  # warmup + compile
    t0 = time.perf_counter(); state = run(state, n_base)
    t1 = time.perf_counter(); state = run(state, 11 * n_base)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (10 * n_base)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData, make_scan_train_step)

    graph = synthetic_graph(seed=0, scale=40.0, avg_degree=10.0)
    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=0.01)
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=30)
    queries = s.sample_many("2p", 1500) + s.sample_many("3i", 1500)
    data = DeviceTrainData(graph.schema, queries)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    key = jax.random.key(0)
    d = cfg.embed_dim
    B = cfg.batch_size
    R = graph.schema.n_relations
    print(f"nodes={graph.schema.n_nodes} rels={R} d={d} B={B}")

    # ---- 1. full step per structure (current path, dense adam) ----
    optimizer = optax.adam(cfg.lr)
    for struct in ("2p", "3i"):
        scan = make_scan_train_step(cfg, optimizer)
        p = init_params(cfg, graph.schema, jax.random.key(0))
        st = (p, optimizer.init(p))

        def full(state, n, _struct=struct, _scan=scan):
            p, o = state
            p, o, _ = _scan(p, o, data.pools[_struct], _struct, key, n, 1.0,
                            _struct == "3i")
            return (p, o)

        t = timed_scan(full, st)
        print(f"full step [{struct}]: {t*1e6:.1f} us/step "
              f"({B/t/1e3:.0f}k q/s)")

    # ---- 2. fwd+bwd only (no optimizer, no param update) ----
    pool = data.pools["3i"]

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def grad_only(p, n_steps):
        def body(carry, t):
            k = jax.random.fold_in(key, t)
            idx = jax.random.randint(k, (B,), 0, pool.n)
            neg = pool.negs[idx][:, 0]

            def loss_fn(pp):
                return gqe.margin_loss_rows(
                    cfg, pp, "3i", pool.anchors[idx], pool.rels[idx],
                    pool.inter_modes[idx], pool.targets[idx], neg,
                    jnp.ones(B, jnp.bool_))

            loss, g = jax.value_and_grad(loss_fn)(carry)
            carry = jax.tree.map(lambda a, b: a + 0.0 * b, carry, g)
            return carry, loss

        p, _ = jax.lax.scan(body, p, jnp.arange(n_steps))
        return p

    t = timed_scan(lambda p, n: grad_only(p, n), params)
    print(f"fwd+bwd only [3i]: {t*1e6:.1f} us/step")

    # ---- 3. fwd only ----
    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def fwd_only(p, n_steps):
        def body(carry, t):
            k = jax.random.fold_in(key, t)
            idx = jax.random.randint(k, (B,), 0, pool.n)
            neg = pool.negs[idx][:, 0]
            loss = gqe.margin_loss_rows(
                cfg, p, "3i", pool.anchors[idx], pool.rels[idx],
                pool.inter_modes[idx], pool.targets[idx], neg,
                jnp.ones(B, jnp.bool_))
            return carry + 0.0 * loss, loss

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_steps))
        return acc

    t = timed_scan(lambda a, n: fwd_only(params, n), jnp.float32(0))
    print(f"fwd only  [3i]: {t*1e6:.1f} us/step")

    # ---- 4. adam update alone on the param tree ----
    opt_state = optimizer.init(params)

    @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
    def adam_only(state, n_steps):
        p, o = state
        g = jax.tree.map(jnp.ones_like, p)

        def body(carry, t):
            p, o = carry
            up, o = optimizer.update(g, o, p)
            p = optax.apply_updates(p, up)
            return (p, o), 0.0

        (p, o), _ = jax.lax.scan(body, (p, o), jnp.arange(n_steps))
        return (p, o)

    t = timed_scan(adam_only, (params, opt_state))
    print(f"dense adam alone: {t*1e6:.1f} us/step")

    # ---- 5. projection variants: y[b] = x[b] @ W[rel[b]], fwd+bwd ----
    # params was donated by adam_only; make a fresh copy of the weights
    W = init_params(cfg, graph.schema, jax.random.key(0))["proj"]["W"]  # [R, d, d]
    x0 = jnp.asarray(np.random.default_rng(1).normal(size=(B, d)), jnp.float32)
    rel = jnp.asarray(np.random.default_rng(2).integers(0, R, B), jnp.int32)

    def variant(name, proj_fn, prec):
        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run(x, n_steps):
            def body(carry, t):
                def loss_fn(W):
                    y = proj_fn(carry, rel, W, prec)
                    return jnp.sum(y * y)

                l, g = jax.value_and_grad(loss_fn)(W)
                return carry + 0.0 * l, l

            x, _ = jax.lax.scan(body, x, jnp.arange(n_steps))
            return x

        t = timed_scan(lambda x, n: run(x, n), x0, n_base=500)
        print(f"proj {name}: {t*1e6:.1f} us/call(fwd+bwd)")

    def per_row_gather(x, rel, W, prec):
        return jnp.einsum("bd,bde->be", x, W[rel],
                          preferred_element_type=jnp.float32, precision=prec)

    def matmul_select(x, rel, W, prec):
        r, dd, ee = W.shape
        t = jnp.dot(x, W.transpose(1, 0, 2).reshape(dd, r * ee),
                    preferred_element_type=jnp.float32, precision=prec)
        t = t.reshape(x.shape[0], r, ee)
        return jnp.take_along_axis(t, rel[:, None, None], axis=1)[:, 0]

    def ragged(x, rel, W, prec):
        order = jnp.argsort(rel)
        xs = x[order]
        sizes = jnp.bincount(rel, length=W.shape[0])
        y = jax.lax.ragged_dot(xs, W, sizes,
                               preferred_element_type=jnp.float32,
                               precision=prec)
        inv = jnp.argsort(order)
        return y[inv]

    HI = jax.lax.Precision.HIGHEST
    DF = jax.lax.Precision.DEFAULT
    variant("gather f32-HI", per_row_gather, HI)
    variant("gather bf16-DF", per_row_gather, DF)
    variant("mm+sel f32-HI", matmul_select, HI)
    variant("mm+sel bf16-DF", matmul_select, DF)
    try:
        variant("ragged f32-HI", ragged, HI)
        variant("ragged bf16-DF", ragged, DF)
    except Exception as e:  # ragged_dot availability / lowering
        print("ragged_dot failed:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
