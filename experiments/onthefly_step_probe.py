"""Onthefly (pool-free) step cost probe on the real chip (r05, VERDICT task 3).

Measures, with the perf_probe difference-timing scheme:
  - the fused sample+train scan step per structure (1p, 3i with hard
    alternation) — r04 baseline: 3i 524 µs/step;
  - the SAMPLING-ONLY cost (vmapped sample_structure_batch, stop-graded
    scan consuming the batches) to attribute the delta over the pool step;
  - the pool-pipeline 3i step on the same graph for the same dispatch
    shape (the "sampling is free" reference point).

Run: python experiments/onthefly_step_probe.py [--scale 40]
"""

from __future__ import annotations

import argparse
import json
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

    state = run(state, n_base)       # warmup + compile (n program)
    state = run(state, 11 * n_base)  # warmup + compile (11n program)
    t0 = time.perf_counter(); state = run(state, n_base)
    t1 = time.perf_counter(); state = run(state, 11 * n_base)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (10 * n_base)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=float, default=40.0)
    p.add_argument("--n_base", type=int, default=200)
    args = p.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        make_scan_train_step,
    )
    from graphqembed_tpu.training.device_sampler import (
        DeviceGraph,
        make_onthefly_train_step,
        sample_structure_batch,
    )

    graph = synthetic_graph(seed=0, scale=args.scale, avg_degree=10.0)
    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=0.01)
    dg = DeviceGraph.build(graph, sample_size=16, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    optimizer = optax.adam(cfg.lr)
    print(f"graph: {graph.schema.n_nodes} nodes, {graph.num_edges()} edges "
          f"(flat list {dg.edges.shape[0]})", flush=True)

    results = {}

    # fused sample+train, per structure
    step = make_onthefly_train_step(cfg, optimizer, dg)
    for structure, hard in (("1p", False), ("3i", True)):
        p0 = jax.tree.map(lambda x: x.copy(), params)
        state = (p0, optimizer.init(p0), jax.random.key(1))

        def fn(state, n, structure=structure, hard=hard):
            p_, o_, k_ = state
            k_ = jax.random.fold_in(k_, n)
            p_, o_, _ = step(p_, o_, structure, k_, n, 1.0, hard)
            return (p_, o_, k_)

        us = timed_scan(fn, state, n_base=args.n_base) * 1e6
        results[f"onthefly_{structure}_step_us"] = round(us, 1)
        print(f"onthefly {structure} (hard={hard}): {us:.1f} us/step",
              flush=True)

    # sampling only: vmapped sample_structure_batch, checksum-consumed
    import functools

    for structure in ("1p", "3i"):
        @functools.partial(jax.jit, static_argnames=("n",))
        def sample_only(key, n, structure=structure):
            ks = jax.vmap(lambda t: jax.random.fold_in(key, t))(
                jnp.arange(n))
            batches = jax.vmap(lambda k: sample_structure_batch(
                dg, k, cfg.batch_size, structure))(ks)
            return sum(jnp.sum(x) for x in jax.tree.leaves(batches))

        key0 = jax.random.key(2)

        def fn(state, n, structure=structure):
            # state is the previous checksum (ignored); key varies with n
            return sample_only(jax.random.fold_in(key0, n), n)

        us = timed_scan(fn, jnp.zeros(()), n_base=args.n_base) * 1e6
        results[f"sample_only_{structure}_us_per_step"] = round(us, 1)
        print(f"sample-only {structure}: {us:.1f} us/step "
              f"({us / cfg.batch_size * 1e3:.1f} ns/query)", flush=True)

    # pool-pipeline 3i reference on the same graph
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=30)
    data = DeviceTrainData(graph.schema, s.sample_many("3i", 1500))
    scan = make_scan_train_step(cfg, optimizer)
    p0 = jax.tree.map(lambda x: x.copy(), params)
    state = (p0, optimizer.init(p0), jax.random.key(3))

    def fn_pool(state, n):
        p_, o_, k_ = state
        k_ = jax.random.fold_in(k_, n)
        p_, o_, _ = scan(p_, o_, data.pools["3i"], "3i", k_, n, 1.0, True)
        return (p_, o_, k_)

    us = timed_scan(fn_pool, state, n_base=args.n_base) * 1e6
    results["pool_3i_step_us"] = round(us, 1)
    print(f"pool 3i (hard): {us:.1f} us/step", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
