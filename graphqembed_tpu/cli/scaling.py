"""Scaling-efficiency harness (BASELINE.json: edges/s at 1 chip / 1 host /
N hosts, >80% efficiency target at 2+ hosts).

Runs the sharded train step (DP batch axis + row-sharded table) on meshes of
1, 2, 4, ... devices over whatever jax.devices() provides — real chips on a
pod slice, or the simulated CPU mesh
(JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8) for
mechanism validation — and reports queries/s, edges/s (traversed + scored,
training/metrics.py accounting) and parallel efficiency vs the 1-device run.
CPU-mesh numbers validate the harness, not the hardware: virtual devices
share host cores, so efficiency there is NOT the ICI number.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(n_devices: int, cfg, graph, queries, n_steps: int = 60,
            warmup: int = 10) -> dict:
    """Throughput of the GSPMD scan mega-step (the production multi-chip
    path: on-device batch selection, whole chunks per dispatch) on an
    n_devices mesh, alternating 2p / 3i chunks."""
    import jax
    import optax

    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.parallel import (
        make_mesh,
        make_sharded_scan_train_step,
        shard_params,
    )
    from graphqembed_tpu.training.device_data import DeviceTrainData
    from graphqembed_tpu.training.metrics import EDGES_PER_QUERY

    mesh = make_mesh(n_devices)
    params = shard_params(
        init_params(cfg, graph.schema, jax.random.key(0)), mesh)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    scan = make_sharded_scan_train_step(cfg, optimizer, mesh)
    data = DeviceTrainData(graph.schema, queries)
    key = jax.random.key(0)
    chunk = max(10, n_steps // 4)

    def run(params, opt_state, n, k0):
        done, i = 0, 0
        while done < n:
            s = ("2p", "3i")[i % 2]
            params, opt_state, _ = scan(
                params, opt_state, data.pools[s], s,
                jax.random.fold_in(key, k0 + i), chunk, 1.0, s == "3i")
            done += chunk
            i += 1
        return params, opt_state, done

    params, opt_state, _ = run(params, opt_state, warmup, 1000)
    jax.block_until_ready(params)
    t0 = time.perf_counter()
    params, opt_state, done = run(params, opt_state, n_steps, 0)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    # `done` (not n_steps): the chunked loop may overshoot the request, and
    # crediting only n_steps would systematically understate throughput.
    qps = done * cfg.batch_size / dt
    epq = np.mean([EDGES_PER_QUERY["2p"], EDGES_PER_QUERY["3i"]])
    return {"devices": n_devices, "queries_per_sec": round(qps, 1),
            "edges_per_sec": round(qps * epq, 1)}


def measure_full_protocol(n_devices: int, cfg, graph, queries, val,
                          total_steps: int, burn_in: int) -> dict:
    """Throughput of the FULL-protocol distributed trainer
    (run_train_device_mega over a mesh: burn-in → weighted multitask →
    in-loop eval → best-params tracking) — the end-to-end number the
    BASELINE scaling target is about, not just raw scan dispatches."""
    import jax

    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.parallel import make_mesh
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        run_train_device_mega,
    )
    from graphqembed_tpu.training.metrics import EDGES_PER_QUERY

    mesh = make_mesh(n_devices) if n_devices > 1 else None
    # compiled programs are keyed on (structure, n_steps/steps_per) and each
    # run_train_device_mega call builds fresh jitted closures — route
    # compiles through the persistent cache AND warm up with the SAME
    # steps_per so the timed run replays cached executables instead of
    # compiling inside the timing window (r05 review fix)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_gqe_scaling_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    data = DeviceTrainData(graph.schema, queries)
    # warmup run compiles every program (burn + multitask + eval)
    run_train_device_mega(cfg, graph.schema, params, data, val_queries=val,
                          total_steps=max(8, total_steps // 10),
                          burn_in_steps=max(4, burn_in // 10), steps_per=10,
                          mesh=mesh)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    t0 = time.perf_counter()
    res = run_train_device_mega(cfg, graph.schema, params, data,
                                val_queries=val, total_steps=total_steps,
                                burn_in_steps=burn_in, steps_per=10,
                                mesh=mesh)
    dt = time.perf_counter() - t0
    qps = res.steps * cfg.batch_size / dt
    epq = np.mean([EDGES_PER_QUERY[s] for s in data.structures])
    return {"devices": n_devices, "mode": "full_protocol",
            "steps": res.steps, "wall_s": round(dt, 2),
            "val_auc": round(res.best_val_auc, 4),
            "queries_per_sec": round(qps, 1),
            "edges_per_sec": round(qps * epq, 1)}


def main(argv=None):
    p = argparse.ArgumentParser("gqe-scaling")
    p.add_argument("--scale", type=float, default=4.0)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--embed_dim", type=int, default=128)
    p.add_argument("--n_queries", type=int, default=800)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--full-protocol", action="store_true", dest="full",
                   help="measure the full distributed trainer (burn-in + "
                        "multitask + eval, run_train_device_mega over the "
                        "mesh) instead of raw scan dispatches")
    args = p.parse_args(argv)

    import jax

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph

    cfg = GQEConfig(embed_dim=args.embed_dim, projection="bilinear",
                    batch_size=args.batch_size,
                    val_every=max(20, args.steps // 2))
    graph = synthetic_graph(seed=0, scale=args.scale, avg_degree=8.0)
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=20)
    queries = (s.sample_many("2p", args.n_queries)
               + s.sample_many("3i", args.n_queries))
    val = None
    if args.full:
        queries += s.sample_many("1p", args.n_queries)  # burn-in needs edges
        sv = QuerySampler(graph, np.random.default_rng(1), max_negs=20)
        val = sv.sample_many("1p", 100) + sv.sample_many("3i", 100)

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    results = []
    base = None
    for n in sizes:
        if args.full:
            r = measure_full_protocol(n, cfg, graph, queries, val,
                                      total_steps=args.steps,
                                      burn_in=max(10, args.steps // 4))
        else:
            r = measure(n, cfg, graph, queries, n_steps=args.steps)
        if base is None:
            base = r["edges_per_sec"]
        r["efficiency_vs_1dev"] = round(
            r["edges_per_sec"] / (base * r["devices"]), 3)
        results.append(r)
        print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
