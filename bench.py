"""Benchmark harness (BASELINE.json metric: "queries/sec/chip (train) on bio
2p/3i queries"). Runs on whatever jax.devices() provides (the real TPU chip
under the driver). Prints ONE JSON line.

Baseline: the reference published no throughput numbers (BASELINE.md), so
vs_baseline is measured against the in-tree PyTorch oracle (the operational
stand-in for the reference implementation, SURVEY.md §7) running the same
workload with torch-2.13-cpu + Adam — i.e. "how much faster is the TPU-native
framework than the reference-style eager implementation on this host".
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_workload(scale=40.0, n_queries=1500, batch_size=512, embed_dim=128,
                   seed=0):
    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph

    graph = synthetic_graph(seed=seed, scale=scale, avg_degree=10.0)
    cfg = GQEConfig(embed_dim=embed_dim, projection="bilinear",
                    intersection="min", batch_size=batch_size, lr=0.01)
    s = QuerySampler(graph, np.random.default_rng(seed), max_negs=30)
    queries = (s.sample_many("2p", n_queries) + s.sample_many("3i", n_queries))
    return graph, cfg, queries


def bench_jax(graph, cfg, queries, n_steps=2000, warmup_steps=100,
              sparse: bool = False, data=None) -> float:
    """Device-resident pipeline: query pools live in HBM, lax.scan mega-steps
    (100 train steps per dispatch), alternating 2p / 3i chunks.

    sparse=True uses the lazy-sparse-Adam table update (O(touched rows)).
    History: before the one-gather margin loss (docs/DESIGN.md §11) the
    dense step paid five separate [N, d] cotangent materializations and
    sparse won at N=35k (1.22M vs 1.09M q/s). With ONE dense cotangent the
    ordering flipped at this N (r03 probe: fp32 dense 1.03M vs sparse
    0.83M; bf16 1.23M vs 0.88M) — the sparse path's per-step dedup/scatter
    fixed cost now exceeds the single dense sweep at 35k rows; sparse
    remains the win for large N where the dense Adam sweep dominates.
    Dense is also the bit-faithful reference-semantics default in
    training.

    cfg.storage_dtype="bfloat16" stores the table + Adam moments in bf16
    (dense: fused one-pass stochastic-rounding Pallas Adam via FusedAdamOpt;
    sparse: SR row writes) — halves the step's dominant HBM traffic
    (docs/DESIGN.md §10); quality delta pinned in RESULTS_storage_bf16.md."""
    import jax
    import optax

    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        default_optimizer,
        make_scan_train_step,
        make_scan_train_step_sparse,
    )
    from graphqembed_tpu.training.sparse_adam import init_lazy_adam

    data = data or DeviceTrainData(graph.schema, queries)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    optimizer = optax.adam(cfg.lr)
    key = jax.random.key(0)
    chunk = 100

    if sparse:
        table = params.pop("table")
        table_state = init_lazy_adam(table)
        opt_state = optimizer.init(params)
        scan = make_scan_train_step_sparse(cfg, optimizer)
        state = (params, table, table_state, opt_state)

        def run(state, n, k0):
            params, table, table_state, opt_state = state
            done, i = 0, 0
            while done < n:
                s = ("2p", "3i")[i % 2]
                params, table, table_state, opt_state, loss = scan(
                    params, table, table_state, opt_state, data.pools[s], s,
                    jax.random.fold_in(key, k0 + i), chunk, 1.0,
                    s == "3i" and cfg.hard_neg_alternate)
                done += chunk
                i += 1
            return (params, table, table_state, opt_state)
    else:
        optimizer = default_optimizer(cfg)  # FusedAdamOpt for bf16 storage
        opt_state = optimizer.init(params)
        scan = make_scan_train_step(cfg, optimizer)
        state = (params, opt_state)

        def run(state, n, k0):
            params, opt_state = state
            done, i = 0, 0
            while done < n:
                s = ("2p", "3i")[i % 2]
                params, opt_state, loss = scan(
                    params, opt_state, data.pools[s], s,
                    jax.random.fold_in(key, k0 + i), chunk, 1.0,
                    s == "3i" and cfg.hard_neg_alternate)
                done += chunk
                i += 1
            return (params, opt_state)

    # Difference timing with a value-read fence: on this deployment the TPU
    # is behind a tunnel where block_until_ready can return early on fresh
    # executables and any host value read costs a ~1.7 s round trip. Each
    # window is timed end-to-end (fenced by a value read); the per-step time
    # is the Theil-Sen (median-of-pairwise) SLOPE of time vs steps over
    # several window sizes x repeats — the intercept absorbs the RTT and
    # constant dispatch overhead, and the median rejects the occasional
    # multi-second tunnel spike that poisons a single two-point difference
    # (observed: 1.7M vs 1.1M q/s from one spiked window).
    def timed(n, k0):
        nonlocal state
        t0 = time.perf_counter()
        state = run(state, n, k0)
        jax.block_until_ready(jax.tree.leaves(state)[0])
        float(jnp_sum_probe(state))
        return time.perf_counter() - t0

    import jax.numpy as jnp

    def jnp_sum_probe(state):
        leaf = jax.tree.leaves(state)[0]
        return jnp.sum(leaf[:1])

    timed(warmup_steps, 1000)
    windows = (n_steps, 6 * n_steps, 11 * n_steps)
    points = []
    for rep in range(2):
        for n in windows:
            points.append((n, timed(n, 1000 * (len(points) + 2))))
    slopes = [(tj - ti) / (nj - ni)
              for i, (ni, ti) in enumerate(points)
              for nj, tj in points[i + 1:] if nj != ni]
    slope = float(np.median(slopes))
    return cfg.batch_size / max(slope, 1e-9)


def bench_onthefly(graph, cfg, n_steps=2000, warmup_steps=100) -> float:
    """Pool-free fused sample+train (r05): every batch sampled ON DEVICE by
    the exact flat-CSR sampler inside the compiled scan — zero precomputed
    queries, zero HBM pool. Same 2p/3i alternation and Theil-Sen timing as
    bench_jax; quality guard for the sampler's distribution:
    RESULTS_onthefly_quality.md."""
    import jax
    import jax.numpy as jnp

    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import default_optimizer
    from graphqembed_tpu.training.device_sampler import (
        DeviceGraph,
        make_onthefly_train_step,
    )

    dg = DeviceGraph.build(graph, sample_size=16, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    optimizer = default_optimizer(cfg)
    opt_state = optimizer.init(params)
    scan = make_onthefly_train_step(cfg, optimizer, dg)
    key = jax.random.key(0)
    chunk = 100
    state = (params, opt_state)

    def run(state, n, k0):
        params, opt_state = state
        done, i = 0, 0
        while done < n:
            s = ("2p", "3i")[i % 2]
            params, opt_state, loss = scan(
                params, opt_state, s, jax.random.fold_in(key, k0 + i),
                chunk, 1.0, s == "3i" and cfg.hard_neg_alternate)
            done += chunk
            i += 1
        return (params, opt_state)

    def timed(n, k0):
        nonlocal state
        t0 = time.perf_counter()
        state = run(state, n, k0)
        jax.block_until_ready(jax.tree.leaves(state)[0])
        float(jnp.sum(jax.tree.leaves(state)[0][:1]))
        return time.perf_counter() - t0

    timed(warmup_steps, 1000)
    windows = (n_steps, 6 * n_steps, 11 * n_steps)
    points = []
    for rep in range(2):
        for n in windows:
            points.append((n, timed(n, 1000 * (len(points) + 2))))
    slopes = [(tj - ti) / (nj - ni)
              for i, (ni, ti) in enumerate(points)
              for nj, tj in points[i + 1:] if nj != ni]
    return cfg.batch_size / max(float(np.median(slopes)), 1e-9)


def bench_oracle(graph, cfg, queries, n_steps=8, warmup=1) -> float:
    """Reference-style eager PyTorch training step (same semantics, same
    batch shapes) with dense Adam — the hot loop of SURVEY.md §4.1."""
    import torch

    from graphqembed_tpu.oracle import torch_gqe

    d = cfg.embed_dim
    schema = graph.schema
    g = torch.Generator().manual_seed(0)

    def leaf(*shape, scale=1.0):
        return (torch.randn(*shape, generator=g, dtype=torch.float32) * scale
                ).requires_grad_(True)

    params = {
        "table": leaf(schema.n_nodes, d),
        "proj": {"W": leaf(schema.n_relations, d, d, scale=1.0 / d**0.5)},
        "inter": {
            "pre": leaf(len(schema.modes), d, d, scale=1.0 / d**0.5),
            "post": leaf(len(schema.modes), d, d, scale=1.0 / d**0.5),
        },
    }
    leaves = [params["table"], params["proj"]["W"], params["inter"]["pre"],
              params["inter"]["post"]]
    opt = torch.optim.Adam(leaves, lr=cfg.lr)

    from graphqembed_tpu.training import TrainData

    data = TrainData(graph.schema, queries, cfg.batch_size, seed=0)
    batches = [(s, data.sample_batch(s)) for s in ("2p", "3i") for _ in range(4)]

    def one(i):
        st, (rels, anchors, targets, negs, mask, im) = batches[i % len(batches)]
        opt.zero_grad()
        loss = torch_gqe.margin_loss(cfg, params, st, anchors, rels, int(im),
                                     targets, negs, mask)
        loss.backward()
        opt.step()

    for i in range(warmup):
        one(i)
    t0 = time.perf_counter()
    for i in range(n_steps):
        one(i)
    dt = time.perf_counter() - t0
    return n_steps * cfg.batch_size / dt


def _variants(cfg):
    """The benchmarked configs. Quality guards (committed evidence):
    bf16 compute = macro AUC Δ −0.0014 (RESULTS_bf16.md); bf16 storage+SR =
    RESULTS_storage_bf16.md. fp32 dense remains the oracle-parity config."""
    import dataclasses

    bf16 = dataclasses.replace(cfg, compute_dtype="bfloat16",
                               storage_dtype="bfloat16")
    bf16c = dataclasses.replace(cfg, compute_dtype="bfloat16")
    return [
        ("fp32-dense", cfg, False),
        ("fp32-sparse", cfg, True),
        ("bf16-dense-fused", bf16, False),
        ("bf16-compute-only", bf16c, False),
        ("bf16-sparse", bf16, True),
    ]


def main(probe: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.training.device_data import DeviceTrainData

    graph, cfg, queries = build_workload()
    data = DeviceTrainData(graph.schema, queries)
    results = {}
    for name, vcfg, sparse in _variants(cfg):
        results[name] = bench_jax(graph, vcfg, queries, sparse=sparse,
                                  data=data)
        if probe:
            print(json.dumps({"variant": name,
                              "qps": round(results[name], 1)}), flush=True)
    # pool-free on-device sampling at the winning precision (r05): same
    # 2p/3i training workload, zero precomputed queries
    import dataclasses
    bf16c = dataclasses.replace(cfg, compute_dtype="bfloat16")
    results["bf16-onthefly"] = bench_onthefly(graph, bf16c)
    if probe:
        print(json.dumps({"variant": "bf16-onthefly",
                          "qps": round(results["bf16-onthefly"], 1)}),
              flush=True)
    jax_qps = max(results.values())
    oracle_qps = bench_oracle(graph, cfg, queries)
    print(json.dumps({
        "metric": "train queries/sec/chip, bio-synth 2p+3i, bilinear d=128 "
                  "B=512 (best of fp32/bf16-storage x dense/sparse Adam, "
                  "incl. pool-free on-device-sampled onthefly; quality "
                  "deltas pinned in RESULTS_bf16/_storage_bf16/"
                  "_onthefly_quality.md)",
        "value": round(jax_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(jax_qps / oracle_qps, 2),
        "variants": {k: round(v, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main(probe="--probe" in sys.argv)
