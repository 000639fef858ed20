"""Flagship quality run: full 7-structure protocol on a bio-scale synthetic
KG, real TPU, reporting AUC/APR (val) and clean-test AUC (generalization over
held-out edges). Writes RESULTS.md. Run: python experiments/flagship_bio.py
[--quick]."""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--scale", type=float, default=4.0)
    ap.add_argument("--n_train", type=int, default=5000)
    ap.add_argument("--out", type=str, default="RESULTS.md")
    args = ap.parse_args()

    import jax

    # persistent compile cache: repeat runs skip the (slow, remote) TPU
    # compiles; set via config because the axon sitecustomize initializes jax
    # before this script's env assignments could be seen
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import STRUCTURES, GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler, parallel_sample
    from graphqembed_tpu.graph.synthetic import holdout_edges, synthetic_graph
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training import eval_apr, eval_auc, run_train

    t_all = time.time()
    n_train = 600 if args.quick else args.n_train
    n_val = 100 if args.quick else 500
    n_test = 50 if args.quick else 300
    cfg = GQEConfig(
        embed_dim=128, projection="bilinear", intersection="min",
        batch_size=512, lr=0.03,
        max_iter=1500 if args.quick else 15000,
        max_burn_in=400 if args.quick else 3000,
        val_every=500 if args.quick else 2000,
        conv_window=200, tol=1e-7, seed=0)

    graph = synthetic_graph(seed=0, scale=args.scale, avg_degree=8.0)
    train_graph, held = holdout_edges(graph, frac=0.1, seed=1)
    print(f"graph: {graph.schema.n_nodes} nodes, {graph.num_edges()} edges, "
          f"{len(held)} held out", flush=True)

    t0 = time.time()
    train, val = [], []
    for st in STRUCTURES:
        qs = parallel_sample(train_graph, st, n_train + n_val, n_workers=8,
                             seed=7, max_negs=50)
        train += qs[:n_train]
        val += qs[n_train:n_train + n_val]
    # clean test queries: answerable on the full graph only
    test = []
    for st in STRUCTURES:
        s = QuerySampler(graph, np.random.default_rng(11), max_negs=50)
        test += s.sample_many(st, n_test, train_graph=train_graph)
    t_sample = time.time() - t0
    print(f"sampled {len(train)}/{len(val)}/{len(test)} in {t_sample:.0f}s",
          flush=True)

    params = init_params(cfg, graph.schema, jax.random.key(0))
    t0 = time.time()
    res = run_train(cfg, graph.schema, params, train, val_queries=val)
    t_train = time.time() - t0
    print(f"trained {res.steps} steps in {t_train:.0f}s "
          f"({res.queries_per_sec:.0f} q/s)", flush=True)

    best = res.best_params
    val_auc = eval_auc(cfg, best, graph.schema, val, seed=3)
    val_hard = eval_auc(cfg, best, graph.schema, val, seed=3, hard=True)
    val_apr = eval_apr(cfg, best, graph.schema, val, max_negs=50)
    test_auc = eval_auc(cfg, best, graph.schema, test, seed=3)

    r = lambda d: {k: round(v, 4) for k, v in d.items()}
    report = {
        "graph": {"nodes": graph.schema.n_nodes, "edges": graph.num_edges(),
                  "held_out_edges": len(held), "scale": args.scale},
        "config": {"projection": cfg.projection, "d": cfg.embed_dim,
                   "batch": cfg.batch_size, "lr": cfg.lr,
                   "steps": res.steps, "burn_in": res.burn_in_steps},
        "throughput_queries_per_sec_hostloop": round(res.queries_per_sec, 1),
        "val_auc": r(val_auc), "val_auc_hard": r(val_hard),
        "val_apr": r(val_apr), "clean_test_auc": r(test_auc),
        "wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(report, indent=2), flush=True)

    rows = "\n".join(
        f"| {st} | {val_auc.get(st, float('nan')):.3f} "
        f"| {val_hard.get(st, float('nan')):.3f} "
        f"| {val_apr.get(st, float('nan')):.3f} "
        f"| {test_auc.get(st, float('nan')):.3f} |"
        for st in (*STRUCTURES, "macro"))
    md = f"""# RESULTS — flagship synthetic-bio run (TPU v5e, 1 chip)

Full reference protocol (burn-in → weighted multitask, hard-negative
alternation, best-val selection) with the bilinear/min operator set, d=128.
Graph: {graph.schema.n_nodes} nodes / {graph.num_edges()} directed edges
(synthetic bio schema; real bio/reddit pickles unavailable offline —
SURVEY.md §0), 10% edges held out; clean test queries require held-out edges.

| structure | val AUC | val AUC (hard neg) | val APR | clean-test AUC |
|---|---|---|---|---|
{rows}

- train queries: {len(train)} ({n_train}/structure); steps: {res.steps}
  (burn-in {res.burn_in_steps}); host-loop throughput
  {res.queries_per_sec:.0f} q/s (the device-resident pipeline in bench.py
  sustains ~435k q/s on the same chip)
- sampling: {t_sample:.0f}s (native C++ engine, 8 threads); training:
  {t_train:.0f}s; total wall: {report['wall_s']}s

Raw JSON: see `RESULTS.json`.
"""
    Path(args.out).write_text(md)
    Path(args.out).with_suffix(".json").write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
