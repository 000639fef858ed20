"""The quality-parity bar (SURVEY.md §7, VERDICT r1 item 1a): train the eager
PyTorch oracle AND the JAX framework with the exact same §2.5 protocol — same
TrainData batch schedule (shared sampler, same seed), same init params, same
eval negative-selection — and report per-structure AUC/APR for both.

The oracle-trained numbers ARE the operational definition of "reference
quality"; the JAX column must match within ~0.01 macro. Writes
RESULTS_oracle_parity.{md,json}.

Run (CPU is the right backend here — the host-schedule loop is RTT-bound on
the tunneled TPU, and the comparison needs identical schedules, not speed):
  JAX_PLATFORMS=cpu python experiments/oracle_parity.py
"""

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
    ap.add_argument("--dataset", type=str, default="bio",
                    choices=["bio", "bio-latent"],
                    help="bio-latent: the latent-community family the "
                         "quality flagship runs on (r05 — pins the oracle "
                         "bar where learning actually happens, VERDICT r04 "
                         "task 4)")
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--n_train", type=int, default=8000)
    ap.add_argument("--n_val", type=int, default=400)
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--burn_in", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    from graphqembed_tpu.config import STRUCTURES, GQEConfig
    from graphqembed_tpu.data.sampling import parallel_sample
    from graphqembed_tpu.graph.synthetic import (
        synthetic_graph,
        synthetic_graph_latent,
    )
    from graphqembed_tpu.models.params import init_params, params_to_numpy
    from graphqembed_tpu.oracle.train import (
        eval_apr_oracle,
        eval_auc_oracle,
        run_train_oracle,
    )
    from graphqembed_tpu.training import eval_apr, eval_auc, run_train

    if args.quick:
        args.scale, args.n_train, args.n_val = 0.5, 800, 100
        args.steps, args.burn_in = 1500, 400

    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=args.lr, max_iter=args.steps,
                    max_burn_in=args.burn_in, val_every=args.steps // 4,
                    tol=0.0, conv_window=10**6, seed=0)

    t0 = time.time()
    gen = {"bio": synthetic_graph, "bio-latent": synthetic_graph_latent}
    graph = gen[args.dataset](seed=0, scale=args.scale, avg_degree=8.0)
    print(f"graph: {graph.schema.n_nodes} nodes, {graph.num_edges()} edges",
          flush=True)
    train, val = [], []
    for st in STRUCTURES:
        qs = parallel_sample(graph, st, args.n_train + args.n_val,
                             n_workers=8, seed=7, max_negs=50)
        train += qs[:-args.n_val]
        val += qs[-args.n_val:]
    print(f"sampled {len(train)} train / {len(val)} val "
          f"({time.time()-t0:.0f}s)", flush=True)

    p0 = params_to_numpy(init_params(cfg, graph.schema,
                                     jax.random.key(cfg.seed)))

    t1 = time.time()
    res_o = run_train_oracle(
        cfg, graph.schema, p0, train, val_queries=val,
        log=lambda s, st, l: print(f"  oracle step {s} [{st}] {l:.4f}",
                                   flush=True))
    t_oracle = time.time() - t1
    print(f"oracle: {res_o.steps} steps in {t_oracle:.0f}s "
          f"(best val {res_o.best_val_auc:.4f})", flush=True)

    t1 = time.time()
    res_j = run_train(
        cfg, graph.schema, jax.tree.map(jax.numpy.asarray, p0), train,
        val_queries=val,
        on_step=lambda s, st, l: (s % 2000 == 0) and print(
            f"  jax step {s} [{st}] {l:.4f}", flush=True))
    t_jax = time.time() - t1
    print(f"jax:    {res_j.steps} steps in {t_jax:.0f}s "
          f"(best val {res_j.best_val_auc:.4f})", flush=True)

    auc_o = eval_auc_oracle(cfg, res_o.best_params, graph.schema, val,
                            seed=3)
    apr_o = eval_apr_oracle(cfg, res_o.best_params, graph.schema, val,
                            max_negs=50)
    hard_o = eval_auc_oracle(cfg, res_o.best_params, graph.schema, val,
                             seed=3, hard=True)
    auc_j = eval_auc(cfg, res_j.best_params, graph.schema, val, seed=3)
    apr_j = eval_apr(cfg, res_j.best_params, graph.schema, val, max_negs=50)
    hard_j = eval_auc(cfg, res_j.best_params, graph.schema, val, seed=3,
                      hard=True)

    r = lambda d: {k: round(v, 4) for k, v in d.items()}
    report = {
        "dataset": args.dataset,
        "graph": {"nodes": graph.schema.n_nodes, "edges": graph.num_edges(),
                  "scale": args.scale},
        "config": {"projection": cfg.projection, "d": cfg.embed_dim,
                   "batch": cfg.batch_size, "lr": cfg.lr,
                   "steps": args.steps, "burn_in": args.burn_in,
                   "n_train_per_structure": args.n_train},
        "oracle": {"auc": r(auc_o), "apr": r(apr_o), "hard_auc": r(hard_o),
                   "train_s": round(t_oracle, 1), "steps": res_o.steps},
        "jax": {"auc": r(auc_j), "apr": r(apr_j), "hard_auc": r(hard_j),
                "train_s": round(t_jax, 1), "steps": res_j.steps},
        "delta_macro_auc": round(abs(auc_o["macro"] - auc_j["macro"]), 4),
        "delta_macro_apr": round(abs(apr_o["macro"] - apr_j["macro"]), 4),
        "delta_macro_hard_auc": round(
            abs(hard_o["macro"] - hard_j["macro"]), 4),
    }
    print(json.dumps(report, indent=2), flush=True)

    nan = float("nan")
    rows = "\n".join(
        f"| {st} | {auc_o.get(st, nan):.3f} "
        f"| {auc_j.get(st, nan):.3f} "
        f"| {auc_j.get(st, nan) - auc_o.get(st, nan):+.3f} "
        f"| {apr_o.get(st, nan):.3f} "
        f"| {apr_j.get(st, nan):.3f} "
        f"| {hard_o.get(st, nan):.3f} "
        f"| {hard_j.get(st, nan):.3f} |"
        for st in (*STRUCTURES, "macro"))
    out = ("RESULTS_oracle_parity.md" if args.dataset == "bio"
           else "RESULTS_oracle_parity_latent.md")
    md = f"""# Oracle-trained quality parity ({args.dataset})

The quality bar for this framework (SURVEY.md §7: the reference mount is
empty, so the in-tree PyTorch oracle TRAINED with the §2.5 protocol defines
reference AUC/APR). Both rows below trained with IDENTICAL batch schedules
(shared numpy sampler, same seed), identical init, dense Adam lr={cfg.lr},
{args.steps} steps (burn-in {args.burn_in}), bilinear/min, d=128, B=512, on a
{graph.schema.n_nodes}-node / {graph.num_edges()}-edge synthetic bio KG with
{args.n_train} train queries per structure ({args.dataset} family).

| structure | oracle AUC | JAX AUC | Δ AUC | oracle APR | JAX APR | oracle hard-AUC | JAX hard-AUC |
|---|---|---|---|---|---|---|---|
{rows}

- macro |Δ| AUC: **{report['delta_macro_auc']}**, APR:
  **{report['delta_macro_apr']}**, hard-neg AUC:
  **{report['delta_macro_hard_auc']}** (parity contract: ≤ ~0.01 macro;
  hard-AUC macro averages intersection structures only — SURVEY §2.6)
- oracle (eager torch fp64, CPU): {t_oracle:.0f}s; JAX (fp32,
  {jax.default_backend()}): {t_jax:.0f}s — same schedule, same host
- enforced continuously at smaller budget by tests/test_oracle_trained.py

Raw JSON: `{Path(out).with_suffix(".json").name}`.
"""
    Path(out).write_text(md)
    Path(out).with_suffix(".json").write_text(json.dumps(report, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
