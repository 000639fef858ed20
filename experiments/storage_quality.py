"""bf16-STORAGE end-to-end quality run (round-3 perf lever, docs/DESIGN.md
§10): train the full 7-structure protocol with identical data/init/schedule
under

  fp32      — fp32 storage + fp32 compute (Precision.HIGHEST; oracle parity)
  bf16      — bf16 table+moments (stochastic-rounding fused Adam) AND bf16
              MXU compute — the bench.py winning variant

and report per-structure AUC deltas + throughput. This is the quality guard
for the BENCH headline (bench.py reports best-of including this config).
Writes RESULTS_storage_bf16.{md,json}.

Run on the TPU chip:  python experiments/storage_quality.py
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=4.0)
    ap.add_argument("--n_train", type=int, default=8000)
    ap.add_argument("--n_val", type=int, default=400)
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--burn_in", type=int, default=6000)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.scale, args.n_train, args.n_val = 0.5, 800, 100
        args.steps, args.burn_in = 2000, 500

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import STRUCTURES, GQEConfig
    from graphqembed_tpu.data.sampling import parallel_sample
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training import eval_auc
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        FusedAdamOpt,
        run_train_device_mega,
    )

    graph = synthetic_graph(seed=0, scale=args.scale, avg_degree=8.0)
    print(f"graph: {graph.schema.n_nodes} nodes, {graph.num_edges()} edges",
          flush=True)
    t0 = time.time()
    train, val = [], []
    for st in STRUCTURES:
        qs = parallel_sample(graph, st, args.n_train + args.n_val,
                             n_workers=2, seed=7, max_negs=50)
        train += qs[:-args.n_val]
        val += qs[-args.n_val:]
    print(f"sampled {len(train)}/{len(val)} in {time.time()-t0:.0f}s",
          flush=True)

    base = GQEConfig(embed_dim=128, projection="bilinear",
                     intersection="min", batch_size=512, lr=args.lr,
                     seed=0, val_every=max(1, args.steps // 5), tol=0.0,
                     conv_window=10**9)
    arms = {
        "fp32": base,
        "bf16_storage_compute": dataclasses.replace(
            base, compute_dtype="bfloat16", storage_dtype="bfloat16"),
    }

    results = {}
    for name, cfg in arms.items():
        data = DeviceTrainData(graph.schema, train)
        params = init_params(cfg, graph.schema, jax.random.key(0))
        # constant lr both arms (the SR kernel takes traced lr; keep the
        # comparison clean). FusedAdamOpt for BOTH so the only delta is
        # storage/compute precision, not the optimizer formulation.
        res = run_train_device_mega(
            cfg, graph.schema, params, data, val_queries=val,
            total_steps=args.steps, burn_in_steps=args.burn_in,
            steps_per=200, optimizer=FusedAdamOpt(cfg.lr),
            log=lambda step, st, l: print(
                f"  [{name}] step {step} [{st}] loss {l:.4f}", flush=True))
        auc = eval_auc(cfg, res.best_params, graph.schema, val, seed=3)
        hard = eval_auc(cfg, res.best_params, graph.schema, val, seed=3,
                        hard=True)
        results[name] = {
            "auc": {k: round(v, 4) for k, v in auc.items()},
            "hard_auc": {k: round(v, 4) for k, v in hard.items()},
            "queries_per_sec": round(res.queries_per_sec, 1),
            "steps": res.steps,
        }
        print(name, json.dumps(results[name]), flush=True)

    f32, b16 = results["fp32"], results["bf16_storage_compute"]
    report = {
        "graph": {"nodes": graph.schema.n_nodes,
                  "edges": graph.num_edges(), "scale": args.scale},
        "config": {"d": 128, "batch": 512, "lr": args.lr,
                   "steps": args.steps, "burn_in": args.burn_in,
                   "n_train_per_structure": args.n_train},
        "fp32": f32, "bf16_storage_compute": b16,
        "macro_auc_delta": round(
            b16["auc"]["macro"] - f32["auc"]["macro"], 4),
        "macro_hard_auc_delta": round(
            b16["hard_auc"]["macro"] - f32["hard_auc"]["macro"], 4),
        "throughput_ratio": round(
            b16["queries_per_sec"] / f32["queries_per_sec"], 3),
    }
    print(json.dumps(report, indent=2), flush=True)

    rows = "\n".join(
        f"| {st} | {f32['auc'].get(st, float('nan')):.3f} "
        f"| {b16['auc'].get(st, float('nan')):.3f} "
        f"| {b16['auc'].get(st, 0) - f32['auc'].get(st, 0):+.3f} |"
        for st in (*STRUCTURES, "macro"))
    md = f"""# bf16 STORAGE end-to-end quality (TPU v5e, 1 chip)

Same data, init, schedule, optimizer (fused one-pass Adam); only precision
differs: fp32 = fp32 table/moments + Precision.HIGHEST compute;
bf16 = bf16 table+Adam moments written with STOCHASTIC ROUNDING
(ops/fused_adam.py) + bf16 MXU compute — the configuration bench.py's
best-of reports.

| structure | fp32 AUC | bf16 AUC | Δ |
|---|---|---|---|
{rows}

- hard-negative macro: fp32 {f32['hard_auc']['macro']:.3f} vs bf16
  {b16['hard_auc']['macro']:.3f} (Δ {report['macro_hard_auc_delta']:+.4f})
- macro AUC delta: **{report['macro_auc_delta']:+.4f}**
- end-to-end wall-clock q/s in this run (fp32
  {f32['queries_per_sec']:.0f} / bf16 {b16['queries_per_sec']:.0f},
  ratio {report['throughput_ratio']}) is tunnel-RTT-dominated on this
  deployment and NOT the throughput instrument — the fenced Theil–Sen
  bench (bench.py) is; see DESIGN.md §7/§11

Raw JSON: `RESULTS_storage_bf16.json`.
"""
    Path("RESULTS_storage_bf16.md").write_text(md)
    Path("RESULTS_storage_bf16.json").write_text(json.dumps(report, indent=2))
    print("wrote RESULTS_storage_bf16.md")


if __name__ == "__main__":
    main()
