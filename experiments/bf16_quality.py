"""bf16 end-to-end quality run (VERDICT r1 item 10, DESIGN.md §9): train the
full 7-structure protocol twice on identical data/init — compute_dtype
float32 (MXU Precision.HIGHEST, the oracle-parity policy) vs bfloat16 (MXU
DEFAULT: fp32 storage, bf16 MXU passes) — and report the per-structure AUC
delta and the throughput ratio. Writes RESULTS_bf16.{md,json}.

Run on the TPU chip:  python experiments/bf16_quality.py
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
    import optax

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

    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = GQEConfig(embed_dim=128, projection="bilinear",
                        intersection="min", batch_size=512, lr=args.lr,
                        seed=0, compute_dtype=dtype,
                        val_every=max(1, args.steps // 5), tol=0.0,
                        conv_window=10**9)
        data = DeviceTrainData(graph.schema, train)
        params = init_params(cfg, graph.schema, jax.random.key(0))
        res = run_train_device_mega(
            cfg, graph.schema, params, data, val_queries=val,
            total_steps=args.steps, burn_in_steps=args.burn_in,
            steps_per=200,
            optimizer=optax.adam(
                optax.cosine_decay_schedule(cfg.lr, args.steps, alpha=0.05)))
        auc = eval_auc(cfg, res.best_params, graph.schema, val, seed=3)
        results[dtype] = {
            "auc": {k: round(v, 4) for k, v in auc.items()},
            "queries_per_sec": round(res.queries_per_sec, 1),
            "steps": res.steps,
        }
        print(dtype, json.dumps(results[dtype]), flush=True)

    f32, bf16 = results["float32"], results["bfloat16"]
    report = {
        "graph": {"nodes": graph.schema.n_nodes,
                  "edges": graph.num_edges(), "scale": args.scale},
        "config": {"d": 128, "batch": 512, "lr": args.lr,
                   "steps": args.steps, "burn_in": args.burn_in,
                   "n_train_per_structure": args.n_train},
        "float32": f32, "bfloat16": bf16,
        "macro_auc_delta": round(
            bf16["auc"]["macro"] - f32["auc"]["macro"], 4),
        "throughput_ratio": round(
            bf16["queries_per_sec"] / f32["queries_per_sec"], 3),
    }
    print(json.dumps(report, indent=2), flush=True)

    rows = "\n".join(
        f"| {st} | {f32['auc'].get(st, float('nan')):.3f} "
        f"| {bf16['auc'].get(st, float('nan')):.3f} "
        f"| {bf16['auc'].get(st, 0) - f32['auc'].get(st, 0):+.3f} |"
        for st in (*STRUCTURES, "macro"))
    md = f"""# bf16 end-to-end quality (TPU v5e, 1 chip)

Same data, init, schedule; only the precision policy differs:
float32 = fp32 storage + MXU Precision.HIGHEST (oracle parity);
bfloat16 = fp32 storage + MXU DEFAULT (bf16 truncation in matmuls).

| structure | fp32 AUC | bf16 AUC | Δ |
|---|---|---|---|
{rows}

- throughput: fp32 {f32['queries_per_sec']:.0f} q/s vs bf16
  {bf16['queries_per_sec']:.0f} q/s — ratio
  **{report['throughput_ratio']}×**
- macro AUC delta: **{report['macro_auc_delta']:+.4f}**

Raw JSON: `RESULTS_bf16.json`.
"""
    Path("RESULTS_bf16.md").write_text(md)
    Path("RESULTS_bf16.json").write_text(json.dumps(report, indent=2))
    print("wrote RESULTS_bf16.md")


if __name__ == "__main__":
    main()
