"""Paper-scale ONTHEFLY flagship: the full 400k-step bio protocol with ZERO
precomputed queries — every batch (including partial-branch hard negatives)
sampled on device inside the compiled scan. Pool build time: none; host
query preprocessing: none (only the offline exact-negative val/clean-test
sets for eval). Writes RESULTS_onthefly_paperscale.{md,json}.
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
                    choices=["bio", "bio-latent"])
    ap.add_argument("--scale", type=float, default=114.0)
    ap.add_argument("--avg_degree", type=float, default=40.0)
    ap.add_argument("--n_val", type=int, default=400)
    ap.add_argument("--n_test", type=int, default=300)
    ap.add_argument("--steps", type=int, default=400_000)
    ap.add_argument("--burn_in", type=int, default=150_000)
    ap.add_argument("--lr", type=float, default=0.03)
    args = ap.parse_args()

    import jax
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import STRUCTURES, GQEConfig
    from graphqembed_tpu.data.sampling import parallel_sample
    from graphqembed_tpu.graph.synthetic import (
        holdout_edges,
        synthetic_graph,
        synthetic_graph_latent,
    )
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.native import native_sample_clean_many
    from graphqembed_tpu.training import eval_apr, eval_auc
    from graphqembed_tpu.training.device_data import FusedAdamOpt
    from graphqembed_tpu.training.device_sampler import (
        DeviceGraph,
        run_train_onthefly,
    )

    t_all = time.time()
    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=args.lr, seed=0,
                    val_every=max(1, args.steps // 10), tol=0.0,
                    conv_window=10**9,
                    compute_dtype="bfloat16", storage_dtype="bfloat16")
    gen = (synthetic_graph_latent if args.dataset == "bio-latent"
           else synthetic_graph)
    graph = gen(seed=0, scale=args.scale, avg_degree=args.avg_degree)
    train_graph, held = holdout_edges(graph, frac=0.1, seed=1)
    print(f"graph {graph.schema.n_nodes} nodes {graph.num_edges()} edges "
          f"{len(held)} held", flush=True)

    t0 = time.time()
    val = []
    for st in STRUCTURES:
        val += parallel_sample(train_graph, st, args.n_val, n_workers=2,
                               seed=7, max_negs=50)
    test = []
    for st in STRUCTURES:
        test += native_sample_clean_many(graph, train_graph, st, args.n_test,
                                         seed=13, max_negs=50) or []
    t_eval_sample = time.time() - t0
    print(f"val {len(val)} / clean {len(test)} ({t_eval_sample:.0f}s)",
          flush=True)

    # the TRAINER sees only the train graph (on-device adjacency sample)
    dg = DeviceGraph.build(train_graph, sample_size=16, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    schedule = optax.cosine_decay_schedule(cfg.lr, args.steps, alpha=0.05)
    t0 = time.time()
    res = run_train_onthefly(
        cfg, graph.schema, params, dg, val_queries=val,
        total_steps=args.steps, burn_in_steps=args.burn_in, steps_per=200,
        optimizer=FusedAdamOpt(schedule),
        log=lambda step, st, l: (step % 40000 == 0) and print(
            f"  step {step} [{st}] loss {l:.4f}", flush=True))
    t_train = time.time() - t0

    best = res.best_params
    val_auc = eval_auc(cfg, best, graph.schema, val, seed=3)
    val_hard = eval_auc(cfg, best, graph.schema, val, seed=3, hard=True)
    val_apr = eval_apr(cfg, best, graph.schema, val, max_negs=50)
    test_auc = eval_auc(cfg, best, graph.schema, test, seed=3)

    r = lambda d: {k: round(v, 4) for k, v in d.items()}
    report = {
        "dataset": f"{args.dataset}-synth-paperscale-onthefly",
        "graph": {"nodes": graph.schema.n_nodes, "edges": graph.num_edges(),
                  "scale": args.scale, "avg_degree": args.avg_degree},
        "steps": res.steps, "burn_in": res.burn_in_steps,
        "train_queries_per_sec_per_chip": round(res.queries_per_sec, 1),
        "train_s": round(t_train, 1),
        "val_auc": r(val_auc), "val_auc_hard": r(val_hard),
        "val_apr": r(val_apr), "clean_test_auc": r(test_auc),
        "eval_sample_s": round(t_eval_sample, 1),
        "wall_s": round(time.time() - t_all, 1),
        "precomputed_train_queries": 0,
    }
    print(json.dumps(report, indent=2), flush=True)
    out_stem = ("RESULTS_onthefly_paperscale"
                if args.dataset == "bio"
                else "RESULTS_onthefly_latent_paperscale")
    Path(out_stem + ".json").write_text(json.dumps(report, indent=1))
    md = f"""# Paper-scale ONTHEFLY flagship (round 4)

The full bio protocol ({args.steps} steps incl. {args.burn_in} burn-in,
bf16 flagship config, cosine decay) with **zero precomputed train
queries**: every batch — all 7 structures, type-range negatives,
partial-branch HARD negatives — is sampled ON DEVICE inside the compiled
scan from the train graph's neighbor tables. No pool build, no host query
preprocessing on the training path.

| metric | onthefly | pool/device flagship (same protocol) |
|---|---|---|
| sustained train q/s/chip | **{report['train_queries_per_sec_per_chip']:.0f}** | 1,195,726 |
| val macro AUC | **{val_auc['macro']:.4f}** | 0.8253 |
| hard-neg macro AUC | **{val_hard['macro']:.4f}** | 0.6833 |
| val macro APR | **{val_apr['macro']:.4f}** | 0.8231 |
| clean-test macro AUC | **{test_auc['macro']:.4f}** | 0.7082 |
| precomputed train queries | **0** | 10.2M (1p) + 300k |

Per-structure val AUC: {r(val_auc)}; hard: {r(val_hard)};
clean-test: {r(test_auc)}.
"""
    Path(out_stem + ".md").write_text(md)
    print("wrote", out_stem + ".md", flush=True)


if __name__ == "__main__":
    main()
