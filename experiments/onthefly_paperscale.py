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
                    choices=["bio", "bio-latent", "reddit"])
    ap.add_argument("--scale", type=float, default=None,
                    help="default 114 (bio families) / 60 (reddit)")
    ap.add_argument("--avg_degree", type=float, default=40.0)
    ap.add_argument("--n_val", type=int, default=400)
    ap.add_argument("--n_test", type=int, default=300)
    ap.add_argument("--steps", type=int, default=400_000)
    ap.add_argument("--burn_in", type=int, default=150_000)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--dist", type=str, default=None,
                    choices=["rel", "node", "edge"],
                    help="onthefly_anchor_dist override (default: config "
                         "default; RESULTS_onthefly_quality.md is the "
                         "mid-scale A/B, this run is the paper-scale one)")
    ap.add_argument("--runs", type=int, default=2,
                    help="training repetitions for the sustained-throughput "
                         "row (median reported — multi-run headline "
                         "discipline, VERDICT r04 task 8); quality comes "
                         "from run 1 (seed-deterministic)")
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
        reddit_graph,
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
    dist_kw = {"onthefly_anchor_dist": args.dist} if args.dist else {}
    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=args.lr, seed=0, **dist_kw,
                    val_every=max(1, args.steps // 10), tol=0.0,
                    conv_window=10**9,
                    compute_dtype="bfloat16", storage_dtype="bfloat16")
    if args.scale is None:
        args.scale = 60.0 if args.dataset == "reddit" else 114.0
    gen = {"bio-latent": synthetic_graph_latent, "bio": synthetic_graph,
           "reddit": reddit_graph}[args.dataset]
    graph = gen(seed=0, scale=args.scale, avg_degree=args.avg_degree)
    train_graph, held = holdout_edges(graph, frac=0.1, seed=1)
    print(f"graph {graph.schema.n_nodes} nodes {graph.num_edges()} edges "
          f"{len(held)} held", flush=True)

    # eval-set sampling OVERLAPPED with burn-in (r05, VERDICT r04 task 7):
    # the drivers take val_queries as a callable joined at the first eval
    # boundary, so the ~70 s of host sampling runs while burn-in trains
    from concurrent.futures import ThreadPoolExecutor

    eval_timings = {}

    def _sample_eval_sets():
        t0s = time.time()
        val = []
        for st in STRUCTURES:
            val += parallel_sample(train_graph, st, args.n_val, n_workers=2,
                                   seed=7, max_negs=50)
        test = []
        for st in STRUCTURES:
            test += native_sample_clean_many(graph, train_graph, st,
                                             args.n_test, seed=13,
                                             max_negs=50) or []
        eval_timings["eval_sample_thread_s"] = round(time.time() - t0s, 1)
        print(f"val {len(val)} / clean {len(test)} sampled "
              f"({eval_timings['eval_sample_thread_s']}s, overlapped)",
              flush=True)
        return val, test

    ex_eval = ThreadPoolExecutor(max_workers=1)
    eval_fut = ex_eval.submit(_sample_eval_sets)
    val_fn = lambda: eval_fut.result()[0]

    # the TRAINER sees only the train graph (on-device adjacency sample)
    dg = DeviceGraph.build(train_graph, sample_size=16, seed=0)
    schedule = optax.cosine_decay_schedule(cfg.lr, args.steps, alpha=0.05)
    sustained = []
    res = None
    for run_i in range(max(1, args.runs)):
        params = init_params(cfg, graph.schema, jax.random.key(0))
        t0 = time.time()
        # every run uses the SAME full protocol incl. in-loop evals, so
        # the sustained numbers are comparable (median-of-runs discipline)
        r_i = run_train_onthefly(
            cfg, graph.schema, params, dg, val_queries=val_fn,
            total_steps=args.steps, burn_in_steps=args.burn_in,
            steps_per=200, optimizer=FusedAdamOpt(schedule),
            log=lambda step, st, l: (step % 40000 == 0) and print(
                f"  step {step} [{st}] loss {l:.4f}", flush=True))
        sustained.append(round(r_i.queries_per_sec, 1))
        print(f"run {run_i}: sustained {sustained[-1]:.0f} q/s", flush=True)
        if run_i == 0:
            res = r_i
            t_train = time.time() - t0
    val, test = eval_fut.result()
    ex_eval.shutdown()
    t_eval_sample = eval_timings.get("eval_sample_thread_s", 0.0)

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
        "train_queries_per_sec_per_chip": float(np.median(sustained)),
        "sustained_runs": sustained,
        "train_s": round(t_train, 1),
        "val_auc": r(val_auc), "val_auc_hard": r(val_hard),
        "val_apr": r(val_apr), "clean_test_auc": r(test_auc),
        "eval_sample_s": round(t_eval_sample, 1),
        "wall_s": round(time.time() - t_all, 1),
        "precomputed_train_queries": 0,
    }
    print(json.dumps(report, indent=2), flush=True)
    out_stem = {"bio": "RESULTS_onthefly_paperscale",
                "bio-latent": "RESULTS_onthefly_latent_paperscale",
                "reddit": "RESULTS_onthefly_reddit_paperscale"}[args.dataset]
    Path(out_stem + ".json").write_text(json.dumps(report, indent=1))
    md = f"""# Paper-scale ONTHEFLY flagship (round 5)

The full bio protocol ({args.steps} steps incl. {args.burn_in} burn-in,
bf16 flagship config, cosine decay) with **zero precomputed train
queries**: every batch — all 7 structures, type-range negatives,
partial-branch HARD negatives — is sampled ON DEVICE inside the compiled
scan from the train graph's neighbor tables (r05: the exact flat-CSR
sampler, anchor dist "{cfg.onthefly_anchor_dist}" —
RESULTS_onthefly_quality.md). No pool build, no host query preprocessing
on the training path; val/clean-test sampling overlapped with burn-in
({t_eval_sample:.0f}s on a host thread).

| metric | onthefly | pool/device flagship (same protocol) |
|---|---|---|
| sustained train q/s/chip | **{report['train_queries_per_sec_per_chip']:.0f}** (median of {len(sustained)} runs: {sustained}) | 1,195,726 |
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
