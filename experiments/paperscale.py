"""Paper-scale quality run (VERDICT r1 item 1b): the round-1 paper-scale
graph (scale=114, avg_degree=40 -> ~100k nodes / ~11.3M edges, BASELINE.md
"bio graph scale" ~1e5 nodes / ~8M edges) trained with FULL 1p coverage —
every train edge is a 1p query (native_all_edges_1p, the reference's
train_edges semantics) — plus bulk intersection/path pools through the
array fast path (native_sample_arrays -> device_pool_from_arrays, zero
python Query objects on the train side).

Round-1 failure mode this fixes: 20k 1p queries on a 100k-node graph leave
most embeddings without a single positive gradient (val macro 0.629,
clean-test ~chance). Writes RESULTS_bio_paperscale.{md,json}.

Run on the TPU chip:  python experiments/paperscale.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", type=str, default="bio",
                    choices=["bio", "reddit", "bio-latent", "reddit-latent"],
                    help="synthetic schema family (the two paper "
                         "benchmarks); reddit uses graph/synthetic.py::"
                         "reddit_graph at the same paper-like node count; "
                         "bio-latent plants recoverable community "
                         "structure (synthetic_graph_latent) so clean-test "
                         "has headroom above the degree-only ceiling")
    ap.add_argument("--scale", type=float, default=None,
                    help="default: 114 (bio, ~100k nodes) / 60 (reddit)")
    ap.add_argument("--avg_degree", type=float, default=40.0)
    ap.add_argument("--n_inter", type=int, default=50000,
                    help="train queries per non-1p structure")
    ap.add_argument("--n_val", type=int, default=400)
    ap.add_argument("--n_test", type=int, default=300)
    ap.add_argument("--steps", type=int, default=400_000)
    ap.add_argument("--burn_in", type=int, default=150_000)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", type=str, default="RESULTS_bio_paperscale.md")
    ap.add_argument("--hard_frac", type=float, default=0.5,
                    help="fraction of i-structure steps drawing HARD "
                         "negatives (0.5 = reference alternation)")
    ap.add_argument("--pool_width", type=int, default=16,
                    help="stored negative/hard pool width for non-1p "
                         "structures (diversity of the per-step draw)")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute AND storage (stochastic-rounding "
                         "fused Adam) — the bench.py winning configuration; "
                         "quality guard: RESULTS_storage_bf16.md")
    args = ap.parse_args()
    if args.scale is None:
        args.scale = 60.0 if args.dataset.startswith("reddit") else 114.0
    if args.out == "RESULTS_bio_paperscale.md" and args.dataset == "reddit":
        args.out = "RESULTS_reddit_paperscale.md"
    if args.out == "RESULTS_bio_paperscale.md" and args.dataset == "bio-latent":
        args.out = "RESULTS_biolatent_paperscale.md"
    if args.out == "RESULTS_bio_paperscale.md" and args.dataset == "reddit-latent":
        args.out = "RESULTS_redditlatent_paperscale.md"
    if args.bf16 and "_bf16" not in args.out:  # never clobber the fp32 run
        args.out = args.out.replace(".md", "_bf16.md")
    if args.quick:
        args.scale, args.avg_degree = 2.0, 8.0
        args.n_inter, args.n_val, args.n_test = 2000, 100, 50
        args.steps, args.burn_in = 8000, 3000

    import jax
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import STRUCTURES, GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler, parallel_sample
    from graphqembed_tpu.graph.synthetic import (
        holdout_edges,
        reddit_graph,
        reddit_graph_latent,
        synthetic_graph,
        synthetic_graph_latent,
    )
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.native import (
        native_all_edges_1p,
        native_sample_arrays,
    )
    from graphqembed_tpu.training import eval_apr, eval_auc
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        device_pool_from_arrays,
        run_train_device_mega,
    )

    t_all = time.time()
    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=args.lr, seed=0,
                    val_every=max(1, args.steps // 10), tol=0.0,
                    conv_window=10**9, hard_neg_frac=args.hard_frac,
                    compute_dtype="bfloat16" if args.bf16 else "float32",
                    storage_dtype="bfloat16" if args.bf16 else "float32")

    gen = {"reddit": reddit_graph, "bio": synthetic_graph,
           "bio-latent": synthetic_graph_latent,
           "reddit-latent": reddit_graph_latent}[args.dataset]
    graph = gen(seed=0, scale=args.scale, avg_degree=args.avg_degree)
    train_graph, held = holdout_edges(graph, frac=0.1, seed=1)
    print(f"graph: {graph.schema.n_nodes} nodes, {graph.num_edges()} edges, "
          f"{len(held)} held out", flush=True)

    # --- train pools ---
    # 1p: C++ all-edges builder, threaded across cores. The 6 non-1p pools
    # sample on host threads (GIL-free C++) OVERLAPPED with burn-in running
    # on the device (burn-in uses only the 1p pool) via deferred_pools.
    t0 = time.time()
    arr_1p = native_all_edges_1p(train_graph, max_negs=16, seed=11)
    pools = {"1p": device_pool_from_arrays(graph.schema, arr_1p)}
    n_1p = len(arr_1p["targets"])
    del arr_1p
    t_1p = time.time() - t0
    print(f"1p pool: ALL {n_1p} train edges ({t_1p:.0f}s)", flush=True)

    others = [s for s in STRUCTURES if s != "1p"]
    ex = ThreadPoolExecutor(max_workers=2)  # 2 cores on this box
    futures = {st: ex.submit(native_sample_arrays, train_graph, st,
                             args.n_inter, seed=100 + i, max_negs=50)
               for i, st in enumerate(others)}
    data = DeviceTrainData.from_pools(pools)
    timings = {"pool_1p_s": round(t_1p, 1)}

    def deferred():
        t_join = time.time()
        out = {}
        for st, fut in futures.items():
            arr = fut.result()
            out[st] = device_pool_from_arrays(graph.schema, arr,
                                              neg_width=args.pool_width,
                                              hard_neg_width=args.pool_width)
            print(f"{st} pool: {len(arr['targets'])} "
                  f"({time.time()-t0:.0f}s since build start)", flush=True)
        ex.shutdown()
        timings["pool_join_wait_s"] = round(time.time() - t_join, 1)
        timings["pool_others_done_s"] = round(time.time() - t0, 1)
        return out

    # --- val / clean-test queries, OVERLAPPED with burn-in (r05, VERDICT
    # r04 task 7): the r04 decomposition showed 70.5 s of host eval-set
    # sampling serial before training; the first eval only happens at the
    # first multitask val_every boundary, so the sampling runs on a host
    # thread while burn-in runs on the device — run_train_device_mega takes
    # val_queries as a CALLABLE and joins it there (TrainResult.timings
    # val_wait_s records any residual exposure). ---
    from graphqembed_tpu.native import native_sample_clean_many

    t0e = time.time()
    eval_timings = {}

    def _sample_eval_sets():
        t0s = time.time()
        val = []
        for st in STRUCTURES:
            val += parallel_sample(train_graph, st, args.n_val, n_workers=2,
                                   seed=7, max_negs=50)
        test = []
        s = QuerySampler(graph, np.random.default_rng(13), max_negs=50)
        for st in STRUCTURES:
            # clean-test at native speed (the python clean sampler was
            # 90-120s of flagship wall); python fallback keeps the offline
            # contract
            qs = native_sample_clean_many(graph, train_graph, st,
                                          args.n_test, seed=13, max_negs=50)
            test += (qs if qs is not None
                     else s.sample_many(st, args.n_test,
                                        train_graph=train_graph))
        eval_timings["eval_sample_thread_s"] = round(time.time() - t0s, 1)
        print(f"val {len(val)} / clean-test {len(test)} sampled "
              f"({eval_timings['eval_sample_thread_s']}s, overlapped)",
              flush=True)
        return val, test

    ex_eval = ThreadPoolExecutor(max_workers=1)
    eval_fut = ex_eval.submit(_sample_eval_sets)
    val_fn = lambda: eval_fut.result()[0]

    # --- train: device mega pipeline, cosine decay ---
    params = init_params(cfg, graph.schema, jax.random.key(0))
    schedule = optax.cosine_decay_schedule(cfg.lr, args.steps, alpha=0.05)
    if args.bf16:
        from graphqembed_tpu.training.device_data import FusedAdamOpt
        optimizer = FusedAdamOpt(schedule)  # SR writes; bf16 moments
    else:
        optimizer = optax.adam(schedule)
    res = run_train_device_mega(
        cfg, graph.schema, params, data, val_queries=val_fn,
        total_steps=args.steps, burn_in_steps=args.burn_in, steps_per=200,
        optimizer=optimizer, deferred_pools=deferred,
        log=lambda step, st, l: print(
            f"  step {step} [{st}] loss {l:.4f}", flush=True))
    t_pools = timings["pool_others_done_s"]
    val, test = eval_fut.result()
    ex_eval.shutdown()
    t_eval_sample = eval_timings.get("eval_sample_thread_s", 0.0)
    print(f"trained {res.steps} steps "
          f"({res.queries_per_sec:.0f} q/s/chip); "
          f"val history {[(d, round(m, 4)) for d, m in res.val_history]}",
          flush=True)

    best = res.best_params
    val_auc = eval_auc(cfg, best, graph.schema, val, seed=3)
    val_hard = eval_auc(cfg, best, graph.schema, val, seed=3, hard=True)
    val_apr = eval_apr(cfg, best, graph.schema, val, max_negs=50)
    test_auc = eval_auc(cfg, best, graph.schema, test, seed=3)

    r = lambda d: {k: round(v, 4) for k, v in d.items()}
    report = {
        "dataset": f"{args.dataset}-synth-paperscale",
        "graph": {"nodes": graph.schema.n_nodes, "edges": graph.num_edges(),
                  "held_out_edges": len(held), "scale": args.scale,
                  "avg_degree": args.avg_degree},
        "config": {"projection": cfg.projection, "d": cfg.embed_dim,
                   "batch": cfg.batch_size, "lr": cfg.lr,
                   "steps": res.steps, "burn_in": res.burn_in_steps,
                   "n_train_1p": n_1p,
                   "n_train_per_other_structure": args.n_inter,
                   "hard_neg_frac": args.hard_frac,
                   "pool_width": args.pool_width,
                   "compute_dtype": cfg.compute_dtype,
                   "storage_dtype": cfg.storage_dtype},
        "train_queries_per_sec_per_chip": round(res.queries_per_sec, 1),
        "phase_timings_s": {k: round(v, 1)
                            for k, v in (res.timings or {}).items()},
        "val_auc": r(val_auc), "val_auc_hard": r(val_hard),
        "val_apr": r(val_apr), "clean_test_auc": r(test_auc),
        "pool_build_s": round(t_pools, 1),
        "pool_timings": timings,
        "eval_sample_s": round(t_eval_sample, 1),
        "eval_sample_exposed_wait_s": round(
            (res.timings or {}).get("val_wait_s", 0.0), 1),
        "wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(report, indent=2), flush=True)

    rows = "\n".join(
        f"| {st} | {val_auc.get(st, float('nan')):.3f} "
        f"| {val_hard.get(st, float('nan')):.3f} "
        f"| {val_apr.get(st, float('nan')):.3f} "
        f"| {test_auc.get(st, float('nan')):.3f} |"
        for st in (*STRUCTURES, "macro"))
    md = f"""# RESULTS — paper-scale synthetic-{args.dataset} run (TPU v5e, 1 chip)

Full protocol with FULL 1p coverage: every one of the {n_1p} train edges is
a 1p query (C++ all-edges pool, exact negatives), {args.n_inter} queries per
other structure, all through the array fast path (no python Query objects on
the train side). Graph: {graph.schema.n_nodes} nodes /
{graph.num_edges()} directed edges, 10% held out; clean-test queries are
answerable only with held-out edges. bilinear/min, d=128, B=512,
{res.steps} steps (burn-in {res.burn_in_steps}), cosine lr {cfg.lr},
hard_neg_frac {args.hard_frac}, stored negative/hard pool width
{args.pool_width}, {cfg.compute_dtype} compute / {cfg.storage_dtype}
storage.

| structure | val AUC | val AUC (hard neg) | val APR | clean-test AUC |
|---|---|---|---|---|
{rows}

- sustained training throughput {res.queries_per_sec:.0f} queries/s/chip
- pool build: 1p (all edges, threaded C++) {timings['pool_1p_s']}s; non-1p
  pools done at {t_pools:.0f}s, overlapped with device burn-in — the
  multitask phase waited only {timings.get('pool_join_wait_s', 0.0)}s on
  them; val/clean-test sampling {t_eval_sample:.0f}s on a host thread
  OVERLAPPED with burn-in (exposed wait
  {report['eval_sample_exposed_wait_s']}s); total wall {report['wall_s']}s
{"- round-1 comparison (20k 1p queries instead of %d): val macro 0.629,"
 "\n  clean-test macro 0.556 — the coverage fix is the delta" % n_1p
 if args.dataset == "bio" else
 "- small-scale comparison (RESULTS_reddit.md, round 1: 136.9k queries"
 "\n  total): val macro 0.719 — this run is the paper-scale recipe"
 " (all-edges 1p\n  coverage + 50k/structure) applied to reddit"}

Raw JSON: `{Path(args.out).with_suffix('.json').name}`.
"""
    Path(args.out).write_text(md)
    Path(args.out).with_suffix(".json").write_text(json.dumps(report, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
