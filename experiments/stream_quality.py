"""Stream-vs-device QUALITY guard with a stream_reuse sweep (r05, VERDICT
r04 task 6): the windowed-HBM stream schedule differs semantically from the
device pipeline — a window is a shuffle buffer and each staged record is
consumed ~cfg.stream_reuse times before the window swaps — and
RESULTS_stream.md only reported throughput. This pins the AUC cost (or win)
of that schedule at matched budget on IDENTICAL train data.

Protocol: one native-sampled train set (all-edges 1p + n_inter per other
structure), written BOTH as device pools and as npz shards; the device mega
pipeline and the stream pipeline (reuse ∈ {2, 8, 32}) train the same step
budget with the bf16 flagship config and are scored on the same offline
exact-negative val queries. Writes the quality table into
RESULTS_stream_quality.{md,json} and the recommended default.

Run on the TPU chip: python experiments/stream_quality.py
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=12.0)
    ap.add_argument("--avg_degree", type=float, default=20.0)
    ap.add_argument("--n_inter", type=int, default=8000)
    ap.add_argument("--n_val", type=int, default=200)
    ap.add_argument("--steps", type=int, default=60_000)
    ap.add_argument("--burn_in", type=int, default=20_000)
    ap.add_argument("--reuse", type=str, default="2,8,32")
    ap.add_argument("--stream_window", type=int, default=16384)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import STRUCTURES, GQEConfig
    from graphqembed_tpu.data.loader import save_query_arrays
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.data.grain_pipeline import run_train_stream
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.native import native_all_edges_1p, native_sample_arrays
    from graphqembed_tpu.training import eval_apr, eval_auc
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        device_pool_from_arrays,
        run_train_device_mega,
    )

    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=0.03, seed=0,
                    val_every=max(1, args.steps // 5), tol=0.0,
                    conv_window=10**9, stream_window=args.stream_window,
                    compute_dtype="bfloat16", storage_dtype="bfloat16")
    graph = synthetic_graph(seed=0, scale=args.scale,
                            avg_degree=args.avg_degree)
    print(f"graph {graph.schema.n_nodes} nodes {graph.num_edges()} edges",
          flush=True)

    rng = np.random.default_rng(5)
    s_val = QuerySampler(graph, rng, max_negs=32)
    val = []
    for st in STRUCTURES:
        val += s_val.sample_many(st, args.n_val)

    # --- ONE train set, consumed by both pipelines ---
    arrs = [native_all_edges_1p(graph, max_negs=16, seed=11)]
    for si, st in enumerate(s for s in STRUCTURES if s != "1p"):
        arrs.append(native_sample_arrays(graph, st, args.n_inter,
                                         seed=100 + si, max_negs=16))
    pools = {a["structure"]: device_pool_from_arrays(graph.schema, a)
             for a in arrs}
    data = DeviceTrainData.from_pools(pools)
    tmp = tempfile.mkdtemp(prefix="stream_quality_")
    save_query_arrays(Path(tmp) / "train_queries", graph.schema, arrs)
    print(f"train set: {sum(len(a['targets']) for a in arrs)} queries "
          f"(shards in {tmp})", flush=True)

    results = {}

    def score(name, cfg_x, res, t0):
        best = res.best_params
        results[name] = {
            "val_auc": eval_auc(cfg_x, best, graph.schema, val, seed=3),
            "val_auc_hard": eval_auc(cfg_x, best, graph.schema, val, seed=3,
                                     hard=True),
            "val_apr": eval_apr(cfg_x, best, graph.schema, val, max_negs=32),
            "train_s": round(time.time() - t0, 1),
            "qps": round(res.queries_per_sec),
        }
        print(json.dumps({name: {k: (round(v["macro"], 4)
                                     if isinstance(v, dict) else v)
                                 for k, v in results[name].items()}}),
              flush=True)

    # --- device mega (the in-RAM reference schedule) ---
    params = init_params(cfg, graph.schema, jax.random.key(0))
    t0 = time.time()
    res = run_train_device_mega(cfg, graph.schema, params, data,
                                val_queries=val, total_steps=args.steps,
                                burn_in_steps=args.burn_in, steps_per=100)
    score("device", cfg, res, t0)

    # --- stream, reuse sweep ---
    for reuse in (float(x) for x in args.reuse.split(",")):
        cfg_r = dataclasses.replace(cfg, stream_reuse=reuse)
        params = init_params(cfg_r, graph.schema, jax.random.key(0))
        t0 = time.time()
        res = run_train_stream(cfg_r, graph.schema, params,
                               Path(tmp) / "train_queries",
                               val_queries=val, total_steps=args.steps,
                               burn_in_steps=args.burn_in)
        score(f"stream-reuse{reuse:g}", cfg_r, res, t0)

    r = lambda d: {k: round(v, 4) for k, v in d.items()}
    out = {name: {"val_auc": r(x["val_auc"]),
                  "val_auc_hard": r(x["val_auc_hard"]),
                  "val_apr": r(x["val_apr"]),
                  "train_s": x["train_s"], "qps": x["qps"]}
           for name, x in results.items()}
    Path("RESULTS_stream_quality.json").write_text(json.dumps(out, indent=1))
    rows = "\n".join(
        f"| {name} | {x['val_auc']['macro']:.4f} "
        f"| {x['val_auc_hard']['macro']:.4f} "
        f"| {x['val_apr']['macro']:.4f} | {x['qps']} |"
        for name, x in out.items())
    d = out["device"]
    deltas = "\n".join(
        f"| {name} − device | {x['val_auc']['macro']-d['val_auc']['macro']:+.4f} "
        f"| {x['val_auc_hard']['macro']-d['val_auc_hard']['macro']:+.4f} "
        f"| {x['val_apr']['macro']-d['val_apr']['macro']:+.4f} | |"
        for name, x in out.items() if name != "device")
    md = f"""# Stream schedule quality guard (round 5)

Matched-budget stream-vs-device at mid-scale (scale {args.scale}, degree
{args.avg_degree}; {args.steps} steps incl. {args.burn_in} burn-in; bf16
flagship config; IDENTICAL native-sampled train data — all-edges 1p +
{args.n_inter}/structure — and identical offline exact-negative val
queries; stream window {args.stream_window} records/structure). The
stream schedule is a windowed shuffle buffer: each staged record is
consumed ~stream_reuse times before the window swaps; this table prices
that semantic difference.

| pipeline | val macro AUC | hard-neg macro AUC | val macro APR | sustained q/s |
|---|---|---|---|---|
{rows}
{deltas}

Throughput context: RESULTS_stream.md (the windowed stream sustains
678-811k q/s beyond-RAM; this mid-scale guard's q/s includes compiles
and in-loop evals and is NOT the throughput headline).
"""
    Path("RESULTS_stream_quality.md").write_text(md)
    print("wrote RESULTS_stream_quality.md", flush=True)


if __name__ == "__main__":
    main()
