"""Query-sampling CLI — the reference's per-dataset sampling scripts
[R: netquery/bio sampling scripts (conf=L), SURVEY.md §4.3]: drives the
fork-parallel sampler over a graph (synthetic or imported) and writes native
query sets (train / val / test with clean-query filtering and exhaustive
negatives for the test full_neg split)."""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("gqe-sample")
    p.add_argument("--data_dir", type=str, default=None,
                   help="dir with reference graph_data.pkl; default: synthetic")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--synthetic_scale", type=float, default=1.0)
    p.add_argument("--dataset", type=str, default="bio",
                   choices=["bio", "reddit", "bio-latent"])
    p.add_argument("--n_train", type=int, default=2000, help="per structure")
    p.add_argument("--n_val", type=int, default=200)
    p.add_argument("--n_test", type=int, default=200)
    p.add_argument("--holdout_frac", type=float, default=0.1)
    p.add_argument("--max_negs", type=int, default=100)
    p.add_argument("--n_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--structures", type=str, default="all")
    p.add_argument("--native", action="store_true",
                   help="sample the TRAIN set with the C++ sampler and "
                        "write mixed-formula npz shards directly "
                        "(save_query_arrays) — the beyond-RAM producer: "
                        "~100x the python sampler, queries never transit "
                        "python objects. val/test also use the native "
                        "samplers (clean-test filtering and exhaustive "
                        "negatives are preserved in C++).")
    args = p.parse_args(argv)

    from graphqembed_tpu.config import STRUCTURES
    from graphqembed_tpu.data.loader import (
        export_reference_pickle,
        import_reference_graph,
        save_queries,
        save_query_arrays,
    )
    from graphqembed_tpu.data.sampling import QuerySampler, parallel_sample
    from graphqembed_tpu.graph.synthetic import (
        holdout_edges,
        reddit_graph,
        synthetic_graph,
        synthetic_graph_latent,
    )

    structures = (list(STRUCTURES) if args.structures == "all"
                  else args.structures.split(","))
    if args.data_dir:
        graph = import_reference_graph(Path(args.data_dir) / "graph_data.pkl")
    else:
        gen = {"reddit": reddit_graph, "bio": synthetic_graph,
               "bio-latent": synthetic_graph_latent}[args.dataset]
        graph = gen(seed=args.seed, scale=args.synthetic_scale,
                    avg_degree=8.0)
    train_graph, held = holdout_edges(graph, args.holdout_frac, args.seed)
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    export_reference_pickle(train_graph, out / "graph_data.pkl")

    t0 = time.perf_counter()
    n_train_total = 0
    if args.native:
        from graphqembed_tpu.native.binding import native_sample_arrays

        arrs = []
        for si, st in enumerate(structures):
            a = native_sample_arrays(train_graph, st, args.n_train,
                                     seed=args.seed * 1000 + si,
                                     max_negs=args.max_negs)
            if a is None:
                raise SystemExit("--native: C++ sampler unavailable "
                                 "(build failed?); rerun without --native")
            arrs.append(a)
            n_train_total += len(a["targets"])
            print(f"{st}: native-sampled {len(a['targets'])} "
                  f"(t={time.perf_counter() - t0:.1f}s)")
        save_query_arrays(out / "train_queries", graph.schema, arrs)
    train, val, test = [], [], []
    for si, st in enumerate(structures):
        # train/val: sampled on the TRAIN graph (no leakage of held-out edges)
        if not args.native:
            train += parallel_sample(train_graph, st, args.n_train,
                                     n_workers=args.n_workers, seed=args.seed,
                                     max_negs=args.max_negs)
        if args.native:
            from graphqembed_tpu.native import (
                native_sample_clean_many,
                native_sample_many,
            )
            # val/test seeds live in a space DISJOINT from the per-structure
            # train seeds (args.seed*1000 + si, si < 7): reusing a train
            # seed on the same graph with the same deterministic sampler
            # would make a val set an exact prefix of a train shard —
            # train/val leakage (ADVICE r04, medium).
            val += native_sample_many(train_graph, st, args.n_val,
                                      seed=args.seed * 1000 + 500 + si,
                                      max_negs=args.max_negs) or []
            test += native_sample_clean_many(
                graph, train_graph, st, args.n_test,
                seed=args.seed * 1000 + 800 + si,
                max_negs=args.max_negs, exhaustive_negs=True) or []
        else:
            sv = QuerySampler(train_graph,
                              np.random.default_rng(args.seed + 1),
                              max_negs=args.max_negs)
            val += sv.sample_many(st, args.n_val)
            # test: clean queries on the FULL graph (need ≥1 held-out
            # edge), exhaustive negatives for the full_neg/APR protocol
            stest = QuerySampler(graph, np.random.default_rng(args.seed + 2),
                                 max_negs=args.max_negs)
            test += stest.sample_many(st, args.n_test, exhaustive_negs=True,
                                      train_graph=train_graph)
        print(f"{st}: sampled (t={time.perf_counter() - t0:.1f}s)")
    if not args.native:
        save_queries(out / "train_queries", graph.schema, train)
        n_train_total = len(train)
    save_queries(out / "val_queries", graph.schema, val)
    save_queries(out / "test_queries", graph.schema, test)
    print(f"wrote {n_train_total} train / {len(val)} val / {len(test)} test "
          f"queries to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
