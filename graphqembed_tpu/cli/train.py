"""Training CLI — the reference's per-dataset train scripts, unified
[R: netquery/bio/train.py, netquery/reddit/train.py (conf=H), SURVEY.md §1 L6].

Reference flags preserved (--embed_dim --data_dir --lr --batch_size --max_iter
--max_burn_in --val_every --tol --decoder --inter_decoder ...); dataset comes
from --data_dir (native or reference-pickle format) or --synthetic for the
offline generator. The run config is frozen and serialized into --model_dir
so every run is reproducible from its saved config (SURVEY.md §6).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("gqe-train")
    p.add_argument("--data_dir", type=str, default=None,
                   help="dir with graph + query sets (native format), or a "
                        "reference graph_data.pkl directory")
    p.add_argument("--synthetic", action="store_true",
                   help="use the deterministic synthetic bio-schema KG")
    p.add_argument("--synthetic_scale", type=float, default=1.0)
    p.add_argument("--dataset", type=str, default="bio",
                   choices=["bio", "reddit", "bio-latent"],
                   help="synthetic schema family (the two paper benchmarks; "
                        "bio-latent plants recoverable community structure "
                        "— graph/synthetic.py::synthetic_graph_latent)")
    p.add_argument("--n_train_queries", type=int, default=2000,
                   help="per structure, when sampling on the fly (synthetic)")
    p.add_argument("--n_val_queries", type=int, default=200)
    p.add_argument("--embed_dim", type=int, default=128)
    p.add_argument("--decoder", type=str, default="bilinear",
                   choices=["bilinear", "transe", "distmult"])
    p.add_argument("--inter_decoder", type=str, default="min",
                   choices=["min", "mean"])
    p.add_argument("--simple_inter", action="store_true",
                   help="SimpleSetIntersection (no learned transforms)")
    p.add_argument("--depth", type=int, default=0,
                   help="0=direct embeddings; >0 SAGE-style deep encoder")
    p.add_argument("--aggregator", type=str, default="mean",
                   choices=["mean", "pool"])
    p.add_argument("--neighbor_samples", type=int, default=8,
                   help="sampled neighbors per relation for depth>0")
    p.add_argument("--opt", type=str, default="adam",
                   choices=["adam", "sgd"],
                   help="optimizer (the reference's --opt flag): adam "
                        "(default, the paper's choice) or sgd. "
                        "--storage_dtype bfloat16 requires adam (the "
                        "stochastic-rounding fused kernel implements the "
                        "Adam update)")
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--max_iter", type=int, default=10000)
    p.add_argument("--max_burn_in", type=int, default=2000)
    p.add_argument("--val_every", type=int, default=1000)
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--path_weight", type=float, default=0.01)
    p.add_argument("--inter_weight", type=float, default=0.005)
    p.add_argument("--hard_neg_frac", type=float, default=0.5,
                   help="fraction of intersection-structure steps drawing "
                        "HARD negatives in the device pipelines (0.5 = the "
                        "reference's strict alternation; host loop always "
                        "alternates strictly)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="MXU compute precision (bfloat16: ~1.5x, macro AUC "
                        "delta -0.0014 — RESULTS_bf16.md)")
    p.add_argument("--storage_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="table + Adam-moment storage (bfloat16 halves the "
                        "step's dominant HBM traffic via the stochastic-"
                        "rounding fused Adam — RESULTS_storage_bf16.md; "
                        "device/onthefly pipelines only)")
    p.add_argument("--bf16", action="store_true",
                   help="shorthand: bfloat16 compute AND storage (the "
                        "bench.py winning configuration)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_dir", type=str, default="runs/latest")
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--cpu", action="store_true", help="force JAX_PLATFORMS=cpu")
    p.add_argument("--pipeline", type=str, default="host",
                   choices=["host", "device", "stream", "onthefly"],
                   help="host: reference-schedule loop (per-formula "
                        "batches). device: device-resident mega-dispatch "
                        "pipeline — the fast production path; both support "
                        "convergence stopping, "
                        "checkpoints/--resume, and --depth > 0. stream: "
                        "beyond-RAM windowed HBM staging over the saved npz "
                        "shards in --data_dir (device mega schedule, "
                        "double-buffered host assembly; supports bf16 "
                        "storage and --depth > 0). "
                        "onthefly: pool-free — every batch is SAMPLED ON "
                        "DEVICE inside the compiled scan (all 7 structures; "
                        "type-range + partial-branch hard negatives); train "
                        "queries are never materialized")
    p.add_argument("--ckpt_every", type=int, default=0,
                   help="save full train state every N steps (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="restart from the latest checkpoint in model_dir")
    p.add_argument("--mesh", type=int, default=0,
                   help="devices in the DP mesh for the distributed trainer "
                        "(--pipeline device/onthefly): params row-sharded, "
                        "batches DP-split, collectives inserted by "
                        "XLA/GSPMD. 0 = auto (all visible devices when >1); "
                        "1 = force single-device")
    return p


def dispatch_steps_per(max_iter: int) -> int:
    """Dispatch granularity for the device/onthefly pipelines: 100
    steps/structure/round at production budgets, proportionally finer below
    max_iter=2000 so rounding whole segments to dispatch boundaries cannot
    overshoot a small budget by multiples. COUPLING, by design: eval,
    checkpoint, and convergence checks all quantize to this boundary — a
    checkpoint lands at the first boundary past each --ckpt_every multiple,
    and bitwise resume equality holds because the boundary sequence is a
    pure function of (max_iter, step counters), never wall-clock. Pinned by
    tests/test_cli.py::test_dispatch_steps_per."""
    return max(1, min(100, max_iter // 20))


def load_dataset(args, skip_train: bool = False):
    """skip_train=True (stream pipeline) leaves train queries on disk —
    the whole point of the beyond-RAM loader."""
    from graphqembed_tpu.data.loader import import_reference_graph, load_queries
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import reddit_graph, synthetic_graph
    from graphqembed_tpu.config import STRUCTURES

    if args.synthetic or args.data_dir is None:
        from graphqembed_tpu.graph.synthetic import synthetic_graph_latent
        gen = {"reddit": reddit_graph, "bio": synthetic_graph,
               "bio-latent": synthetic_graph_latent}[args.dataset]
        graph = gen(seed=args.seed, scale=args.synthetic_scale,
                    avg_degree=8.0)
        s = QuerySampler(graph, np.random.default_rng(args.seed), max_negs=50)
        train, val = [], []
        for st in STRUCTURES:
            qs = s.sample_many(st, args.n_train_queries + args.n_val_queries)
            train += qs[:args.n_train_queries]
            val += qs[args.n_train_queries:]
        return graph, train, val
    d = Path(args.data_dir)
    graph = import_reference_graph(d / "graph_data.pkl")
    train = [] if skip_train else load_queries(d / "train_queries")
    val = load_queries(d / "val_queries") if (d / "val_queries").exists() else None
    return graph, train, val


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.bf16:
        args.compute_dtype = args.storage_dtype = "bfloat16"
    if args.storage_dtype != "float32" and args.opt != "adam":
        raise SystemExit("--storage_dtype bfloat16 requires --opt adam "
                         "(the SR fused kernel is an Adam update)")
    if args.storage_dtype != "float32" and args.pipeline not in (
            "device", "onthefly", "stream"):
        raise SystemExit(
            "--storage_dtype bfloat16 needs the stochastic-rounding fused "
            "Adam, wired into --pipeline device, stream or onthefly (host "
            "uses plain optax Adam; see FusedAdamOpt docstring)")
    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training import eval_apr, eval_auc, run_train
    from graphqembed_tpu.training.checkpoint import (
        CheckpointManager,
        save_checkpoint,
    )

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        filename=args.log_dir and str(Path(args.log_dir) / "train.log"),
    )
    cfg = GQEConfig(
        embed_dim=args.embed_dim,
        projection=args.decoder,
        intersection=args.inter_decoder,
        learned_intersection=not args.simple_inter,
        depth=args.depth,
        aggregator=args.aggregator,
        lr=args.lr,
        batch_size=args.batch_size,
        max_iter=args.max_iter,
        max_burn_in=args.max_burn_in,
        val_every=args.val_every,
        tol=args.tol,
        path_weight=args.path_weight,
        inter_weight=args.inter_weight,
        hard_neg_frac=args.hard_neg_frac,
        compute_dtype=args.compute_dtype,
        storage_dtype=args.storage_dtype,
        seed=args.seed,
    )
    model_dir = Path(args.model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    (model_dir / "config.json").write_text(cfg.to_json())

    mesh = None
    n_mesh = args.mesh
    if n_mesh == 0 and args.pipeline in ("device", "onthefly") \
            and args.storage_dtype == "float32":
        # auto-mesh: all visible devices, shrunk to divide the batch (DP
        # splits the batch axis). bf16 storage stays single-device — its
        # stochastic-rounding Pallas optimizer is opaque to GSPMD.
        import math
        n_mesh = math.gcd(len(jax.devices()), args.batch_size)
    if n_mesh > 1:
        if args.pipeline not in ("device", "onthefly"):
            raise SystemExit("--mesh N>1 needs --pipeline device or onthefly "
                             "(the GSPMD mega-step pipelines)")
        if args.storage_dtype != "float32":
            raise SystemExit("--mesh N>1 requires --storage_dtype float32 "
                             "(FusedAdamOpt's Pallas kernels are opaque to "
                             "GSPMD; see make_multitask_mega_step)")
        if args.batch_size % n_mesh:
            raise SystemExit(f"--mesh {n_mesh} must divide --batch_size "
                             f"{args.batch_size} (DP splits the batch axis)")
        from graphqembed_tpu.parallel import make_mesh
        mesh = make_mesh(n_mesh)
        logging.info("distributed trainer: %d-device DP mesh, row-sharded "
                     "table", n_mesh)

    graph, train, val = load_dataset(args,
                                     skip_train=args.pipeline == "stream")
    logging.info("dataset: %d nodes, %d edges, %d train / %d val queries",
                 graph.schema.n_nodes, graph.num_edges(), len(train),
                 len(val or []))
    params = init_params(cfg, graph.schema, jax.random.key(cfg.seed))
    tables = None
    if cfg.depth > 0:
        from graphqembed_tpu.models.encoders import NeighborTables
        tables = NeighborTables.build(graph, sample_size=args.neighbor_samples,
                                      seed=cfg.seed)
    optimizer = None   # None = each driver's default (Adam; SR-fused for bf16)
    if args.opt == "sgd":
        import optax
        optimizer = optax.sgd(cfg.lr)
    mgr = None
    if args.ckpt_every or args.resume:
        mgr = CheckpointManager(model_dir / "ckpts", keep=3)
    from graphqembed_tpu.training.metrics import MetricsWriter
    writer = MetricsWriter(model_dir, tensorboard=True)
    if args.pipeline == "stream":
        if args.data_dir is None:
            raise SystemExit("--pipeline stream needs --data_dir with saved "
                             "npz query shards (gqe-sample output)")
        from graphqembed_tpu.data.grain_pipeline import run_train_stream
        res = run_train_stream(
            cfg, graph.schema, params, Path(args.data_dir) / "train_queries",
            val_queries=val, neighbor_tables=tables, ckpt_manager=mgr,
            ckpt_every=args.ckpt_every, resume=args.resume,
            optimizer=optimizer,
            log=lambda step, s, l: logging.info(
                "step %d [%s] loss %.4f", step, s, l))
    elif args.pipeline == "onthefly":
        from graphqembed_tpu.training.device_sampler import (
            DeviceGraph,
            run_train_onthefly,
        )
        dg = DeviceGraph.build(graph, sample_size=args.neighbor_samples,
                               seed=cfg.seed)
        steps_per = dispatch_steps_per(args.max_iter)
        res = run_train_onthefly(
            cfg, graph.schema, params, dg, val_queries=val,
            steps_per=steps_per, neighbor_tables=tables, ckpt_manager=mgr,
            ckpt_every=args.ckpt_every, resume=args.resume, mesh=mesh,
            optimizer=optimizer,
            log=lambda step, s, l: (
                logging.info("step %d [%s] loss %.4f", step, s, l),
                writer.write(step, **{f"loss/{s}": l}))[0])
    elif args.pipeline == "device":
        from graphqembed_tpu.training.device_data import (
            DeviceTrainData,
            run_train_device_mega,
        )
        data = DeviceTrainData(graph.schema, train)
        steps_per = dispatch_steps_per(args.max_iter)
        res = run_train_device_mega(
            cfg, graph.schema, params, data, val_queries=val,
            steps_per=steps_per, optimizer=optimizer,
            neighbor_tables=tables, ckpt_manager=mgr,
            ckpt_every=args.ckpt_every, resume=args.resume, mesh=mesh,
            log=lambda step, s, l: (
                logging.info("step %d [%s] loss %.4f", step, s, l),
                writer.write(step, **{f"loss/{s}": l}))[0])
    else:
        res = run_train(cfg, graph.schema, params, train, val_queries=val,
                        neighbor_tables=tables, ckpt_manager=mgr,
                        ckpt_every=args.ckpt_every, resume=args.resume,
                        metrics=writer, optimizer=optimizer)
    writer.close()

    metrics = {
        "steps": res.steps,
        "burn_in_steps": res.burn_in_steps,
        "best_val_auc": res.best_val_auc,
        "queries_per_sec": res.queries_per_sec,
    }
    if val:
        metrics["final_auc"] = eval_auc(cfg, res.best_params, graph.schema, val,
                                        seed=cfg.seed, neighbor_tables=tables)
        metrics["final_auc_hard"] = eval_auc(cfg, res.best_params, graph.schema,
                                             val, seed=cfg.seed, hard=True,
                                             neighbor_tables=tables)
        metrics["final_apr"] = eval_apr(cfg, res.best_params, graph.schema, val,
                                        max_negs=cfg.max_eval_negs,
                                        neighbor_tables=tables)
    (model_dir / "metrics.json").write_text(json.dumps(metrics, indent=2))
    save_checkpoint(model_dir / "best", res.best_params, step=res.steps)
    logging.info("done: %s", json.dumps(metrics))
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
