"""Evaluation CLI: load a checkpoint + test queries, report AUC (one_neg and
hard-neg) and APR (full_neg) per structure [SURVEY.md §2.6]."""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser("gqe-eval")
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--split", type=str, default="test_queries")
    p.add_argument("--max_negs", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.loader import import_reference_graph, load_queries
    from graphqembed_tpu.training import eval_apr, eval_auc
    from graphqembed_tpu.training.checkpoint import load_checkpoint

    model_dir = Path(args.model_dir)
    cfg = GQEConfig.from_json((model_dir / "config.json").read_text())
    state, meta = load_checkpoint(model_dir / "best")
    params = state["params"]
    d = Path(args.data_dir)
    graph = import_reference_graph(d / "graph_data.pkl")
    queries = load_queries(d / args.split)

    out = {
        "step": meta.get("step"),
        "auc": eval_auc(cfg, params, graph.schema, queries, seed=args.seed),
        "auc_hard": eval_auc(cfg, params, graph.schema, queries,
                             seed=args.seed, hard=True),
        "apr": eval_apr(cfg, params, graph.schema, queries,
                        max_negs=args.max_negs or cfg.max_eval_negs),
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
