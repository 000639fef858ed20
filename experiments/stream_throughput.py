"""Stream throughput at the r05 default reuse (r05 follow-up to the
RESULTS_stream.md headline, which was measured at stream_reuse=8 before the
quality guard lowered the default to 2.0): same bench-scale workload, reuse
∈ {2, 8}, ≥2 runs each, median reported. Appends the row to
RESULTS_stream.md.

Run on the TPU chip: python experiments/stream_throughput.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_gqe_xla_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.grain_pipeline import run_train_stream
    from graphqembed_tpu.data.loader import save_query_arrays
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.native import native_all_edges_1p, native_sample_arrays

    cfg = GQEConfig(embed_dim=128, projection="bilinear", intersection="min",
                    batch_size=512, lr=0.01, seed=0, val_every=10**9,
                    tol=0.0, conv_window=10**9, stream_window=16384,
                    compute_dtype="bfloat16", storage_dtype="bfloat16")
    graph = synthetic_graph(seed=0, scale=40.0, avg_degree=10.0)
    arrs = [native_all_edges_1p(graph, cap=40000, max_negs=16, seed=1),
            native_sample_arrays(graph, "2p", 30000, seed=2, max_negs=16),
            native_sample_arrays(graph, "3i", 30000, seed=3, max_negs=16)]
    tmp = tempfile.mkdtemp(prefix="stream_tp_")
    save_query_arrays(Path(tmp) / "train_queries", graph.schema, arrs)
    print(f"dataset {sum(len(a['targets']) for a in arrs)} queries -> {tmp}",
          flush=True)

    out = {}
    for reuse in (2.0, 8.0):
        cfg_r = dataclasses.replace(cfg, stream_reuse=reuse)
        qps = []
        for run_i in range(2):
            params = init_params(cfg_r, graph.schema, jax.random.key(0))
            t0 = time.time()
            res = run_train_stream(cfg_r, graph.schema, params,
                                   Path(tmp) / "train_queries",
                                   total_steps=30000, burn_in_steps=5000,
                                   steps_per=100)
            qps.append(round(res.queries_per_sec))
            print(f"reuse {reuse:g} run {run_i}: {qps[-1]} q/s "
                  f"({time.time()-t0:.0f}s wall)", flush=True)
        out[f"reuse{reuse:g}"] = {"runs": qps,
                                  "median": int(np.median(qps))}
    print(json.dumps(out), flush=True)

    md = f"""
## r05 addendum: throughput at the quality-justified default (reuse 2)

The headline above was measured at stream_reuse=8, which the r05
matched-budget quality guard (RESULTS_stream_quality.md) showed costs
−0.081 val AUC at a fixed step budget; the default is now 2.0. Same
bench-scale workload re-measured (median of 2 runs each):
reuse 2 = **{out['reuse2']['median']}** q/s/chip (runs {out['reuse2']['runs']}),
reuse 8 = **{out['reuse8']['median']}** q/s/chip (runs {out['reuse8']['runs']}).
The reuse knob is the quality↔host-throughput tradeoff; pick by the
RESULTS_stream_quality.md price list.
"""
    with open("RESULTS_stream.md", "a") as f:
        f.write(md)
    print("appended to RESULTS_stream.md")


if __name__ == "__main__":
    main()
