"""Capacity-padding waste in the owner-compute gather (VERDICT r03 #8).

The padded all_to_all ships [D, C] id buckets + [D, C, d] row payloads per
device. This measures, at REALISTIC id skew (anchor/target/negative ids of
actual sampled query batches over the synthetic bio graph — preferential
attachment, so hub-heavy), how much of that payload is useful and how much
is dropped, per capacity factor:

  useful fraction  = sum_p min(count_p, C) / (D * C)
  dropped fraction = sum_p max(count_p - C, 0) / B

Run on the 8-virtual-device CPU mesh; cross-checks the analytic counts
against sharded_gather_with_overflow's psum'd drop counter. Prints one JSON
line per (distribution, factor).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax

    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.parallel.gather import (
        gather_capacity,
        sharded_gather_with_overflow,
    )
    from graphqembed_tpu.parallel.mesh import make_mesh

    graph = synthetic_graph(seed=0, scale=4.0, avg_degree=10.0)
    n_nodes = graph.schema.n_nodes
    d_mesh = 8
    b = 512
    rows_per_shard = -(-n_nodes // d_mesh)

    s = QuerySampler(graph, np.random.default_rng(0), max_negs=16)
    queries = s.sample_many("2i", 4000) + s.sample_many("3i", 4000)
    rng = np.random.default_rng(1)

    def query_ids_batch():
        qs = [queries[i] for i in rng.integers(0, len(queries), b)]
        ids = []
        for q in qs:
            ids.extend(q.anchors)
            ids.append(q.target)
            ids.append(int(rng.choice(q.neg_samples)))
        return np.asarray(rng.choice(ids, size=b), np.int32)

    dists = {
        "uniform": lambda: rng.integers(0, n_nodes, b).astype(np.int32),
        "query-ids (pref-attach skew)": query_ids_batch,
    }
    factors = [0.0, 1.0, 1.25, 1.5, 2.0, 4.0]
    n_batches = 200

    for name, draw in dists.items():
        batches = [draw() for _ in range(n_batches)]
        for f in factors:
            cap = gather_capacity(b, d_mesh, f)
            useful = dropped = 0
            for ids in batches:
                counts = np.bincount(ids // rows_per_shard, minlength=d_mesh)
                useful += np.minimum(counts, cap).sum()
                dropped += np.maximum(counts - cap, 0).sum()
            total_payload = n_batches * d_mesh * cap
            print(json.dumps({
                "dist": name, "capacity_factor": f, "capacity": cap,
                "payload_slots_per_dev": d_mesh * cap,
                "useful_frac": round(useful / total_payload, 4),
                "dropped_frac": round(dropped / (n_batches * b), 5),
            }), flush=True)

    # cross-check the drop counter against the real shard_map path
    mesh = make_mesh(8)
    table = jax.random.normal(jax.random.key(0),
                              (rows_per_shard * d_mesh, 8), jnp_dtype())
    ids_global = np.stack([dists["uniform"]() for _ in range(d_mesh)])
    for f in (1.0, 2.0):
        cap = gather_capacity(b, d_mesh, f)
        rows, overflow = sharded_gather_with_overflow(
            mesh, table, jax.numpy.asarray(ids_global.reshape(-1)),
            capacity_factor=f)
        expect = 0
        for dev in range(d_mesh):
            counts = np.bincount(ids_global[dev] // rows_per_shard,
                                 minlength=d_mesh)
            expect += np.maximum(counts - cap, 0).sum()
        print(json.dumps({"crosscheck_factor": f,
                          "overflow_reported": int(overflow),
                          "overflow_expected": int(expect)}), flush=True)


def jnp_dtype():
    import jax.numpy as jnp

    return jnp.float32


if __name__ == "__main__":
    main()
