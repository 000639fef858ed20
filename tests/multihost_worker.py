"""Worker for test_multihost.py: one of N CPU processes in a real
jax.distributed cluster. Usage:
  python multihost_worker.py <process_id> <num_processes> <coordinator>

Each process exposes 4 virtual CPU devices (XLA_FLAGS set by the launcher),
so 2 processes form an 8-device global mesh. Exercises
initialize_multihost + global_batch_from_local + one sharded train step."""

import sys


def main():
    pid, nproc, addr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    import jax
    import numpy as np
    import optax
    from jax.sharding import Mesh, PartitionSpec as P

    from graphqembed_tpu.parallel.multihost import (
        global_batch_from_local,
        initialize_multihost,
    )

    info = initialize_multihost(coordinator_address=addr,
                                num_processes=nproc, process_id=pid)
    assert info["process_count"] == nproc, info
    assert info["process_index"] == pid, info
    n_local = info["local_devices"]
    n_global = info["global_devices"]
    assert n_global == nproc * n_local, info

    mesh = Mesh(np.array(jax.devices()), ("data",))

    # global batch assembly: each process contributes its local rows
    b_global = 2 * n_global
    per_proc = b_global // nproc
    local = (np.arange(per_proc, dtype=np.float32)
             + pid * per_proc).reshape(per_proc)
    gbatch = global_batch_from_local(mesh, local)
    assert gbatch.shape == (b_global,), gbatch.shape
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=jax.NamedSharding(mesh, P()))(gbatch)
    want = b_global * (b_global - 1) / 2.0
    assert float(total) == want, (float(total), want)

    # one sharded train step over the cross-process mesh
    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.parallel import make_sharded_train_step, shard_params
    from graphqembed_tpu.training import TrainData

    graph = synthetic_graph(seed=0, scale=0.2, avg_degree=5.0)
    cfg = GQEConfig(embed_dim=16, projection="bilinear",
                    batch_size=b_global)
    # identical seeded init on every process -> device_put to the global
    # sharding is well-defined
    params = shard_params(init_params(cfg, graph.schema, jax.random.key(0)),
                          mesh)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    step = make_sharded_train_step(cfg, optimizer, mesh, params)

    data = TrainData(graph.schema, QuerySampler(
        graph, np.random.default_rng(0), max_negs=10).sample_many("2i", 60),
        batch_size=b_global, seed=0)
    rels, anchors, targets, negs, row_mask, im = data.sample_batch("2i")
    # per-host input shards, assembled into global arrays
    lo, hi = pid * per_proc, (pid + 1) * per_proc
    anchors_g = global_batch_from_local(mesh, anchors[lo:hi],
                                        P("data", None))
    targets_g = global_batch_from_local(mesh, targets[lo:hi], P("data"))
    negs_g = global_batch_from_local(mesh, negs[lo:hi], P("data"))
    mask_g = global_batch_from_local(mesh, row_mask[lo:hi], P("data"))
    params, opt_state, loss = step(params, opt_state, "2i", rels, anchors_g,
                                   targets_g, negs_g, mask_g, im, 1.0)
    loss = float(loss)
    assert np.isfinite(loss), loss

    # --- explicit shard_map collectives ACROSS the process boundary ---
    # GSPMD and shard_map lower differently over multi-process meshes; the
    # owner-compute all_to_all route (parallel/gather.py) and the sharded
    # SAGE step (parallel/deep.py) must be exercised here too, not only on
    # the single-process 8-device mesh.
    from jax.sharding import NamedSharding

    from graphqembed_tpu.parallel.gather import sharded_gather

    n_rows = 4 * n_global
    d = 8
    tbl = (np.arange(n_rows, dtype=np.float32)[:, None]
           * np.ones((1, d), np.float32))
    tbl_g = jax.device_put(tbl, NamedSharding(mesh, P("data", None)))
    ids = np.arange(n_global, dtype=np.int32)[::-1] * 2  # cross-shard ids
    ids_g = jax.device_put(ids, NamedSharding(mesh, P("data")))
    rows = jax.jit(
        lambda t, i: sharded_gather(mesh, t, i),
        out_shardings=NamedSharding(mesh, P()),
    )(tbl_g, ids_g)
    np.testing.assert_array_equal(np.asarray(rows), tbl[ids])

    # one sharded depth-1 SAGE train step (batched one-exchange-per-hop)
    import dataclasses

    from graphqembed_tpu.models.encoders import NeighborTables
    from graphqembed_tpu.parallel.deep import (
        ShardedNeighborTables,
        make_sharded_deep_train_step,
    )

    cfg_d = dataclasses.replace(cfg, depth=1, projection="transe")
    params_d = shard_params(
        init_params(cfg_d, graph.schema, jax.random.key(1)), mesh)
    opt_d = optax.adam(cfg_d.lr)
    opt_state_d = opt_d.init(params_d)
    st = ShardedNeighborTables.build(
        mesh, NeighborTables.build(graph, sample_size=4, seed=0))
    deep_step = make_sharded_deep_train_step(cfg_d, opt_d, mesh, st)
    qs1p = QuerySampler(graph, np.random.default_rng(1),
                        max_negs=10).sample_many("1p", 40)
    data1p = TrainData(graph.schema, qs1p, batch_size=b_global, seed=0)
    rels1, anchors1, targets1, negs1, mask1, im1 = data1p.sample_batch("1p")
    anchors1_g = global_batch_from_local(mesh, anchors1[lo:hi], P("data", None))
    targets1_g = global_batch_from_local(mesh, targets1[lo:hi], P("data"))
    negs1_g = global_batch_from_local(mesh, negs1[lo:hi], P("data"))
    rep = NamedSharding(mesh, P())
    # replicated global arrays (plain jnp arrays are process-local and can't
    # mix with global arrays in a multi-process jit)
    rels_rows = jax.device_put(
        np.ascontiguousarray(np.broadcast_to(
            np.asarray(rels1)[None, :], (b_global, len(rels1)))), rep)
    modes_rows = jax.device_put(np.full((b_global,), int(im1), np.int32),
                                rep)
    params_d, opt_state_d, loss_d = deep_step(
        params_d, opt_state_d, "1p", anchors1_g, rels_rows, modes_rows,
        targets1_g, negs1_g)
    loss_d = float(loss_d)
    assert np.isfinite(loss_d), loss_d

    print(f"MULTIHOST_OK pid={pid} procs={info['process_count']} "
          f"devices={n_global} loss={loss:.6f} deep_loss={loss_d:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
