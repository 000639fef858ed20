"""Checkpoint/resume tests (SURVEY.md §6): save→restore round-trips params and
optimizer state; restart-from-latest resumes bit-identically (deterministic
data order from restored RNG state)."""

import jax
import numpy as np
import optax

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.training import TrainData, make_train_step
from graphqembed_tpu.training.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)


def _tree_allclose(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y), rtol=0, atol=0), a, b)


def test_save_load_roundtrip(graph, tmp_path):
    cfg = GQEConfig(embed_dim=16, projection="bilinear")
    params = init_params(cfg, graph.schema, jax.random.key(0))
    opt = optax.adam(0.01)
    opt_state = opt.init(params)
    save_checkpoint(tmp_path / "ck", params, step=7, opt_state=opt_state)
    state, meta = load_checkpoint(tmp_path / "ck")
    assert meta["step"] == 7
    _tree_allclose(state["params"], params)


def test_resume_bit_identical(graph, tmp_path):
    """Train 4 steps, checkpoint at 2, resume → steps 3-4 reproduce exactly."""
    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32, seed=0)
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=10)
    queries = s.sample_many("1p", 100)
    opt = optax.adam(cfg.lr)
    step = make_train_step(cfg, opt)

    def fresh():
        p = init_params(cfg, graph.schema, jax.random.key(0))
        return p, opt.init(p)

    mgr = CheckpointManager(tmp_path / "run", keep=2)
    params, opt_state = fresh()
    data = TrainData(graph.schema, queries, cfg.batch_size, seed=5)
    losses_a = []
    for i in range(4):
        if i == 2:
            mgr.save(i, params, opt_state, rng_state=data.rng)
        b = data.sample_batch("1p")
        params, opt_state, loss = step(params, opt_state, "1p", *b,
                                       np.float32(1.0))
        losses_a.append(float(loss))

    # restore WITH a target tree: optax opt-states are NamedTuples and orbax
    # needs the structure to rebuild them (plain-dict restore breaks .mu)
    fp, fo = fresh()
    restored = mgr.restore_latest(like={"params": fp, "opt_state": fo})
    assert restored is not None
    state, meta = restored
    assert meta["step"] == 2
    params2, opt2 = state["params"], state["opt_state"]
    data2 = TrainData(graph.schema, queries, cfg.batch_size, seed=5)
    data2.rng = meta["rng_state"]
    losses_b = []
    for i in range(2, 4):
        b = data2.sample_batch("1p")
        params2, opt2, loss = step(params2, opt2, "1p", *b, np.float32(1.0))
        losses_b.append(float(loss))
    np.testing.assert_array_equal(losses_a[2:], losses_b)
    _tree_allclose(params, params2)


def test_keep_limit(graph, tmp_path):
    cfg = GQEConfig(embed_dim=16)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    opt_state = optax.adam(0.01).init(params)
    mgr = CheckpointManager(tmp_path / "run", keep=2)
    for i in range(5):
        mgr.save(i, params, opt_state)
    dirs = sorted(d.name for d in (tmp_path / "run").iterdir())
    assert dirs == ["step_00000003", "step_00000004"]


def test_cross_mesh_shape_restore(graph, tmp_path):
    """SURVEY §6 checkpoint row: 'restores across different mesh shapes'.
    Save params trained on the 8-device mesh, restore onto 4-device and
    single-device meshes (and back up from 1 to 8), continue training on
    each, and assert the continued states agree — re-sharding is orbax's
    job given a `like` tree with the target shardings."""
    import jax.numpy as jnp

    from graphqembed_tpu.parallel.mesh import (
        make_mesh,
        param_shardings,
        pad_table_rows,
    )
    from graphqembed_tpu.parallel.train_step import (
        make_sharded_scan_train_step,
    )
    from graphqembed_tpu.training.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from graphqembed_tpu.training.device_data import DeviceTrainData

    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                    lr=0.05, seed=0)
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=10)
    data = DeviceTrainData(graph.schema, s.sample_many("1p", 200))
    pool = data.pools["1p"]

    def sharded(params, n_dev):
        mesh = make_mesh(n_dev)
        # pad for the LARGEST mesh so every topology sees the same shapes
        params, _ = pad_table_rows(params, 8)
        return mesh, jax.device_put(params, param_shardings(params, mesh))

    def train(mesh, params, n_steps, key_i):
        opt = optax.adam(cfg.lr)
        run = make_sharded_scan_train_step(cfg, opt, mesh)
        p, _, loss = run(params, opt.init(params), pool, "1p",
                         jax.random.key(key_i), n_steps, 1.0, False)
        return p, loss

    p0 = init_params(cfg, graph.schema, jax.random.key(1))
    mesh8, p8 = sharded(p0, 8)
    p8, _ = train(mesh8, p8, 10, 7)
    p8_host = jax.device_get(p8)   # train() donates its params argument
    save_checkpoint(tmp_path / "ck8", p8_host, step=10)

    # continue on the 8-mesh (the control)
    p8b, _ = train(mesh8, p8, 5, 9)
    control = jax.device_get(p8b)

    for n_dev in (4, 1):
        mesh_t = make_mesh(n_dev)
        shardings = param_shardings(p8_host, mesh_t)
        like = jax.tree.map(
            lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
            p8_host, shardings)
        state, meta = load_checkpoint(tmp_path / "ck8", like={"params": like})
        pr = state["params"]
        assert meta["step"] == 10
        # restored values match the saved ones exactly
        for a, b in zip(jax.tree.leaves(pr), jax.tree.leaves(p8_host)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # sharding landed on the target mesh
        assert pr["table"].sharding.mesh.devices.size == n_dev
        # continue training on the target mesh: same continuation as the
        # 8-mesh control (up to f32 psum reassociation across topologies)
        prb, _ = train(mesh_t, pr, 5, 9)
        for a, b in zip(jax.tree.leaves(jax.device_get(prb)),
                        jax.tree.leaves(control)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    # and back UP: save the single-device state, restore onto 8 devices
    save_checkpoint(tmp_path / "ck1", p8_host, step=10)
    shardings8 = param_shardings(p8_host, mesh8)
    like8 = jax.tree.map(
        lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
        p8_host, shardings8)
    state, _ = load_checkpoint(tmp_path / "ck1", like={"params": like8})
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(p8_host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert state["params"]["table"].sharding.mesh.devices.size == 8
