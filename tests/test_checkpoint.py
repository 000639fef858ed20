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
