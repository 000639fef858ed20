"""Device-resident pipeline tests: per-row model path matches the per-formula
path bitwise on a single-formula batch; the scan mega-step trains (loss
decreases, params finite) and respects hard-negative alternation plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphqembed_tpu.config import STRUCTURES, GQEConfig
from graphqembed_tpu.data.queries import group_by_formula, make_batch
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models import gqe
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.training.device_data import (
    DeviceTrainData,
    make_multitask_mega_step,
    make_scan_train_step,
    run_train_device,
)


@pytest.mark.parametrize("structure", STRUCTURES)
def test_rows_path_matches_formula_path(graph, structure):
    cfg = GQEConfig(embed_dim=32, projection="bilinear", intersection="min")
    params = init_params(cfg, graph.schema, jax.random.key(0))
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=10)
    groups = group_by_formula(s.sample_many(structure, 40))
    qs = max(groups.values(), key=len)
    b = make_batch(graph.schema, qs, batch_size=len(qs), neg_width=1)

    q_formula = gqe.embed_query(cfg, params, structure, b.anchors, b.rels,
                                np.int32(b.inter_mode_id))
    rels_rows = np.tile(b.rels[None, :], (len(qs), 1))
    modes_rows = np.full(len(qs), b.inter_mode_id, np.int32)
    q_rows = gqe.embed_query_rows(cfg, params, structure, b.anchors,
                                  rels_rows, modes_rows)
    np.testing.assert_allclose(np.asarray(q_formula), np.asarray(q_rows),
                               rtol=1e-6, atol=1e-7)


def test_scan_step_trains(graph):
    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    lr=0.05, seed=0)
    s = QuerySampler(graph, np.random.default_rng(1), max_negs=10)
    queries = s.sample_many("1p", 400)
    data = DeviceTrainData(graph.schema, queries)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    scan = make_scan_train_step(cfg, optimizer)
    key = jax.random.key(0)
    params, opt_state, l0 = scan(params, opt_state, data.pools["1p"], "1p",
                                 key, 10, 1.0, False)
    for i in range(5):
        params, opt_state, l1 = scan(params, opt_state, data.pools["1p"], "1p",
                                     jax.random.fold_in(key, i), 50, 1.0, False)
    assert float(l1) < 0.6 * float(l0), (float(l0), float(l1))
    assert np.isfinite(np.asarray(params["table"])).all()


def test_mega_step_matches_sequential(graph):
    """One multitask mega-dispatch is bitwise-equal to the equivalent
    sequence of single-structure scan dispatches (same key discipline)."""
    from graphqembed_tpu.config import INTERSECT_STRUCTURES
    from graphqembed_tpu.training.loop import structure_weight

    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=32,
                    lr=0.03, seed=0)
    s = QuerySampler(graph, np.random.default_rng(3), max_negs=10)
    queries = []
    for st in STRUCTURES:
        queries += s.sample_many(st, 60)
    data = DeviceTrainData(graph.schema, queries)
    optimizer = optax.adam(cfg.lr)
    key = jax.random.key(7)
    n_rounds, steps_per = 2, 5

    p1 = init_params(cfg, graph.schema, jax.random.key(2))
    o1 = optimizer.init(p1)
    mega = make_multitask_mega_step(cfg, optimizer, data)
    p1, o1, losses = mega(p1, o1, key, n_rounds, steps_per)
    assert losses.shape == (n_rounds, len(data.structures))

    p2 = init_params(cfg, graph.schema, jax.random.key(2))
    o2 = optimizer.init(p2)
    scan = make_scan_train_step(cfg, optimizer)
    seq_losses = np.zeros((n_rounds, len(data.structures)), np.float32)
    for r in range(n_rounds):
        kr = jax.random.fold_in(key, r)
        for si, st in enumerate(data.structures):
            p2, o2, ml = scan(
                p2, o2, data.pools[st], st, jax.random.fold_in(kr, si),
                steps_per, structure_weight(cfg, st),
                st in INTERSECT_STRUCTURES and cfg.hard_neg_alternate)
            seq_losses[r, si] = float(ml)

    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(losses), seq_losses)


def test_run_train_device_multitask(graph):
    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=64,
                    lr=0.03, seed=0)
    s = QuerySampler(graph, np.random.default_rng(2), max_negs=10)
    queries = []
    for st in STRUCTURES:
        queries += s.sample_many(st, 80)
    data = DeviceTrainData(graph.schema, queries)
    params = init_params(cfg, graph.schema, jax.random.key(1))
    params, opt_state, losses = run_train_device(
        cfg, graph.schema, params, data, total_steps=350, burn_in_steps=100,
        chunk=50)
    assert set(losses) == set(STRUCTURES)
    assert all(np.isfinite(v).all() for v in losses.values() if v)
    # burn-in chunks trained 1p only: first two chunks are 1p
    assert len(losses["1p"]) >= 2


def test_run_train_device_mega(graph):
    """High-level mega-dispatch driver: burn-in + multitask + best-val
    selection returns a TrainResult with sane fields and finite params."""
    from graphqembed_tpu.training.device_data import run_train_device_mega

    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=64,
                    lr=0.03, seed=0, max_iter=400, max_burn_in=100,
                    val_every=150)
    s = QuerySampler(graph, np.random.default_rng(4), max_negs=10)
    train, val = [], []
    for st in STRUCTURES:
        qs = s.sample_many(st, 100)
        train += qs[:80]
        val += qs[80:]
    data = DeviceTrainData(graph.schema, train)
    params = init_params(cfg, graph.schema, jax.random.key(2))
    res = run_train_device_mega(cfg, graph.schema, params, data,
                                val_queries=val, steps_per=10)
    assert res.steps >= cfg.max_iter
    assert res.burn_in_steps == 100
    assert res.best_val_auc > 0
    assert res.val_history
    assert set(res.losses) == set(STRUCTURES)
    for leaf in jax.tree.leaves(res.best_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_run_train_device_mega_resume_bitwise(graph, tmp_path):
    """Kill-free resume determinism: a run checkpointed at a dispatch
    boundary and resumed to completion ends with BITWISE-identical params to
    the uninterrupted run — batch selection is counter-based
    (fold_in(key, dispatch_i)), and dispatch_i/done are in the checkpoint."""
    from graphqembed_tpu.training.checkpoint import CheckpointManager
    from graphqembed_tpu.training.device_data import run_train_device_mega

    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                    lr=0.03, seed=0, val_every=30, tol=0.0,
                    conv_window=10**6)
    s = QuerySampler(graph, np.random.default_rng(5), max_negs=10)
    train = s.sample_many("1p", 80) + s.sample_many("2i", 80)
    data = DeviceTrainData(graph.schema, train)
    p0 = init_params(cfg, graph.schema, jax.random.key(3))

    res_full = run_train_device_mega(
        cfg, graph.schema, jax.tree.map(lambda x: x.copy(), p0), data,
        total_steps=100, burn_in_steps=20, steps_per=10)

    mgr = CheckpointManager(tmp_path / "ckpts", keep=3)
    run_train_device_mega(
        cfg, graph.schema, jax.tree.map(lambda x: x.copy(), p0), data,
        total_steps=60, burn_in_steps=20, steps_per=10,
        ckpt_manager=mgr, ckpt_every=20)
    res_resumed = run_train_device_mega(
        cfg, graph.schema, jax.tree.map(lambda x: x.copy(), p0), data,
        total_steps=100, burn_in_steps=20, steps_per=10,
        ckpt_manager=mgr, ckpt_every=10**9, resume=True)

    assert res_full.steps == res_resumed.steps == 100
    for a, b in zip(jax.tree.leaves(res_full.params),
                    jax.tree.leaves(res_resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_train_device_mega_convergence_stops(graph):
    """tol=inf makes check_conv fire as soon as the windowed series exists:
    both burn-in and multitask must stop far short of their budgets."""
    from graphqembed_tpu.training.device_data import run_train_device_mega

    # conv is checked at dispatch boundaries, whose size follows val_every —
    # so use a realistic cadence (val_every=1e9 would mean "never sync",
    # which legitimately runs each phase as one dispatch)
    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                    lr=0.03, seed=0, val_every=40, tol=1e9,
                    conv_window=20)
    s = QuerySampler(graph, np.random.default_rng(6), max_negs=10)
    train = s.sample_many("1p", 80) + s.sample_many("2i", 80)
    data = DeviceTrainData(graph.schema, train)
    params = init_params(cfg, graph.schema, jax.random.key(3))
    res = run_train_device_mega(cfg, graph.schema, params, data,
                                total_steps=100_000, burn_in_steps=50_000,
                                steps_per=10)
    # window = 2 rounds -> burn-in stops once 4+ rounds of history exist;
    # multitask stops after 2 dispatches of history
    assert res.burn_in_steps <= 100, res.burn_in_steps
    assert res.steps < 2000, res.steps


def test_run_train_device_mega_depth1(graph):
    """depth>0 SAGE encoder inside the scan mega-step: trains, loss drops,
    result finite — the neighbor tables ride as jit arguments."""
    from graphqembed_tpu.models.encoders import NeighborTables
    from graphqembed_tpu.training.device_data import run_train_device_mega

    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                    lr=0.05, seed=0, depth=1, val_every=10**9, tol=0.0,
                    conv_window=10**6)
    tables = NeighborTables.build(graph, sample_size=4, seed=0)
    s = QuerySampler(graph, np.random.default_rng(7), max_negs=10)
    train = s.sample_many("1p", 200)
    data = DeviceTrainData(graph.schema, train)
    params = init_params(cfg, graph.schema, jax.random.key(4))
    assert "encoder" in params
    res = run_train_device_mega(cfg, graph.schema, params, data,
                                total_steps=200, burn_in_steps=200,
                                steps_per=20, neighbor_tables=tables)
    series = res.losses["1p"]
    assert len(series) >= 4
    assert series[-1] < 0.8 * series[0], series
    for leaf in jax.tree.leaves(res.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_run_train_device_mega_deferred_pools(graph):
    """deferred_pools: burn-in trains on 1p only; the callable is invoked
    AFTER burn-in and its pools join the multitask phase (the overlap hook
    for host pool-building during device burn-in). The callable must not
    fire before burn-in completes."""
    from graphqembed_tpu.training.device_data import (
        DevicePool,
        run_train_device_mega,
    )

    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                    lr=0.05, seed=0, val_every=10**9, tol=0.0,
                    conv_window=10**6)
    s = QuerySampler(graph, np.random.default_rng(7), max_negs=10)
    data = DeviceTrainData(graph.schema, s.sample_many("1p", 200))
    fired = {"n": 0}

    def deferred():
        fired["n"] += 1
        return {"2i": DevicePool(graph.schema, "2i",
                                 s.sample_many("2i", 150))}

    params = init_params(cfg, graph.schema, jax.random.key(4))
    res = run_train_device_mega(cfg, graph.schema, params, data,
                                total_steps=400, burn_in_steps=200,
                                steps_per=20, deferred_pools=deferred)
    assert fired["n"] == 1
    assert res.burn_in_steps == 200
    assert res.steps >= 400
    assert len(res.losses["2i"]) > 0          # multitask trained the merged pool
    assert len(res.losses["1p"]) > len(res.losses["2i"])  # 1p also in burn-in
    for leaf in jax.tree.leaves(res.params):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("structure", ["1p", "3p", "3i", "ip", "pi"])
def test_onegather_loss_matches_margin_loss_rows(graph, structure):
    """margin_loss_rows_onegather (single fused table gather; one dense
    scatter in backward) must match margin_loss_rows in VALUE and GRADIENTS —
    same math, different autodiff shape."""
    from graphqembed_tpu.models import gqe

    cfg = GQEConfig(embed_dim=16, projection="bilinear", batch_size=24,
                    seed=0)
    s = QuerySampler(graph, np.random.default_rng(3), max_negs=10)
    pool = DeviceTrainData(graph.schema, s.sample_many(structure, 60)
                           ).pools[structure]
    params = init_params(cfg, graph.schema, jax.random.key(2))
    idx = jnp.arange(24)
    neg = pool.negs[idx][:, 0]
    mask = jnp.ones(24, bool)
    args = (pool.anchors[idx], pool.rels[idx], pool.inter_modes[idx],
            pool.targets[idx], neg, mask)

    l1, g1 = jax.value_and_grad(
        lambda p: gqe.margin_loss_rows(cfg, p, structure, *args))(params)
    l2, g2 = jax.value_and_grad(
        lambda p: gqe.margin_loss_rows_onegather(cfg, p, structure, *args)
    )(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g1, g2)


def test_hard_neg_frac_schedule(graph):
    """hard_neg_frac: 0.5 preserves strict parity alternation bit-for-bit;
    1.0 draws hard every step (verified by pool-distinguishability: give
    each query disjoint plain/hard pools and check the sampled negative's
    provenance through the loss path is consistent — here via the schedule
    helper directly plus an e2e train sanity)."""
    import dataclasses

    from graphqembed_tpu.training.device_data import _hard_step

    cfg = GQEConfig(embed_dim=16)
    assert [bool(_hard_step(cfg, t)) for t in range(6)] == \
        [False, True, False, True, False, True]
    cfg1 = dataclasses.replace(cfg, hard_neg_frac=1.0)
    assert all(bool(_hard_step(cfg1, t)) for t in range(16))
    cfg0 = dataclasses.replace(cfg, hard_neg_frac=0.0)
    assert not any(bool(_hard_step(cfg0, t)) for t in range(16))
    cfg75 = dataclasses.replace(cfg, hard_neg_frac=0.75)
    pat = [bool(_hard_step(cfg75, t)) for t in range(8)]
    assert sum(pat) == 6

    # e2e: frac=1.0 trains finite on an intersection structure
    cfg_t = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                      lr=0.05, hard_neg_frac=1.0)
    s = QuerySampler(graph, np.random.default_rng(1), max_negs=10)
    data = DeviceTrainData(graph.schema, s.sample_many("2i", 200))
    params = init_params(cfg_t, graph.schema, jax.random.key(0))
    opt = optax.adam(cfg_t.lr)
    scan = make_scan_train_step(cfg_t, opt)
    params, _, loss = scan(params, opt.init(params), data.pools["2i"], "2i",
                           jax.random.key(1), 30, 1.0, True)
    assert np.isfinite(float(loss))


def test_run_train_device_mega_deferred_val_queries(graph):
    """val_queries as a CALLABLE (r05: eval-set sampling overlapped with
    burn-in): resolved lazily at the first eval boundary — not during
    burn-in — invoked exactly once, and the run evaluates normally
    (val_history populated, timings record the join wait)."""
    from graphqembed_tpu.training.device_data import run_train_device_mega

    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                    lr=0.05, seed=0, val_every=100, tol=0.0,
                    conv_window=10**6)
    s = QuerySampler(graph, np.random.default_rng(9), max_negs=10)
    data = DeviceTrainData(graph.schema,
                           s.sample_many("1p", 200) + s.sample_many("2i", 150))
    sv = QuerySampler(graph, np.random.default_rng(10), max_negs=10)
    called = {"n": 0}

    def val_fn():
        called["n"] += 1
        return sv.sample_many("1p", 40) + sv.sample_many("2i", 40)

    params = init_params(cfg, graph.schema, jax.random.key(5))
    res = run_train_device_mega(cfg, graph.schema, params, data,
                                total_steps=300, burn_in_steps=100,
                                steps_per=20, val_queries=val_fn)
    assert called["n"] == 1
    assert len(res.val_history) >= 1
    assert res.best_val_auc > 0
    assert "val_wait_s" in (res.timings or {})
