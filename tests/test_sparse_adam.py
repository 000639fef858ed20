"""Lazy sparse Adam tests: dedup correctness; single-step equivalence to
dense Adam on touched rows; lazy decay matches dense moment evolution for a
row touched, skipped, touched; sparse scan step trains."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.training.device_data import (
    DeviceTrainData,
    make_scan_train_step_sparse,
)
from graphqembed_tpu.training.sparse_adam import (
    LazyAdamState,
    dedup_row_grads,
    dense_adam_reference,
    init_lazy_adam,
    lazy_adam_update,
)


def test_dedup_row_grads():
    ids = jnp.array([5, 2, 5, 9, 2, 2], jnp.int32)
    g = jnp.arange(6, dtype=jnp.float32)[:, None] * jnp.ones((6, 4))
    uids, summed = dedup_row_grads(ids, g, n_rows=10)
    out = {int(u): s[0] for u, s in zip(np.asarray(uids), np.asarray(summed))
           if u < 10}
    assert out == {2: 1 + 4 + 5, 5: 0 + 2, 9: 3}


def test_single_step_matches_dense_adam():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    state = init_lazy_adam(table)
    ids = jnp.array([3, 7, 3], jnp.int32)
    g = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    new_table, new_state = lazy_adam_update(table, state, ids, g, lr=0.1)

    dense_g = jnp.zeros_like(table).at[ids].add(g)
    ref_table, ref_mu, ref_nu = dense_adam_reference(
        table, jnp.zeros_like(table), jnp.zeros_like(table), 1, dense_g, 0.1)
    # touched rows match dense adam exactly on the first step
    for r in (3, 7):
        np.testing.assert_allclose(np.asarray(new_table[r]),
                                   np.asarray(ref_table[r]), rtol=1e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(new_state.mu[r]),
                                   np.asarray(ref_mu[r]), rtol=1e-5, atol=2e-6)
    # untouched rows unchanged (this is the documented SparseAdam deviation)
    np.testing.assert_array_equal(np.asarray(new_table[0]), np.asarray(table[0]))


def test_lazy_decay_matches_dense_moments():
    """Touch row at t=1, skip t=2..4, touch at t=5: moments must equal the
    dense evolution (decay by beta^4 then update)."""
    d = 4
    table = jnp.ones((3, d))
    state = init_lazy_adam(table)
    g1 = jnp.ones((1, d))
    table, state = lazy_adam_update(table, state, jnp.array([1]), g1, lr=0.01)
    # three steps touching a different row (row 2)
    for _ in range(3):
        table, state = lazy_adam_update(table, state, jnp.array([2]),
                                        jnp.ones((1, d)), lr=0.01)
    g5 = 2 * jnp.ones((1, d))
    table, state = lazy_adam_update(table, state, jnp.array([1]), g5, lr=0.01)
    b1, b2 = 0.9, 0.999
    mu_expected = (b1 ** 4) * (0.1 * 1.0) + 0.1 * 2.0
    nu_expected = (b2 ** 4) * (0.001 * 1.0) + 0.001 * 4.0
    np.testing.assert_allclose(np.asarray(state.mu[1]), mu_expected, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.nu[1]), nu_expected, rtol=1e-3)
    assert int(state.count) == 5 and int(state.stamp[1]) == 5


def test_sparse_scan_step_trains(graph):
    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=64,
                    lr=0.03, seed=0)
    s = QuerySampler(graph, np.random.default_rng(1), max_negs=10)
    data = DeviceTrainData(graph.schema, s.sample_many("2i", 300))
    params = init_params(cfg, graph.schema, jax.random.key(0))
    table = params.pop("table")
    table_state = init_lazy_adam(table)
    opt = optax.adam(cfg.lr)
    opt_state = opt.init(params)
    scan = make_scan_train_step_sparse(cfg, opt)
    key = jax.random.key(0)
    params, table, table_state, opt_state, l0 = scan(
        params, table, table_state, opt_state, data.pools["2i"], "2i", key,
        10, 1.0, False)
    for i in range(6):
        params, table, table_state, opt_state, l1 = scan(
            params, table, table_state, opt_state, data.pools["2i"], "2i",
            jax.random.fold_in(key, i), 50, 1.0, True)
    assert float(l1) < 0.7 * float(l0), (float(l0), float(l1))
    assert np.isfinite(np.asarray(table)).all()
    assert int(table_state.count) == 310


def test_scan_carry_aliasing_deterministic(graph):
    """Scan-carry aliasing audit (docs/DESIGN.md §9): the sparse scan step
    donates (table, moments) and updates them via scatters carrying
    unique_indices=True — a promise dedup_row_grads must uphold. Two claims:
    (1) duplicate batch ids are resolved BEFORE the scatter (all duplicates
    become the out-of-bounds sentinel, which mode='drop' masks), so the
    promise holds even for adversarial batches; (2) rerunning the identical
    donated scan from identical copies is bit-deterministic."""
    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=16,
                    lr=0.05, seed=0)
    # adversarial pool: ONE query repeated -> every step's batch gathers the
    # same ids 16 times over -> maximal duplicate pressure on the scatter
    s = QuerySampler(graph, np.random.default_rng(2), max_negs=5)
    q = s.sample_many("1p", 1)[0]
    data = DeviceTrainData(graph.schema, [q] * 4)
    params = init_params(cfg, graph.schema, jax.random.key(0))

    def run_once():
        p = jax.tree.map(lambda x: x.copy(), params)
        table = p.pop("table")
        st = init_lazy_adam(table)
        opt = optax.adam(cfg.lr)
        ost = opt.init(p)
        scan = make_scan_train_step_sparse(cfg, opt)
        p, table, st, ost, loss = scan(p, table, st, ost, data.pools["1p"],
                                       "1p", jax.random.key(1), 30, 1.0,
                                       False)
        return np.asarray(table), np.asarray(st.mu), float(loss)

    t1, m1, l1 = run_once()
    t2, m2, l2 = run_once()
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(m1, m2)
    assert l1 == l2
    assert np.isfinite(t1).all()
