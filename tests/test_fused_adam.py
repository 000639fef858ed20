"""Fused Pallas Adam vs optax.adam: multi-step equivalence on pytrees
(interpret mode on CPU), plus the bf16-storage stochastic-rounding path
(cfg.storage_dtype="bfloat16"): SR reference properties, moment tracking
(and the nearest-rounding stall it exists to prevent), and end-to-end
training with FusedAdamOpt. The on-core Pallas SR kernel itself has no
interpret-mode lowering (prng primitives); its math is identical to
adam_step_sr_ref by construction and is exercised on the real chip by
bench.py / experiments."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphqembed_tpu.ops.fused_adam import (
    adam_step_sr_ref,
    fused_adam_leaf,
    fused_adam_tree,
    sr_to_bf16_ref,
)


def test_leaf_matches_optax():
    key = jax.random.key(0)
    p = jax.random.normal(key, (64, 16))
    opt = optax.adam(0.01)
    state = opt.init(p)
    mu = jnp.zeros_like(p)
    nu = jnp.zeros_like(p)
    p_ref = p
    p_ker = p
    for t in range(1, 6):
        g = jax.random.normal(jax.random.fold_in(key, t), (64, 16))
        updates, state = opt.update(g, state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_ker, mu, nu = fused_adam_leaf(p_ker, g, mu, nu, jnp.int32(t), 0.01,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(p_ker), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6)


def test_tree_matches_optax():
    key = jax.random.key(1)
    params = {
        "table": jax.random.normal(key, (40, 8)),
        "proj": {"W": jax.random.normal(jax.random.fold_in(key, 1), (3, 8, 8))},
    }
    opt = optax.adam(0.05)
    state = opt.init(params)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    p_ref = params
    p_ker = params
    for t in range(1, 4):
        g = jax.tree.map(
            lambda x: jax.random.normal(jax.random.fold_in(key, 100 + t),
                                        x.shape), params)
        updates, state = opt.update(g, state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_ker, mu, nu = fused_adam_tree(p_ker, g, mu, nu, jnp.int32(t), 0.05,
                                        interpret=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        p_ker, p_ref)


# ---------- bf16 storage: stochastic rounding ----------


def test_sr_ref_adjacent_and_unbiased():
    """sr_to_bf16_ref lands on one of the two bf16 neighbours of x and is
    unbiased: the mean over many draws recovers x to ≪ one bf16 ulp."""
    key = jax.random.key(0)
    # bf16 stores 7 mantissa bits -> ulp at 1.0 is 2^-7; x sits 1/4 of the
    # way between the neighbours 1.0 and 1 + 2^-7
    x = jnp.float32(1.0 + 1.0 / 512.0)
    lo, hi = 1.0, 1.0 + 1.0 / 128.0
    draws = sr_to_bf16_ref(jnp.full((4096,), x),
                           jax.random.bits(key, (4096,), jnp.uint32))
    vals = np.asarray(draws.astype(jnp.float32))
    assert set(np.unique(vals)) <= {lo, hi}, np.unique(vals)
    # expect ~25% hi draws; mean within 10% of an ulp of x
    np.testing.assert_allclose(vals.mean(), float(x), atol=1.0 / 1280.0)
    # negative values too
    drawsn = sr_to_bf16_ref(jnp.full((4096,), -x),
                            jax.random.bits(jax.random.key(1), (4096,),
                                            jnp.uint32))
    np.testing.assert_allclose(np.asarray(drawsn.astype(jnp.float32)).mean(),
                               -float(x), atol=1.0 / 1280.0)
    # exactly-representable values pass through untouched
    exact = jnp.float32(0.5)
    out = sr_to_bf16_ref(jnp.full((128,), exact),
                         jax.random.bits(jax.random.key(2), (128,),
                                         jnp.uint32))
    assert (np.asarray(out.astype(jnp.float32)) == 0.5).all()


def test_sr_moment_tracks_f32_where_nearest_stalls():
    """The reason SR is load-bearing (ops/fused_adam.py): with a constant
    small gradient, (1−β2)·g² falls below half a bf16 ulp once nu has grown,
    so nearest-rounding FREEZES the second moment below its fixed point — SR
    keeps integrating it. Run the nu recursion (β2=0.999, g=0.01) long enough
    for the fixed points to separate, in all three arithmetics."""

    def scan_nu(write):
        def body(nu, k):
            return write(0.999 * nu.astype(jnp.float32) + 0.001 * 1e-4, k), None
        keys = jax.random.split(jax.random.key(3), 2500)
        nu, _ = jax.lax.scan(body, write(jnp.zeros((8, 128)),
                                         jax.random.key(9)), keys)
        return float(jnp.mean(nu.astype(jnp.float32)))

    nu_f32 = scan_nu(lambda x, k: x)
    nu_sr = scan_nu(lambda x, k: sr_to_bf16_ref(
        x, jax.random.bits(k, x.shape, jnp.uint32)))
    nu_nearest = scan_nu(lambda x, k: x.astype(jnp.bfloat16))
    assert abs(nu_sr - nu_f32) / nu_f32 < 0.10, (nu_sr, nu_f32)
    # the control stalls far below the true moment — this is what SR prevents
    assert nu_nearest < 0.5 * nu_f32, (nu_nearest, nu_f32)


def test_sr_adam_param_trajectory_tracks_f32():
    """200 steps of bf16-storage SR Adam vs f32 optax.adam on the same grad
    stream: parameters stay within a few bf16 ulps of the f32 trajectory."""
    key = jax.random.key(4)
    p0 = jax.random.normal(key, (16, 128), jnp.float32)
    p_sr, mu, nu = p0.astype(jnp.bfloat16), None, None
    mu = jnp.zeros_like(p_sr)
    nu = jnp.zeros_like(p_sr)
    opt = optax.adam(0.003)
    state = opt.init(p0)
    p_ref = p0
    for t in range(1, 201):
        g = 0.1 * jax.random.normal(jax.random.fold_in(key, t), p0.shape)
        updates, state = opt.update(g, state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_sr, mu, nu = adam_step_sr_ref(p_sr, g, mu, nu, jnp.int32(t), 0.003,
                                        jax.random.fold_in(key, 10_000 + t))
    err = float(jnp.mean(jnp.abs(p_sr.astype(jnp.float32) - p_ref)))
    scale = float(jnp.mean(jnp.abs(p_ref)))
    assert err / scale < 0.02, (err, scale)


def test_fused_tree_mixed_dtypes_cpu_ref():
    """fused_adam_tree routes bf16 leaves through the SR reference on CPU and
    f32 leaves through the interpret-mode kernel; both update."""
    params = {"table": jnp.ones((16, 128), jnp.bfloat16),
              "W": jnp.ones((8, 128), jnp.float32)}
    grads = jax.tree.map(lambda x: jnp.full(x.shape, 0.5, x.dtype), params)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    p2, mu2, nu2 = fused_adam_tree(params, grads, mu, nu, jnp.int32(1), 0.01,
                                   interpret=True)
    assert p2["table"].dtype == jnp.bfloat16
    assert p2["W"].dtype == jnp.float32
    assert float(jnp.max(p2["table"].astype(jnp.float32))) < 1.0
    assert float(jnp.max(p2["W"])) < 1.0
    assert float(jnp.max(nu2["table"].astype(jnp.float32))) > 0.0


def test_bf16_storage_end_to_end_trains(graph):
    """make_scan_train_step + FusedAdamOpt with storage_dtype=bfloat16: loss
    decreases, the table STAYS bf16, and values remain finite."""
    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        FusedAdamOpt,
        make_scan_train_step,
    )

    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=64,
                    lr=0.03, seed=0, storage_dtype="bfloat16")
    s = QuerySampler(graph, np.random.default_rng(1), max_negs=10)
    data = DeviceTrainData(graph.schema, s.sample_many("2i", 300))
    params = init_params(cfg, graph.schema, jax.random.key(0))
    assert params["table"].dtype == jnp.bfloat16
    opt = FusedAdamOpt(cfg.lr)
    opt_state = opt.init(params)
    scan = make_scan_train_step(cfg, opt)
    key = jax.random.key(0)
    params, opt_state, l0 = scan(params, opt_state, data.pools["2i"], "2i",
                                 key, 10, 1.0, False)
    for i in range(6):
        params, opt_state, l1 = scan(params, opt_state, data.pools["2i"],
                                     "2i", jax.random.fold_in(key, i), 50,
                                     1.0, True)
    assert params["table"].dtype == jnp.bfloat16
    assert float(l1) < 0.75 * float(l0), (float(l0), float(l1))
    assert np.isfinite(np.asarray(params["table"].astype(jnp.float32))).all()


def test_bf16_storage_rejects_plain_optax(graph):
    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.training.device_data import make_scan_train_step

    cfg = GQEConfig(embed_dim=32, storage_dtype="bfloat16")
    with pytest.raises(ValueError, match="stochastic-rounding"):
        make_scan_train_step(cfg, optax.adam(0.01))


def test_sparse_bf16_table_trains(graph):
    """Sparse lazy Adam over a bf16 table (SR writes): rows move, moments
    integrate, untouched rows bit-identical."""
    from graphqembed_tpu.training.sparse_adam import (
        init_lazy_adam,
        lazy_adam_update,
    )

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(20, 128)).astype(np.float32)
                        ).astype(jnp.bfloat16)
    orig = np.asarray(table.astype(jnp.float32)).copy()
    state = init_lazy_adam(table)
    key = jax.random.key(0)
    ids = jnp.array([3, 7, 3], jnp.int32)
    for t in range(50):
        g = jnp.asarray(rng.normal(size=(3, 128)).astype(np.float32)) * 0.1
        table, state = lazy_adam_update(table, state, ids, g, lr=0.01,
                                        key=jax.random.fold_in(key, t))
    now = np.asarray(table.astype(jnp.float32))
    assert table.dtype == jnp.bfloat16
    assert np.abs(now[3] - orig[3]).max() > 0.01
    assert np.array_equal(now[0], orig[0])  # untouched row bit-identical
    assert float(jnp.max(state.nu[3].astype(jnp.float32))) > 0.0


def test_rows_ref_matches_dense_sr_ref():
    """adam_step_rows_sr_ref (sparse row grads, dense-Adam semantics) ==
    adam_step_sr_ref on the scatter-built dense grad, same key — including
    duplicate ids (their contributions sum)."""
    from graphqembed_tpu.ops.fused_adam import (
        adam_step_rows_sr_ref,
        adam_step_sr_ref,
    )

    rng = np.random.default_rng(3)
    n, d, L = 64, 128, 24
    p = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mu = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32) * 0.01
                     ).astype(jnp.bfloat16)
    nu = jnp.asarray(rng.uniform(size=(n, d)).astype(np.float32) * 1e-3
                     ).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, n, size=L).astype(np.int32))
    ids = ids.at[3].set(ids[0])  # force a duplicate
    rows = jnp.asarray(rng.normal(size=(L, d)).astype(np.float32) * 0.1
                       ).astype(jnp.bfloat16)
    count = jnp.int32(4)
    key = jax.random.key(11)
    p1, m1, v1 = adam_step_rows_sr_ref(p, mu, nu, ids, rows, count, 0.01, key)
    order = jnp.argsort(ids)
    g = jnp.zeros((n, d), jnp.float32).at[ids[order]].add(
        rows[order].astype(jnp.float32), indices_are_sorted=True)
    p2, m2, v2 = adam_step_sr_ref(p, g, mu, nu, count, 0.01, key)
    for a, b in ((p1, p2), (m1, m2), (v1, v2)):
        np.testing.assert_array_equal(np.asarray(a.astype(jnp.float32)),
                                      np.asarray(b.astype(jnp.float32)))


def test_presort_row_ids_invariants():
    """Sorted ids ascending; order permutes ids to sorted; padding carries
    sentinel id n / order L; tile_starts bracket each tile's id range."""
    from graphqembed_tpu.ops.fused_adam import (
        _pick_tile,
        presort_row_ids,
        rows_pad,
    )

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, L = 880, 96
    ids = jnp.asarray(rng.integers(0, n, size=(3, L)).astype(np.int32))
    sids, order, starts = presort_row_ids(ids, n)
    tile = _pick_tile(n, jnp.bfloat16)
    assert sids.shape == (3, rows_pad(L)) == order.shape
    assert starts.shape == (3, n // tile + 1)
    for b in range(3):
        s = np.asarray(sids[b])
        o = np.asarray(order[b])
        assert (np.diff(s[:L]) >= 0).all()
        np.testing.assert_array_equal(s[:L], np.sort(np.asarray(ids[b])))
        np.testing.assert_array_equal(np.asarray(ids[b])[o[:L]], s[:L])
        assert (s[L:] == n).all() and (o[L:] == L).all()
        st = np.asarray(starts[b])
        for t in range(n // tile):
            seg = s[st[t]:st[t + 1]]
            assert ((seg >= t * tile) & (seg < (t + 1) * tile)).all()


def test_rows_grad_update_scan_matches_dense_quality(graph):
    """cfg.rows_grad_update=True (CPU: the jnp reference path) trains the
    same workload to a loss in family with the dense bf16 path — the opt-in
    rows-grad pipeline is semantically a dense-Adam step."""
    import dataclasses

    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        FusedAdamOpt,
        make_scan_train_step,
    )

    from graphqembed_tpu.config import GQEConfig
    cfg0 = GQEConfig(embed_dim=32, batch_size=64, lr=0.01,
                     compute_dtype="bfloat16", storage_dtype="bfloat16")
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=10)
    queries = s.sample_many("2i", 300)
    data = DeviceTrainData(graph.schema, queries)
    losses = {}
    for name, cfg in (("dense", cfg0),
                      ("rows", dataclasses.replace(cfg0,
                                                   rows_grad_update=True))):
        params = init_params(cfg, graph.schema, jax.random.key(0))
        opt = FusedAdamOpt(cfg.lr)
        st = opt.init(params)
        scan = make_scan_train_step(cfg, opt)
        p, o, loss = scan(params, st, data.pools["2i"], "2i",
                          jax.random.key(1), 60, np.float32(1.0), True)
        losses[name] = float(loss)
    # same protocol, same schedule; SR streams differ so allow slack
    assert abs(losses["dense"] - losses["rows"]) < 0.15, losses
