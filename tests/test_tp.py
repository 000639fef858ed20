"""Tensor parallelism over a ('data', 'model') mesh (SURVEY.md §3 TP row).

TP shards the operator stacks on the feature dim (Megatron-style: projection
and intersection-pre column-sharded, intersection-post row-sharded with a
GSPMD-inserted psum); the embedding table stays row-sharded over 'data'.
DESIGN.md's analysis stands — at d=128 TP is off by default (sub-128 tiles
under-fill the MXU) — but the capability is real and pinned here: a 4x2
CPU mesh trains bit-comparably to the single device, with the operator
params VERIFIABLY sharded over 'model'.
"""

import jax
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.parallel import (
    make_mesh_2d,
    make_sharded_train_step,
    param_shardings,
    shard_params,
)
from graphqembed_tpu.training import TrainData, make_train_step


@pytest.fixture(scope="module")
def setup(request):
    graph = request.getfixturevalue("graph")
    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=64, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=20)
    queries = (s.sample_many("2i", 200) + s.sample_many("1p", 200)
               + s.sample_many("3p", 150))
    data = TrainData(graph.schema, queries, cfg.batch_size, seed=1)
    return graph, cfg, params, data


def test_tp_param_shardings(setup):
    graph, cfg, params, _ = setup
    mesh = make_mesh_2d(4, 2)
    sp = shard_params(params, mesh)
    assert sp["table"].sharding.spec == P("data", None)
    assert sp["proj"]["W"].sharding.spec == P(None, None, "model")
    assert sp["inter"]["pre"].sharding.spec == P(None, None, "model")
    assert sp["inter"]["post"].sharding.spec == P(None, "model", None)
    # per-device shard of W really is half the feature dim
    shard = next(iter(sp["proj"]["W"].addressable_shards)).data
    assert shard.shape == (params["proj"]["W"].shape[0],
                           cfg.embed_dim, cfg.embed_dim // 2)


@pytest.mark.parametrize("projection", ["bilinear", "transe"])
def test_tp_step_matches_single_device(setup, projection):
    graph, cfg, _, _ = setup
    import dataclasses

    cfg = dataclasses.replace(cfg, projection=projection)
    params = init_params(cfg, graph.schema, jax.random.key(2))
    s = QuerySampler(graph, np.random.default_rng(1), max_negs=20)
    queries = s.sample_many("2i", 200) + s.sample_many("3p", 150)
    data = TrainData(graph.schema, queries, cfg.batch_size, seed=1)
    mesh = make_mesh_2d(4, 2)
    optimizer = optax.adam(cfg.lr)

    p1 = jax.tree.map(lambda x: x.copy(), params)
    o1 = optimizer.init(p1)
    step1 = make_train_step(cfg, optimizer)

    ptp = shard_params(jax.tree.map(lambda x: x.copy(), params), mesh)
    otp = optimizer.init(ptp)
    steptp = make_sharded_train_step(cfg, optimizer, mesh, ptp)

    for structure in ["2i", "3p", "2i"]:
        batch = data.sample_batch(structure)
        rels, anchors, targets, negs, row_mask, im = batch
        p1, o1, l1 = step1(p1, o1, structure, rels, anchors, targets, negs,
                           row_mask, im, np.float32(1.0))
        ptp, otp, ltp = steptp(ptp, otp, structure, rels, anchors, targets,
                               negs, row_mask, im, 1.0)
        np.testing.assert_allclose(float(l1), float(ltp), rtol=2e-5,
                                   atol=1e-6)

    # results match AND the updated operator params are still model-sharded
    # (adam moments followed the TP shardings; no silent replication)
    key = "W" if projection == "bilinear" else "r"
    np.testing.assert_allclose(np.asarray(ptp["proj"][key]),
                               np.asarray(p1["proj"][key]),
                               rtol=2e-4, atol=2e-5)
    n = params["table"].shape[0]
    np.testing.assert_allclose(np.asarray(ptp["table"])[:n],
                               np.asarray(p1["table"]),
                               rtol=2e-4, atol=2e-5)
    exp = (P(None, None, "model") if projection == "bilinear"
           else P(None, "model"))
    assert ptp["proj"][key].sharding.spec == exp


def test_tp_scan_mega_step(setup):
    """The GSPMD scan mega-step also composes with the 2-D mesh: one
    dispatch of 5 steps on ('data','model') matches the single-device scan
    (same pool, same key)."""
    from graphqembed_tpu.parallel import make_sharded_scan_train_step
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        make_scan_train_step,
    )

    graph, cfg, params, _ = setup
    s = QuerySampler(graph, np.random.default_rng(5), max_negs=10)
    queries = s.sample_many("2i", 150)
    data = DeviceTrainData(graph.schema, queries)
    mesh = make_mesh_2d(4, 2)
    optimizer = optax.adam(cfg.lr)
    key = jax.random.key(3)

    p1 = jax.tree.map(lambda x: x.copy(), params)
    o1 = optimizer.init(p1)
    scan1 = make_scan_train_step(cfg, optimizer)
    p1, o1, l1 = scan1(p1, o1, data.pools["2i"], "2i", key, 5, 1.0, True)

    ptp = shard_params(jax.tree.map(lambda x: x.copy(), params), mesh)
    otp = optimizer.init(ptp)
    scantp = make_sharded_scan_train_step(cfg, optimizer, mesh)
    ptp, otp, ltp = scantp(ptp, otp, data.pools["2i"], "2i", key, 5, 1.0,
                           True)

    np.testing.assert_allclose(float(l1), float(ltp), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ptp["proj"]["W"]),
                               np.asarray(p1["proj"]["W"]),
                               rtol=2e-4, atol=2e-5)


def test_param_shardings_1d_mesh_unchanged(setup):
    """No 'model' axis -> operator params replicated (the d=128 default)."""
    from graphqembed_tpu.parallel import make_mesh

    graph, cfg, params, _ = setup
    sp = param_shardings(params, make_mesh(8))
    assert sp["proj"]["W"].spec == P()
    assert sp["table"].spec == P("data", None)
