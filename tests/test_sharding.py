"""Multi-device sharding tests on the simulated 8-device CPU mesh (SURVEY.md
§5.5): sharded train step runs, and its results match the single-device step
(same data, same init) to fp32 tolerance."""

import jax
import numpy as np
import optax
import pytest

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.parallel import make_mesh, make_sharded_train_step, shard_params
from graphqembed_tpu.training import TrainData, make_train_step


@pytest.fixture(scope="module")
def setup(request):
    graph = request.getfixturevalue("graph")
    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=64, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=20)
    queries = s.sample_many("2i", 200) + s.sample_many("1p", 200)
    data = TrainData(graph.schema, queries, cfg.batch_size, seed=1)
    return graph, cfg, params, data


def test_mesh_and_param_sharding(setup):
    graph, cfg, params, _ = setup
    mesh = make_mesh(8)
    sp = shard_params(params, mesh)
    assert sp["table"].shape[0] % 8 == 0
    assert sp["table"].sharding.spec == jax.sharding.PartitionSpec("data", None)
    assert sp["proj"]["W"].sharding.spec == jax.sharding.PartitionSpec()


def test_sharded_step_matches_single_device(setup):
    graph, cfg, params, data = setup
    mesh = make_mesh(8)
    optimizer = optax.adam(cfg.lr)

    # single-device reference
    p1 = jax.tree.map(lambda x: x.copy(), params)
    o1 = optimizer.init(p1)
    step1 = make_train_step(cfg, optimizer)

    # sharded
    p8 = shard_params(jax.tree.map(lambda x: x.copy(), params), mesh)
    o8 = optimizer.init(p8)
    step8 = make_sharded_train_step(cfg, optimizer, mesh, p8)

    losses1, losses8 = [], []
    for structure in ["1p", "2i", "1p", "2i"]:
        batch = data.sample_batch(structure)
        rels, anchors, targets, negs, row_mask, im = batch
        p1, o1, l1 = step1(p1, o1, structure, rels, anchors, targets, negs,
                           row_mask, im, np.float32(1.0))
        p8, o8, l8 = step8(p8, o8, structure, rels, anchors, targets, negs,
                           row_mask, im, 1.0)
        losses1.append(float(l1))
        losses8.append(float(l8))
    np.testing.assert_allclose(losses1, losses8, rtol=2e-5, atol=1e-6)
    n = params["table"].shape[0]
    np.testing.assert_allclose(np.asarray(p8["table"])[:n],
                               np.asarray(p1["table"]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p8["proj"]["W"]),
                               np.asarray(p1["proj"]["W"]), rtol=2e-4, atol=2e-5)


def test_sharded_scan_matches_single_device(setup):
    """The GSPMD scan mega-step (multi-chip production path) matches the
    single-device scan pipeline to f32-reduction tolerance: same pools, same
    keys -> same parameters after 3 dispatches x 5 steps."""
    from graphqembed_tpu.parallel import make_sharded_scan_train_step
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        make_scan_train_step,
    )

    graph, cfg, params, _ = setup
    s = QuerySampler(graph, np.random.default_rng(5), max_negs=10)
    queries = s.sample_many("2i", 150) + s.sample_many("2p", 150)
    data = DeviceTrainData(graph.schema, queries)
    mesh = make_mesh(8)
    optimizer = optax.adam(cfg.lr)
    key = jax.random.key(3)

    p1 = jax.tree.map(lambda x: x.copy(), params)
    o1 = optimizer.init(p1)
    scan1 = make_scan_train_step(cfg, optimizer)

    p8 = shard_params(jax.tree.map(lambda x: x.copy(), params), mesh)
    o8 = optimizer.init(p8)
    scan8 = make_sharded_scan_train_step(cfg, optimizer, mesh)

    for i, structure in enumerate(["2p", "2i", "2p"]):
        k = jax.random.fold_in(key, i)
        hard = structure == "2i"
        p1, o1, l1 = scan1(p1, o1, data.pools[structure], structure, k, 5,
                           1.0, hard)
        p8, o8, l8 = scan8(p8, o8, data.pools[structure], structure, k, 5,
                           1.0, hard)
        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
    n = params["table"].shape[0]
    np.testing.assert_allclose(np.asarray(p8["table"])[:n],
                               np.asarray(p1["table"]), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(p8["proj"]["W"]),
                               np.asarray(p1["proj"]["W"]), rtol=5e-4, atol=5e-5)
    # table rows stay row-sharded through the scan (no silent replication)
    assert p8["table"].sharding.spec[0] == "data"


def test_sharded_scan_depth1_matches_single_device(setup):
    """GSPMD scan mega-step with the depth-1 SAGE encoder: sharded vs
    single-device, same pools/keys -> same losses and params to f32
    tolerance (DP psum reassociation)."""
    from graphqembed_tpu.models.encoders import NeighborTables
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.parallel import make_sharded_scan_train_step
    from graphqembed_tpu.training.device_data import (
        DeviceTrainData,
        make_scan_train_step,
    )

    graph, cfg0, _, _ = setup
    cfg = GQEConfig(embed_dim=16, projection="bilinear", batch_size=32,
                    lr=0.03, depth=1, seed=0)
    tables = NeighborTables.build(graph, sample_size=4, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(6))
    s = QuerySampler(graph, np.random.default_rng(8), max_negs=10)
    data = DeviceTrainData(graph.schema,
                           s.sample_many("1p", 120) + s.sample_many("2i", 120))
    mesh = make_mesh(8)
    optimizer = optax.adam(cfg.lr)
    key = jax.random.key(4)

    p1 = jax.tree.map(lambda x: x.copy(), params)
    o1 = optimizer.init(p1)
    scan1 = make_scan_train_step(cfg, optimizer, neighbor_tables=tables)

    p8 = shard_params(jax.tree.map(lambda x: x.copy(), params), mesh)
    o8 = optimizer.init(p8)
    scan8 = make_sharded_scan_train_step(cfg, optimizer, mesh,
                                         neighbor_tables=tables)

    for i, structure in enumerate(["1p", "2i"]):
        k = jax.random.fold_in(key, i)
        p1, o1, l1 = scan1(p1, o1, data.pools[structure], structure, k, 4,
                           1.0, structure == "2i")
        p8, o8, l8 = scan8(p8, o8, data.pools[structure], structure, k, 4,
                           1.0, structure == "2i")
        np.testing.assert_allclose(float(l1), float(l8), rtol=1e-4)
    # param tolerance looser than the depth-0 scan test: Adam normalizes the
    # psum-reassociation noise in small encoder grads toward ±lr over the 8
    # steps (observed ~1.5e-4 on isolated elements)
    n = params["table"].shape[0]
    np.testing.assert_allclose(np.asarray(p8["table"])[:n],
                               np.asarray(p1["table"]), rtol=5e-4, atol=4e-4)
    for k2 in ("W_self", "W_rel"):
        np.testing.assert_allclose(np.asarray(p8["encoder"][k2]),
                                   np.asarray(p1["encoder"][k2]),
                                   rtol=5e-4, atol=4e-4)
    assert p8["table"].sharding.spec[0] == "data"
