"""Depth>0 (SAGE) encoder oracle parity (SURVEY.md §1 L2, §3 inventory —
the reference's netquery/encoders.py::Encoder + aggregators.py are real
code): the JAX deep encoder must match an INDEPENDENT eager-torch
implementation — activations, scores, gradients, and (slow) trained AUC.
Aggregation order, relu/norm placement, and mask semantics are exactly the
silent-failure traps SURVEY §8 warns about."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models.encoders import NeighborTables, sage_encode
from graphqembed_tpu.models.params import init_params, params_to_numpy
from graphqembed_tpu.oracle import torch_gqe


@pytest.fixture(scope="module")
def deep_setup(request):
    graph = request.getfixturevalue("graph")
    cfg = GQEConfig(embed_dim=16, projection="bilinear", depth=1, seed=0)
    tables = NeighborTables.build(graph, sample_size=4, seed=1)
    p_np = params_to_numpy(init_params(cfg, graph.schema, jax.random.key(3)))
    return graph, cfg, tables, p_np


@pytest.mark.parametrize("aggregator", ["mean", "pool"])
@pytest.mark.parametrize("depth", [1, 2])
def test_sage_activation_parity(deep_setup, aggregator, depth):
    graph, cfg, tables, p_np = deep_setup
    ids = np.arange(0, graph.schema.n_nodes, 3, dtype=np.int32)[:40]
    out_j = sage_encode(cfg, jnp.asarray(p_np["table"]),
                        jax.tree.map(jnp.asarray, p_np["encoder"]),
                        tables, jnp.asarray(ids), depth=depth,
                        aggregator=aggregator)
    out_t = torch_gqe.sage_encode(cfg, p_np, tables, ids, depth=depth,
                                  aggregator=aggregator)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("structure", ["1p", "2i", "ip"])
def test_deep_forward_scores_parity(deep_setup, structure):
    graph, cfg, tables, p_np = deep_setup
    from graphqembed_tpu.data.queries import group_by_formula, make_batch
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.models.encoders import make_deep_encoder

    s = QuerySampler(graph, np.random.default_rng(5), max_negs=8)
    f, qs = next(iter(group_by_formula(s.sample_many(structure, 40)).items()))
    b = make_batch(graph.schema, qs, rng=np.random.default_rng(0))
    rels, anchors, targets = b.rels, b.anchors, b.targets
    im = b.inter_mode_id

    p_j = jax.tree.map(jnp.asarray, p_np)
    enc_j = make_deep_encoder(cfg, p_j, tables, cfg.depth, cfg.aggregator)
    sc_j = gqe.forward_scores(cfg, p_j, structure, jnp.asarray(anchors),
                              jnp.asarray(rels), jnp.int32(im),
                              jnp.asarray(targets), encode_fn=enc_j)
    enc_t = torch_gqe.make_deep_encoder(cfg, p_np, tables)
    sc_t = torch_gqe.forward_scores(cfg, p_np, structure, anchors, rels,
                                    int(im), targets, enc_t)
    np.testing.assert_allclose(np.asarray(sc_j), sc_t.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_deep_margin_loss_grad_parity(deep_setup):
    """Gradients through the SAGE encoder (table + W_self/W_rel/W_pool) match
    torch autograd."""
    graph, cfg, tables, p_np = deep_setup
    from graphqembed_tpu.data.queries import group_by_formula, make_batch
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.models.encoders import make_deep_encoder

    s = QuerySampler(graph, np.random.default_rng(6), max_negs=8)
    f, qs = next(iter(group_by_formula(s.sample_many("2i", 32)).items()))
    b = make_batch(graph.schema, qs, rng=np.random.default_rng(1))
    rels, anchors, targets = b.rels, b.anchors, b.targets
    im, mask = b.inter_mode_id, b.row_mask
    neg1 = b.negs[:, 0]

    def loss_j(p):
        enc = make_deep_encoder(cfg, p, tables, cfg.depth, cfg.aggregator)
        return gqe.margin_loss(cfg, p, "2i", jnp.asarray(anchors),
                               jnp.asarray(rels), jnp.int32(im),
                               jnp.asarray(targets), jnp.asarray(neg1),
                               jnp.asarray(mask), encode_fn=enc)

    lj, gj = jax.value_and_grad(loss_j)(jax.tree.map(jnp.asarray, p_np))

    p_t = {"table": torch.as_tensor(p_np["table"]).double().requires_grad_(),
           "proj": {"W": torch.as_tensor(
               p_np["proj"]["W"]).double().requires_grad_()},
           "inter": {k: torch.as_tensor(v).double().requires_grad_()
                     for k, v in p_np["inter"].items()},
           "encoder": {k: torch.as_tensor(v).double().requires_grad_()
                       for k, v in p_np["encoder"].items()}}
    enc_t = torch_gqe.make_deep_encoder(cfg, p_t, tables)
    lt = torch_gqe.margin_loss(cfg, p_t, "2i", anchors, rels, int(im),
                               targets, neg1, mask, enc_t)
    lt.backward()
    np.testing.assert_allclose(float(lj), float(lt), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gj["table"]),
                               p_t["table"].grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    for k in ("W_self", "W_rel"):
        np.testing.assert_allclose(np.asarray(gj["encoder"][k]),
                                   p_t["encoder"][k].grad.numpy(),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_oracle_trained_depth1_auc(graph):
    """Small oracle-trained depth-1 comparison: both stacks train the SAGE
    model with the identical protocol; converged val AUC must agree."""
    from graphqembed_tpu.oracle.train import eval_auc_oracle, run_train_oracle
    from graphqembed_tpu.training.eval import eval_auc
    from graphqembed_tpu.training.loop import run_train

    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    max_iter=600, max_burn_in=300, val_every=10**9,
                    conv_window=10**6, tol=0.0, lr=0.05, depth=1, seed=3)
    tables = NeighborTables.build(graph, sample_size=4, seed=0)
    s = QuerySampler(graph, np.random.default_rng(2), max_negs=20)
    train, val = [], []
    for st in ("1p", "2i"):
        qs = s.sample_many(st, 500)
        train += qs[:400]
        val += qs[400:]
    p0 = params_to_numpy(init_params(cfg, graph.schema, jax.random.key(7)))

    res_o = run_train_oracle(cfg, graph.schema, p0, train, tables=tables)
    res_j = run_train(cfg, graph.schema, jax.tree.map(jnp.asarray, p0),
                      train, neighbor_tables=tables)
    auc_o = eval_auc_oracle(cfg, res_o.params, graph.schema, val, seed=9,
                            tables=tables)
    auc_j = eval_auc(cfg, res_j.params, graph.schema, val, seed=9,
                     neighbor_tables=tables)
    assert auc_o["macro"] > 0.55, auc_o
    for k, v in auc_o.items():
        tol = 0.04 if k == "macro" else 0.07
        assert abs(v - auc_j[k]) < tol, (k, v, auc_j[k])
