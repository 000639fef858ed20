"""Golden parity tests (SURVEY.md §5.2): identical weights loaded into the
PyTorch oracle and the JAX model must give allclose per-structure activations,
scores, and losses — the operational definition of reference parity
(BASELINE.json north_star; reference mount empty, SURVEY.md §0)."""

import jax
import numpy as np
import pytest

from graphqembed_tpu.config import STRUCTURES, GQEConfig
from graphqembed_tpu.data.queries import group_by_formula, make_batch
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models import gqe
from graphqembed_tpu.models.params import init_params, params_to_numpy
from graphqembed_tpu.oracle import torch_gqe

CONFIGS = [
    GQEConfig(embed_dim=32, projection="transe", intersection="min"),
    GQEConfig(embed_dim=32, projection="distmult", intersection="mean"),
    GQEConfig(embed_dim=32, projection="bilinear", intersection="min"),
    GQEConfig(embed_dim=32, projection="bilinear", intersection="mean",
              learned_intersection=False),
]


def _batch_for(graph, structure, seed=0):
    s = QuerySampler(graph, np.random.default_rng(seed), max_negs=20)
    groups = group_by_formula(s.sample_many(structure, 40))
    qs = max(groups.values(), key=len)
    return make_batch(graph.schema, qs, batch_size=len(qs), neg_width=5,
                      rng=None)


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"{c.projection}-{c.intersection}-{c.learned_intersection}")
@pytest.mark.parametrize("structure", STRUCTURES)
def test_activation_parity(graph, cfg, structure):
    params = params_to_numpy(init_params(cfg, graph.schema, jax.random.key(0)))
    b = _batch_for(graph, structure)

    q_jax = np.asarray(
        gqe.embed_query(cfg, params, structure, b.anchors, b.rels,
                        np.int32(b.inter_mode_id)))
    q_oracle = torch_gqe.embed_query(cfg, params, structure, b.anchors, b.rels,
                                     b.inter_mode_id).numpy()
    np.testing.assert_allclose(q_jax, q_oracle, rtol=1e-5, atol=1e-6)

    s_jax = np.asarray(
        gqe.forward_scores(cfg, params, structure, b.anchors, b.rels,
                           np.int32(b.inter_mode_id), b.negs))
    s_oracle = torch_gqe.forward_scores(cfg, params, structure, b.anchors,
                                        b.rels, b.inter_mode_id, b.negs).numpy()
    np.testing.assert_allclose(s_jax, s_oracle, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("structure", STRUCTURES)
def test_loss_and_grad_parity(graph, structure):
    cfg = CONFIGS[2]  # bilinear/min — the paper's main variant
    params = params_to_numpy(init_params(cfg, graph.schema, jax.random.key(1)))
    b = _batch_for(graph, structure, seed=1)
    negs1 = b.negs[:, 0]

    loss_jax, grads = jax.value_and_grad(
        lambda p: gqe.margin_loss(cfg, p, structure, b.anchors, b.rels,
                                  np.int32(b.inter_mode_id), b.targets, negs1,
                                  b.row_mask))(
        jax.tree.map(lambda x: np.asarray(x), params))
    loss_oracle = torch_gqe.margin_loss(cfg, params, structure, b.anchors,
                                        b.rels, b.inter_mode_id, b.targets,
                                        negs1, b.row_mask)
    np.testing.assert_allclose(float(loss_jax), float(loss_oracle),
                               rtol=1e-5, atol=1e-7)

    # gradient parity via torch autograd on the oracle
    import torch
    tparams = {
        "table": torch.tensor(np.asarray(params["table"]), dtype=torch.float64,
                              requires_grad=True),
        "proj": {"W": torch.tensor(np.asarray(params["proj"]["W"]),
                                   dtype=torch.float64, requires_grad=True)},
        "inter": {k: torch.tensor(np.asarray(v), dtype=torch.float64,
                                  requires_grad=True)
                  for k, v in params["inter"].items()},
    }
    loss_t = torch_gqe.margin_loss(cfg, tparams, structure, b.anchors, b.rels,
                                   b.inter_mode_id, b.targets, negs1, b.row_mask)
    loss_t.backward()
    np.testing.assert_allclose(np.asarray(grads["proj"]["W"]),
                               tparams["proj"]["W"].grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grads["table"]),
                               tparams["table"].grad.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_encode_is_normalized(graph):
    cfg = CONFIGS[0]
    params = init_params(cfg, graph.schema, jax.random.key(2))
    ids = np.arange(10, dtype=np.int32)
    e = np.asarray(gqe.encode(params["table"], ids))
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, rtol=1e-6)


def test_jit_no_retrace_across_formulas(graph):
    """Different formulas of the same structure share one compiled program
    (static shapes; rel ids are data) — SURVEY.md §8 tenet."""
    cfg = CONFIGS[0]
    params = init_params(cfg, graph.schema, jax.random.key(3))
    s = QuerySampler(graph, np.random.default_rng(7), max_negs=10)
    groups = list(group_by_formula(s.sample_many("2i", 60)).items())[:3]
    import functools
    traces = []

    @functools.partial(jax.jit, static_argnames=("structure",))
    def f(params, structure, anchors, rels, inter_mode_id):
        traces.append(1)
        return gqe.embed_query(cfg, params, structure, anchors, rels, inter_mode_id)

    for formula, qs in groups:
        b = make_batch(graph.schema, qs, batch_size=8, neg_width=1)
        f(params, "2i", b.anchors, b.rels, np.int32(b.inter_mode_id))
    assert len(traces) == 1


@pytest.mark.parametrize("scoring", ["cosine", "dot", "l2"])
def test_scoring_variant_parity(graph, scoring):
    cfg = GQEConfig(embed_dim=32, projection="distmult", scoring=scoring)
    params = params_to_numpy(init_params(cfg, graph.schema, jax.random.key(4)))
    b = _batch_for(graph, "2p", seed=3)
    s_jax = np.asarray(
        gqe.forward_scores(cfg, params, "2p", b.anchors, b.rels,
                           np.int32(b.inter_mode_id), b.negs))
    s_oracle = torch_gqe.forward_scores(cfg, params, "2p", b.anchors, b.rels,
                                        b.inter_mode_id, b.negs).numpy()
    np.testing.assert_allclose(s_jax, s_oracle, rtol=1e-5, atol=1e-6)
    if scoring == "dot":
        cos = GQEConfig(embed_dim=32, projection="distmult", scoring="cosine")
        s_cos = np.asarray(
            gqe.forward_scores(cos, params, "2p", b.anchors, b.rels,
                               np.int32(b.inter_mode_id), b.negs))
        assert np.abs(s_jax - s_cos).max() > 1e-5  # genuinely different score


@pytest.mark.parametrize("structure", STRUCTURES)
def test_soft_and_parity(graph, structure):
    cfg = CONFIGS[2]
    params = params_to_numpy(init_params(cfg, graph.schema, jax.random.key(5)))
    b = _batch_for(graph, structure, seed=5)
    s_jax = np.asarray(
        gqe.soft_and_scores(cfg, params, structure, b.anchors, b.rels, b.negs))
    s_oracle = torch_gqe.soft_and_scores(cfg, params, structure, b.anchors,
                                         b.rels, b.negs).numpy()
    np.testing.assert_allclose(s_jax, s_oracle, rtol=1e-5, atol=1e-6)
    assert (s_jax >= 0).all() and (s_jax <= 1).all()
