"""End-to-end metric tests (SURVEY.md §5.6): small-budget training on the
synthetic bio-schema graph must beat chance AUC by a pinned margin; loss must
decrease during burn-in; the full 7-structure multi-task protocol must run."""

import jax
import numpy as np
import pytest

from graphqembed_tpu.config import STRUCTURES, GQEConfig
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.training import check_conv, eval_apr, eval_auc, run_train


def _queries(graph, structures, n_train, n_val, seed=0):
    s = QuerySampler(graph, np.random.default_rng(seed), max_negs=30)
    train, val = [], []
    for st in structures:
        qs = s.sample_many(st, n_train + n_val)
        train += qs[:n_train]
        val += qs[n_train:]
    return train, val


def test_check_conv():
    assert not check_conv([1.0] * 10, window=10, tol=1e-3)  # too short
    decreasing = list(np.linspace(1.0, 0.1, 40))
    assert not check_conv(decreasing, window=10, tol=1e-3)
    flat = list(np.linspace(1.0, 0.1, 30)) + [0.1] * 20
    assert check_conv(flat, window=10, tol=1e-3)


def test_burn_in_1p_learns(graph):
    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    max_iter=500, max_burn_in=500, val_every=10_000,
                    conv_window=50, tol=0.0, lr=0.05, seed=1)
    train, val = _queries(graph, ["1p"], n_train=300, n_val=80)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    res = run_train(cfg, graph.schema, params, train, val_queries=None)
    early = np.mean(res.losses["1p"][:20])
    late = np.mean(res.losses["1p"][-20:])
    assert late < 0.5 * early, (early, late)
    aucs = eval_auc(cfg, res.params, graph.schema, val)
    assert aucs["1p"] > 0.65, aucs


@pytest.mark.slow
def test_full_multitask_protocol():
    # smaller graph + 600 queries/structure: enough coverage that val AUC
    # measures learning, not sampling sparsity. Loss weights are the defaults
    # (path 0.01 / inter 0.005): empirically, weight-1.0 multitask steps
    # clobber the edge-level structure learned in burn-in (1p AUC falls to
    # chance), which is exactly why the reference down-weights them.
    from graphqembed_tpu.graph.synthetic import synthetic_graph
    graph = synthetic_graph(seed=7, scale=0.25, avg_degree=6.0)
    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=128,
                    max_iter=2000, max_burn_in=400, val_every=1000,
                    conv_window=100, tol=0.0, lr=0.03, seed=2)
    train, val = _queries(graph, STRUCTURES, n_train=600, n_val=40)
    params = init_params(cfg, graph.schema, jax.random.key(1))
    res = run_train(cfg, graph.schema, params, train, val_queries=val)
    assert res.burn_in_steps == 400  # tol=0 -> burn-in runs to max_burn_in
    assert set(res.losses) == set(STRUCTURES)
    for st in STRUCTURES:
        assert len(res.losses[st]) > 0, f"structure {st} never trained"
    aucs = eval_auc(cfg, res.best_params, graph.schema, val, seed=9)
    assert aucs["macro"] > 0.6, aucs
    hard = eval_auc(cfg, res.best_params, graph.schema, val, seed=9, hard=True)
    assert set(hard) <= {"2i", "3i", "ip", "pi", "macro"}
    apr = eval_apr(cfg, res.best_params, graph.schema, val, max_negs=30)
    assert apr["macro"] > 0.6, apr


def test_deep_encoder_training(graph):
    """depth-1 end-to-end: run_train with neighbor tables learns 1p."""
    from graphqembed_tpu.models.encoders import NeighborTables

    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    max_iter=250, max_burn_in=250, val_every=10_000,
                    conv_window=50, tol=0.0, lr=0.05, depth=1, seed=4)
    tables = NeighborTables.build(graph, sample_size=4, seed=0)
    train, val = _queries(graph, ["1p"], n_train=250, n_val=60, seed=4)
    params = init_params(cfg, graph.schema, jax.random.key(2))
    assert "encoder" in params
    res = run_train(cfg, graph.schema, params, train, neighbor_tables=tables)
    early = np.mean(res.losses["1p"][:20])
    late = np.mean(res.losses["1p"][-20:])
    assert late < 0.7 * early, (early, late)
    aucs = eval_auc(cfg, res.params, graph.schema, val, neighbor_tables=tables)
    assert aucs["1p"] > 0.55, aucs
