"""Eval metric cross-checks (SURVEY.md §4.2): JAX AUC vs sklearn
roc_auc_score; JAX percentile ranks vs scipy-style mean percentile; masking
correctness."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import roc_auc_score

from graphqembed_tpu.training.eval import auc_from_scores, percentile_ranks


def test_auc_matches_sklearn():
    rng = np.random.default_rng(0)
    for _ in range(5):
        pos = rng.normal(0.5, 1.0, size=40).astype(np.float32)
        neg = rng.normal(0.0, 1.0, size=40).astype(np.float32)
        got = float(auc_from_scores(jnp.asarray(pos), jnp.asarray(neg),
                                    jnp.ones(40, bool), jnp.ones(40, bool)))
        want = roc_auc_score([1] * 40 + [0] * 40, np.concatenate([pos, neg]))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_auc_with_ties_matches_sklearn():
    pos = np.array([1.0, 0.5, 0.5, 0.0], dtype=np.float32)
    neg = np.array([0.5, 0.5, 0.0, -1.0], dtype=np.float32)
    got = float(auc_from_scores(jnp.asarray(pos), jnp.asarray(neg),
                                jnp.ones(4, bool), jnp.ones(4, bool)))
    want = roc_auc_score([1] * 4 + [0] * 4, np.concatenate([pos, neg]))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_auc_masking():
    pos = np.array([1.0, -99.0], dtype=np.float32)
    neg = np.array([0.0, 99.0], dtype=np.float32)
    m_pos = np.array([True, False])
    m_neg = np.array([True, False])
    got = float(auc_from_scores(jnp.asarray(pos), jnp.asarray(neg),
                                jnp.asarray(m_pos), jnp.asarray(m_neg)))
    assert got == 1.0  # masked junk cannot poison the metric


def test_percentile_ranks():
    pos = np.array([2.0, 0.0], dtype=np.float32)
    negs = np.array([[1.0, 3.0, 0.0, 2.0],
                     [0.0, 0.0, 0.0, 0.0]], dtype=np.float32)
    mask = np.array([[True, True, True, False],
                     [True, True, False, False]])
    got = np.asarray(percentile_ranks(jnp.asarray(pos), jnp.asarray(negs),
                                      jnp.asarray(mask)))
    # row0: negs {1,3,0}: 2 below, 0 tie -> 2/3
    # row1: negs {0,0}: 0 below, 2 ties -> (0.5*2)/2 = 0.5
    np.testing.assert_allclose(got, [2 / 3, 0.5], rtol=1e-6)


def test_percentile_all_masked():
    pr = np.asarray(percentile_ranks(jnp.asarray([1.0]),
                                     jnp.asarray([[0.0, 0.0]]),
                                     jnp.asarray([[False, False]])))
    np.testing.assert_allclose(pr, [0.5])


def test_fast_eval_matches_legacy(graph):
    """The single-dispatch-per-structure eval path must reproduce the legacy
    per-formula-batch path exactly (same protocol, same seed)."""
    import jax
    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training import eval_apr, eval_auc

    cfg = GQEConfig(embed_dim=16, projection="distmult", eval_batch_size=64)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=12)
    queries = []
    for st in ("1p", "2p", "2i", "ip", "pi"):
        queries += s.sample_many(st, 40)

    # depth=0 + neighbor_tables sentinel routes to the legacy path with the
    # same (non-deep) scorer
    fast = eval_auc(cfg, params, graph.schema, queries, seed=5)
    legacy = eval_auc(cfg, params, graph.schema, queries, seed=5,
                      neighbor_tables=object())
    assert set(fast) == set(legacy)
    for k in fast:
        np.testing.assert_allclose(fast[k], legacy[k], atol=5e-4), k

    fast_apr = eval_apr(cfg, params, graph.schema, queries, max_negs=12)
    legacy_apr = eval_apr(cfg, params, graph.schema, queries, max_negs=12,
                          neighbor_tables=object())
    for k in fast_apr:
        np.testing.assert_allclose(fast_apr[k], legacy_apr[k], atol=5e-4), k
