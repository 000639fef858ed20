"""Property-based tests (hypothesis; SURVEY.md §5.3): sampler invariants and
structural round-trips hold over randomized graphs, seeds and structures —
not just the fixture graph."""

import numpy as np
from hypothesis import given, settings, strategies as st

from graphqembed_tpu.config import STRUCTURES
from graphqembed_tpu.data.queries import Formula, Query
from graphqembed_tpu.data.sampling import QuerySampler, answers
from graphqembed_tpu.graph.schema import Schema, reverse_relation
from graphqembed_tpu.graph.synthetic import holdout_edges, synthetic_graph

_GRAPH_CACHE: dict = {}


def _graph(seed, scale):
    key = (seed, scale)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = synthetic_graph(seed=seed, scale=scale,
                                            avg_degree=5.0)
    return _GRAPH_CACHE[key]


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 3), scale=st.sampled_from([0.1, 0.3]),
       structure=st.sampled_from(STRUCTURES), qseed=st.integers(0, 100))
def test_sampled_query_invariants(seed, scale, structure, qseed):
    graph = _graph(seed, scale)
    s = QuerySampler(graph, np.random.default_rng(qseed), max_negs=10,
                     max_tries=50)
    q = s.sample(structure)
    if q is None:
        return  # starved tiny graph: acceptable
    ans = answers(graph, q.formula, q.anchors)
    assert q.target in ans
    assert not (set(q.neg_samples.tolist()) & ans)
    lo, hi = graph.schema.mode_range(q.formula.target_mode)
    assert all(lo <= n < hi for n in q.neg_samples)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 3), scale=st.sampled_from([0.1, 0.3]),
       structure=st.sampled_from(STRUCTURES), qseed=st.integers(0, 50))
def test_query_serialize_roundtrip(seed, scale, structure, qseed):
    graph = _graph(seed, scale)
    s = QuerySampler(graph, np.random.default_rng(qseed), max_negs=5,
                     max_tries=50)
    q = s.sample(structure)
    if q is None:
        return
    q2 = Query.deserialize(q.serialize())
    assert q2.formula == q.formula
    assert q2.anchors == q.anchors and q2.target == q.target
    np.testing.assert_array_equal(q2.neg_samples, q.neg_samples)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 5))
def test_reverse_relation_involution(seed):
    graph = _graph(0, 0.1)
    rels = graph.schema.relations
    r = rels[seed % len(rels)]
    assert reverse_relation(reverse_relation(r)) == r
    rid = graph.schema.rel_id(r)
    assert graph.schema.reverse_rel_id(graph.schema.reverse_rel_id(rid)) == rid


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 3), frac=st.sampled_from([0.05, 0.2]))
def test_holdout_edge_accounting(seed, frac):
    graph = _graph(seed, 0.1)
    train, held = holdout_edges(graph, frac=frac, seed=seed)
    assert graph.num_edges() == train.num_edges() + 2 * len(held)
    for s, rel, d in held[:10]:
        assert not train.has_edge(s, rel, d)
        assert graph.has_edge(s, rel, d)
