"""Sampler invariants (SURVEY.md §5.3): every sampled query is satisfied by its
target; negatives are non-answers; hard negatives satisfy ≥1 but not all
branches; clean test queries are unanswerable on the training graph; batching
preserves data and masks padding."""

import numpy as np
import pytest

from graphqembed_tpu.config import STRUCTURES
from graphqembed_tpu.data.queries import Formula, Query, group_by_formula, make_batch
from graphqembed_tpu.data.sampling import (
    QuerySampler,
    answers,
    branch_answer_sets,
    parallel_sample,
)


@pytest.mark.parametrize("structure", STRUCTURES)
def test_sample_invariants(graph, structure):
    s = QuerySampler(graph, np.random.default_rng(1), max_negs=30)
    qs = s.sample_many(structure, 25)
    assert len(qs) >= 10, f"sampler starved for {structure}"
    for q in qs[:10]:
        ans = answers(graph, q.formula, q.anchors)
        assert q.target in ans
        assert not (set(q.neg_samples.tolist()) & ans)
        lo, hi = graph.schema.mode_range(q.formula.target_mode)
        assert np.all((q.neg_samples >= lo) & (q.neg_samples < hi))
        if q.hard_neg_samples is not None:
            hard = set(q.hard_neg_samples.tolist())
            assert not (hard & ans)
            branches = branch_answer_sets(graph, q.formula, q.anchors)
            if q.formula.structure == "ip":
                from graphqembed_tpu.data.sampling import project_set
                partial = project_set(graph, set.union(*branches), q.formula.rels[2])
            else:
                partial = set.union(*branches)
            assert hard <= partial


@pytest.mark.parametrize("structure", ["1p", "2i", "ip"])
def test_clean_test_queries(graph, train_and_held, structure):
    train, _ = train_and_held
    s = QuerySampler(graph, np.random.default_rng(2), max_negs=20)
    qs = s.sample_many(structure, 10, train_graph=train)
    assert len(qs) >= 3
    for q in qs:
        assert q.target in answers(graph, q.formula, q.anchors)
        assert q.target not in answers(train, q.formula, q.anchors)


def test_serialize_roundtrip(graph):
    s = QuerySampler(graph, np.random.default_rng(3))
    q = s.sample_many("pi", 1)[0]
    q2 = Query.deserialize(q.serialize())
    assert q2.formula == q.formula and q2.anchors == q.anchors
    np.testing.assert_array_equal(q2.neg_samples, q.neg_samples)


def test_parallel_sample_dedup(graph):
    qs = parallel_sample(graph, "2p", 40, n_workers=2, seed=9)
    keys = {q.dedup_key() for q in qs}
    assert len(keys) == len(qs) >= 20


def test_make_batch_padding(graph):
    s = QuerySampler(graph, np.random.default_rng(4), max_negs=30)
    groups = group_by_formula(s.sample_many("2i", 60))
    qs = max(groups.values(), key=len)[:7]
    b = make_batch(graph.schema, qs, batch_size=16, neg_width=8,
                   hard_neg_width=8, rng=np.random.default_rng(0))
    assert b.anchors.shape == (16, 2) and b.negs.shape == (16, 8)
    assert b.row_mask.sum() == len(qs)
    assert not b.row_mask[len(qs):].any()
    for i, q in enumerate(qs):
        assert tuple(b.anchors[i]) == q.anchors
        assert b.targets[i] == q.target
        valid = b.negs[i][b.neg_mask[i]]
        assert set(valid.tolist()) <= set(q.neg_samples.tolist())
    assert b.inter_mode_id == graph.schema.mode_id(qs[0].formula.target_mode)


def test_formula_mode_accessors(graph):
    s = QuerySampler(graph, np.random.default_rng(5))
    for structure in STRUCTURES:
        q = s.sample_many(structure, 1)[0]
        f = q.formula
        assert len(f.anchor_modes) == f.n_anchors
        for a, m in zip(q.anchors, f.anchor_modes):
            assert graph.schema.mode_of(a) == m
        assert graph.schema.mode_of(q.target) == f.target_mode
        if structure == "ip":
            assert f.intersection_mode == f.rels[2][0]
        elif structure in ("2i", "3i", "pi"):
            assert f.intersection_mode == f.target_mode
        else:
            assert f.intersection_mode is None


def test_is_answer_matches_answers(graph):
    """Meet-in-the-middle membership == full answer-set membership, for true
    answers, walked targets, and random same-mode nodes."""
    from graphqembed_tpu.data.sampling import QuerySampler, answers, is_answer

    rng = np.random.default_rng(9)
    s = QuerySampler(graph, rng, max_negs=10)
    for structure in STRUCTURES:
        for q in s.sample_many(structure, 25):
            ans = answers(graph, q.formula, q.anchors)
            lo, hi = graph.schema.mode_range(q.formula.target_mode)
            probes = {q.target, *rng.integers(lo, hi, 12).tolist()}
            probes |= set(list(ans)[:5])
            for t in probes:
                assert is_answer(graph, q.formula, q.anchors, int(t)) == \
                    (t in ans), (structure, t)
