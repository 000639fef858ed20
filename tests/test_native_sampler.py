"""Native C++ sampler tests: builds with g++, output satisfies the exact
same invariants as the python sampler (target is an answer; negatives are
non-answers of the target mode; hard negatives ⊆ partial matches − answers),
deterministic in seed, and much faster than python at bulk sizes."""

import time

import numpy as np
import pytest

from graphqembed_tpu.config import STRUCTURES
from graphqembed_tpu.data.sampling import (
    QuerySampler,
    answers,
    branch_answer_sets,
    project_set,
)
from graphqembed_tpu.native import native_available, native_sample_many

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


@pytest.mark.parametrize("structure", STRUCTURES)
def test_native_invariants(graph, structure):
    qs = native_sample_many(graph, structure, 30, seed=1, max_negs=25)
    assert qs is not None and len(qs) >= 10, f"starved for {structure}"
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
            if structure == "ip":
                partial = project_set(graph, set.union(*branches),
                                      q.formula.rels[2])
            else:
                partial = set.union(*branches)
            assert hard <= partial


def test_native_deterministic(graph):
    a = native_sample_many(graph, "2i", 20, seed=7)
    b = native_sample_many(graph, "2i", 20, seed=7)
    assert [q.serialize() for q in a] == [q.serialize() for q in b]
    c = native_sample_many(graph, "2i", 20, seed=8)
    assert [q.serialize() for q in a] != [q.serialize() for q in c]


def test_native_dedup(graph):
    qs = native_sample_many(graph, "1p", 200, seed=0, max_negs=10)
    keys = {q.dedup_key() for q in qs}
    assert len(keys) == len(qs)


def test_native_exhaustive_negs(graph):
    qs = native_sample_many(graph, "1p", 5, seed=2, exhaustive_negs=True)
    for q in qs:
        ans = answers(graph, q.formula, q.anchors)
        lo, hi = graph.schema.mode_range(q.formula.target_mode)
        # exhaustive: every non-answer of the mode is present
        assert len(q.neg_samples) == (hi - lo) - len(ans & set(range(lo, hi)))


def test_native_faster_than_python(graph):
    t0 = time.perf_counter()
    native_sample_many(graph, "3i", 300, seed=0, max_negs=30)
    t_native = time.perf_counter() - t0
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=30)
    t0 = time.perf_counter()
    s.sample_many("3i", 300)
    t_python = time.perf_counter() - t0
    assert t_native < t_python, (t_native, t_python)


def test_arrays_to_device_pool(graph):
    """native_sample_arrays feeds DevicePool directly; pool contents agree
    with Query-object conversion of the same native output."""
    from graphqembed_tpu.native.binding import native_sample_arrays
    from graphqembed_tpu.training.device_data import (
        DevicePool,
        device_pool_from_arrays,
    )

    for structure in ("2p", "ip", "pi", "3i"):
        arrays = native_sample_arrays(graph, structure, 40, seed=3,
                                      max_negs=16)
        qs = native_sample_many(graph, structure, 40, seed=3, max_negs=16)
        pool_a = device_pool_from_arrays(graph.schema, arrays)
        pool_q = DevicePool(graph.schema, structure, qs)
        assert pool_a.n == pool_q.n
        np.testing.assert_array_equal(np.asarray(pool_a.anchors),
                                      np.asarray(pool_q.anchors))
        np.testing.assert_array_equal(np.asarray(pool_a.rels),
                                      np.asarray(pool_q.rels))
        np.testing.assert_array_equal(np.asarray(pool_a.targets),
                                      np.asarray(pool_q.targets))
        np.testing.assert_array_equal(np.asarray(pool_a.inter_modes),
                                      np.asarray(pool_q.inter_modes))
        np.testing.assert_array_equal(np.asarray(pool_a.neg_counts),
                                      np.asarray(pool_q.neg_counts))


def test_parallel_sample_native_engine(graph):
    from graphqembed_tpu.data.sampling import parallel_sample

    qs = parallel_sample(graph, "2i", 60, n_workers=2, seed=5, engine="native")
    assert len(qs) >= 30
    keys = {q.dedup_key() for q in qs}
    assert len(keys) == len(qs)
    for q in qs[:5]:
        assert q.target in answers(graph, q.formula, q.anchors)


def test_all_edges_1p_full_coverage_and_threads(graph):
    """native_all_edges_1p: every directed edge appears exactly once as a 1p
    query; negatives are exact non-answers; the THREADED build (disjoint
    output slices + compaction) yields the same edge set as sequential."""
    from graphqembed_tpu.native import native_all_edges_1p

    ref = None
    for nt in (1, 2, 3):
        arr = native_all_edges_1p(graph, seed=5, max_negs=8, n_threads=nt)
        assert arr is not None
        n_edges = graph.num_edges()
        assert len(arr["targets"]) == n_edges
        rows = np.stack([arr["anchors"][:, 0], arr["rels"][:, 0],
                         arr["targets"]], axis=1)
        key = rows[np.lexsort(rows.T[::-1])]
        assert len(np.unique(key, axis=0)) == n_edges  # each edge exactly once
        if ref is None:
            ref = key
        else:
            np.testing.assert_array_equal(key, ref)  # same edges any n_threads
        # spot-check invariants on a sample of rows
        schema = graph.schema
        idx = np.random.default_rng(0).choice(n_edges, size=50, replace=False)
        for i in idx:
            a = int(arr["anchors"][i, 0])
            r = int(arr["rels"][i, 0])
            t = int(arr["targets"][i])
            nbrs = set(graph.neighbors(a, schema.relations[r]))
            assert t in nbrs
            c = int(arr["neg_counts"][i])
            assert c > 0
            lo, hi = schema.mode_range(schema.relations[r][2])
            for neg in arr["negs"][i, :c]:
                assert lo <= neg < hi
                assert int(neg) not in nbrs


def test_all_edges_1p_subsample(graph):
    """cap < n_edges takes the sequential Bernoulli path: ~cap rows, all
    valid edges."""
    from graphqembed_tpu.native import native_all_edges_1p

    n_edges = graph.num_edges()
    cap = n_edges // 3
    arr = native_all_edges_1p(graph, cap=cap, seed=5, max_negs=8, n_threads=4)
    got = len(arr["targets"])
    assert 0.5 * cap <= got <= cap, (got, cap)
    schema = graph.schema
    for i in range(0, got, max(1, got // 40)):
        a = int(arr["anchors"][i, 0])
        r = int(arr["rels"][i, 0])
        t = int(arr["targets"][i])
        assert t in set(graph.neighbors(a, schema.relations[r]))


@pytest.mark.parametrize("structure", ["1p", "3p", "3i", "ip", "pi"])
def test_native_clean_sampler_invariants(graph, structure):
    """C++ clean-test sampler: every query is answerable on the FULL graph,
    UNANSWERABLE on the train graph (>=1 held-out edge required), negatives
    are full-graph non-answers, hard negatives (intersections) satisfy a
    proper subset of branches."""
    from graphqembed_tpu.data.sampling import is_answer
    from graphqembed_tpu.graph.synthetic import holdout_edges
    from graphqembed_tpu.native import native_sample_clean_many

    train, held = holdout_edges(graph, 0.1, seed=1)
    qs = native_sample_clean_many(graph, train, structure, 30, seed=3,
                                  max_negs=10)
    if qs is None:
        pytest.skip("native sampler unavailable")
    assert len(qs) > 0
    for q in qs[:12]:
        assert is_answer(graph, q.formula, q.anchors, q.target)
        assert not is_answer(train, q.formula, q.anchors, q.target)
        for neg in q.neg_samples[:4]:
            assert not is_answer(graph, q.formula, q.anchors, int(neg))
        if q.hard_neg_samples is not None:
            for h in q.hard_neg_samples[:4]:
                assert not is_answer(graph, q.formula, q.anchors, int(h))
