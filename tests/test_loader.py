"""Data IO round-trips: reference-pickle export→import reproduces the graph;
native query-set save/load reproduces queries; direction flip is involutive
on chains."""

import numpy as np

from graphqembed_tpu.data.loader import (
    export_reference_pickle,
    import_reference_graph,
    load_queries,
    reference_rels_to_application_order,
    save_queries,
)
from graphqembed_tpu.data.sampling import QuerySampler
from graphqembed_tpu.graph.schema import reverse_relation


def test_reference_pickle_roundtrip(graph, tmp_path):
    p = tmp_path / "graph_data.pkl"
    export_reference_pickle(graph, p)
    g2 = import_reference_graph(p)
    assert g2.schema == graph.schema
    assert g2.num_edges() == graph.num_edges()
    for rel in graph.schema.relations:
        assert set(g2.adj[rel]) == set(graph.adj[rel])
        for k in list(graph.adj[rel])[:5]:
            np.testing.assert_array_equal(np.sort(g2.adj[rel][k]),
                                          np.sort(graph.adj[rel][k]))


def test_query_set_roundtrip(graph, tmp_path):
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=15)
    qs = []
    for st in ("1p", "2p", "2i", "ip", "pi"):
        qs += s.sample_many(st, 10)
    save_queries(tmp_path / "qs", graph.schema, qs)
    back = load_queries(tmp_path / "qs")
    assert len(back) == len(qs)
    orig = {q.dedup_key(): q for q in qs}
    for q in back:
        o = orig[q.dedup_key()]
        np.testing.assert_array_equal(np.sort(q.neg_samples), np.sort(o.neg_samples))
        if o.hard_neg_samples is not None:
            np.testing.assert_array_equal(np.sort(q.hard_neg_samples),
                                          np.sort(o.hard_neg_samples))


def test_direction_flip_chain(graph):
    s = QuerySampler(graph, np.random.default_rng(1))
    q = s.sample_many("3p", 1)[0]
    # target-outward reference form: reversed relations, target-first order
    ref_form = tuple(reverse_relation(r) for r in reversed(q.formula.rels))
    back = reference_rels_to_application_order("3p", ref_form)
    assert back == q.formula.rels


def test_direction_flip_intersections(graph):
    s = QuerySampler(graph, np.random.default_rng(2))
    for st in ("2i", "3i", "ip", "pi"):
        q = s.sample_many(st, 1)[0]
        r = q.formula.rels
        if st in ("2i", "3i"):
            ref_form = tuple(reverse_relation(x) for x in r)
        elif st == "pi":
            ref_form = (reverse_relation(r[1]), reverse_relation(r[0]),
                        reverse_relation(r[2]))
        else:  # ip
            ref_form = tuple(reverse_relation(x) for x in r)
        assert reference_rels_to_application_order(st, ref_form) == r


def test_test_queries_one_neg_full_neg_split(graph, tmp_path):
    """Mixed test sets split by stored negative count (the reference's
    one_neg/full_neg organization); homogeneous exhaustive sets serve both
    views unchanged (the documented gqe-sample behavior)."""
    from graphqembed_tpu.data.loader import (
        load_test_queries_by_formula,
        save_queries,
    )
    from graphqembed_tpu.data.sampling import QuerySampler

    s = QuerySampler(graph, np.random.default_rng(4), max_negs=20)
    qs = s.sample_many("1p", 30)
    # make half the queries one_neg-style (a single stored negative)
    import dataclasses as dc
    mixed = [dc.replace(q, neg_samples=q.neg_samples[:1]) if i % 2 == 0
             else q for i, q in enumerate(qs) if len(q.neg_samples) > 1]
    out = tmp_path / "mixed"
    save_queries(out, graph.schema, mixed)
    views = load_test_queries_by_formula(out)
    n_one = sum(len(g) for fs in views["one_neg"].values()
                for g in fs.values())
    n_full = sum(len(g) for fs in views["full_neg"].values()
                 for g in fs.values())
    assert n_one + n_full == len(mixed)
    assert n_one > 0 and n_full > 0
    for fs in views["one_neg"].values():
        for g in fs.values():
            assert all(len(q.neg_samples) == 1 for q in g)
    for fs in views["full_neg"].values():
        for g in fs.values():
            assert all(len(q.neg_samples) > 1 for q in g)

    # homogeneous exhaustive set: both views identical, nothing dropped
    out2 = tmp_path / "homog"
    save_queries(out2, graph.schema, qs)
    views2 = load_test_queries_by_formula(out2)
    c1 = sum(len(g) for fs in views2["one_neg"].values() for g in fs.values())
    c2 = sum(len(g) for fs in views2["full_neg"].values() for g in fs.values())
    assert c1 == c2 == len(qs)


def test_save_query_arrays_stream_roundtrip(graph, tmp_path):
    """Native-sampler SoA arrays -> mixed-formula npz shards ->
    NpzStructureStream windows: ids/rels/negs survive the trip and every
    drawn record is a real sampled query."""
    from graphqembed_tpu.data.grain_pipeline import NpzStructureStream
    from graphqembed_tpu.data.loader import save_query_arrays
    from graphqembed_tpu.native.binding import native_sample_arrays

    arr = native_sample_arrays(graph, "2i", 200, seed=0, max_negs=8)
    if arr is None:
        import pytest
        pytest.skip("native sampler unavailable")
    save_query_arrays(tmp_path, graph.schema, [arr])
    want = {(tuple(a), int(t)): r
            for a, t, r in zip(arr["anchors"][:, :2], arr["targets"],
                               arr["rels"][:, :2].tolist())}
    stream = NpzStructureStream(tmp_path, "2i", seed=1)
    batch = stream.draw(64)
    assert batch["anchors"].shape == (64, 2)
    assert batch["rels"].shape == (64, 2)
    for i in range(64):
        key = (tuple(batch["anchors"][i]), int(batch["target"][i]))
        assert key in want
        assert want[key] == batch["rels"][i].tolist()
        # negative pads are -1-marked, real entries are valid node ids
        negs = batch["negs"][i]
        assert ((negs >= -1) & (negs < graph.schema.n_nodes)).all()
    # exactly-once: state roundtrip replays the same window
    st = stream.get_state()
    b1 = stream.draw(32)
    stream.set_state(st)
    b2 = stream.draw(32)
    np.testing.assert_array_equal(b1["target"], b2["target"])
