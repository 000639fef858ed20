"""L0 graph substrate tests: schema packing, adjacency/CSR consistency,
reversal closure, edge holdout, negative-edge candidates."""

import numpy as np

from graphqembed_tpu.graph import Graph, Schema, reverse_relation, synthetic_graph
from graphqembed_tpu.graph.synthetic import holdout_edges


def test_schema_packing():
    s = Schema.build({"a": 3, "b": 5}, [("a", "r", "b")])
    assert s.n_nodes == 8
    assert s.mode_range("a") == (0, 3)
    assert s.mode_range("b") == (3, 8)
    assert s.mode_of(0) == "a" and s.mode_of(3) == "b" and s.mode_of(7) == "b"
    # closed under reversal
    assert ("b", "r", "a") in s.relations
    rid = s.rel_id(("a", "r", "b"))
    assert s.rel_of(s.reverse_rel_id(rid)) == ("b", "r", "a")
    np.testing.assert_array_equal(s.mode_offset_array(), [0, 3])


def test_graph_reversal_closure(graph):
    for rel in graph.schema.relations:
        rrel = reverse_relation(rel)
        for src, dsts in graph.adj[rel].items():
            for d in dsts[:5]:
                assert graph.has_edge(int(d), rrel, src)


def test_graph_mode_ranges(graph):
    s = graph.schema
    for rel in s.relations:
        flo, fhi = s.mode_range(rel[0])
        tlo, thi = s.mode_range(rel[2])
        for src, dsts in list(graph.adj[rel].items())[:20]:
            assert flo <= src < fhi
            assert np.all((dsts >= tlo) & (dsts < thi))


def test_csr_matches_adjacency(graph):
    for rel in graph.schema.relations:
        indptr, indices = graph.csr(rel)
        lo, hi = graph.schema.mode_range(rel[0])
        assert len(indptr) == hi - lo + 1
        for src, dsts in list(graph.adj[rel].items())[:20]:
            i = src - lo
            row = indices[indptr[i]:indptr[i + 1]]
            np.testing.assert_array_equal(row, np.sort(dsts))


def test_remove_edges(graph):
    train, held = holdout_edges(graph, frac=0.1, seed=1)
    assert held
    for src, rel, dst in held[:50]:
        assert graph.has_edge(src, rel, dst)
        assert not train.has_edge(src, rel, dst)
        assert not train.has_edge(dst, reverse_relation(rel), src)
    # original untouched; counts consistent (each removal kills 2 directed edges)
    assert graph.num_edges() == train.num_edges() + 2 * len(held)


def test_negative_edge_candidates(graph):
    rng = np.random.default_rng(0)
    rel = ("drug", "targets", "protein")
    src = int(graph.nodes_with_out_edges(rel)[0])
    negs = graph.negative_edge_candidates(src, rel, rng, k=20)
    lo, hi = graph.schema.mode_range("protein")
    pos = set(graph.neighbors(src, rel).tolist())
    assert len(negs) == 20 and len(set(negs.tolist())) == 20
    for n in negs:
        assert lo <= n < hi and int(n) not in pos


def test_synthetic_determinism():
    g1 = synthetic_graph(seed=5, scale=0.3)
    g2 = synthetic_graph(seed=5, scale=0.3)
    assert g1.num_edges() == g2.num_edges()
    rel = ("drug", "treats", "disease")
    assert set(g1.adj[rel]) == set(g2.adj[rel])
    for k in list(g1.adj[rel])[:10]:
        np.testing.assert_array_equal(g1.adj[rel][k], g2.adj[rel][k])
