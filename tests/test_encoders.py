"""Deep (SAGE-style) encoder tests: depth-0 equals DirectEncoder semantics;
depth-1 output is unit-norm, finite, mask-correct (isolated nodes fall back
to self transform); mean vs pool aggregators differ; neighbor tables honor
CSR contents."""

import jax
import numpy as np
import pytest

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.models import gqe
from graphqembed_tpu.models.encoders import (
    NeighborTables,
    init_encoder_params,
    sage_encode,
)
from graphqembed_tpu.models.params import init_params


@pytest.fixture(scope="module")
def setup(request):
    graph = request.getfixturevalue("graph")
    cfg = GQEConfig(embed_dim=16)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    enc = init_encoder_params(cfg, graph.schema, jax.random.key(1))
    tables = NeighborTables.build(graph, sample_size=4, seed=0)
    return graph, cfg, params, enc, tables


def test_neighbor_tables_contents(setup):
    graph, cfg, params, enc, tables = setup
    schema = graph.schema
    for ri, rel in enumerate(schema.relations[:4]):
        lo, hi = schema.mode_range(rel[0])
        for li in range(min(hi - lo, 10)):
            row = tables.neighbors[ri, li]
            adj = set(graph.neighbors(lo + li, rel).tolist())
            for x in row:
                if x >= 0:
                    assert int(x) in adj
            if not adj:
                assert (row == -1).all()


def test_depth0_equals_direct(setup):
    graph, cfg, params, enc, tables = setup
    ids = np.arange(20, dtype=np.int32)
    a = sage_encode(cfg, params["table"], enc, tables, ids, depth=0)
    b = gqe.encode(params["table"], ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("aggregator", ["mean", "pool"])
@pytest.mark.parametrize("depth", [1, 2])
def test_deep_encode_shapes(setup, aggregator, depth):
    graph, cfg, params, enc, tables = setup
    ids = np.arange(0, graph.schema.n_nodes, 7, dtype=np.int32)[:32]
    out = np.asarray(sage_encode(cfg, params["table"], enc, tables, ids,
                                 depth=depth, aggregator=aggregator))
    assert out.shape == (len(ids), cfg.embed_dim)
    assert np.isfinite(out).all()
    norms = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_aggregators_differ(setup):
    graph, cfg, params, enc, tables = setup
    ids = np.arange(32, dtype=np.int32)
    a = np.asarray(sage_encode(cfg, params["table"], enc, tables, ids,
                               depth=1, aggregator="mean"))
    b = np.asarray(sage_encode(cfg, params["table"], enc, tables, ids,
                               depth=1, aggregator="pool"))
    assert np.abs(a - b).max() > 1e-3


def test_deep_encoder_in_model_forward(setup):
    """depth-1 encoder drives the full query forward + margin loss under jit
    and gradients flow into encoder weights."""
    import jax.numpy as jnp
    from graphqembed_tpu.models.encoders import make_deep_encoder
    from graphqembed_tpu.data.queries import group_by_formula, make_batch
    from graphqembed_tpu.data.sampling import QuerySampler

    graph, cfg, params, enc, tables = setup
    params = dict(params)
    params["encoder"] = enc
    s = QuerySampler(graph, np.random.default_rng(3), max_negs=10)
    qs = max(group_by_formula(s.sample_many("2i", 30)).values(), key=len)
    b = make_batch(graph.schema, qs, batch_size=len(qs), neg_width=1,
                   rng=np.random.default_rng(0))

    def loss_fn(p):
        encode_fn = make_deep_encoder(cfg, p, tables, depth=1)
        return gqe.margin_loss(cfg, p, "2i", b.anchors, b.rels,
                               np.int32(b.inter_mode_id), b.targets,
                               b.negs[:, 0], b.row_mask, encode_fn=encode_fn)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    g = np.asarray(grads["encoder"]["W_self"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0
