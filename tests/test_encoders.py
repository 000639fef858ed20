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
