"""On-device sampler tests: sampled edges are true graph edges; multi-hop
paths are real paths; negatives are type-correct and not the positive; the
sampler composes with margin_loss_rows under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.models import gqe
from graphqembed_tpu.models.params import init_params
from graphqembed_tpu.training.device_sampler import (
    DeviceGraph,
    sample_path_batch,
)


@pytest.fixture(scope="module")
def dg(request):
    graph = request.getfixturevalue("graph")
    return graph, DeviceGraph.build(graph, sample_size=8, seed=0)


def test_edges_are_real(dg):
    graph, d = dg
    anchors, rels, targets, negs, ok = sample_path_batch(
        d, jax.random.key(0), 128, n_hops=1)
    anchors, rels, targets, negs, ok = map(np.asarray,
                                           (anchors, rels, targets, negs, ok))
    assert ok.mean() > 0.9
    schema = graph.schema
    for i in np.nonzero(ok)[0][:30]:
        rel = schema.rel_of(int(rels[i, 0]))
        assert graph.has_edge(int(anchors[i, 0]), rel, int(targets[i]))
        lo, hi = schema.mode_range(rel[2])
        assert lo <= negs[i] < hi and negs[i] != targets[i]


@pytest.mark.parametrize("hops", [2, 3])
def test_paths_are_real(dg, hops):
    graph, d = dg
    anchors, rels, targets, negs, ok = sample_path_batch(
        d, jax.random.key(1), 128, n_hops=hops)
    anchors, rels, targets, ok = map(np.asarray, (anchors, rels, targets, ok))
    assert ok.mean() > 0.5
    schema = graph.schema
    checked = 0
    for i in np.nonzero(ok)[0]:
        if checked >= 20:
            break
        cur = {int(anchors[i, 0])}
        fine = True
        for h in range(hops):
            rel = schema.rel_of(int(rels[i, h]))
            nxt = set()
            for v in cur:
                nxt |= set(graph.neighbors(v, rel).tolist())
            if not nxt:
                fine = False
                break
            cur = nxt
        assert fine and int(targets[i]) in cur
        checked += 1
    assert checked >= 10


def test_composes_with_margin_loss(dg):
    graph, d = dg
    cfg = GQEConfig(embed_dim=16, projection="transe")
    params = init_params(cfg, graph.schema, jax.random.key(0))

    @jax.jit
    def step(params, key):
        anchors, rels, targets, negs, ok = sample_path_batch(d, key, 64,
                                                             n_hops=2)
        return gqe.margin_loss_rows(cfg, params, "2p", anchors, rels,
                                    jnp.full(64, -1, jnp.int32), targets,
                                    negs, ok)

    loss = step(params, jax.random.key(2))
    assert np.isfinite(float(loss)) and float(loss) > 0
