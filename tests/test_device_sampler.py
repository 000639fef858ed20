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


def test_inter_batch_valid(dg):
    """2i/3i on-device batches: every unmasked row's branches are real edges
    into the target, branches are distinct, negatives type-correct."""
    from graphqembed_tpu.training.device_sampler import sample_inter_batch

    graph, d = dg
    schema = graph.schema
    for k in (2, 3):
        anchors, rels, modes, tgt, neg, ok = map(np.asarray, sample_inter_batch(
            d, jax.random.key(k), 128, k_branches=k))
        assert ok.mean() > 0.5, ok.mean()
        for i in np.nonzero(ok)[0][:20]:
            seen = set()
            for bidx in range(k):
                rel = schema.rel_of(int(rels[i, bidx]))
                assert graph.has_edge(int(anchors[i, bidx]), rel, int(tgt[i]))
                seen.add((int(rels[i, bidx]), int(anchors[i, bidx])))
            assert len(seen) == k  # distinct branches
            assert int(modes[i]) == schema.mode_id(
                schema.rel_of(int(rels[i, 0]))[2])
            lo, hi = schema.mode_range(schema.rel_of(int(rels[i, 0]))[2])
            assert lo <= neg[i] < hi and neg[i] != tgt[i]


def test_onthefly_training_learns(dg):
    """Pool-free fused sample+train mega-step: 1p on-the-fly training learns
    (loss halves), and a 2i segment runs finite."""
    import optax

    from graphqembed_tpu.training.device_sampler import (
        make_onthefly_train_step,
    )

    graph, d = dg
    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    lr=0.05, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    run = make_onthefly_train_step(cfg, optimizer, d)
    params, opt_state, l0 = run(params, opt_state, "1p", jax.random.key(1),
                                20, 1.0)
    for i in range(5):
        params, opt_state, l1 = run(params, opt_state, "1p",
                                    jax.random.fold_in(jax.random.key(2), i),
                                    60, 1.0)
    assert float(l1) < 0.6 * float(l0), (float(l0), float(l1))
    params, opt_state, li = run(params, opt_state, "2i", jax.random.key(3),
                                20, 1.0)
    assert np.isfinite(float(li))
    assert np.isfinite(np.asarray(params["table"])).all()
