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
        anchors, rels, modes, tgt, neg, hard, hok, ok = map(
            np.asarray, sample_inter_batch(d, jax.random.key(k), 128,
                                           k_branches=k))
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
        # partial-branch hard negatives: satisfy >=1 branch, differ from the
        # target, and FAIL at least one branch (checked on real rows)
        assert (ok & hok).mean() > 0.2
        hchecked = 0
        for i in np.nonzero(ok & hok)[0]:
            if hchecked >= 15:
                break
            sat = [graph.has_edge(int(anchors[i, bidx]),
                                  schema.rel_of(int(rels[i, bidx])),
                                  int(hard[i])) for bidx in range(k)]
            assert any(sat), (i, sat)
            assert int(hard[i]) != int(tgt[i])
            hchecked += 1
        assert hchecked >= 5


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
    # r05 note: the exact edge-uniform sampler plateaus at a HIGHER loss
    # than the r04 node-uniform-ish one did (hub edges dominate the stream
    # and carry irreducible margin loss under transE; fresh edges every
    # step also preclude the pool pipeline's memorization) — the quality
    # metric (AUC, test_run_train_onthefly_quality) is what matters, and
    # matches. This asserts learning, not a fitted floor.
    assert float(l1) < 0.8 * float(l0), (float(l0), float(l1))
    params, opt_state, li = run(params, opt_state, "2i", jax.random.key(3),
                                20, 1.0)
    assert np.isfinite(float(li))
    assert np.isfinite(np.asarray(params["table"])).all()


def test_ip_batch_valid(dg):
    """ip on-device batches: both branches are real edges into the JOIN node
    v, v -r3-> target is a real edge, branches distinct, inter_mode = v's
    mode. v is recovered by intersecting branch-1 neighbors with r3's
    reverse neighbors of the target."""
    from graphqembed_tpu.training.device_sampler import sample_ip_batch

    graph, d = dg
    schema = graph.schema
    anchors, rels, modes, tgt, neg, hard, hok, ok = map(
        np.asarray, sample_ip_batch(d, jax.random.key(11), 128))
    assert ok.mean() > 0.4, ok.mean()
    checked = 0
    for i in np.nonzero(ok)[0]:
        if checked >= 20:
            break
        r1 = schema.rel_of(int(rels[i, 0]))
        r2 = schema.rel_of(int(rels[i, 1]))
        r3 = schema.rel_of(int(rels[i, 2]))
        # candidate join nodes: reached from a1 via r1 AND from a2 via r2
        # AND having target as an r3-neighbor
        v1 = set(graph.neighbors(int(anchors[i, 0]), r1).tolist())
        v2 = set(graph.neighbors(int(anchors[i, 1]), r2).tolist())
        vs = {v for v in v1 & v2
              if int(tgt[i]) in set(graph.neighbors(v, r3).tolist())}
        assert vs, (i, r1, r2, r3)
        assert (int(rels[i, 0]), int(anchors[i, 0])) != \
               (int(rels[i, 1]), int(anchors[i, 1]))
        assert int(modes[i]) == schema.mode_id(r1[2])  # join node's mode
        lo, hi = schema.mode_range(r3[2])
        assert lo <= neg[i] < hi and neg[i] != tgt[i]
        checked += 1
    assert checked >= 10


def test_pi_batch_valid(dg):
    """pi on-device batches: a1 -r1-> v -r2-> t is a real 2-chain, a2 -r3-> t
    a real edge distinct from the chain's last edge, inter_mode = t's mode."""
    from graphqembed_tpu.training.device_sampler import sample_pi_batch

    graph, d = dg
    schema = graph.schema
    anchors, rels, modes, tgt, neg, hard, hok, ok = map(
        np.asarray, sample_pi_batch(d, jax.random.key(12), 128))
    assert ok.mean() > 0.4, ok.mean()
    checked = 0
    for i in np.nonzero(ok)[0]:
        if checked >= 20:
            break
        r1 = schema.rel_of(int(rels[i, 0]))
        r2 = schema.rel_of(int(rels[i, 1]))
        r3 = schema.rel_of(int(rels[i, 2]))
        # chain: exists v with a1 -r1-> v -r2-> t
        mids = set(graph.neighbors(int(anchors[i, 0]), r1).tolist())
        assert any(int(tgt[i]) in set(graph.neighbors(v, r2).tolist())
                   for v in mids)
        # edge branch into t
        assert graph.has_edge(int(anchors[i, 1]), r3, int(tgt[i]))
        assert int(modes[i]) == schema.mode_id(r3[2])
        lo, hi = schema.mode_range(r3[2])
        assert lo <= neg[i] < hi and neg[i] != tgt[i]
        checked += 1
    assert checked >= 10


def test_run_train_onthefly_quality(dg):
    """The CLI-reachable pool-free driver: full 7-structure on-device
    protocol reaches above-chance AUC on offline exact-negative val
    queries — the BASELINE.json stretch capability end to end."""
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.training.device_sampler import run_train_onthefly

    graph, d = dg
    cfg = GQEConfig(embed_dim=32, projection="bilinear", batch_size=128,
                    lr=0.03, seed=2, val_every=10**9, tol=0.0,
                    conv_window=10**9)
    s = QuerySampler(graph, np.random.default_rng(5), max_negs=20)
    val = []
    for st in ("1p", "2p", "2i", "ip", "pi"):
        val += s.sample_many(st, 60)
    params = init_params(cfg, graph.schema, jax.random.key(1))
    res = run_train_onthefly(cfg, graph.schema, params, d, val_queries=val,
                             total_steps=2200, burn_in_steps=400,
                             steps_per=50)
    assert res.steps >= 2200
    assert set(res.losses.keys()) >= {"1p", "2p", "3p", "2i", "3i", "ip", "pi"}
    assert all(len(v) > 0 for v in res.losses.values())
    assert res.best_val_auc > 0.6, res.best_val_auc


def test_rel_uniform_dist_valid(dg):
    """dist="rel" (the offline protocol's relation-uniform-first schedule,
    r05): every unmasked row of every structure is still a REAL query —
    edges exist, chains are walkable, branches are distinct real in-edges —
    and the hop relations are relation-diverse (the property that
    edge-weighted hops lose: with 12 relations, a 128-row 2p batch under
    "rel" must touch most relation types at hop 2)."""
    from graphqembed_tpu.training.device_sampler import (
        sample_inter_batch,
        sample_ip_batch,
        sample_pi_batch,
    )

    graph, d = dg
    schema = graph.schema
    # paths
    anchors, rels, targets, negs, ok = sample_path_batch(
        d, jax.random.key(21), 128, n_hops=2, dist="rel")
    anchors, rels, targets, ok = map(np.asarray,
                                     (anchors, rels, targets, ok))
    assert ok.mean() > 0.9
    checked = 0
    for i in np.nonzero(ok)[0]:
        if checked >= 15:
            break
        r1 = schema.rel_of(int(rels[i, 0]))
        r2 = schema.rel_of(int(rels[i, 1]))
        mids = set(graph.neighbors(int(anchors[i, 0]), r1).tolist())
        assert any(int(targets[i]) in set(graph.neighbors(v, r2).tolist())
                   for v in mids)
        checked += 1
    assert checked >= 10
    # relation diversity at hop 2 (the distribution property "rel" buys)
    hop2 = set(int(r) for r in rels[ok, 1])
    assert len(hop2) >= schema.n_relations // 2, hop2
    # intersections + ip + pi: reuse the structural checks at dist="rel"
    for fn, k in ((sample_inter_batch, 2), (sample_inter_batch, 3)):
        a, r, m, t, n_, h, hok, okk = map(np.asarray, fn(
            d, jax.random.key(22 + k), 128, k_branches=k, dist="rel"))
        assert okk.mean() > 0.5
        for i in np.nonzero(okk)[0][:10]:
            seen = set()
            for bi in range(k):
                rel = schema.rel_of(int(r[i, bi]))
                assert graph.has_edge(int(a[i, bi]), rel, int(t[i]))
                seen.add((int(r[i, bi]), int(a[i, bi])))
            assert len(seen) == k
    a, r, m, t, n_, h, hok, okk = map(np.asarray, sample_ip_batch(
        d, jax.random.key(31), 128, dist="rel"))
    assert okk.mean() > 0.4
    for i in np.nonzero(okk)[0][:10]:
        r1 = schema.rel_of(int(r[i, 0]))
        r2 = schema.rel_of(int(r[i, 1]))
        r3 = schema.rel_of(int(r[i, 2]))
        v1 = set(graph.neighbors(int(a[i, 0]), r1).tolist())
        v2 = set(graph.neighbors(int(a[i, 1]), r2).tolist())
        assert any(int(t[i]) in set(graph.neighbors(v, r3).tolist())
                   for v in v1 & v2)
    a, r, m, t, n_, h, hok, okk = map(np.asarray, sample_pi_batch(
        d, jax.random.key(32), 128, dist="rel"))
    assert okk.mean() > 0.4
    for i in np.nonzero(okk)[0][:10]:
        r1 = schema.rel_of(int(r[i, 0]))
        r2 = schema.rel_of(int(r[i, 1]))
        r3 = schema.rel_of(int(r[i, 2]))
        mids = set(graph.neighbors(int(a[i, 0]), r1).tolist())
        assert any(int(t[i]) in set(graph.neighbors(v, r2).tolist())
                   for v in mids)
        assert graph.has_edge(int(a[i, 1]), r3, int(t[i]))
        assert (int(r[i, 2]), int(a[i, 1])) != (int(r[i, 1]), int(a[i, 0]))
