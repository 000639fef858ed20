"""grain pipeline tests: deterministic batches, correct contents vs saved
queries, checkpointed iterator resume."""

import numpy as np
import pytest

from graphqembed_tpu.data.grain_pipeline import make_query_loader
from graphqembed_tpu.data.loader import save_queries
from graphqembed_tpu.data.sampling import QuerySampler


@pytest.fixture(scope="module")
def saved(tmp_path_factory, request):
    graph = request.getfixturevalue("graph")
    out = tmp_path_factory.mktemp("qs")
    s = QuerySampler(graph, np.random.default_rng(0), max_negs=12)
    qs = s.sample_many("2i", 120) + s.sample_many("1p", 120)
    save_queries(out, graph.schema, qs)
    return graph, out, qs


def test_batches_contents(saved):
    graph, out, qs = saved
    loader = make_query_loader(out, graph.schema, "2i", batch_size=16, seed=1)
    it = iter(loader)
    valid = {(q.anchors, q.target) for q in qs
             if q.formula.structure == "2i"}
    b = next(it)
    assert b["anchors"].shape == (16, 2) and b["rels"].shape == (16, 2)
    for i in range(16):
        assert (tuple(int(x) for x in b["anchors"][i]),
                int(b["target"][i])) in valid


def test_deterministic(saved):
    graph, out, _ = saved
    a = next(iter(make_query_loader(out, graph.schema, "1p", 8, seed=5)))
    b = next(iter(make_query_loader(out, graph.schema, "1p", 8, seed=5)))
    np.testing.assert_array_equal(a["target"], b["target"])
    c = next(iter(make_query_loader(out, graph.schema, "1p", 8, seed=6)))
    assert not np.array_equal(a["target"], c["target"])


def test_checkpoint_resume(saved):
    graph, out, _ = saved
    loader = make_query_loader(out, graph.schema, "1p", 8, seed=2)
    it = iter(loader)
    next(it)
    state = it.get_state()
    want = next(it)
    it2 = iter(loader)
    it2.set_state(state)
    got = next(it2)
    np.testing.assert_array_equal(want["target"], got["target"])


def test_run_train_stream_e2e(graph, tmp_path):
    """Beyond-RAM host pipeline end-to-end: stream batches from the npz
    shards through grain, run the full protocol, learn 1p above chance."""
    import jax

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.grain_pipeline import run_train_stream
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training import eval_auc

    s = QuerySampler(graph, np.random.default_rng(3), max_negs=10)
    save_queries(tmp_path, graph.schema,
                 s.sample_many("1p", 500) + s.sample_many("2i", 150))
    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    lr=0.05, seed=1, val_every=300, tol=0.0,
                    conv_window=10**6)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    val = s.sample_many("1p", 80) + s.sample_many("2i", 60)
    res = run_train_stream(cfg, graph.schema, params, tmp_path,
                           val_queries=val, total_steps=600,
                           burn_in_steps=400)
    assert res.steps == 600
    assert res.burn_in_steps == 400
    assert set(res.losses) == {"1p", "2i"}
    # windowed stream records one mean loss per DISPATCH (50 steps), so
    # compare the first dispatch against the last
    early = res.losses["1p"][0]
    late = res.losses["1p"][-1]
    assert late < 0.7 * early, (early, late)
    aucs = eval_auc(cfg, res.best_params, graph.schema, val)
    assert aucs["1p"] > 0.6, aucs


def test_run_train_stream_resume_bitwise(graph, tmp_path):
    """Stream-pipeline resume is exactly-once: a run checkpointed at step k
    and resumed must end with BITWISE-identical params to an uninterrupted
    run — grain iterator states, numpy RNG state, hard-neg toggle, and
    burn-in counters all restore (the pieces the batch sequence depends
    on)."""
    import jax

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.grain_pipeline import run_train_stream
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training.checkpoint import CheckpointManager

    s = QuerySampler(graph, np.random.default_rng(3), max_negs=10)
    data_dir = tmp_path / "q"
    data_dir.mkdir()
    save_queries(data_dir, graph.schema,
                 s.sample_many("1p", 300) + s.sample_many("2i", 150))
    cfg = GQEConfig(embed_dim=16, projection="transe", batch_size=32,
                    lr=0.05, seed=1, val_every=10**9, tol=0.0,
                    conv_window=10**6)
    p0 = init_params(cfg, graph.schema, jax.random.key(0))

    # uninterrupted control: 200 steps (burn-in 80)
    res_full = run_train_stream(cfg, graph.schema,
                                jax.tree.map(lambda x: x.copy(), p0),
                                data_dir, total_steps=200, burn_in_steps=80)

    # checkpointed run: ckpt every 60 -> kill (stop) at 120, then resume
    mgr = CheckpointManager(tmp_path / "ck", keep=3)
    run_train_stream(cfg, graph.schema,
                     jax.tree.map(lambda x: x.copy(), p0), data_dir,
                     total_steps=120, burn_in_steps=80,
                     ckpt_manager=mgr, ckpt_every=60)
    res_resumed = run_train_stream(cfg, graph.schema,
                                   jax.tree.map(lambda x: x.copy(), p0),
                                   data_dir, total_steps=200,
                                   burn_in_steps=80, ckpt_manager=mgr,
                                   ckpt_every=60, resume=True)
    assert res_resumed.steps == 200
    for a, b in zip(jax.tree.leaves(res_full.params),
                    jax.tree.leaves(res_resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def dataclasses_replace_val(cfg):
    import dataclasses

    return dataclasses.replace(cfg, val_every=200)


def test_run_train_stream_deep_encoder(graph, tmp_path):
    """--depth > 0 through the stream pipeline: the SAGE encoder threads
    into the windowed scan (neighbor_tables) and a short run learns 1p
    above chance."""
    import jax

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.data.grain_pipeline import run_train_stream
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.models.encoders import (
        NeighborTables,
        init_encoder_params,
    )
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training import eval_auc

    s = QuerySampler(graph, np.random.default_rng(3), max_negs=10)
    save_queries(tmp_path, graph.schema, s.sample_many("1p", 400))
    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    lr=0.05, seed=1, depth=1, val_every=10**9, tol=0.0,
                    conv_window=10**6)
    tables = NeighborTables.build(graph, sample_size=4, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    params["encoder"] = init_encoder_params(cfg, graph.schema,
                                            jax.random.key(1))
    val = s.sample_many("1p", 80)
    # val_queries exercises the IN-LOOP eval path too (it must thread
    # neighbor_tables — caught a depth>0 eval bug in review)
    cfg = dataclasses_replace_val(cfg)
    res = run_train_stream(cfg, graph.schema, params, tmp_path,
                           val_queries=val, total_steps=400,
                           burn_in_steps=400, neighbor_tables=tables)
    assert res.steps == 400
    assert res.best_val_auc > 0.55, res.best_val_auc
    aucs = eval_auc(cfg, res.params, graph.schema, val,
                    neighbor_tables=tables)
    assert aucs["1p"] > 0.55, aucs


def test_run_train_onthefly_deep_encoder(graph):
    """--depth > 0 through the onthefly pipeline: SAGE encoding composes
    with on-device sampling inside the compiled scan."""
    import jax

    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.models.encoders import (
        NeighborTables,
        init_encoder_params,
    )
    from graphqembed_tpu.models.params import init_params
    from graphqembed_tpu.training import eval_auc
    from graphqembed_tpu.data.sampling import QuerySampler
    from graphqembed_tpu.training.device_sampler import (
        DeviceGraph,
        run_train_onthefly,
    )

    cfg = GQEConfig(embed_dim=32, projection="transe", batch_size=64,
                    lr=0.05, seed=1, depth=1, val_every=10**9, tol=0.0,
                    conv_window=10**6)
    dg = DeviceGraph.build(graph, sample_size=4, seed=0)
    tables = NeighborTables.build(graph, sample_size=4, seed=0)
    params = init_params(cfg, graph.schema, jax.random.key(0))
    params["encoder"] = init_encoder_params(cfg, graph.schema,
                                            jax.random.key(1))
    res = run_train_onthefly(cfg, graph.schema, params, dg,
                             total_steps=400, burn_in_steps=400,
                             steps_per=50, neighbor_tables=tables)
    assert res.steps == 400
    s = QuerySampler(graph, np.random.default_rng(3), max_negs=10)
    val = s.sample_many("1p", 80)
    aucs = eval_auc(cfg, res.params, graph.schema, val,
                    neighbor_tables=tables)
    assert aucs["1p"] > 0.55, aucs


def test_window_packer_carve_matches_direct():
    """pack() output must equal per-array device_put of the same window
    arrays — one packed transfer + one jitted carve, same values/shapes,
    and a second pack with identical shapes reuses the carve program."""
    import jax.numpy as jnp

    from graphqembed_tpu.data.grain_pipeline import (
        _WINDOW_FIELDS,
        WindowPacker,
    )

    rng = np.random.default_rng(0)

    def mk(n, a, r, k):
        return {
            "anchors": rng.integers(0, 50, (n, a)).astype(np.int32),
            "rels": rng.integers(0, 6, (n, r)).astype(np.int32),
            "inter_modes": rng.integers(-1, 4, n).astype(np.int32),
            "targets": rng.integers(0, 50, n).astype(np.int32),
            "negs": rng.integers(0, 50, (n, 5)).astype(np.int32),
            "neg_counts": rng.integers(1, 5, n).astype(np.int32),
            "hard": rng.integers(0, 50, (n, 5)).astype(np.int32),
            "hard_counts": rng.integers(1, 5, n).astype(np.int32),
        }

    per = {"1p": mk(40, 1, 1, 5), "3i": mk(24, 3, 3, 5)}
    packer = WindowPacker()
    wins = packer.pack(per)
    for s, arrays in per.items():
        assert wins[s].n == len(arrays["targets"])
        for f in _WINDOW_FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(wins[s], f)), arrays[f])
    carve1 = packer._carve
    wins2 = packer.pack({"1p": mk(40, 1, 1, 5), "3i": mk(24, 3, 3, 5)})
    assert packer._carve is carve1  # same shapes -> no recompile
    assert int(jnp.sum(wins2["1p"].targets)) >= 0
