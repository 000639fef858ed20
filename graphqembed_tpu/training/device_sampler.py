"""On-device query sampling (BASELINE.json stretch capability: "query
sampling and path traversal compile to sparse gather/scatter over an
edge-partitioned adjacency", with "on-device negative resampling
(counter-based PRNG + type-range rejection)").

The exact offline sampler (data/sampling.py, native/) remains the source of
train/eval query sets with exact negatives; this module generates training
batches for ALL 7 STRUCTURES (1p/2p/3p chains, 2i/3i intersections, ip/pi
mixed) entirely on device from the padded per-relation neighbor tables — no
host in the loop, unlimited fresh samples. Negatives are type-range
approximations (uniform same-mode, rejected only against the sampled
positive), the standard large-scale approximation; exact-negative training
stays available via the pools. make_onthefly_train_step composes this into
a pool-free scan mega-step (sampling + training fused in one compiled
program); run_train_onthefly is the full-protocol driver behind
`gqe-train --pipeline onthefly`.

Device graph encoding (from models/encoders.py::NeighborTables):
  neighbors int32 [R, max_from, S] (−1 pad), rel_from_lo/rel_to_lo/rel_to_hi
  int32 [R], live relation ids int32 [Rl].
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from graphqembed_tpu.graph.graph import Graph
from graphqembed_tpu.models.encoders import NeighborTables


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["neighbors", "live_rels", "from_lo", "from_hi", "to_lo",
                 "to_hi", "rel_rev", "to_mode_id"],
    meta_fields=[],
)
@dataclasses.dataclass
class DeviceGraph:
    """Edge-partitioned adjacency sample on device."""

    neighbors: jnp.ndarray  # int32 [R, max_from, S], −1 pad, GLOBAL dst ids
    live_rels: jnp.ndarray  # int32 [Rl] relations with ≥1 edge
    from_lo: jnp.ndarray    # int32 [R]
    from_hi: jnp.ndarray
    to_lo: jnp.ndarray
    to_hi: jnp.ndarray
    rel_rev: jnp.ndarray    # int32 [R] reverse relation id
    to_mode_id: jnp.ndarray  # int32 [R] mode id of the to-side

    @classmethod
    def build(cls, graph: Graph, sample_size: int = 16,
              seed: int = 0) -> "DeviceGraph":
        schema = graph.schema
        tables = NeighborTables.build(graph, sample_size=sample_size,
                                      seed=seed)
        live = [i for i, r in enumerate(schema.relations) if graph.adj[r]]
        lo = np.array([schema.mode_range(r[0])[0] for r in schema.relations],
                      np.int32)
        hi = np.array([schema.mode_range(r[0])[1] for r in schema.relations],
                      np.int32)
        tlo = np.array([schema.mode_range(r[2])[0] for r in schema.relations],
                       np.int32)
        thi = np.array([schema.mode_range(r[2])[1] for r in schema.relations],
                       np.int32)
        rev = np.array([schema.reverse_rel_id(i)
                        for i in range(schema.n_relations)], np.int32)
        tmid = np.array([schema.mode_id(r[2]) for r in schema.relations],
                        np.int32)
        return cls(
            neighbors=jnp.asarray(tables.neighbors),
            live_rels=jnp.asarray(np.asarray(live, np.int32)),
            from_lo=jnp.asarray(lo), from_hi=jnp.asarray(hi),
            to_lo=jnp.asarray(tlo), to_hi=jnp.asarray(thi),
            rel_rev=jnp.asarray(rev), to_mode_id=jnp.asarray(tmid),
        )


def _pick_edges(dg: DeviceGraph, key: jax.Array, b: int, tries: int = 8):
    """Sample b (rel, src_gid, dst_gid, valid) uniformly-ish: `tries`
    candidate (rel, src, slot) triples per row, first valid wins."""
    s = dg.neighbors.shape[2]
    ks = jax.random.split(key, 3)
    rel_pos = jax.random.randint(ks[0], (b, tries), 0, dg.live_rels.shape[0])
    rel = dg.live_rels[rel_pos]                              # [b, T]
    n_from = dg.from_hi[rel] - dg.from_lo[rel]
    u = jax.random.randint(ks[1], (b, tries), 0, 1 << 30)
    local = u % n_from                                       # [b, T]
    slot = jax.random.randint(ks[2], (b, tries), 0, s)
    dst = dg.neighbors[rel, local, slot]                     # [b, T]
    valid = dst >= 0
    first = jnp.argmax(valid, axis=1)                        # first valid try
    take = lambda x: jnp.take_along_axis(x, first[:, None], axis=1)[:, 0]
    ok = jnp.take_along_axis(valid, first[:, None], axis=1)[:, 0]
    return take(rel), take(local) + dg.from_lo[take(rel)], take(dst), ok


def _neg_resample(dg: DeviceGraph, key: jax.Array, rel: jnp.ndarray,
                  target: jnp.ndarray, tries: int = 4) -> jnp.ndarray:
    """Type-range negative: uniform in the target mode of `rel`, rejecting
    collisions with the positive target over a fixed number of tries."""
    lo = dg.to_lo[rel]
    n = dg.to_hi[rel] - lo
    u = jax.random.randint(key, (tries,) + rel.shape, 0, 1 << 30)
    cand = lo[None] + (u % n[None])
    ok = cand != target[None]
    first = jnp.argmax(ok, axis=0)
    return jnp.take_along_axis(cand, first[None], axis=0)[0]


def sample_path_batch(dg: DeviceGraph, key: jax.Array, b: int,
                      n_hops: int = 1):
    """On-device 1p/2p/3p batch: anchors [b, 1], rels [b, n_hops],
    targets [b], negs [b], row_mask [b]. The walk extends FORWARD from a
    sampled edge (anchor→…→target), each hop a gather into the neighbor
    table; rows where any hop lands on padding are masked out."""
    k_edge, k_hops, k_neg = jax.random.split(key, 3)
    rel0, src, dst, ok = _pick_edges(dg, k_edge, b)
    rels = [rel0]
    cur = dst
    for h in range(1, n_hops):
        kh = jax.random.fold_in(k_hops, h)
        k1, k2, k3 = jax.random.split(kh, 3)
        rel_pos = jax.random.randint(k1, (b,), 0, dg.live_rels.shape[0])
        # next relation must depart from cur's mode: accept candidates whose
        # from-range contains cur (retry via tries axis)
        tries = 8
        rel_c = dg.live_rels[
            jax.random.randint(k1, (b, tries), 0, dg.live_rels.shape[0])]
        in_range = ((cur[:, None] >= dg.from_lo[rel_c])
                    & (cur[:, None] < dg.from_hi[rel_c]))
        slot = jax.random.randint(k2, (b, tries), 0, dg.neighbors.shape[2])
        local = cur[:, None] - dg.from_lo[rel_c]
        nxt = dg.neighbors[rel_c, jnp.maximum(local, 0), slot]
        valid = in_range & (nxt >= 0)
        first = jnp.argmax(valid, axis=1)
        take = lambda x: jnp.take_along_axis(x, first[:, None], axis=1)[:, 0]
        ok = ok & jnp.take_along_axis(valid, first[:, None], axis=1)[:, 0]
        rels.append(take(rel_c))
        cur = jnp.where(ok, take(nxt), cur)
    target = cur
    neg = _neg_resample(dg, k_neg, rels[-1], target)
    return (src[:, None], jnp.stack(rels, axis=1), target, neg, ok)


def _in_branch(dg: DeviceGraph, key: jax.Array, node: jnp.ndarray,
               prev: list, b: int, tries: int = 8):
    """Sample one in-edge branch of `node`: a (rel, anchor) with
    anchor —rel→ node, via the REVERSE neighbor table. `prev` is a list of
    (rel, anchor) pairs to reject as duplicates. Returns (rel, anchor, ok)."""
    k1, k2 = jax.random.split(key)
    rel_c = dg.live_rels[
        jax.random.randint(k1, (b, tries), 0, dg.live_rels.shape[0])]
    in_range = ((node[:, None] >= dg.to_lo[rel_c])
                & (node[:, None] < dg.to_hi[rel_c]))
    rev = dg.rel_rev[rel_c]                              # [b, T]
    local = node[:, None] - dg.to_lo[rel_c]              # local in rev's from-range
    slot = jax.random.randint(k2, (b, tries), 0, dg.neighbors.shape[2])
    anchor = dg.neighbors[rev, jnp.maximum(local, 0), slot]
    valid = in_range & (anchor >= 0)
    for rj, aj in prev:
        valid &= ~((rel_c == rj[:, None]) & (anchor == aj[:, None]))
    first = jnp.argmax(valid, axis=1)
    take = lambda x: jnp.take_along_axis(x, first[:, None], axis=1)[:, 0]
    ok = jnp.take_along_axis(valid, first[:, None], axis=1)[:, 0]
    return take(rel_c), take(anchor), ok


def _hard_neg_branches(dg: DeviceGraph, key: jax.Array,
                       anchors: jnp.ndarray, rels: jnp.ndarray,
                       tgt: jnp.ndarray, tries: int = 8):
    """On-device PARTIAL-BRANCH hard negative for an intersection at the
    node the branches join (SURVEY.md §2.2: hard negatives satisfy a proper
    subset of the branches): pick a random branch i, sample an alternative
    endpoint t' of anchor_i via rel_i (so t' SATISFIES branch i), and reject
    candidates that also appear in another branch j's sampled neighbor row
    (so t' likely FAILS branch j — membership is tested against the S
    table samples, the standard on-device approximation). anchors/rels
    [b, k] in FORWARD orientation (anchor —rel→ join). Returns
    (hard [b], ok [b]); callers fall back to the plain negative where ok is
    False."""
    b, k_br = anchors.shape
    k1, k2 = jax.random.split(key)
    i = jax.random.randint(k1, (b,), 0, k_br)
    pick = lambda x, idx: jnp.take_along_axis(x, idx[:, None], axis=1)[:, 0]
    rel_i = pick(rels, i)
    anc_i = pick(anchors, i)
    local_i = jnp.maximum(anc_i - dg.from_lo[rel_i], 0)
    slots = jax.random.randint(k2, (b, tries), 0, dg.neighbors.shape[2])
    cand = dg.neighbors[rel_i[:, None], local_i[:, None], slots]   # [b, T]
    j = (i + 1) % k_br
    rel_j = pick(rels, j)
    anc_j = pick(anchors, j)
    local_j = jnp.maximum(anc_j - dg.from_lo[rel_j], 0)
    row_j = dg.neighbors[rel_j, local_j]                           # [b, S]
    sat_j = (cand[:, :, None] == row_j[:, None, :]).any(axis=2)
    valid = (cand >= 0) & (cand != tgt[:, None]) & ~sat_j
    first = jnp.argmax(valid, axis=1)
    hard = jnp.take_along_axis(cand, first[:, None], axis=1)[:, 0]
    ok = jnp.take_along_axis(valid, first[:, None], axis=1)[:, 0]
    return hard, ok


def sample_inter_batch(dg: DeviceGraph, key: jax.Array, b: int,
                       k_branches: int = 2):
    """On-device 2i/3i batch: anchors [b, k], rels [b, k], inter_modes [b],
    targets [b], negs [b], hard_negs [b], hard_ok [b], row_mask [b]. Branch
    0 comes from an edge pick (anchor0 —rel0→ t); branches 1..k-1 sample
    in-edges of t via the REVERSE neighbor table (rel_i with
    t —rev(rel_i)→ anchor_i); rows with no valid in-edge, or duplicate
    (rel, anchor) branches, are masked out. hard_negs are partial-branch
    negatives (_hard_neg_branches) with hard_ok marking rows where one was
    found."""
    k_edge, k_br, k_neg, k_hard = jax.random.split(key, 4)
    rel0, a0, tgt, ok = _pick_edges(dg, k_edge, b)
    rels = [rel0]
    anchors = [a0]
    for i in range(1, k_branches):
        r, a, ok_i = _in_branch(dg, jax.random.fold_in(k_br, i), tgt,
                                list(zip(rels, anchors)), b)
        ok = ok & ok_i
        rels.append(r)
        anchors.append(a)
    inter_modes = dg.to_mode_id[rels[0]]
    neg = _neg_resample(dg, k_neg, rels[0], tgt)
    a_stack = jnp.stack(anchors, axis=1)
    r_stack = jnp.stack(rels, axis=1)
    hard, hard_ok = _hard_neg_branches(dg, k_hard, a_stack, r_stack, tgt)
    return (a_stack, r_stack, inter_modes, tgt, neg,
            jnp.where(hard_ok, hard, neg), hard_ok, ok)


def sample_ip_batch(dg: DeviceGraph, key: jax.Array, b: int):
    """On-device ip batch — (a1 —r1→ v) ∧ (a2 —r2→ v), then v —r3→ t
    [mirrors native/sampler.cpp case 5]: pick the final edge (r3, v, t),
    then two distinct in-branches at the JOIN node v. anchors [b, 2],
    rels [b, 3] = (r1, r2, r3), inter_modes [b] = v's mode."""
    k_edge, k_b1, k_b2, k_neg, k_hard, k_hp = jax.random.split(key, 6)
    r3, v, tgt, ok = _pick_edges(dg, k_edge, b)
    r1, a1, ok1 = _in_branch(dg, k_b1, v, [], b)
    r2, a2, ok2 = _in_branch(dg, k_b2, v, [(r1, a1)], b)
    ok = ok & ok1 & ok2
    anchors = jnp.stack([a1, a2], axis=1)
    rels = jnp.stack([r1, r2, r3], axis=1)
    inter_modes = dg.to_mode_id[r1]      # join node v's mode
    neg = _neg_resample(dg, k_neg, r3, tgt)
    # hard negative: a partial-branch join v' (satisfies one of the two
    # branches at v, fails the other), projected through r3 — so t' is
    # answerable for a proper subset of the query's constraints
    v_hard, hok = _hard_neg_branches(dg, k_hard, anchors,
                                     jnp.stack([r1, r2], axis=1), v)
    local = jnp.maximum(v_hard - dg.from_lo[r3], 0)
    slot = jax.random.randint(k_hp, (b,), 0, dg.neighbors.shape[2])
    t_hard = dg.neighbors[r3, local, slot]
    hok = hok & (t_hard >= 0) & (t_hard != tgt)
    return (anchors, rels, inter_modes, tgt, neg,
            jnp.where(hok, t_hard, neg), hok, ok)


def sample_pi_batch(dg: DeviceGraph, key: jax.Array, b: int):
    """On-device pi batch — (a1 —r1→ v —r2→ t) ∧ (a2 —r3→ t)
    [mirrors native/sampler.cpp case 6]: pick the chain's last edge
    (r2, v, t), extend backwards to a1 via an in-branch at v, add the edge
    branch (r3, a2) at t, rejecting the degenerate duplicate of the chain's
    own last edge. anchors [b, 2], rels [b, 3] = (r1, r2, r3),
    inter_modes [b] = t's mode."""
    k_edge, k_b1, k_b2, k_neg, k_hard = jax.random.split(key, 5)
    r2, v, tgt, ok = _pick_edges(dg, k_edge, b)
    r1, a1, ok1 = _in_branch(dg, k_b1, v, [], b)
    r3, a2, ok2 = _in_branch(dg, k_b2, tgt, [(r2, v)], b)
    ok = ok & ok1 & ok2
    anchors = jnp.stack([a1, a2], axis=1)
    rels = jnp.stack([r1, r2, r3], axis=1)
    inter_modes = dg.to_mode_id[r3]      # intersection at the target mode
    neg = _neg_resample(dg, k_neg, r3, tgt)
    # hard negative at t: the two branches joining at the target are the
    # chain's last hop (v —r2→ t) and the edge (a2 —r3→ t)
    hard, hok = _hard_neg_branches(
        dg, k_hard, jnp.stack([v, a2], axis=1),
        jnp.stack([r2, r3], axis=1), tgt)
    return (anchors, rels, inter_modes, tgt, neg,
            jnp.where(hok, hard, neg), hok, ok)


def sample_structure_batch(dg: DeviceGraph, key: jax.Array, b: int,
                           structure: str):
    """Dispatch table over all 7 structures -> (anchors, rels, inter_modes,
    targets, negs, hard_negs, hard_ok, row_mask). `structure` is static.
    Chains carry hard_negs == negs with hard_ok all-False (no intersection
    to take a partial branch of)."""
    if structure in ("1p", "2p", "3p"):
        anchors, rels, tgt, neg, mask = sample_path_batch(
            dg, key, b, n_hops=int(structure[0]))
        modes = jnp.full((b,), -1, jnp.int32)
        return (anchors, rels, modes, tgt, neg, neg,
                jnp.zeros((b,), jnp.bool_), mask)
    if structure in ("2i", "3i"):
        return sample_inter_batch(dg, key, b, k_branches=int(structure[0]))
    if structure == "ip":
        return sample_ip_batch(dg, key, b)
    if structure == "pi":
        return sample_pi_batch(dg, key, b)
    raise ValueError(structure)


def make_onthefly_train_step(cfg, optimizer, dg: DeviceGraph,
                             neighbor_tables=None, mesh=None):
    """Pool-free scan mega-step: each scan iteration SAMPLES its batch on
    device (sample_structure_batch) and takes one train step on it —
    sampling and training fused in one compiled program, zero host
    involvement and zero HBM pool. Supports all 7 structures.

    use_hard=True runs §2.5's hard-negative alternation on device: steps
    where device_data._hard_step(cfg, t) holds (strict parity alternation at
    hard_neg_frac=0.5, generalized cycle otherwise) score against the
    PARTIAL-BRANCH hard negative (_hard_neg_branches); rows where no hard
    candidate was found fall back to the plain type-range negative.

    mesh: the MULTI-CHIP form of the quality-flagship pipeline: the
    DeviceGraph (per-relation neighbor tables — small relative to the
    embedding state) and neighbor_tables are placed replicated, the sampled
    [T, B, ...] batch arrays carry a with_sharding_constraint DP split on
    the batch axis (so GSPMD shards both the SAMPLING work and the train
    step across devices), and params are expected row-sharded
    (parallel.shard_params). Sample draws are a pure function of
    fold_in(key, t), so the stream is IDENTICAL to the single-device
    pipeline; losses match up to DP-psum reduction order (pinned by
    test_sharded_trainer.py). Requires a GSPMD-partitionable optimizer
    (optax; not FusedAdamOpt — see make_multitask_mega_step).

    Returns run(params, opt_state, structure, key, n_steps, weight,
    use_hard) -> (params, opt_state, mean_loss)."""
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.training.device_data import (
        FusedAdamOpt,
        _apply_optimizer,
        _hard_step,
    )

    b = cfg.batch_size
    batch_constraint = None
    if mesh is not None:
        if isinstance(optimizer, FusedAdamOpt):
            raise ValueError(
                "mesh training requires a GSPMD-partitionable optimizer "
                "(optax.adam / storage_dtype=float32), not FusedAdamOpt")
        from jax.sharding import NamedSharding, PartitionSpec

        def batch_constraint(x):
            spec = PartitionSpec(None, "data", *([None] * (x.ndim - 2)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))

    @functools.partial(
        jax.jit,
        static_argnames=("structure", "n_steps", "use_hard"),
        donate_argnames=("params", "opt_state"),
    )
    def scan_fn(params, opt_state, dg, tables, structure, key, n_steps,
                weight, use_hard):
        # ALL n_steps batches sampled before the scan in a handful of big
        # vmapped kernels (the device_data._select_batches lever: in-body
        # sampling cost the onthefly step ~25% at mid-scale). Per-step
        # values are identical — each step's draws are a pure function of
        # fold_in(key, t).
        ts = jnp.arange(n_steps)
        keys = jax.vmap(lambda t: jax.random.fold_in(key, t))(ts)
        batches = jax.vmap(
            lambda k: sample_structure_batch(dg, k, b, structure))(keys)
        if batch_constraint is not None:
            batches = jax.tree.map(batch_constraint, batches)

        def body(carry, xs):
            params, opt_state = carry
            t, (anchors, rels, modes, tgt, neg, hard_neg, hard_ok,
                mask) = xs
            if use_hard:
                neg = jnp.where(_hard_step(cfg, t), hard_neg, neg)

            def loss_fn(p):
                if cfg.depth > 0 and tables is not None:
                    from graphqembed_tpu.models.encoders import (
                        make_deep_encoder,
                    )
                    encode_fn = make_deep_encoder(cfg, p, tables, cfg.depth,
                                                  cfg.aggregator)
                    return weight * gqe.margin_loss_rows(
                        cfg, p, structure, anchors, rels, modes, tgt, neg,
                        mask, encode_fn=encode_fn)
                return weight * gqe.margin_loss_rows_onegather(
                    cfg, p, structure, anchors, rels, modes, tgt, neg, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state = _apply_optimizer(optimizer, params, grads,
                                                 opt_state)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (ts, batches))
        return params, opt_state, jnp.mean(losses)

    placed_dg, placed_tables = dg, neighbor_tables
    if mesh is not None:
        from graphqembed_tpu.parallel.mesh import replicated
        rep = replicated(mesh)
        placed_dg = jax.device_put(dg, rep)
        if neighbor_tables is not None:
            placed_tables = jax.device_put(neighbor_tables, rep)

    def run(params, opt_state, structure: str, key, n_steps: int,
            weight: float, use_hard: bool = False):
        return scan_fn(params, opt_state, placed_dg, placed_tables,
                       structure, key, n_steps, np.float32(weight),
                       bool(use_hard))

    return run


def run_train_onthefly(cfg, schema, params, dg: DeviceGraph,
                       val_queries=None, total_steps: int | None = None,
                       burn_in_steps: int | None = None,
                       steps_per: int = 100, key=None, optimizer=None,
                       log=None, ckpt_manager=None, ckpt_every: int = 0,
                       resume: bool = False, neighbor_tables=None,
                       mesh=None):
    """Production driver for the pool-free pipeline (`gqe-train --pipeline
    onthefly`): burn-in (1p) then weighted multitask over all 7 structures,
    every batch sampled ON DEVICE inside the compiled scan — the
    BASELINE.json stretch capability ("query sampling and path traversal
    compile to sparse gather/scatter") end to end. Intersection structures
    run §2.5's hard-negative alternation with on-device partial-branch hard
    negatives (use_hard in make_onthefly_train_step). Eval still uses
    offline exact-negative val queries.

    Checkpoint/resume (ckpt_manager + ckpt_every): saves at dispatch
    boundaries; the batch stream is a pure function of (key, dispatch_i) —
    every sample is drawn from fold_in(key, dispatch_i) inside the scan —
    so resume replays bit-identically with no host sampler state to save
    (pinned by tests/test_fault_injection.py). Returns a
    training/loop.py::TrainResult.

    mesh: runs the full protocol multi-chip (see make_onthefly_train_step):
    params row-sharded here; sampling + training GSPMD-sharded; eval and
    checkpointing run unchanged on the sharded arrays."""
    import time

    from graphqembed_tpu.config import INTERSECT_STRUCTURES, STRUCTURES
    from graphqembed_tpu.training.device_data import default_optimizer
    from graphqembed_tpu.training.eval import eval_auc
    from graphqembed_tpu.training.loop import (
        TrainResult,
        check_conv,
        structure_weight,
    )

    total_steps = total_steps if total_steps is not None else cfg.max_iter
    burn_in_steps = (burn_in_steps if burn_in_steps is not None
                     else min(cfg.max_burn_in, total_steps))
    optimizer = optimizer or default_optimizer(cfg)
    if mesh is not None:
        from graphqembed_tpu.parallel.mesh import shard_params
        params = shard_params(params, mesh)
    opt_state = optimizer.init(params)
    key = key if key is not None else jax.random.key(cfg.seed)
    step_fn = make_onthefly_train_step(cfg, optimizer, dg,
                                       neighbor_tables=neighbor_tables,
                                       mesh=mesh)
    structures = list(STRUCTURES)
    losses: dict[str, list[float]] = {s: [] for s in structures}
    burn_series: list[float] = []
    multi_series: list[float] = []
    val_history: list[tuple[int, float]] = []
    best_macro = -1.0
    best_params = jax.tree.map(lambda x: x.copy(), params)
    done = 0
    dispatch_i = 0
    actual_burn_in = 0
    in_burn = True
    last_ckpt = 0
    t0 = time.time()

    if resume and ckpt_manager is not None:
        like = {"params": params, "opt_state": opt_state,
                "best_params": params}
        if mesh is not None:
            from graphqembed_tpu.parallel.mesh import mesh_consistent
            like = mesh_consistent(like, mesh)
        restored = ckpt_manager.restore_latest(like=like)
        if restored is not None:
            state, meta = restored
            params = state["params"]
            opt_state = state["opt_state"]
            best_params = state["best_params"]
            done = last_ckpt = int(meta["step"])
            dispatch_i = int(meta["dispatch_i"])
            actual_burn_in = int(meta["burn_in_steps"])
            in_burn = bool(meta["in_burn"])
            best_macro = float(meta["best_macro"])
            burn_series = list(meta.get("burn_tail", []))
            multi_series = list(meta.get("multi_tail", []))

    def dispatch(structure, n):
        nonlocal params, opt_state, done, dispatch_i
        params, opt_state, mloss = step_fn(
            params, opt_state, structure,
            jax.random.fold_in(key, dispatch_i), n,
            structure_weight(cfg, structure),
            structure in INTERSECT_STRUCTURES and cfg.hard_neg_alternate)
        dispatch_i += 1
        done += n
        loss = float(mloss)
        losses[structure].append(loss)
        if log:
            log(done, structure, loss)
        return loss

    def maybe_ckpt(force: bool = False):
        nonlocal last_ckpt
        if ckpt_manager is None or not ckpt_every or \
                (done - last_ckpt < ckpt_every and not force) or \
                done == last_ckpt:
            return
        ckpt_manager.save_state(
            done,
            {"params": params, "opt_state": opt_state,
             "best_params": best_params},
            extra={"dispatch_i": dispatch_i, "in_burn": in_burn,
                   "burn_in_steps": actual_burn_in,
                   "best_macro": best_macro,
                   "burn_tail": burn_series[-cfg.conv_window:],
                   "multi_tail": multi_series[-cfg.conv_window:]})
        last_ckpt = done

    burn_window = max(1, round(cfg.conv_window / steps_per))
    while in_burn and done < burn_in_steps:
        burn_series.append(dispatch("1p", min(steps_per,
                                              burn_in_steps - done)))
        if (check_conv(burn_series, burn_window, cfg.tol)
                or done >= burn_in_steps):
            in_burn = False
            actual_burn_in = done
        maybe_ckpt()
    if in_burn:
        in_burn = False
        actual_burn_in = done

    multi_window = max(1, round(cfg.conv_window
                                / (len(structures) * steps_per)))
    eval_every = max(1, cfg.val_every)
    next_eval = done + eval_every
    while done < total_steps:
        round_losses = []
        for s in structures:
            if done >= total_steps:
                break
            round_losses.append(dispatch(s, min(steps_per,
                                                total_steps - done)))
        multi_series.append(float(np.mean(round_losses)))
        if val_queries and done >= next_eval:
            aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                            neighbor_tables=neighbor_tables)
            macro = aucs.get("macro", 0.0)
            val_history.append((done, macro))
            if macro > best_macro:
                best_macro = macro
                best_params = jax.tree.map(lambda x: x.copy(), params)
            next_eval = done + eval_every
        maybe_ckpt()
        if check_conv(multi_series, multi_window, cfg.tol):
            break
    maybe_ckpt(force=True)  # final state (resume-to-completion lands here)
    if val_queries and not val_history:
        aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                        neighbor_tables=neighbor_tables)
        best_macro = aucs.get("macro", 0.0)
        val_history.append((done, best_macro))
        best_params = params
    dt = time.time() - t0
    return TrainResult(
        params=params,
        best_params=best_params if best_macro >= 0 else params,
        best_val_auc=best_macro,
        steps=done,
        burn_in_steps=actual_burn_in,
        losses=losses,
        val_history=val_history,
        queries_per_sec=done * cfg.batch_size / max(dt, 1e-9),
    )
