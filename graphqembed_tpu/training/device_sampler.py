"""On-device query sampling (BASELINE.json stretch capability: "query
sampling and path traversal compile to sparse gather/scatter over an
edge-partitioned adjacency", with "on-device negative resampling
(counter-based PRNG + type-range rejection)").

The exact offline sampler (data/sampling.py, native/) remains the source of
train/eval query sets with exact negatives; this module generates EDGE (1p),
PATH (2p/3p) and INTERSECTION (2i/3i) training batches entirely on device
from the padded per-relation neighbor tables — no host in the loop,
unlimited fresh samples. Negatives are type-range approximations (uniform
same-mode, rejected only against the sampled positive), the standard
large-scale approximation; exact-negative training stays available via the
pools. make_onthefly_train_step composes this into a pool-free scan
mega-step (sampling + training fused in one compiled program).

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


def sample_inter_batch(dg: DeviceGraph, key: jax.Array, b: int,
                       k_branches: int = 2):
    """On-device 2i/3i batch: anchors [b, k], rels [b, k], inter_modes [b],
    targets [b], negs [b], row_mask [b]. Branch 0 comes from an edge pick
    (anchor0 —rel0→ t); branches 1..k-1 sample in-edges of t via the REVERSE
    neighbor table (rel_i with t —rev(rel_i)→ anchor_i); rows with no valid
    in-edge, or duplicate (rel, anchor) branches, are masked out."""
    k_edge, k_br, k_neg = jax.random.split(key, 3)
    rel0, a0, tgt, ok = _pick_edges(dg, k_edge, b)
    rels = [rel0]
    anchors = [a0]
    tries = 8
    for i in range(1, k_branches):
        ki = jax.random.fold_in(k_br, i)
        k1, k2 = jax.random.split(ki)
        # candidate relation must ARRIVE at tgt's mode: its to-range contains
        # tgt; then anchor = a sample from the reverse table's row of tgt
        rel_c = dg.live_rels[
            jax.random.randint(k1, (b, tries), 0, dg.live_rels.shape[0])]
        in_range = ((tgt[:, None] >= dg.to_lo[rel_c])
                    & (tgt[:, None] < dg.to_hi[rel_c]))
        rev = dg.rel_rev[rel_c]                              # [b, T]
        local = tgt[:, None] - dg.to_lo[rel_c]               # tgt local in rev's from-range
        slot = jax.random.randint(k2, (b, tries), 0, dg.neighbors.shape[2])
        anchor = dg.neighbors[rev, jnp.maximum(local, 0), slot]
        valid = in_range & (anchor >= 0)
        # reject duplicates of earlier branches
        for rj, aj in zip(rels, anchors):
            valid &= ~((rel_c == rj[:, None]) & (anchor == aj[:, None]))
        first = jnp.argmax(valid, axis=1)
        take = lambda x: jnp.take_along_axis(x, first[:, None], axis=1)[:, 0]
        ok = ok & jnp.take_along_axis(valid, first[:, None], axis=1)[:, 0]
        rels.append(take(rel_c))
        anchors.append(take(anchor))
    inter_modes = dg.to_mode_id[rels[0]]
    neg = _neg_resample(dg, k_neg, rels[0], tgt)
    return (jnp.stack(anchors, axis=1), jnp.stack(rels, axis=1),
            inter_modes, tgt, neg, ok)


def make_onthefly_train_step(cfg, optimizer, dg: DeviceGraph):
    """Pool-free scan mega-step: each scan iteration SAMPLES its batch on
    device (sample_path_batch / sample_inter_batch) and takes one train step
    on it — sampling and training fused in one compiled program, zero host
    involvement and zero HBM pool. Supports structures 1p/2p/3p/2i/3i.

    Returns run(params, opt_state, structure, key, n_steps, weight)
    -> (params, opt_state, mean_loss)."""
    import optax

    from graphqembed_tpu.models import gqe

    b = cfg.batch_size

    @functools.partial(
        jax.jit,
        static_argnames=("structure", "n_steps"),
        donate_argnames=("params", "opt_state"),
    )
    def scan_fn(params, opt_state, dg, structure, key, n_steps, weight):
        def body(carry, t):
            params, opt_state = carry
            k = jax.random.fold_in(key, t)
            if structure in ("1p", "2p", "3p"):
                anchors, rels, tgt, neg, mask = sample_path_batch(
                    dg, k, b, n_hops=int(structure[0]))
                modes = jnp.full((b,), -1, jnp.int32)
            elif structure in ("2i", "3i"):
                anchors, rels, modes, tgt, neg, mask = sample_inter_batch(
                    dg, k, b, k_branches=int(structure[0]))
            else:
                raise ValueError(structure)

            def loss_fn(p):
                return weight * gqe.margin_loss_rows(
                    cfg, p, structure, anchors, rels, modes, tgt, neg, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(n_steps))
        return params, opt_state, jnp.mean(losses)

    def run(params, opt_state, structure: str, key, n_steps: int,
            weight: float):
        return scan_fn(params, opt_state, dg, structure, key, n_steps,
                       np.float32(weight))

    return run
