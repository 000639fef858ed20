"""On-device query sampling (BASELINE.json stretch capability: "query
sampling and path traversal compile to sparse gather/scatter over an
edge-partitioned adjacency", with "on-device negative resampling
(counter-based PRNG + type-range rejection)").

The exact offline sampler (data/sampling.py, native/) remains the source of
train/eval query sets with exact negatives; this module generates training
batches for ALL 7 STRUCTURES (1p/2p/3p chains, 2i/3i intersections, ip/pi
mixed) entirely on device — no host in the loop, unlimited fresh samples.
r05 substrate: an EXACT flat-CSR edge list (DeviceGraph.edges/node_ptr/
node_rel_cnt — every edge, rejection-free one-randint picks; the S-sampled
per-relation neighbor tables remain only for hard-negative membership
tests, where a subset is inherent). The pick DISTRIBUTION is a measured
config (GQEConfig.onthefly_anchor_dist; default "rel" = the offline C++
sampler's relation-uniform-first schedule — RESULTS_onthefly_quality.md).
Negatives are type-range approximations (uniform same-mode, rejected only
against the sampled positive), the standard large-scale approximation;
exact-negative training stays available via the pools.
make_onthefly_train_step composes this into a pool-free scan mega-step
(sampling + training fused in one compiled program; mesh= for the GSPMD
multi-chip form); run_train_onthefly is the full-protocol driver behind
`gqe-train --pipeline onthefly [--mesh N]`.
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
                 "to_hi", "rel_rev", "to_mode_id", "edges", "node_ptr",
                 "node_rel_cnt"],
    meta_fields=[],
)
@dataclasses.dataclass
class DeviceGraph:
    """Edge-partitioned adjacency on device: a flat src-ordered directed
    edge list over the reversal-closed graph (EXACT — every edge, not a
    sample) plus the S-sampled per-relation neighbor tables (used for hard-
    negative membership tests, where an approximate subset is inherent).

    The flat list is the round-5 sampler substrate (docs/DESIGN.md §13):
    a node's out-edges are a contiguous row slice (node_ptr), so
    - uniform-EDGE sampling is one randint + three [b] gathers (exactly
      edge-uniform — the pool protocol's 1p distribution, closing the
      relation-uniform bias of the r04 try-based sampler), and
    - uniform in-/out-edge sampling AT a node is one randint + gathers
      (in-edges of n are its out-edges reversed, by reversal closure) —
      no rejection tries anywhere on the hot path.
    """

    neighbors: jnp.ndarray  # int32 [R, max_from, S], −1 pad, GLOBAL dst ids
    live_rels: jnp.ndarray  # int32 [Rl] relations with ≥1 edge
    from_lo: jnp.ndarray    # int32 [R]
    from_hi: jnp.ndarray
    to_lo: jnp.ndarray
    to_hi: jnp.ndarray
    rel_rev: jnp.ndarray    # int32 [R] reverse relation id
    to_mode_id: jnp.ndarray  # int32 [R] mode id of the to-side
    # PACKED rows so each random access is ONE row-DMA instead of 2-3
    # scalar gathers (the sampler is gather-descriptor-bound, ~9 ns/row —
    # docs/DESIGN.md §13): edges[e] = (rel, src, dst, 0), ordered by src;
    # node_ptr[n] = (start, out_degree) — out-edges of n are rows
    # [start, start+deg) of `edges`.
    edges: jnp.ndarray      # int32 [E, 4]
    node_ptr: jnp.ndarray   # int32 [N, 2]
    # Relation-uniform support (the OFFLINE protocol's distribution —
    # native/sampler.cpp picks relations uniformly first for chains and
    # in-branches; edge-frequency-weighted hops measurably starve
    # rare-relation chains, r05 paper-scale: 2p −0.10 / 3p −0.14 val AUC):
    # node_rel_cnt[n, r] = n's out-edge count under r (a node's row in
    # `edges` is relation-sorted, so r's block starts at
    # node_ptr[n,0] + sum(node_rel_cnt[n, :r])).
    node_rel_cnt: jnp.ndarray  # int32 [N, R]

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
        e_src, e_rel, e_dst, gptr, nrc = cls._flat_edges(graph)
        return cls(
            neighbors=jnp.asarray(tables.neighbors),
            live_rels=jnp.asarray(np.asarray(live, np.int32)),
            from_lo=jnp.asarray(lo), from_hi=jnp.asarray(hi),
            to_lo=jnp.asarray(tlo), to_hi=jnp.asarray(thi),
            rel_rev=jnp.asarray(rev), to_mode_id=jnp.asarray(tmid),
            edges=jnp.asarray(np.stack(
                [e_rel, e_src, e_dst, np.zeros_like(e_rel)], axis=1)),
            node_ptr=jnp.asarray(np.stack(
                [gptr[:-1], gptr[1:] - gptr[:-1]], axis=1)),
            node_rel_cnt=jnp.asarray(nrc),
        )

    @staticmethod
    def _flat_edges(graph: Graph):
        """Src-ordered flat directed edge list over ALL relations (vectorized
        from the per-relation CSRs; ~20 bytes/edge in HBM)."""
        schema = graph.schema
        n = schema.n_nodes
        counts = np.zeros(n, np.int64)
        rel_rows = []
        for ri, rel in enumerate(schema.relations):
            indptr_r, indices_r = graph.csr(rel)
            rlo, _ = schema.mode_range(rel[0])
            cnt = np.diff(indptr_r)
            counts[rlo:rlo + len(cnt)] += cnt
            rel_rows.append((ri, rlo, indptr_r, indices_r, cnt))
        gptr = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=gptr[1:])
        e_total = int(gptr[-1])
        assert e_total < 2**31, e_total
        e_src = np.empty(e_total, np.int32)
        e_rel = np.empty(e_total, np.int32)
        e_dst = np.empty(e_total, np.int32)
        nrc = np.zeros((n, schema.n_relations), np.int32)
        fill = gptr[:-1].copy()
        for ri, rlo, indptr_r, indices_r, cnt in rel_rows:
            if indices_r.size == 0:
                continue
            rows = np.repeat(np.arange(len(cnt)), cnt)
            offs = np.arange(len(indices_r)) - np.repeat(indptr_r[:-1], cnt)
            pos = fill[rlo + rows] + offs
            e_src[pos] = (rlo + rows).astype(np.int32)
            e_rel[pos] = ri
            e_dst[pos] = indices_r
            fill[rlo:rlo + len(cnt)] += cnt
            nrc[rlo:rlo + len(cnt), ri] = cnt
        return e_src, e_rel, e_dst, gptr.astype(np.int32), nrc


def _pick_edges(dg: DeviceGraph, key: jax.Array, b: int,
                dist: str = "edge"):
    """Sample b edges, rejection-free on the flat CSR. Returns
    (rel, src_gid, dst_gid, valid).

    dist="edge": EXACTLY edge-uniform (the pool protocol's 1p
    distribution) — one randint into the flat edge list + one packed [b, 4]
    row gather; valid always True.
    dist="node": uniform NODE then uniform out-edge — oversamples
    low-degree nodes' edges (≈ the r04 sampler's schedule, which the
    mid-scale guard shows HELPS quality: tail nodes get positive
    gradients); rows landing on a zero-out-degree node are masked.
    Either way this replaces the r04 8-try relation→node→slot chain
    (docs/DESIGN.md §13)."""
    if dist == "rel":
        # the OFFLINE protocol's first pick (native/sampler.cpp::walk +
        # pick_edge): uniform live RELATION, then a NODE uniform in the
        # relation's from-range (two candidates, first with edges wins —
        # the C++ sampler retries until success; rows where both miss are
        # masked), then a neighbor uniform within (node, rel)
        k1, k2, k3 = jax.random.split(key, 3)
        r = dg.live_rels[
            jax.random.randint(k1, (b,), 0, dg.live_rels.shape[0])]
        n_from = dg.from_hi[r] - dg.from_lo[r]
        u2 = jax.random.randint(k2, (2, b), 0, 1 << 30)
        cand = dg.from_lo[r][None] + u2 % jnp.maximum(n_from, 1)[None]
        cnt2 = dg.node_rel_cnt[cand, r[None]]            # [2, b]
        sel0 = cnt2[0] > 0
        node = jnp.where(sel0, cand[0], cand[1])
        crow = dg.node_rel_cnt[node]                     # [b, R]
        take = lambda x, i: jnp.take_along_axis(x, i[:, None], 1)[:, 0]
        c = take(crow, r)
        off0 = take(jnp.cumsum(crow, axis=1), r) - c
        start = dg.node_ptr[node][:, 0]
        u = jax.random.randint(k3, (b,), 0, 1 << 30)
        rows = dg.edges[start + off0 + u % jnp.maximum(c, 1)]
        return rows[:, 0], rows[:, 1], rows[:, 2], c > 0
    if dist == "node":
        k1, k2 = jax.random.split(key)
        node = jax.random.randint(k1, (b,), 0, dg.node_ptr.shape[0])
        start, deg = _out_deg(dg, node)
        u = jax.random.randint(k2, (b,), 0, 1 << 30)
        rows = dg.edges[start + u % jnp.maximum(deg, 1)]
        return rows[:, 0], rows[:, 1], rows[:, 2], deg > 0
    e = jax.random.randint(key, (b,), 0, dg.edges.shape[0])
    rows = dg.edges[e]                                   # one [b, 4] gather
    return rows[:, 0], rows[:, 1], rows[:, 2], jnp.ones((b,), jnp.bool_)


def _out_deg(dg: DeviceGraph, node: jnp.ndarray):
    """(row start, out-degree) of `node` in the flat edge list."""
    row = dg.node_ptr[node]                              # one [.., 2] gather
    return row[..., 0], row[..., 1]


def _k_distinct_out_edges(dg: DeviceGraph, key: jax.Array,
                          node: jnp.ndarray, k: int):
    """k DISTINCT uniform out-edges of `node` (exact without-replacement via
    sequential skip-insertion, k ≤ 3). In the reversal-closed graph a
    node's in-edges are its out-edges reversed, so this is also the exact
    k-distinct-in-branch sampler for intersections. Returns
    (edge indices [k, b], ok [b] = degree ≥ k)."""
    assert 1 <= k <= 3, k
    start, deg = _out_deg(dg, node)
    ok = deg >= k
    us = jax.random.randint(key, (k,) + node.shape, 0, 1 << 30)
    o0 = us[0] % jnp.maximum(deg, 1)
    offs = [o0]
    if k >= 2:
        o1 = us[1] % jnp.maximum(deg - 1, 1)
        o1 = o1 + (o1 >= o0)
        offs.append(o1)
    if k >= 3:
        o2 = us[2] % jnp.maximum(deg - 2, 1)
        lo_, hi_ = jnp.minimum(o0, o1), jnp.maximum(o0, o1)
        o2 = o2 + (o2 >= lo_)
        o2 = o2 + (o2 >= hi_)
        offs.append(o2)
    return start[None] + jnp.stack(offs), ok


def _out_edge_excluding_pair(dg: DeviceGraph, key: jax.Array,
                             node: jnp.ndarray, ex_rel: jnp.ndarray,
                             ex_dst: jnp.ndarray):
    """One uniform out-edge of `node`, excluding the (ex_rel, ex_dst) edge:
    draw, and on a hit take the cyclic successor (which thus carries 2/deg
    weight — a one-edge bias, accepted; the row offset of a known edge is
    not available without a per-relation search). Returns (eidx, ok)."""
    start, deg = _out_deg(dg, node)
    ok = deg >= 2
    u = jax.random.randint(key, node.shape, 0, 1 << 30)
    off = u % jnp.maximum(deg, 1)
    row = dg.edges[start + off]
    hit = (row[..., 0] == ex_rel) & (row[..., 2] == ex_dst)
    off = jnp.where(hit, (off + 1) % jnp.maximum(deg, 1), off)
    return start + off, ok


def _pick_valid(key: jax.Array, valid: jnp.ndarray):
    """Uniform index among True entries of each row of valid [b, S] (cumsum
    selection — exact, unlike first-of-random-slots). Returns
    (idx [b], ok [b])."""
    cnt = valid.sum(axis=1)
    u = jax.random.randint(key, (valid.shape[0],), 0, 1 << 30)
    sel = u % jnp.maximum(cnt, 1)
    csum = jnp.cumsum(valid, axis=1)
    idx = jnp.argmax(csum == (sel + 1)[:, None], axis=1)
    return idx, cnt > 0


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


def _k_distinct_branches_rel(dg: DeviceGraph, key: jax.Array,
                             node: jnp.ndarray, k: int):
    """k distinct out-edges of `node`, RELATION-UNIFORM first (the offline
    protocol: uniform among the node's PRESENT out-relations, then uniform
    within that relation's block of the node's relation-sorted row).
    Distinctness via cyclic shift within the block on collision (k ≤ 3;
    rows where a collision survives the shifts are masked). Returns
    (eidx [k, b], ok [b])."""
    start, deg = _out_deg(dg, node)
    cnt = dg.node_rel_cnt[node]                      # [b, R] one row gather
    csum = jnp.cumsum(cnt, axis=-1)
    ok = deg >= k
    take = lambda x, i: jnp.take_along_axis(x, i[..., None], -1)[..., 0]
    picks = []
    for i in range(k):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        ridx, ok_i = _pick_valid(k1, cnt > 0)
        c = take(cnt, ridx)
        off0 = take(csum, ridx) - c
        u = jax.random.randint(k2, node.shape, 0, 1 << 30)
        off = u % jnp.maximum(c, 1)
        for _ in range(len(picks)):
            e = start + off0 + off
            coll = jnp.zeros_like(ok)
            for pe in picks:
                coll = coll | (e == pe)
            off = jnp.where(coll, (off + 1) % jnp.maximum(c, 1), off)
        e = start + off0 + off
        for pe in picks:
            ok = ok & (e != pe)
        ok = ok & ok_i
        picks.append(e)
    return jnp.stack(picks), ok


def _rel_out_edge_excluding_pair(dg: DeviceGraph, key: jax.Array,
                                 node: jnp.ndarray, ex_rel: jnp.ndarray,
                                 ex_dst: jnp.ndarray):
    """Relation-uniform out-edge of `node` excluding the (ex_rel, ex_dst)
    edge (cyclic-successor shift within the block on a hit, as in
    _out_edge_excluding_pair). Returns (eidx, ok)."""
    start, deg = _out_deg(dg, node)
    cnt = dg.node_rel_cnt[node]
    csum = jnp.cumsum(cnt, axis=-1)
    take = lambda x, i: jnp.take_along_axis(x, i[..., None], -1)[..., 0]
    k1, k2 = jax.random.split(key)
    ridx, _ = _pick_valid(k1, cnt > 0)
    c = take(cnt, ridx)
    off0 = take(csum, ridx) - c
    u = jax.random.randint(k2, node.shape, 0, 1 << 30)
    off = u % jnp.maximum(c, 1)
    e = start + off0 + off
    row = dg.edges[e]
    hit = (row[..., 0] == ex_rel) & (row[..., 2] == ex_dst)
    off = jnp.where(hit, (off + 1) % jnp.maximum(c, 1), off)
    e = start + off0 + off
    # the cyclic shift stays inside the RELATION block: when the excluded
    # edge's block has c == 1 and was chosen, the shift lands back on the
    # excluded edge — mask those rows instead of emitting a degenerate
    # duplicate branch
    row2 = dg.edges[e]
    still = (row2[..., 0] == ex_rel) & (row2[..., 2] == ex_dst)
    return e, (deg >= 2) & ~still


def sample_path_batch(dg: DeviceGraph, key: jax.Array, b: int,
                      n_hops: int = 1, dist: str = "edge"):
    """On-device 1p/2p/3p batch: anchors [b, 1], rels [b, n_hops],
    targets [b], negs [b], row_mask [b]. The first edge is EXACTLY
    edge-uniform (flat list); each further hop is a uniform out-edge of the
    current node (one randint + two gathers — reversal closure guarantees
    out-degree ≥ 1 at any reached node, so rows never fail)."""
    k_edge, k_hops, k_neg = jax.random.split(key, 3)
    rel0, src, dst, ok = _pick_edges(dg, k_edge, b, dist)
    rels = [rel0]
    cur = dst
    for h in range(1, n_hops):
        kh = jax.random.fold_in(k_hops, h)
        if dist == "rel":
            # offline-protocol hop: uniform among cur's present relations,
            # then uniform within that relation's block
            e, ok_h = _k_distinct_branches_rel(dg, kh, cur, 1)
            rows = dg.edges[e[0]]
            deg_ok = ok_h
        else:
            start, deg = _out_deg(dg, cur)
            u = jax.random.randint(kh, (b,), 0, 1 << 30)
            rows = dg.edges[start + u % jnp.maximum(deg, 1)]
            deg_ok = deg > 0
        ok = ok & deg_ok        # guard; always true under reversal closure
        rels.append(rows[:, 0])
        cur = jnp.where(deg_ok, rows[:, 2], cur)
    target = cur
    neg = _neg_resample(dg, k_neg, rels[-1], target)
    return (src[:, None], jnp.stack(rels, axis=1), target, neg, ok)


def _hard_neg_branches(dg: DeviceGraph, key: jax.Array,
                       anchors: jnp.ndarray, rels: jnp.ndarray,
                       tgt: jnp.ndarray):
    """On-device PARTIAL-BRANCH hard negative for an intersection at the
    node the branches join (SURVEY.md §2.2: hard negatives satisfy a proper
    subset of the branches): pick a random branch i, choose an alternative
    endpoint t' of anchor_i via rel_i UNIFORMLY among the valid candidates
    of the S-sampled neighbor row (one row gather + cumsum selection —
    r05: replaces 8 scalar-gather tries with first-valid bias), rejecting
    candidates that also appear in branch j's sampled neighbor row (so t'
    likely FAILS branch j — membership against the S table samples, the
    standard on-device approximation). anchors/rels [b, k] in FORWARD
    orientation (anchor —rel→ join). Returns (hard [b], ok [b]); callers
    fall back to the plain negative where ok is False."""
    b, k_br = anchors.shape
    k1, k2 = jax.random.split(key)
    i = jax.random.randint(k1, (b,), 0, k_br)
    pick = lambda x, idx: jnp.take_along_axis(x, idx[:, None], axis=1)[:, 0]
    rel_i = pick(rels, i)
    anc_i = pick(anchors, i)
    local_i = jnp.maximum(anc_i - dg.from_lo[rel_i], 0)
    cand = dg.neighbors[rel_i, local_i]                            # [b, S]
    j = (i + 1) % k_br
    rel_j = pick(rels, j)
    anc_j = pick(anchors, j)
    local_j = jnp.maximum(anc_j - dg.from_lo[rel_j], 0)
    row_j = dg.neighbors[rel_j, local_j]                           # [b, S]
    sat_j = (cand[:, :, None] == row_j[:, None, :]).any(axis=2)
    valid = (cand >= 0) & (cand != tgt[:, None]) & ~sat_j
    idx, ok = _pick_valid(k2, valid)
    hard = jnp.take_along_axis(cand, idx[:, None], axis=1)[:, 0]
    return hard, ok


def sample_inter_batch(dg: DeviceGraph, key: jax.Array, b: int,
                       k_branches: int = 2, dist: str = "edge"):
    """On-device 2i/3i batch: anchors [b, k], rels [b, k], inter_modes [b],
    targets [b], negs [b], hard_negs [b], hard_ok [b], row_mask [b]. The
    target comes from an edge-uniform pick (so targets are in-degree
    weighted, as in r04); the k branches are k DISTINCT uniform in-edges of
    t — exact without-replacement over the flat out-edge row of t reversed
    (_k_distinct_out_edges), replacing the r04 reject-duplicates retry
    chain. Rows with in-degree < k are masked out. hard_negs are
    partial-branch negatives (_hard_neg_branches) with hard_ok marking rows
    where one was found."""
    k_t, k_br, k_neg, k_hard = jax.random.split(key, 4)
    _, _, tgt, ok_t = _pick_edges(dg, k_t, b, dist)
    branches = (_k_distinct_branches_rel if dist == "rel"
                else _k_distinct_out_edges)
    eidx, ok = branches(dg, k_br, tgt, k_branches)               # [k, b]
    ok = ok & ok_t
    rows = dg.edges[eidx]                         # one [k, b, 4] gather
    anchors = rows[..., 2]                        # [k, b]
    rels = dg.rel_rev[rows[..., 0]]               # forward: a —rel→ tgt
    inter_modes = dg.to_mode_id[rels[0]]
    neg = _neg_resample(dg, k_neg, rels[0], tgt)
    a_stack = anchors.T
    r_stack = rels.T
    hard, hard_ok = _hard_neg_branches(dg, k_hard, a_stack, r_stack, tgt)
    return (a_stack, r_stack, inter_modes, tgt, neg,
            jnp.where(hard_ok, hard, neg), hard_ok, ok)


def sample_ip_batch(dg: DeviceGraph, key: jax.Array, b: int,
                    dist: str = "edge"):
    """On-device ip batch — (a1 —r1→ v) ∧ (a2 —r2→ v), then v —r3→ t
    [mirrors native/sampler.cpp case 5]: pick the final edge (r3, v, t)
    edge-uniform, then two DISTINCT in-branches at the JOIN node v (exact
    without-replacement over v's reversed out-edges). anchors [b, 2],
    rels [b, 3] = (r1, r2, r3), inter_modes [b] = v's mode."""
    k_edge, k_br, k_neg, k_hard, k_hp = jax.random.split(key, 5)
    r3, v, tgt, ok_t = _pick_edges(dg, k_edge, b, dist)
    branches = (_k_distinct_branches_rel if dist == "rel"
                else _k_distinct_out_edges)
    eidx, ok = branches(dg, k_br, v, 2)
    ok = ok & ok_t
    rows = dg.edges[eidx]                         # one [2, b, 4] gather
    a1, a2 = rows[0, :, 2], rows[1, :, 2]
    r1 = dg.rel_rev[rows[0, :, 0]]
    r2 = dg.rel_rev[rows[1, :, 0]]
    anchors = jnp.stack([a1, a2], axis=1)
    rels = jnp.stack([r1, r2, r3], axis=1)
    inter_modes = dg.to_mode_id[r1]      # join node v's mode
    neg = _neg_resample(dg, k_neg, r3, tgt)
    # hard negative: a partial-branch join v' (satisfies one of the two
    # branches at v, fails the other), projected through r3 — so t' is
    # answerable for a proper subset of the query's constraints; the r3
    # projection picks uniformly among valid sampled neighbors of v'
    v_hard, hok = _hard_neg_branches(dg, k_hard, anchors,
                                     jnp.stack([r1, r2], axis=1), v)
    local = jnp.maximum(v_hard - dg.from_lo[r3], 0)
    row = dg.neighbors[r3, local]                              # [b, S]
    idx, hok2 = _pick_valid(k_hp, (row >= 0) & (row != tgt[:, None]))
    t_hard = jnp.take_along_axis(row, idx[:, None], axis=1)[:, 0]
    hok = hok & hok2
    return (anchors, rels, inter_modes, tgt, neg,
            jnp.where(hok, t_hard, neg), hok, ok)


def sample_pi_batch(dg: DeviceGraph, key: jax.Array, b: int,
                    dist: str = "edge"):
    """On-device pi batch — (a1 —r1→ v —r2→ t) ∧ (a2 —r3→ t)
    [mirrors native/sampler.cpp case 6]: pick the chain's last edge
    (r2, v, t) edge-uniform, extend backwards to a1 via a uniform in-edge
    of v (always exists: v's reversed edge to t), add the edge branch
    (r3, a2) at t excluding the chain's own last edge
    (_out_edge_excluding_pair). anchors [b, 2], rels [b, 3] = (r1, r2, r3),
    inter_modes [b] = t's mode."""
    k_edge, k_b1, k_b2, k_neg, k_hard = jax.random.split(key, 5)
    r2, v, tgt, ok_t = _pick_edges(dg, k_edge, b, dist)
    branches1 = (_k_distinct_branches_rel if dist == "rel"
                 else _k_distinct_out_edges)
    e1, _ = branches1(dg, k_b1, v, 1)
    row1 = dg.edges[e1[0]]
    r1 = dg.rel_rev[row1[:, 0]]
    a1 = row1[:, 2]
    excl = (_rel_out_edge_excluding_pair if dist == "rel"
            else _out_edge_excluding_pair)
    e2, ok = excl(dg, k_b2, tgt, dg.rel_rev[r2], v)
    ok = ok & ok_t
    row2 = dg.edges[e2]
    r3 = dg.rel_rev[row2[:, 0]]
    a2 = row2[:, 2]
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
                           structure: str, dist: str = "edge"):
    """Dispatch table over all 7 structures -> (anchors, rels, inter_modes,
    targets, negs, hard_negs, hard_ok, row_mask). `structure` and `dist`
    (see _pick_edges / GQEConfig.onthefly_anchor_dist) are static. Chains
    carry hard_negs == negs with hard_ok all-False (no intersection to take
    a partial branch of)."""
    if structure in ("1p", "2p", "3p"):
        anchors, rels, tgt, neg, mask = sample_path_batch(
            dg, key, b, n_hops=int(structure[0]), dist=dist)
        modes = jnp.full((b,), -1, jnp.int32)
        return (anchors, rels, modes, tgt, neg, neg,
                jnp.zeros((b,), jnp.bool_), mask)
    if structure in ("2i", "3i"):
        return sample_inter_batch(dg, key, b, k_branches=int(structure[0]),
                                  dist=dist)
    if structure == "ip":
        return sample_ip_batch(dg, key, b, dist=dist)
    if structure == "pi":
        return sample_pi_batch(dg, key, b, dist=dist)
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
        dist = cfg.onthefly_anchor_dist
        batches = jax.vmap(
            lambda k: sample_structure_batch(dg, k, b, structure,
                                             dist=dist))(keys)
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

    t_train = 0.0
    t_eval = 0.0

    def dispatch(structure, n):
        nonlocal params, opt_state, done, dispatch_i, t_train
        td = time.time()
        params, opt_state, mloss = step_fn(
            params, opt_state, structure,
            jax.random.fold_in(key, dispatch_i), n,
            structure_weight(cfg, structure),
            structure in INTERSECT_STRUCTURES and cfg.hard_neg_alternate)
        dispatch_i += 1
        done += n
        loss = float(mloss)   # device sync: the dispatch is fully drained
        t_train += time.time() - td
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
            te = time.time()
            from graphqembed_tpu.training.loop import resolve_queries
            val_queries = resolve_queries(val_queries)
            aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                            neighbor_tables=neighbor_tables)
            t_eval += time.time() - te
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
        te = time.time()
        from graphqembed_tpu.training.loop import resolve_queries
        val_queries = resolve_queries(val_queries)
        aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                        neighbor_tables=neighbor_tables)
        t_eval += time.time() - te
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
        # q/s over TRAIN dispatch time (the device-mega driver's
        # accounting — evals/ckpt are itemized in timings, not folded into
        # the sustained number)
        queries_per_sec=(done * cfg.batch_size / t_train) if t_train
        else 0.0,
        timings={"train_s": t_train, "eval_s": t_eval,
                 "wall_s": dt},
    )
