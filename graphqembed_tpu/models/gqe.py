"""GQE model: per-structure query embedding, scoring, margin loss (pure JAX).

Semantics (the parity contract, SURVEY.md §2.3–2.4, pinned by the oracle):
- Node embeddings are L2-normalized AT LOOKUP (inside the encoder, not the
  scorer) [R: netquery/encoders.py::DirectEncoder (conf=H)].
- Relation projection P_r ∈ {TransE add, DistMult hadamard, bilinear matmul}
  [R: netquery/decoders.py (conf=H)]. Relations arrive in APPLICATION order
  (anchor→target; see data/queries.py) — equivalent to the reference applying
  reversed relations to its target-outward storage.
- Intersection: h_i = relu(z_i @ pre_m); Φ = elementwise min (or mean);
  out = Φ @ post_m — deep-set SetIntersection with per-mode transforms
  [R: netquery/decoders.py::SetIntersection (conf=H)]. The un-learned
  SimpleSetIntersection is Φ alone.
- Score = cosine similarity of query embedding and candidate embedding.
- margin_loss = mean over valid rows of max(0, margin − s_pos + s_neg), one
  sampled negative per query [R: netquery/model.py::margin_loss (conf=H)].

The query-DAG "compiler" is 7 pure functions sharing these primitives —
`structure` is a static (hashable) argument, so jit specializes one XLA
program per structure with zero dynamic dispatch inside (SURVEY.md §8).

Batches are per-formula, so `rels` is an int32[R] array shared by every row:
each hop's operator parameters are gathered ONCE and the projection is a
single [B,d]@[d,d] MXU matmul instead of B vector-matrix products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from graphqembed_tpu.config import GQEConfig

Params = dict


def _precision(cfg: GQEConfig):
    """fp32 mode must be bit-faithful to the oracle ON TPU too: the MXU's
    DEFAULT precision truncates f32 matmul inputs to bf16, which breaks
    activation-parity (~1e-3 rel error). HIGHEST keeps full f32. bf16 perf
    mode keeps DEFAULT."""
    return (jax.lax.Precision.HIGHEST if cfg.compute_dtype == "float32"
            else jax.lax.Precision.DEFAULT)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-24) -> jnp.ndarray:
    """Safe L2 normalize: sqrt(max(Σx², eps)) instead of ‖x‖ because the
    gradient of linalg.norm at exactly 0 is NaN — and min-over-ReLU
    intersection outputs DO hit exactly 0 (all-negative pre-activations in
    every branch), which otherwise NaN-poisons the whole table after one
    backward pass. Forward values are identical for any nonzero x."""
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps))


def encode(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Embedding gather + L2 norm: ids [...]-> [..., d].

    bf16-storage tables upcast AFTER the gather (f32 math everywhere
    downstream); the upcast placement also makes the table's cotangent
    bfloat16, so the dense grad materialization halves its bytes too.
    The gather's backward scatter-add runs with SORTED indices
    (ops/grads.py::take_rows — 2.3x the unsorted XLA scatter on v5e)."""
    from graphqembed_tpu.ops.grads import take_rows
    rows = take_rows(table, ids)
    if rows.dtype != jnp.float32:
        rows = rows.astype(jnp.float32)
    return l2_normalize(rows)


def project(cfg: GQEConfig, params: Params, x: jnp.ndarray,
            rel_id: jnp.ndarray) -> jnp.ndarray:
    """Apply P_rel to x [B, d]; rel_id is a scalar (batch constant)."""
    p = params["proj"]
    if cfg.projection == "transe":
        return x + p["r"][rel_id]
    if cfg.projection == "distmult":
        return x * p["w"][rel_id]
    return jnp.dot(x, p["W"][rel_id], preferred_element_type=jnp.float32,
                   precision=_precision(cfg))


def intersect(cfg: GQEConfig, params: Params, zs: list[jnp.ndarray],
              mode_id: jnp.ndarray) -> jnp.ndarray:
    """Deep-set intersection of branch embeddings zs (each [B, d])."""
    if cfg.use_pallas and cfg.learned_intersection:
        # fused Pallas kernel: relu(z@pre) → Φ → @post in one VMEM-resident
        # call. Measured ~tie with XLA's own fusion on v5e (85 vs 94 TFLOP/s
        # at k=3, B=4096; experiments/kernel_bench.py) — kept as an opt-in
        # capability, not the default
        from graphqembed_tpu.ops.kernels import fused_intersection
        return fused_intersection(jnp.stack(zs),
                                  params["inter"]["pre"][mode_id],
                                  params["inter"]["post"][mode_id],
                                  kind=cfg.intersection)
    if cfg.learned_intersection:
        pre = params["inter"]["pre"][mode_id]
        hs = [jax.nn.relu(jnp.dot(z, pre, preferred_element_type=jnp.float32,
                              precision=_precision(cfg)))
              for z in zs]
    else:
        hs = zs
    stacked = jnp.stack(hs)  # [k, B, d]
    agg = jnp.min(stacked, axis=0) if cfg.intersection == "min" else jnp.mean(stacked, axis=0)
    if cfg.learned_intersection:
        post = params["inter"]["post"][mode_id]
        return jnp.dot(agg, post, preferred_element_type=jnp.float32,
                       precision=_precision(cfg))
    return agg


def embed_query(cfg: GQEConfig, params: Params, structure: str,
                anchors: jnp.ndarray, rels: jnp.ndarray,
                inter_mode_id: jnp.ndarray,
                encode_fn=None) -> jnp.ndarray:
    """Query embedding [B, d] for one formula batch.

    anchors int32[B, A]; rels int32[R] (application order); inter_mode_id
    scalar (−1 for chains, ignored). encode_fn overrides the node encoder
    (ids -> [.., d]); default is table-row gather + L2 norm (DirectEncoder);
    pass models/encoders.py::make_deep_encoder(...) for depth>0 SAGE encoding.
    """
    enc = encode_fn or (lambda ids: encode(params["table"], ids))
    e = lambda i: enc(anchors[:, i])
    P = functools.partial(project, cfg, params)
    if structure == "1p":
        return P(e(0), rels[0])
    if structure == "2p":
        return P(P(e(0), rels[0]), rels[1])
    if structure == "3p":
        return P(P(P(e(0), rels[0]), rels[1]), rels[2])
    if structure == "2i":
        return intersect(cfg, params, [P(e(0), rels[0]), P(e(1), rels[1])],
                         inter_mode_id)
    if structure == "3i":
        return intersect(cfg, params,
                         [P(e(0), rels[0]), P(e(1), rels[1]), P(e(2), rels[2])],
                         inter_mode_id)
    if structure == "pi":
        chain = P(P(e(0), rels[0]), rels[1])
        edge = P(e(1), rels[2])
        return intersect(cfg, params, [chain, edge], inter_mode_id)
    if structure == "ip":
        v = intersect(cfg, params, [P(e(0), rels[0]), P(e(1), rels[1])],
                      inter_mode_id)
        return P(v, rels[2])
    raise ValueError(structure)


# ---------- soft-and baseline model ----------
# The reference's second model class [R: netquery/model.py soft-and baseline
# (conf=L), SURVEY.md §2.4]: instead of one intersected query embedding, each
# branch scores candidates independently and the per-branch scores combine
# multiplicatively (an "AND" in [0, 1] space). Not needed for headline
# parity; provided for model-family completeness.


def branch_embeddings(cfg: GQEConfig, params: Params, structure: str,
                      anchors: jnp.ndarray, rels: jnp.ndarray
                      ) -> list[jnp.ndarray]:
    """Per-branch query embeddings at the target node (no intersection op)."""
    table = params["table"]
    e = lambda i: encode(table, anchors[:, i])
    P = functools.partial(project, cfg, params)
    if structure in ("1p", "2p", "3p"):
        cur = e(0)
        for i in range(len(rels)):
            cur = P(cur, rels[i])
        return [cur]
    if structure == "2i":
        return [P(e(0), rels[0]), P(e(1), rels[1])]
    if structure == "3i":
        return [P(e(0), rels[0]), P(e(1), rels[1]), P(e(2), rels[2])]
    if structure == "pi":
        return [P(P(e(0), rels[0]), rels[1]), P(e(1), rels[2])]
    if structure == "ip":
        # branches join at v then project: each branch projected through r3
        return [P(P(e(0), rels[0]), rels[2]), P(P(e(1), rels[1]), rels[2])]
    raise ValueError(structure)


def soft_and_scores(cfg: GQEConfig, params: Params, structure: str,
                    anchors: jnp.ndarray, rels: jnp.ndarray,
                    candidates: jnp.ndarray) -> jnp.ndarray:
    """Soft-and combined score: per-branch cosine mapped to [0, 1] via
    (s+1)/2, multiplied across branches. Monotone in s for single-branch
    structures (identical rankings to the main model there)."""
    branches = branch_embeddings(cfg, params, structure, anchors, rels)
    c = encode(params["table"], candidates)
    combined = None
    for z in branches:
        s = score(z, c, cfg.scoring)
        p = (s + 1.0) * 0.5 if cfg.scoring == "cosine" else jax.nn.sigmoid(s)
        combined = p if combined is None else combined * p
    return combined


def soft_and_margin_loss(cfg: GQEConfig, params: Params, structure: str,
                         anchors: jnp.ndarray, rels: jnp.ndarray,
                         targets: jnp.ndarray, negs: jnp.ndarray,
                         row_mask: jnp.ndarray) -> jnp.ndarray:
    pos = soft_and_scores(cfg, params, structure, anchors, rels, targets)
    neg = soft_and_scores(cfg, params, structure, anchors, rels, negs)
    per_row = jax.nn.relu(cfg.margin - pos + neg)
    w = row_mask.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


# ---------- per-row variants (mixed-formula batches) ----------
# The reference batches per formula (relations are batch constants). For the
# device-resident training pipeline we also support MIXED-formula batches of
# one structure: rels int32[B, R] per row, operator weights gathered per row.
# Same math, different schedule; consistency with the per-formula path is
# pinned by tests (test_rows_path_matches_formula_path).


def _gathered_matmul(cfg: GQEConfig, x: jnp.ndarray, ids: jnp.ndarray,
                     M: jnp.ndarray) -> jnp.ndarray:
    """y[b] = x[b] @ M[ids[b]] for a stack of small operators M [R, d, e].

    Fast path (R ≤ d): compute x against ALL operators as ONE MXU matmul
    [B, d] @ [d, R·e] and select each row's result — HBM traffic is
    B·R·e + R·d·e instead of the per-row gather's B·d·e, and the backward
    pass is two clean matmuls (dM, dx) instead of a [B, d, e] scatter-add.
    Measured 10x faster fwd+bwd on v5e at B=512, d=128, R=12
    (experiments/perf_probe.py). Falls back to the per-row gather + batched
    einsum when the operator stack is large (R > d), where materializing
    [B, R, e] would cost more than the gather."""
    from graphqembed_tpu.ops.grads import select_dim
    prec = _precision(cfg)
    r = M.shape[0]
    if r <= x.shape[-1]:
        t = jnp.einsum("bd,rde->bre", x, M,
                       preferred_element_type=jnp.float32, precision=prec)
        return select_dim(t, ids)  # onehot-multiply backward, no scatter
    return jnp.einsum("bd,bde->be", x, M[ids],
                      preferred_element_type=jnp.float32, precision=prec)


def _gathered_matmul_stacked(cfg: GQEConfig, x: jnp.ndarray, ids: jnp.ndarray,
                             M: jnp.ndarray) -> jnp.ndarray:
    """y[b,k] = x[b,k] @ M[ids[b,k]] for x [B,K,d], ids [B,K] — the K-branch
    fold of _gathered_matmul: ONE einsum + ONE select for all K branches
    instead of K of each. The kernel COUNT, not the bytes, was measured as
    the fwd/bwd wall of the dense step (docs/DESIGN.md §11 addendum 2), so
    per-branch ops are folded into the batch dimension wherever the DAG
    allows."""
    from graphqembed_tpu.ops.grads import select_dim
    prec = _precision(cfg)
    r = M.shape[0]
    if r <= x.shape[-1]:
        t = jnp.einsum("bkd,rde->bkre", x, M,
                       preferred_element_type=jnp.float32, precision=prec)
        return select_dim(t, ids)  # onehot-multiply backward, no scatter
    return jnp.einsum("bkd,bkde->bke", x, M[ids],
                      preferred_element_type=jnp.float32, precision=prec)


def project_rows(cfg: GQEConfig, params: Params, x: jnp.ndarray,
                 rel_ids: jnp.ndarray) -> jnp.ndarray:
    """x [B, d]; rel_ids [B] -> [B, d] with per-row relation parameters."""
    p = params["proj"]
    if cfg.projection == "transe":
        return x + p["r"][rel_ids]
    if cfg.projection == "distmult":
        return x * p["w"][rel_ids]
    return _gathered_matmul(cfg, x, rel_ids, p["W"])


def project_rows_stacked(cfg: GQEConfig, params: Params, x: jnp.ndarray,
                         rel_ids: jnp.ndarray) -> jnp.ndarray:
    """x [B, K, d]; rel_ids [B, K] -> [B, K, d]: K branch projections as one
    gathered matmul (see _gathered_matmul_stacked)."""
    p = params["proj"]
    if cfg.projection == "transe":
        return x + p["r"][rel_ids]
    if cfg.projection == "distmult":
        return x * p["w"][rel_ids]
    return _gathered_matmul_stacked(cfg, x, rel_ids, p["W"])


def intersect_rows_stacked(cfg: GQEConfig, params: Params, z: jnp.ndarray,
                           mode_ids: jnp.ndarray) -> jnp.ndarray:
    """z [B, K, d]; mode_ids [B] -> [B, d]: deep-set intersection with the
    per-branch pre-transform folded into one gathered matmul."""
    if cfg.learned_intersection:
        ids = jnp.broadcast_to(mode_ids[:, None], z.shape[:2])
        h = jax.nn.relu(_gathered_matmul_stacked(cfg, z, ids,
                                                 params["inter"]["pre"]))
    else:
        h = z
    agg = (jnp.min(h, axis=1) if cfg.intersection == "min"
           else jnp.mean(h, axis=1))
    if cfg.learned_intersection:
        return _gathered_matmul(cfg, agg, mode_ids, params["inter"]["post"])
    return agg


def embed_query_folded(cfg: GQEConfig, params: Params, structure: str,
                       E: jnp.ndarray, rels: jnp.ndarray,
                       inter_modes: jnp.ndarray) -> jnp.ndarray:
    """Query embedding from pre-encoded anchor embeddings E [B, A, d] with the
    per-branch hops FOLDED into the batch dimension: each intersection
    structure's parallel branches run as ONE stacked gathered-matmul instead
    of one per branch (the kernel-count lever — docs/DESIGN.md §11 addendum
    2; same math as the branch-at-a-time path, pinned by the oracle parity
    tests)."""
    P = lambda x, i: project_rows(cfg, params, x, rels[:, i])
    Ps = lambda x, ids: project_rows_stacked(cfg, params, x, ids)
    I = lambda z: intersect_rows_stacked(cfg, params, z, inter_modes)
    e = lambda i: E[:, i]
    if structure == "1p":
        return P(e(0), 0)
    if structure == "2p":
        return P(P(e(0), 0), 1)
    if structure == "3p":
        return P(P(P(e(0), 0), 1), 2)
    if structure == "2i":
        return I(Ps(E[:, :2], rels[:, :2]))
    if structure == "3i":
        return I(Ps(E[:, :3], rels[:, :3]))
    if structure == "pi":
        # hop 1 of both branches folded: chain's first hop + the edge branch
        z1 = Ps(E[:, :2], jnp.stack([rels[:, 0], rels[:, 2]], axis=1))
        chain = P(z1[:, 0], 1)
        return I(jnp.stack([chain, z1[:, 1]], axis=1))
    if structure == "ip":
        v = I(Ps(E[:, :2], rels[:, :2]))
        return P(v, 2)
    raise ValueError(structure)


def embed_query_rows(cfg: GQEConfig, params: Params, structure: str,
                     anchors: jnp.ndarray, rels: jnp.ndarray,
                     inter_modes: jnp.ndarray, encode_fn=None) -> jnp.ndarray:
    """Mixed-formula query embedding: anchors [B, A], rels [B, R],
    inter_modes [B] -> [B, d]. encode_fn overrides the node encoder (depth>0
    SAGE via models/encoders.py::make_deep_encoder), as in embed_query.
    All A anchors are encoded in ONE call (one table gather / one SAGE pass)
    and branches are folded (embed_query_folded)."""
    enc = encode_fn or (lambda ids: encode(params["table"], ids))
    E = enc(anchors)  # [B, A, d]
    return embed_query_folded(cfg, params, structure, E, rels, inter_modes)


def embed_query_from_rows(cfg: GQEConfig, params: Params, structure: str,
                          anchor_rows: jnp.ndarray, rels: jnp.ndarray,
                          inter_modes: jnp.ndarray) -> jnp.ndarray:
    """Like embed_query_rows but anchors arrive as pre-gathered RAW table rows
    [B, A, d] (normalized here) — used by the sparse-table-update train step,
    where gradients flow to the gathered rows instead of the full table."""
    E = l2_normalize(anchor_rows.astype(jnp.float32))
    return embed_query_folded(cfg, params, structure, E, rels, inter_modes)


def margin_loss_from_rows(cfg: GQEConfig, params: Params, structure: str,
                          rows: jnp.ndarray, rels: jnp.ndarray,
                          inter_modes: jnp.ndarray) -> jnp.ndarray:
    """rows [B, A+2, d]: raw gathered table rows — A anchors, then target,
    then negative. Differentiable w.r.t. rows AND params (operator weights)."""
    a = rows.shape[1] - 2
    normed = l2_normalize(rows.astype(jnp.float32))  # anchors+target+neg once
    q = embed_query_folded(cfg, params, structure, normed[:, :a], rels,
                           inter_modes)
    pn = score(q, normed[:, a:], cfg.scoring)  # [B, 2]: pos, neg in one einsum
    return jnp.mean(jax.nn.relu(cfg.margin - pn[:, 0] + pn[:, 1]))


def margin_loss_rows_onegather(cfg: GQEConfig, params: Params, structure: str,
                               anchors: jnp.ndarray, rels: jnp.ndarray,
                               inter_modes: jnp.ndarray, targets: jnp.ndarray,
                               negs: jnp.ndarray,
                               row_mask: jnp.ndarray) -> jnp.ndarray:
    """margin_loss_rows with ONE fused table gather (direct encoder only).

    Identical math to margin_loss_rows, different autodiff shape: the
    separate encode() calls (A anchors + target + negative = up to 5 takes)
    each materialize their OWN dense [N, d] cotangent in the backward pass —
    zeros + scatter + add per take, ~5x the table bytes. Measured on v5e at
    N=35k/B=512/3i, that made fwd+bwd 468 µs of a 648 µs step (72%),
    precision-independent — the real wall of the dense pipeline
    (docs/DESIGN.md §10 update). Gathering all ids in one take keeps the
    backward to a single dense scatter. The scan train steps use this path
    when no custom encoder is active."""
    from graphqembed_tpu.ops.grads import take_rows
    ids = jnp.concatenate([anchors, targets[:, None], negs[:, None]], axis=1)
    rows = take_rows(params["table"], ids)              # [B, A+2, d]
    a = anchors.shape[1]
    normed = l2_normalize(rows.astype(jnp.float32))     # all A+2 rows at once
    q = embed_query_folded(cfg, params, structure, normed[:, :a], rels,
                           inter_modes)
    pn = score(q, normed[:, a:], cfg.scoring)  # [B, 2]: pos, neg in one einsum
    per_row = jax.nn.relu(cfg.margin - pn[:, 0] + pn[:, 1])
    w = row_mask.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def margin_loss_rows(cfg: GQEConfig, params: Params, structure: str,
                     anchors: jnp.ndarray, rels: jnp.ndarray,
                     inter_modes: jnp.ndarray, targets: jnp.ndarray,
                     negs: jnp.ndarray, row_mask: jnp.ndarray,
                     encode_fn=None) -> jnp.ndarray:
    enc = encode_fn or (lambda ids: encode(params["table"], ids))
    q = embed_query_rows(cfg, params, structure, anchors, rels, inter_modes,
                         encode_fn)
    pos = score(q, enc(targets), cfg.scoring)
    neg = score(q, enc(negs), cfg.scoring)
    per_row = jax.nn.relu(cfg.margin - pos + neg)
    w = row_mask.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def score(q: jnp.ndarray, cand_embeds: jnp.ndarray,
          kind: str = "cosine") -> jnp.ndarray:
    """Edge scores — the reference's edge-scoring decoder family
    [R: netquery/decoders.py::CosineEdgeDecoder etc. (conf=L)]:
      cosine: normalize q, dot with (unit-norm) candidate — the default used
              by the paper's main results;
      dot:    raw dot product (q unnormalized);
      l2:     negative squared euclidean distance.
    q [B, d]; cand_embeds [B, d] -> [B], or [B, K, d] -> [B, K]."""
    if kind == "cosine":
        q = l2_normalize(q)
    if kind in ("cosine", "dot"):
        if cand_embeds.ndim == 2:
            return jnp.sum(q * cand_embeds, axis=-1)
        return jnp.einsum("bd,bkd->bk", q, cand_embeds)
    if kind == "l2":
        if cand_embeds.ndim == 2:
            diff = q - cand_embeds
            return -jnp.sum(diff * diff, axis=-1)
        diff = q[:, None, :] - cand_embeds
        return -jnp.sum(diff * diff, axis=-1)
    raise ValueError(kind)


def forward_scores(cfg: GQEConfig, params: Params, structure: str,
                   anchors: jnp.ndarray, rels: jnp.ndarray,
                   inter_mode_id: jnp.ndarray,
                   candidates: jnp.ndarray, encode_fn=None) -> jnp.ndarray:
    """Scores of candidate nodes: candidates int32[B] -> [B] or [B,K] -> [B,K]
    — the reference's QueryEncoderDecoder.forward [R: netquery/model.py (conf=H)]."""
    enc = encode_fn or (lambda ids: encode(params["table"], ids))
    q = embed_query(cfg, params, structure, anchors, rels, inter_mode_id,
                    encode_fn)
    return score(q, enc(candidates), cfg.scoring)


def margin_loss(cfg: GQEConfig, params: Params, structure: str,
                anchors: jnp.ndarray, rels: jnp.ndarray,
                inter_mode_id: jnp.ndarray, targets: jnp.ndarray,
                negs: jnp.ndarray, row_mask: jnp.ndarray,
                encode_fn=None) -> jnp.ndarray:
    """Mean max-margin loss over valid rows; negs int32[B] (one per query)."""
    enc = encode_fn or (lambda ids: encode(params["table"], ids))
    q = embed_query(cfg, params, structure, anchors, rels, inter_mode_id,
                    encode_fn)
    pos = score(q, enc(targets), cfg.scoring)
    neg = score(q, enc(negs), cfg.scoring)
    per_row = jax.nn.relu(cfg.margin - pos + neg)
    w = row_mask.astype(per_row.dtype)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)
