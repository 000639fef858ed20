"""PyTorch oracle: minimal, direct implementation of the GQE semantics of
SURVEY.md §2.3–2.6, standing in for the (empty-mounted) reference
`williamleif/graphqembed` — see SURVEY.md §0 and §5.1. This is the
"PyTorch reference" against which per-query-type activations must be
allclose (BASELINE.json §north_star).

Deliberately boring: eager torch, explicit loops over structures, no sharing
of code with the JAX implementation beyond the parameter LAYOUT (stacked
arrays, see models/params.py), which parity tests copy verbatim into both.
Keep this file < 500 LoC and brutally simple.
"""

from __future__ import annotations

import numpy as np
import torch

Params = dict  # numpy arrays in the models/params.py layout


def _t(x) -> torch.Tensor:
    if isinstance(x, torch.Tensor):
        return x
    return torch.as_tensor(np.asarray(x).copy())


def normalize(x: torch.Tensor) -> torch.Tensor:
    return x / torch.linalg.norm(x, dim=-1, keepdim=True).clamp_min(1e-12)


def encode(params: Params, ids) -> torch.Tensor:
    return normalize(_t(params["table"]).to(torch.float64)[_t(ids).long()])


def project(projection: str, params: Params, x: torch.Tensor, rel_id: int) -> torch.Tensor:
    p = params["proj"]
    if projection == "transe":
        return x + _t(p["r"]).to(torch.float64)[rel_id]
    if projection == "distmult":
        return x * _t(p["w"]).to(torch.float64)[rel_id]
    if projection == "bilinear":
        return x @ _t(p["W"]).to(torch.float64)[rel_id]
    raise ValueError(projection)


def intersect(kind: str, learned: bool, params: Params,
              zs: list[torch.Tensor], mode_id: int) -> torch.Tensor:
    if learned:
        pre = _t(params["inter"]["pre"]).to(torch.float64)[mode_id]
        zs = [torch.relu(z @ pre) for z in zs]
    stacked = torch.stack(zs)
    if kind == "min":
        agg = stacked.min(dim=0).values
    elif kind == "mean":
        agg = stacked.mean(dim=0)
    else:
        raise ValueError(kind)
    if learned:
        post = _t(params["inter"]["post"]).to(torch.float64)[mode_id]
        agg = agg @ post
    return agg


def embed_query(cfg, params: Params, structure: str, anchors, rels,
                inter_mode_id: int) -> torch.Tensor:
    """anchors int[B, A]; rels int[R]; returns float64 [B, d]."""
    anchors = _t(anchors).long()
    rels = [int(r) for r in np.asarray(rels)]
    e = lambda i: encode(params, anchors[:, i])
    P = lambda x, r: project(cfg.projection, params, x, r)
    I = lambda zs: intersect(cfg.intersection, cfg.learned_intersection,
                             params, zs, inter_mode_id)
    if structure == "1p":
        return P(e(0), rels[0])
    if structure == "2p":
        return P(P(e(0), rels[0]), rels[1])
    if structure == "3p":
        return P(P(P(e(0), rels[0]), rels[1]), rels[2])
    if structure == "2i":
        return I([P(e(0), rels[0]), P(e(1), rels[1])])
    if structure == "3i":
        return I([P(e(0), rels[0]), P(e(1), rels[1]), P(e(2), rels[2])])
    if structure == "pi":
        return I([P(P(e(0), rels[0]), rels[1]), P(e(1), rels[2])])
    if structure == "ip":
        return P(I([P(e(0), rels[0]), P(e(1), rels[1])]), rels[2])
    raise ValueError(structure)


def forward_scores(cfg, params: Params, structure: str, anchors, rels,
                   inter_mode_id: int, candidates) -> torch.Tensor:
    q = embed_query(cfg, params, structure, anchors, rels, inter_mode_id)
    c = encode(params, candidates)
    kind = getattr(cfg, "scoring", "cosine")
    if kind == "cosine":
        q = normalize(q)
    if kind in ("cosine", "dot"):
        if c.dim() == 2:
            return (q * c).sum(dim=-1)
        return torch.einsum("bd,bkd->bk", q, c)
    if kind == "l2":
        diff = (q - c) if c.dim() == 2 else (q[:, None, :] - c)
        return -(diff * diff).sum(dim=-1)
    raise ValueError(kind)


def margin_loss(cfg, params: Params, structure: str, anchors, rels,
                inter_mode_id: int, targets, negs, row_mask) -> torch.Tensor:
    pos = forward_scores(cfg, params, structure, anchors, rels, inter_mode_id, targets)
    neg = forward_scores(cfg, params, structure, anchors, rels, inter_mode_id, negs)
    per_row = torch.relu(cfg.margin - pos + neg)
    w = _t(row_mask).to(per_row.dtype)
    return (per_row * w).sum() / w.sum().clamp_min(1.0)


# ---------- soft-and baseline (mirrors models/gqe.py soft_and_*) ----------

def branch_embeddings(cfg, params: Params, structure: str, anchors, rels):
    anchors = _t(anchors).long()
    rels = [int(r) for r in np.asarray(rels)]
    e = lambda i: encode(params, anchors[:, i])
    P = lambda x, r: project(cfg.projection, params, x, r)
    if structure in ("1p", "2p", "3p"):
        cur = e(0)
        for r in rels:
            cur = P(cur, r)
        return [cur]
    if structure == "2i":
        return [P(e(0), rels[0]), P(e(1), rels[1])]
    if structure == "3i":
        return [P(e(0), rels[0]), P(e(1), rels[1]), P(e(2), rels[2])]
    if structure == "pi":
        return [P(P(e(0), rels[0]), rels[1]), P(e(1), rels[2])]
    if structure == "ip":
        return [P(P(e(0), rels[0]), rels[2]), P(P(e(1), rels[1]), rels[2])]
    raise ValueError(structure)


def soft_and_scores(cfg, params: Params, structure: str, anchors, rels,
                    candidates) -> torch.Tensor:
    c = encode(params, candidates)
    combined = None
    for z in branch_embeddings(cfg, params, structure, anchors, rels):
        kind = getattr(cfg, "scoring", "cosine")
        if kind == "cosine":
            z = normalize(z)
        if c.dim() == 2:
            s = (z * c).sum(dim=-1)
        else:
            s = torch.einsum("bd,bkd->bk", z, c)
        p = (s + 1.0) * 0.5 if kind == "cosine" else torch.sigmoid(s)
        combined = p if combined is None else combined * p
    return combined
