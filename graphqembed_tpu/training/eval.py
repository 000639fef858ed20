"""Evaluation: AUC and percentile-rank (APR) computed IN JAX (SURVEY.md §4.2:
no GPU→CPU→sklearn round-trip; rank-based AUC = Mann-Whitney U), with numpy /
sklearn cross-checks in tests.

Protocol fidelity [R: netquery/utils.py::eval_auc_queries, eval_perc_queries
(conf=H), SURVEY.md §2.6]:
- AUC: per formula, score positives and 1-sampled-negative-per-positive
  ("one_neg"); AUC over the 2B scores; macro-average over formulas weighted by
  query count within a structure. Hard-negative AUC reported separately for
  intersection structures.
- APR: for "full_neg" queries (exhaustive type-matched negatives), the
  percentile of the positive's score among its negatives (ties count half),
  averaged over queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from graphqembed_tpu.config import GQEConfig, INTERSECT_STRUCTURES
from graphqembed_tpu.data.queries import Query, group_by_formula, make_batch
from graphqembed_tpu.graph.schema import Schema
from graphqembed_tpu.models import gqe


def auc_from_scores(pos: jnp.ndarray, neg: jnp.ndarray,
                    pos_mask: jnp.ndarray, neg_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked pairwise Mann-Whitney AUC with tie correction:
    AUC = Σ_{i,j} m_i m_j ([p_i > n_j] + ½[p_i = n_j]) / Σ m_i m_j."""
    pm = pos_mask.astype(jnp.float32)
    nm = neg_mask.astype(jnp.float32)
    gt = (pos[:, None] > neg[None, :]).astype(jnp.float32)
    eq = (pos[:, None] == neg[None, :]).astype(jnp.float32)
    w = pm[:, None] * nm[None, :]
    num = jnp.sum(w * (gt + 0.5 * eq))
    den = jnp.maximum(jnp.sum(w), 1.0)
    return num / den


def percentile_ranks(pos: jnp.ndarray, negs: jnp.ndarray,
                     neg_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-query percentile of pos among its negatives, ties count half.
    pos [B]; negs [B, K]; neg_mask [B, K] -> [B] (rows with 0 valid negs -> 0.5)."""
    m = neg_mask.astype(jnp.float32)
    lt = (negs < pos[:, None]).astype(jnp.float32)
    eq = (negs == pos[:, None]).astype(jnp.float32)
    num = jnp.sum(m * (lt + 0.5 * eq), axis=1)
    den = jnp.sum(m, axis=1)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.5)


@functools.partial(jax.jit, static_argnames=("cfg", "structure"))
def _formula_scores(cfg: GQEConfig, params, structure: str, anchors, rels,
                    inter_mode_id, targets, negs):
    """pos [B], neg [B, K] scores for one formula batch."""
    q = gqe.embed_query(cfg, params, structure, anchors, rels, inter_mode_id)
    table = params["table"]
    pos = gqe.score(q, gqe.encode(table, targets), cfg.scoring)
    neg = gqe.score(q, gqe.encode(table, negs), cfg.scoring)
    return pos, neg


@functools.partial(jax.jit, static_argnames=("cfg", "structure"))
def _formula_scores_deep(cfg: GQEConfig, params, structure: str, anchors,
                         rels, inter_mode_id, targets, negs, neighbor_tables):
    """Depth>0 variant: nodes encoded by the SAGE encoder (cfg.depth)."""
    from graphqembed_tpu.models.encoders import make_deep_encoder
    encode_fn = make_deep_encoder(cfg, params, neighbor_tables, cfg.depth,
                                  cfg.aggregator)
    q = gqe.embed_query(cfg, params, structure, anchors, rels, inter_mode_id,
                        encode_fn)
    pos = gqe.score(q, encode_fn(targets), cfg.scoring)
    neg = gqe.score(q, encode_fn(negs), cfg.scoring)
    return pos, neg


def _scores(cfg, params, structure, anchors, rels, inter_mode_id, targets,
            negs, neighbor_tables=None):
    if cfg.depth > 0 and neighbor_tables is not None:
        return _formula_scores_deep(cfg, params, structure, anchors, rels,
                                    inter_mode_id, targets, negs,
                                    neighbor_tables)
    return _formula_scores(cfg, params, structure, anchors, rels,
                           inter_mode_id, targets, negs)


def _batches(schema: Schema, by_formula: dict, batch_size: int, neg_width: int,
             hard_neg_width: int, rng: np.random.Generator | None):
    for formula, qs in sorted(by_formula.items(), key=lambda kv: kv[0].serialize()):
        for i in range(0, len(qs), batch_size):
            chunk = qs[i:i + batch_size]
            yield formula, make_batch(
                schema, chunk, batch_size=batch_size, neg_width=neg_width,
                hard_neg_width=hard_neg_width, rng=rng)


def _scores_rows_impl(cfg: GQEConfig, params, structure: str, anchors, rels,
                      inter_modes, targets, negs):
    q = gqe.embed_query_rows(cfg, params, structure, anchors, rels,
                             inter_modes)
    table = params["table"]
    pos = gqe.score(q, gqe.encode(table, targets), cfg.scoring)
    neg = gqe.score(q, gqe.encode(table, negs), cfg.scoring)
    return pos, neg


_scores_rows = functools.partial(jax.jit, static_argnames=("cfg", "structure"))(
    _scores_rows_impl)
_scores_rows.__doc__ = """Mixed-formula scoring in ONE dispatch per structure:
anchors [N, A], rels [N, R], inter_modes [N], targets [N], negs [N, K] ->
(pos [N], neg [N, K])."""


@functools.partial(jax.jit, static_argnames=("cfg", "structures"))
def _scores_rows_multi(cfg: GQEConfig, params, structures: tuple, *arrays):
    """ALL structures' scores in ONE dispatch: arrays is 5 arrays per
    structure (anchors, rels, modes, targets, negs). On a remote-TPU link each
    dispatch costs ~seconds of RTT, so a whole eval pass is a single program +
    a single transfer; the per-formula metric aggregation then runs on host
    (sklearn-equivalent numpy)."""
    out = []
    for i, s in enumerate(structures):
        anchors, rels, modes, targets, negs = arrays[5 * i:5 * i + 5]
        out.append(_scores_rows_impl(cfg, params, s, anchors, rels, modes,
                                     targets, negs))
    return tuple(out)


def _structure_soa(schema, by_formula, neg_width, rng, hard, pad_to):
    """Pack one structure's queries (all formulas) into padded SoA arrays +
    per-row formula index. Returns None if no rows survive (e.g. hard=True
    with no hard negatives anywhere)."""
    anchors, rels, modes, targets = [], [], [], []
    negs, nmask, fidx = [], [], []
    for fi, (f, qs) in enumerate(sorted(by_formula.items(),
                                        key=lambda kv: kv[0].serialize())):
        rel_ids = f.rel_ids(schema)
        im = f.intersection_mode
        im_id = -1 if im is None else schema.mode_id(im)
        for q in qs:
            pool = q.hard_neg_samples if hard else q.neg_samples
            if pool is None or len(pool) == 0:
                continue
            anchors.append(q.anchors)
            rels.append(rel_ids)
            modes.append(im_id)
            targets.append(q.target)
            row = np.zeros(neg_width, np.int32)
            m = np.zeros(neg_width, bool)
            if rng is not None and neg_width == 1:
                row[0] = pool[rng.integers(0, len(pool))]
                m[0] = True
            else:
                k = min(neg_width, len(pool))
                row[:k] = pool[:k]
                m[:k] = True
            negs.append(row)
            nmask.append(m)
            fidx.append(fi)
    n = len(targets)
    if n == 0:
        return None
    pad = (-n) % pad_to
    def arr(x, dtype):
        a = np.asarray(x, dtype)
        if pad:
            a = np.concatenate([a, np.repeat(a[:1], pad, axis=0)])
        return a
    return {
        "n": n,
        "anchors": arr(anchors, np.int32),
        "rels": arr(rels, np.int32),
        "modes": arr(modes, np.int32),
        "targets": arr(targets, np.int32),
        "negs": arr(negs, np.int32),
        "nmask": np.asarray(nmask, bool),
        "fidx": np.asarray(fidx, np.int32),
    }


def _np_auc(pos: np.ndarray, neg: np.ndarray) -> float:
    """Tie-corrected Mann-Whitney AUC (== sklearn.roc_auc_score)."""
    gt = (pos[:, None] > neg[None, :]).mean(dtype=np.float64)
    eq = (pos[:, None] == neg[None, :]).mean(dtype=np.float64)
    return float(gt + 0.5 * eq)


def eval_auc(cfg: GQEConfig, params, schema: Schema, queries: list[Query],
             seed: int = 0, hard: bool = False,
             neighbor_tables=None) -> dict[str, float]:
    """Macro AUC per structure (query-count weighted over formulas) using one
    sampled negative per positive. hard=True scores hard negatives instead
    (intersection structures only). Returns {structure: auc, 'macro': mean}."""
    if neighbor_tables is None:
        return _eval_auc_fast(cfg, params, schema, queries, seed, hard)
    rng = np.random.default_rng(seed)
    by_struct: dict[str, dict] = {}
    for f, qs in group_by_formula(queries).items():
        by_struct.setdefault(f.structure, {})[f] = qs
    out: dict[str, float] = {}
    for structure, by_formula in sorted(by_struct.items()):
        if hard and structure not in INTERSECT_STRUCTURES:
            continue
        num = den = 0.0
        for formula, b in _batches(schema, by_formula, cfg.eval_batch_size,
                                   neg_width=1,
                                   hard_neg_width=1 if hard else 0, rng=rng):
            negs = b.hard_negs if hard else b.negs
            nmask = b.hard_neg_mask if hard else b.neg_mask
            pos, neg = _scores(cfg, params, structure, b.anchors,
                               b.rels, np.int32(b.inter_mode_id),
                               b.targets, negs, neighbor_tables)
            auc = auc_from_scores(pos, neg[:, 0],
                                  jnp.asarray(b.row_mask),
                                  jnp.asarray(b.row_mask & nmask[:, 0]))
            n = b.n_valid
            num += float(auc) * n
            den += n
        if den:
            out[structure] = num / den
    if out:
        out["macro"] = float(np.mean([v for k, v in out.items() if k != "macro"]))
    return out


def _eval_auc_fast(cfg: GQEConfig, params, schema: Schema,
                   queries: list[Query], seed: int, hard: bool
                   ) -> dict[str, float]:
    rng = np.random.default_rng(seed)
    by_struct: dict[str, dict] = {}
    for f, qs in group_by_formula(queries).items():
        by_struct.setdefault(f.structure, {})[f] = qs
    soas: dict[str, dict] = {}
    for structure, by_formula in sorted(by_struct.items()):
        if hard and structure not in INTERSECT_STRUCTURES:
            continue
        soa = _structure_soa(schema, by_formula, 1, rng, hard,
                             pad_to=cfg.eval_batch_size)
        if soa is not None:
            soas[structure] = soa
    if not soas:
        return {}
    flat = [soas[s][k] for s in soas
            for k in ("anchors", "rels", "modes", "targets", "negs")]
    scores = _scores_rows_multi(cfg, params, tuple(soas), *flat)
    out: dict[str, float] = {}
    for (structure, soa), (pos, neg) in zip(soas.items(), scores):
        pos = np.asarray(pos)[:soa["n"]]
        neg = np.asarray(neg)[:soa["n"], 0]
        num = den = 0.0
        for fi in np.unique(soa["fidx"]):
            sel = soa["fidx"] == fi
            num += _np_auc(pos[sel], neg[sel]) * int(sel.sum())
            den += int(sel.sum())
        out[structure] = num / den
    out["macro"] = float(np.mean(list(out.values())))
    return out


def _eval_apr_fast(cfg: GQEConfig, params, schema: Schema,
                   queries: list[Query], width: int) -> dict[str, float]:
    by_struct: dict[str, dict] = {}
    for f, qs in group_by_formula(queries).items():
        by_struct.setdefault(f.structure, {})[f] = qs
    soas: dict[str, dict] = {}
    for structure, by_formula in sorted(by_struct.items()):
        soa = _structure_soa(schema, by_formula, width, None, False,
                             pad_to=cfg.eval_batch_size)
        if soa is not None:
            soas[structure] = soa
    if not soas:
        return {}
    flat = [soas[s][k] for s in soas
            for k in ("anchors", "rels", "modes", "targets", "negs")]
    scores = _scores_rows_multi(cfg, params, tuple(soas), *flat)
    out: dict[str, float] = {}
    for (structure, soa), (pos, neg) in zip(soas.items(), scores):
        pos = np.asarray(pos)[:soa["n"]]
        neg = np.asarray(neg)[:soa["n"]]
        m = soa["nmask"].astype(np.float64)
        lt = (neg < pos[:, None]) * m
        eq = (neg == pos[:, None]) * m
        cnt = m.sum(axis=1)
        pr = np.where(cnt > 0,
                      (lt.sum(axis=1) + 0.5 * eq.sum(axis=1))
                      / np.maximum(cnt, 1.0), 0.5)
        out[structure] = float(pr.mean())
    if out:
        out["macro"] = float(np.mean([v for k, v in out.items() if k != "macro"]))
    return out


def eval_apr(cfg: GQEConfig, params, schema: Schema, queries: list[Query],
             max_negs: int | None = None,
             neighbor_tables=None) -> dict[str, float]:
    """Mean percentile rank per structure over full_neg queries (negatives
    truncated to max_negs if given — real bio-scale modes need a cap)."""
    if neighbor_tables is None:
        width = max_negs or max(
            (len(q.neg_samples) for q in queries), default=1)
        return _eval_apr_fast(cfg, params, schema, queries, width)
    by_struct: dict[str, dict] = {}
    for f, qs in group_by_formula(queries).items():
        by_struct.setdefault(f.structure, {})[f] = qs
    width = max_negs or max(
        (len(q.neg_samples) for q in queries), default=1)
    out: dict[str, float] = {}
    for structure, by_formula in sorted(by_struct.items()):
        num = den = 0.0
        for formula, b in _batches(schema, by_formula, cfg.eval_batch_size,
                                   neg_width=width, hard_neg_width=0, rng=None):
            pos, neg = _scores(cfg, params, structure, b.anchors,
                               b.rels, np.int32(b.inter_mode_id),
                               b.targets, b.negs, neighbor_tables)
            pr = percentile_ranks(pos, neg, jnp.asarray(b.neg_mask))
            m = b.row_mask.astype(np.float32)
            num += float(jnp.sum(pr * m))
            den += float(m.sum())
        if den:
            out[structure] = num / den
    if out:
        out["macro"] = float(np.mean([v for k, v in out.items() if k != "macro"]))
    return out
