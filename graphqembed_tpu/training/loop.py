"""Training harness: burn-in → multi-task loop with convergence stopping
[R: netquery/utils.py::run_train, run_batch, check_conv (conf=H), SURVEY.md
§2.5].

Protocol:
1. Burn-in: train on 1p (edge) queries only until windowed-loss convergence
   (`check_conv`) or cfg.max_burn_in steps.
2. Multi-task: each step picks a random structure (weighted by query count),
   picks a formula within it (weighted), pads a batch, samples one negative
   per query (hard negatives on alternating steps for intersection
   structures), and takes one Adam step on the weighted margin loss
   (path_weight for 2p/3p, inter_weight for i-structures; conf=L on the
   reference's defaults — configurable).
3. Every val_every steps: AUC on val queries; keep best params.

One jitted train step per (structure, projection) — static shapes per
structure mean zero retracing across formulas and steps (SURVEY.md §8).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Callable

import jax
import numpy as np
import optax

from graphqembed_tpu.config import (
    GQEConfig,
    INTERSECT_STRUCTURES,
    STRUCTURES,
)
from graphqembed_tpu.data.queries import Query, group_by_formula
from graphqembed_tpu.graph.schema import Schema
from graphqembed_tpu.models import gqe
from graphqembed_tpu.training.eval import eval_auc

logger = logging.getLogger("graphqembed_tpu")


def resolve_queries(q):
    """val_queries may be a CALLABLE returning the query list: eval sets are
    only needed at the first eval boundary, so their (host, C++) sampling can
    overlap with burn-in running on the device — pass a closure that joins a
    sampling future (the deferred_pools pattern applied to eval sets,
    VERDICT r04 task 7). Resolved once by each driver at first use."""
    return q() if callable(q) else q


def check_conv(losses: list[float], window: int, tol: float) -> bool:
    """Windowed relative-improvement convergence check
    [R: netquery/utils.py::check_conv (conf=M)]: converged when the mean of
    the most recent `window` losses improves on the previous window's mean by
    less than `tol` (relative)."""
    if len(losses) < 2 * window:
        return False
    new = float(np.mean(losses[-window:]))
    old = float(np.mean(losses[-2 * window:-window]))
    if old <= 0:
        return True
    return (old - new) / old < tol


class TrainData:
    """Training queries organized structure → formula → array views, with a
    batch sampler producing static-shape device-ready numpy arrays."""

    def __init__(self, schema: Schema, queries: list[Query], batch_size: int,
                 seed: int = 0):
        self.schema = schema
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.by_struct: dict[str, list[tuple]] = {}
        for f, qs in group_by_formula(queries).items():
            anchors = np.array([q.anchors for q in qs], dtype=np.int32)
            targets = np.array([q.target for q in qs], dtype=np.int32)
            negs = [q.neg_samples.astype(np.int32) for q in qs]
            hards = [None if q.hard_neg_samples is None
                     else q.hard_neg_samples.astype(np.int32) for q in qs]
            self.by_struct.setdefault(f.structure, []).append(
                (f, anchors, targets, negs, hards))
        self.struct_weights = {
            s: sum(len(t) for _, _, t, _, _ in fl)
            for s, fl in self.by_struct.items()
        }

    @property
    def structures(self) -> list[str]:
        return [s for s in STRUCTURES if s in self.by_struct]

    def pick_structure(self, multitask: bool) -> str:
        if not multitask:
            return "1p"
        ss = self.structures
        w = np.array([self.struct_weights[s] for s in ss], dtype=np.float64)
        return ss[self.rng.choice(len(ss), p=w / w.sum())]

    def sample_batch(self, structure: str, hard: bool = False):
        """Returns (rels, anchors, targets, negs, row_mask, inter_mode_id).
        Queries sampled with replacement if the formula has fewer than
        batch_size; negatives: one uniform draw per query (hard pool when
        requested and available, falling back to plain)."""
        forms = self.by_struct[structure]
        w = np.array([len(t) for _, _, t, _, _ in forms], dtype=np.float64)
        f, anchors, targets, negs, hards = forms[
            self.rng.choice(len(forms), p=w / w.sum())]
        n = len(targets)
        b = self.batch_size
        idx = (np.arange(n) if n >= b else None)
        if n >= b:
            idx = self.rng.choice(n, size=b, replace=False)
        else:
            idx = self.rng.choice(n, size=b, replace=True)
        neg_pick = np.empty(b, dtype=np.int32)
        for j, i in enumerate(idx):
            pool = negs[i]
            if hard and hards[i] is not None and len(hards[i]):
                pool = hards[i]
            neg_pick[j] = pool[self.rng.integers(0, len(pool))]
        im = f.intersection_mode
        return (
            f.rel_ids(self.schema),
            anchors[idx],
            targets[idx],
            neg_pick,
            np.ones(b, dtype=bool),
            np.int32(-1 if im is None else self.schema.mode_id(im)),
        )


def make_train_step(cfg: GQEConfig, optimizer,
                    neighbor_tables=None) -> Callable:
    """Jitted (params, opt_state, batch) -> (params, opt_state, loss), one
    compiled program per structure. neighbor_tables enables the depth>0 SAGE
    encoder (cfg.depth), matching the reference's --depth flag."""

    @functools.partial(jax.jit, static_argnames=("structure",),
                       donate_argnames=("params", "opt_state"))
    def step(params, opt_state, structure, rels, anchors, targets, negs,
             row_mask, inter_mode_id, weight):
        def loss_fn(p):
            encode_fn = None
            if cfg.depth > 0 and neighbor_tables is not None:
                from graphqembed_tpu.models.encoders import make_deep_encoder
                encode_fn = make_deep_encoder(cfg, p, neighbor_tables,
                                              cfg.depth, cfg.aggregator)
            l = gqe.margin_loss(cfg, p, structure, anchors, rels,
                                inter_mode_id, targets, negs, row_mask,
                                encode_fn=encode_fn)
            return l * weight
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


@dataclasses.dataclass
class TrainResult:
    params: dict
    best_params: dict
    best_val_auc: float
    steps: int
    burn_in_steps: int
    losses: dict[str, list[float]]
    val_history: list[tuple[int, float]]
    queries_per_sec: float
    # optional phase decomposition (seconds): train dispatches, eval
    # dispatches, checkpoint writes, deferred-pool wait — the
    # sustained-vs-bench accounting instrument (device mega pipeline)
    timings: dict | None = None


def structure_weight(cfg: GQEConfig, structure: str) -> float:
    if structure == "1p":
        return 1.0
    if structure in ("2p", "3p"):
        return cfg.path_weight
    return cfg.inter_weight


def run_train(
    cfg: GQEConfig,
    schema: Schema,
    params: dict,
    train_queries: list[Query],
    val_queries: list[Query] | None = None,
    log_every: int = 500,
    on_step=None,
    neighbor_tables=None,
    ckpt_manager=None,
    ckpt_every: int = 0,
    resume: bool = False,
    metrics=None,
    optimizer=None,
) -> TrainResult:
    """ckpt_manager + ckpt_every enable periodic full-train-state checkpoints
    (params, optimizer state, host RNG) and restart-from-latest when
    resume=True — the preemption-recovery path (SURVEY.md §6); the resumed
    data order is bit-identical (restored numpy RNG state). optimizer
    defaults to dense Adam (the reference's choice); injectable for parity
    tests against the oracle trainer."""
    optimizer = optimizer or optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    step_fn = make_train_step(cfg, optimizer, neighbor_tables)
    data = TrainData(schema, train_queries, cfg.batch_size, seed=cfg.seed)

    start_step = 0
    if resume and ckpt_manager is not None:
        restored = ckpt_manager.restore_latest(
            like={"params": params, "opt_state": opt_state})
        if restored is not None:
            state, meta = restored
            params, opt_state = state["params"], state["opt_state"]
            start_step = int(meta["step"])
            if "rng_state" in meta:
                data.rng = meta["rng_state"]
            logger.info("resumed from checkpoint at step %d", start_step)

    losses: dict[str, list[float]] = {s: [] for s in data.structures}
    ema_losses: list[float] = []  # 1p burn-in convergence track
    multi_losses: list[float] = []
    val_history: list[tuple[int, float]] = []
    best_val = -1.0
    best_params = params
    hard_toggle = 0
    burn_in_steps = 0
    multitask = "1p" not in data.by_struct  # no edges -> straight to multitask
    t0 = time.perf_counter()
    n_queries = 0
    step_i = 0
    if start_step:
        step_i = start_step
        # burn-in bookkeeping: a resumed run past max_burn_in goes straight
        # to multitask (convergence-window history is not persisted)
        if start_step >= cfg.max_burn_in:
            multitask = True
            burn_in_steps = min(start_step, cfg.max_burn_in)

    while step_i < cfg.max_iter:
        step_i += 1
        structure = data.pick_structure(multitask)
        hard = False
        if structure in INTERSECT_STRUCTURES and cfg.hard_neg_alternate:
            hard = bool(hard_toggle % 2)
            hard_toggle += 1
        rels, anchors, targets, negs, row_mask, im = data.sample_batch(
            structure, hard=hard)
        params, opt_state, loss = step_fn(
            params, opt_state, structure, rels, anchors, targets, negs,
            row_mask, im, np.float32(structure_weight(cfg, structure)))
        loss = float(loss)
        losses[structure].append(loss)
        n_queries += cfg.batch_size

        if not multitask:
            burn_in_steps += 1
            ema_losses.append(loss)
            if (check_conv(ema_losses, cfg.conv_window, cfg.tol)
                    or burn_in_steps >= cfg.max_burn_in):
                logger.info("burn-in done at step %d (loss %.4f)", step_i, loss)
                multitask = True
        else:
            multi_losses.append(loss)

        if on_step is not None:
            on_step(step_i, structure, loss)
        if metrics is not None and step_i % log_every == 0:
            metrics.write(step_i, **{f"loss/{structure}": loss})

        if step_i % log_every == 0:
            logger.info("step %d [%s%s] loss %.4f", step_i, structure,
                        "/hard" if hard else "", loss)

        if ckpt_manager is not None and ckpt_every and step_i % ckpt_every == 0:
            ckpt_manager.save(step_i, params, opt_state, rng_state=data.rng)

        if val_queries and step_i % cfg.val_every == 0:
            val_queries = resolve_queries(val_queries)
            aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                            neighbor_tables=neighbor_tables)
            macro = aucs.get("macro", 0.0)
            val_history.append((step_i, macro))
            if metrics is not None:
                metrics.write(step_i, **{f"val_auc/{k}": v
                                         for k, v in aucs.items()})
            logger.info("step %d val AUC %s", step_i,
                        {k: round(v, 4) for k, v in aucs.items()})
            if macro > best_val:
                best_val = macro
                best_params = jax.tree.map(lambda x: x.copy(), params)

        if multitask and check_conv(multi_losses, cfg.conv_window, cfg.tol):
            logger.info("multi-task converged at step %d", step_i)
            break

    dt = time.perf_counter() - t0
    if best_val < 0:
        best_params = params
    return TrainResult(
        params=params,
        best_params=best_params,
        best_val_auc=best_val,
        steps=step_i,
        burn_in_steps=burn_in_steps,
        losses=losses,
        val_history=val_history,
        queries_per_sec=n_queries / max(dt, 1e-9),
    )
