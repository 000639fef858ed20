"""Device-resident training pipeline (P3, SURVEY.md §8 build plan).

The reference's hot loop is host-driven: python picks a formula, slices a
batch, ships it to the device, takes one step [R: netquery/utils.py::run_batch
(conf=H)]. On TPU that schedule is dispatch-bound: the pure train step is
~0.1 ms while host batch assembly + transfer costs tens of ms. Here the whole
query set lives in HBM as per-structure SoA pools and a `lax.scan` mega-step
runs T training steps per dispatch:

  - batch selection: counter-based jax.random (fold_in(key, step)) — uniform
    over the pool, reproducible, checkpoint-friendly;
  - negative sampling: uniform index into each query's padded negative pool
    (rejection-free: modulo valid count);
  - hard negatives: same, from the hard pool, alternating steps for
    intersection structures (matching §2.5's alternation);
  - mixed-formula batches with per-row relation gather (models/gqe.py
    *_rows) — same math as the reference's per-formula batches, different
    (IID) schedule.

HBM cost: ~(A+R+2+K+Kh) int32 per query — ~100 MB for 10M queries at K=16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphqembed_tpu.config import GQEConfig, INTERSECT_STRUCTURES, STRUCTURES
from graphqembed_tpu.data.queries import Query
from graphqembed_tpu.graph.schema import Schema
from graphqembed_tpu.models import gqe


class DevicePool:
    """One structure's queries as device arrays."""

    def __init__(self, schema: Schema, structure: str, queries: list[Query],
                 neg_width: int = 16, hard_neg_width: int = 16):
        assert all(q.formula.structure == structure for q in queries)
        self.structure = structure
        n = len(queries)
        a = queries[0].formula.n_anchors
        r = len(queries[0].formula.rels)
        anchors = np.zeros((n, a), np.int32)
        rels = np.zeros((n, r), np.int32)
        inter_modes = np.zeros(n, np.int32)
        targets = np.zeros(n, np.int32)
        negs = np.zeros((n, neg_width), np.int32)
        neg_counts = np.zeros(n, np.int32)
        hard = np.zeros((n, hard_neg_width), np.int32)
        hard_counts = np.zeros(n, np.int32)
        rng = np.random.default_rng(0)
        for i, q in enumerate(queries):
            anchors[i] = q.anchors
            rels[i] = q.formula.rel_ids(schema)
            im = q.formula.intersection_mode
            inter_modes[i] = -1 if im is None else schema.mode_id(im)
            targets[i] = q.target
            pool = q.neg_samples
            if len(pool) > neg_width:
                pool = rng.choice(pool, size=neg_width, replace=False)
            negs[i, :len(pool)] = pool
            neg_counts[i] = len(pool)
            hp = q.hard_neg_samples
            if hp is None or len(hp) == 0:
                hp = pool  # fall back to plain negatives
            if len(hp) > hard_neg_width:
                hp = rng.choice(hp, size=hard_neg_width, replace=False)
            hard[i, :len(hp)] = hp
            hard_counts[i] = len(hp)
        dev = jnp.asarray
        self.n = n
        self.anchors = dev(anchors)
        self.rels = dev(rels)
        self.inter_modes = dev(inter_modes)
        self.targets = dev(targets)
        self.negs = dev(negs)
        self.neg_counts = dev(np.maximum(neg_counts, 1))
        self.hard = dev(hard)
        self.hard_counts = dev(np.maximum(hard_counts, 1))


def device_pool_from_arrays(schema: Schema, arrays: dict,
                            neg_width: int = 16,
                            hard_neg_width: int = 16) -> "DevicePool":
    """Build a DevicePool straight from native_sample_arrays output (no
    python Query objects in between) — the bulk preprocessing fast path."""
    structure = arrays["structure"]
    from graphqembed_tpu.data.queries import STRUCT_SHAPE
    a, r = STRUCT_SHAPE[structure]
    n = len(arrays["targets"])
    pool = DevicePool.__new__(DevicePool)
    pool.structure = structure
    pool.n = n
    dev = jnp.asarray
    pool.anchors = dev(arrays["anchors"][:, :a])
    rels = arrays["rels"][:, :r]
    pool.rels = dev(rels)
    # intersection mode id per row (−1 for chains)
    from graphqembed_tpu.config import INTERSECT_STRUCTURES
    if structure in INTERSECT_STRUCTURES:
        tm = schema.rel_target_mode_ids()
        if structure == "ip":
            im = tm[rels[:, 0]]   # intersection at v = branch rels' to-mode
        else:
            im = tm[rels[:, -1]]  # 2i/3i/pi intersect at the target mode
        pool.inter_modes = dev(im.astype(np.int32))
    else:
        pool.inter_modes = dev(np.full(n, -1, np.int32))
    pool.targets = dev(arrays["targets"])
    negs = arrays["negs"][:, :neg_width]
    negc = np.minimum(arrays["neg_counts"], neg_width)
    pool.negs = dev(np.ascontiguousarray(negs))
    pool.neg_counts = dev(np.maximum(negc, 1).astype(np.int32))
    hard = arrays["hard"][:, :hard_neg_width]
    hardc = np.minimum(arrays["hard_counts"], hard_neg_width)
    # fall back to plain negatives where no hard pool exists
    none = hardc == 0
    hard = np.where(none[:, None], negs[:, :hard_neg_width], hard)
    hardc = np.where(none, negc, hardc)
    pool.hard = dev(np.ascontiguousarray(hard))
    pool.hard_counts = dev(np.maximum(hardc, 1).astype(np.int32))
    return pool


class DeviceTrainData:
    def __init__(self, schema: Schema, queries: list[Query],
                 neg_width: int = 16, hard_neg_width: int = 16):
        by_struct: dict[str, list[Query]] = {}
        for q in queries:
            by_struct.setdefault(q.formula.structure, []).append(q)
        self.pools = {
            s: DevicePool(schema, s, qs, neg_width, hard_neg_width)
            for s, qs in by_struct.items()
        }
        self.weights = {s: len(qs) for s, qs in by_struct.items()}

    @property
    def structures(self) -> list[str]:
        return [s for s in STRUCTURES if s in self.pools]

    @classmethod
    def from_pools(cls, pools: dict[str, DevicePool]) -> "DeviceTrainData":
        """Wrap pre-built pools (device_pool_from_arrays fast path — no
        python Query objects; the multi-million-query route)."""
        self = cls.__new__(cls)
        self.pools = dict(pools)
        self.weights = {s: int(p.n) for s, p in pools.items()}
        return self


def _hard_step(cfg: GQEConfig, t):
    """Whether scan step t draws its negative from the HARD pool
    (intersection structures, use_hard=True): strict parity alternation at
    the default hard_neg_frac=0.5 — bit-preserving the reference schedule —
    otherwise an 8-step cycle with round(frac*8) hard steps."""
    if cfg.hard_neg_frac == 0.5:
        return (t % 2) == 1
    k = int(round(cfg.hard_neg_frac * 8))
    return (t % 8) < k


def _select_batches(cfg: GQEConfig, key, n_steps, arrays, use_hard,
                    n_keys: int = 2, idx_constraint=None):
    """All n_steps batches selected OUTSIDE the scan body, in a handful of
    big kernels instead of ~10 tiny ones per step.

    Bitwise-identical to the former per-step derivation: step t's key is
    fold_in(key, t), a pure function of (key, t), so vmapping the whole
    selection over t ∈ [0, n_steps) reproduces the exact idx / negative
    draws the per-step code produced (pinned by
    test_mega_step_matches_sequential, which compares against per-dispatch
    sequences built the old way). This is half of the round-4 kernel-count
    lever (docs/DESIGN.md §11 addendum 2): per scan step the body's data
    dependencies shrink to slices of the pre-gathered [T, B, ...] arrays.

    n_keys=3 additionally returns the per-step k_opt stream used by the
    sparse path (split(k, 3) ≠ split(k) — the streams must match the old
    per-step code exactly). idx_constraint optionally re-shards the [T, B]
    index array (DP batch split in the GSPMD scan).

    Returns (batch_xs dict with [T, B, ...] leaves, k_opt or None)."""
    anchors, rels, inter_modes, targets, negs, neg_counts, hard, \
        hard_counts = arrays
    n = anchors.shape[0]
    b = cfg.batch_size
    ts = jnp.arange(n_steps)

    def per_step(t):
        k = jax.random.fold_in(key, t)
        if n_keys == 3:
            k_idx, k_neg, k_opt = jax.random.split(k, 3)
        else:
            k_idx, k_neg = jax.random.split(k)
            k_opt = k
        idx = jax.random.randint(k_idx, (b,), 0, n)
        j = jax.random.randint(k_neg, (b,), 0, 1 << 30)
        return idx, j, k_opt

    idx, j, k_opt = jax.vmap(per_step)(ts)        # [T, B]
    if idx_constraint is not None:
        idx = idx_constraint(idx)
    flat = idx.reshape(-1)
    sel = lambda a: a[flat].reshape((n_steps, b) + a.shape[1:])
    if use_hard:
        odd = jax.vmap(lambda t: _hard_step(cfg, t))(ts)   # [T] bool
        pool = jnp.where(odd[:, None, None], sel(hard), sel(negs))
        cnt = jnp.where(odd[:, None], sel(hard_counts), sel(neg_counts))
    else:
        pool = sel(negs)
        cnt = sel(neg_counts)
    neg = jnp.take_along_axis(pool, (j % cnt)[..., None], axis=2)[..., 0]
    batch_xs = {"anchors": sel(anchors), "rels": sel(rels),
                "inter_modes": sel(inter_modes), "targets": sel(targets),
                "negs": neg}
    return batch_xs, (k_opt if n_keys == 3 else None)


class FusedAdamOpt:
    """Optimizer shim for the scan drivers backed by ops/fused_adam.py: the
    whole Adam update is ONE aliased HBM pass per leaf per step, and bfloat16
    leaves (cfg.storage_dtype="bfloat16") are written with on-core STOCHASTIC
    ROUNDING — the only correct way to keep Adam moments in bf16 (nearest
    rounding stalls them; see ops/fused_adam.py docstring).

    Not an optax.GradientTransformation on purpose: optax's contract is
    `params + updates`, and that final ADD would itself round-to-nearest in
    bf16 — the new parameter value must be produced in f32 and
    stochastically rounded in the same kernel pass. State = (mu, nu, count).
    lr: float or schedule fn(count) -> lr."""

    def __init__(self, lr):
        self.lr = lr

    def init(self, params):
        return (jax.tree.map(jnp.zeros_like, params),
                jax.tree.map(jnp.zeros_like, params),
                jnp.zeros((), jnp.int32))

    def apply(self, params, grads, state):
        from graphqembed_tpu.ops.fused_adam import fused_adam_tree
        mu, nu, count = state
        count = count + 1
        lr = self.lr(count) if callable(self.lr) else jnp.float32(self.lr)
        params, mu, nu = fused_adam_tree(params, grads, mu, nu, count, lr)
        return params, (mu, nu, count)

    def apply_rows(self, params, small_grads, ids, row_grads, state,
                   presorted=None):
        """Row-gradient fast path (bf16 table, direct encoder): the table is
        updated by ops/fused_adam.py's sparse-grad dense-Adam SR kernel —
        no [N, d] cotangent ever materialized (docs/DESIGN.md §12). Other
        leaves take the normal fused kernel. small_grads: grads for every
        leaf EXCEPT 'table'. presorted: optional
        (sorted_ids, order, tile_starts) from presort_row_ids — the scan
        drivers precompute it for ALL steps outside the body (an in-scan
        sort costs ~40 µs/step; amortized it is ~1 µs)."""
        from graphqembed_tpu.ops.fused_adam import (
            adam_step_rows_sr_ref,
            fused_adam_table_rows_sr,
            fused_adam_table_sorted_rows_sr,
            fused_adam_tree,
        )
        mu, nu, count = state
        count = count + 1
        lr = self.lr(count) if callable(self.lr) else jnp.float32(self.lr)
        small = {k: v for k, v in params.items() if k != "table"}
        small_mu = {k: v for k, v in mu.items() if k != "table"}
        small_nu = {k: v for k, v in nu.items() if k != "table"}
        small, small_mu, small_nu = fused_adam_tree(
            small, small_grads, small_mu, small_nu, count, lr)
        d = params["table"].shape[1]
        if jax.default_backend() == "tpu":
            seed = count.astype(jnp.int32) * jnp.int32(1000003)
            if presorted is not None:
                sids, order, starts = presorted
                aug = jnp.concatenate(
                    [row_grads.reshape(-1, d).astype(jnp.bfloat16),
                     jnp.zeros((1, d), jnp.bfloat16)])
                t_p, t_mu, t_nu = fused_adam_table_sorted_rows_sr(
                    params["table"], mu["table"], nu["table"], sids,
                    aug[order], starts, count, seed, lr)
            else:
                t_p, t_mu, t_nu = fused_adam_table_rows_sr(
                    params["table"], mu["table"], nu["table"], ids,
                    row_grads, count, seed, lr)
        else:
            key = jax.random.fold_in(jax.random.key(1), count)
            t_p, t_mu, t_nu = adam_step_rows_sr_ref(
                params["table"], mu["table"], nu["table"], ids, row_grads,
                count, lr, key)
        params = dict(small, table=t_p)
        mu = dict(small_mu, table=t_mu)
        nu = dict(small_nu, table=t_nu)
        return params, (mu, nu, count)


def _apply_optimizer(optimizer, params, grads, opt_state):
    """One optimizer step for either an optax transformation or FusedAdamOpt
    (which must own the parameter write — see FusedAdamOpt docstring)."""
    if isinstance(optimizer, FusedAdamOpt):
        return optimizer.apply(params, grads, opt_state)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def _rows_fast(cfg: GQEConfig, optimizer) -> bool:
    """Whether the rows-grad update path applies (see _train_body). Opt-in
    via cfg.rows_grad_update — measured SLOWER than the dense sorted-scatter
    path at bench scale (config.py flag comment, docs/DESIGN.md §12)."""
    return (cfg.rows_grad_update and isinstance(optimizer, FusedAdamOpt)
            and cfg.depth == 0 and cfg.storage_dtype != "float32")


def _augment_rows_fast(batch_xs: dict, n_table: int, d: int = 128) -> dict:
    """Attach pre-sorted id metadata for the sorted-rows Adam kernel to the
    hoisted batches: ONE batched argsort + searchsorted for all T steps
    (ops/fused_adam.py::presort_row_ids)."""
    from graphqembed_tpu.ops.fused_adam import presort_row_ids

    ids = jnp.concatenate(
        [batch_xs["anchors"], batch_xs["targets"][..., None],
         batch_xs["negs"][..., None]], axis=-1)        # [T, B, A+2]
    ids2 = ids.reshape(ids.shape[0], -1)
    sids, order, starts = presort_row_ids(ids2, n_table, d)
    return dict(batch_xs, sorted_ids=sids, sort_order=order,
                tile_starts=starts)


def _train_body(cfg: GQEConfig, optimizer, structure, weight, tables):
    """The per-step scan body shared by make_scan_train_step and the
    multitask mega-step: carry (params, opt_state), xs = one pre-selected
    batch (_select_batches). Three formulations, fastest applicable wins:

    1. rows-grad fast path (bf16 table + FusedAdamOpt + direct encoder):
       differentiate w.r.t. the GATHERED rows and let the sparse-grad
       dense-Adam SR kernel own the table update — no [N, d] cotangent
       exists at all (docs/DESIGN.md §12);
    2. one-gather dense path (direct encoder): one fused table gather, one
       dense cotangent with a sorted-scatter backward (ops/grads.py);
    3. the general path (depth>0 SAGE encoder via neighbor tables)."""
    rows_fast = _rows_fast(cfg, optimizer)

    def body(carry, batch):
        params, opt_state = carry
        b = batch["targets"].shape[0]
        if rows_fast:
            table = params["table"]
            small = {k: v for k, v in params.items() if k != "table"}
            ids = jnp.concatenate(
                [batch["anchors"], batch["targets"][:, None],
                 batch["negs"][:, None]], axis=1)
            rows = table[ids]

            def loss_fn(rows, sp):
                return weight * gqe.margin_loss_from_rows(
                    cfg, sp, structure, rows, batch["rels"],
                    batch["inter_modes"])

            loss, (g_rows, g_small) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(rows, small)
            presorted = None
            if "sorted_ids" in batch:
                presorted = (batch["sorted_ids"], batch["sort_order"],
                             batch["tile_starts"])
            params, opt_state = optimizer.apply_rows(
                params, g_small, ids, g_rows, opt_state,
                presorted=presorted)
            return (params, opt_state), loss

        def loss_fn(p):
            encode_fn = None
            if cfg.depth > 0 and tables is not None:
                from graphqembed_tpu.models.encoders import make_deep_encoder
                encode_fn = make_deep_encoder(cfg, p, tables, cfg.depth,
                                              cfg.aggregator)
            if encode_fn is None:
                # one fused gather -> one sorted-scatter in backward
                # (gqe.margin_loss_rows_onegather docstring)
                return weight * gqe.margin_loss_rows_onegather(
                    cfg, p, structure, batch["anchors"], batch["rels"],
                    batch["inter_modes"], batch["targets"], batch["negs"],
                    jnp.ones(b, jnp.bool_))
            return weight * gqe.margin_loss_rows(
                cfg, p, structure, batch["anchors"], batch["rels"],
                batch["inter_modes"], batch["targets"], batch["negs"],
                jnp.ones(b, jnp.bool_), encode_fn=encode_fn)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = _apply_optimizer(optimizer, params, grads,
                                             opt_state)
        return (params, opt_state), loss

    return body


def _check_storage_optimizer(cfg: GQEConfig, optimizer):
    """bf16 storage is only sound under stochastic-rounding writes: a plain
    optax optimizer would create bf16 moments and round-to-nearest every
    update away (ops/fused_adam.py). Fail loudly instead of training a
    frozen table."""
    if cfg.storage_dtype != "float32" and not isinstance(optimizer,
                                                         FusedAdamOpt):
        raise ValueError(
            "storage_dtype=bfloat16 requires the stochastic-rounding "
            "optimizer (FusedAdamOpt); got a plain optax transformation")


def default_optimizer(cfg: GQEConfig, lr=None):
    """The right Adam for the config: FusedAdamOpt (one-pass, SR) for bf16
    storage, optax.adam otherwise."""
    lr = cfg.lr if lr is None else lr
    if cfg.storage_dtype != "float32":
        return FusedAdamOpt(lr)
    return optax.adam(lr)


def make_scan_train_step(cfg: GQEConfig, optimizer, neighbor_tables=None):
    """Returns scan_fn(params, opt_state, pool, structure, key, n_steps,
    weight, use_hard) -> (params, opt_state, mean_loss): n_steps training
    steps in ONE dispatch. use_hard=True draws negatives from the hard pool on
    odd steps (intersection structures). neighbor_tables enables the depth>0
    SAGE encoder (passed as a jit argument, not a closure constant).
    optimizer: optax transformation or FusedAdamOpt (required for bf16
    storage)."""
    _check_storage_optimizer(cfg, optimizer)

    @functools.partial(
        jax.jit,
        static_argnames=("structure", "n_steps", "use_hard"),
        donate_argnames=("params", "opt_state"),
    )
    def scan_fn(params, opt_state, anchors, rels, inter_modes, targets, negs,
                neg_counts, hard, hard_counts, tables, structure, key,
                n_steps, weight, use_hard):
        batch_xs, _ = _select_batches(
            cfg, key, n_steps,
            (anchors, rels, inter_modes, targets, negs, neg_counts, hard,
             hard_counts), use_hard)
        if _rows_fast(cfg, optimizer) and jax.default_backend() == "tpu":
            batch_xs = _augment_rows_fast(batch_xs,
                                          params["table"].shape[0],
                                          params["table"].shape[1])
        body = _train_body(cfg, optimizer, structure, weight, tables)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batch_xs)
        return params, opt_state, jnp.mean(losses)

    def run(params, opt_state, pool: DevicePool, structure: str, key,
            n_steps: int, weight: float, use_hard: bool):
        return scan_fn(params, opt_state, pool.anchors, pool.rels,
                       pool.inter_modes, pool.targets, pool.negs,
                       pool.neg_counts, pool.hard, pool.hard_counts,
                       neighbor_tables, structure, key, n_steps,
                       np.float32(weight), use_hard)

    return run


def make_scan_train_step_sparse(cfg: GQEConfig, small_optimizer):
    """Sparse-table-update variant of make_scan_train_step: the loss is built
    from GATHERED rows, so table gradients are [B·(A+2), d] row grads (never
    densified) and the table is updated by lazy sparse Adam
    (training/sparse_adam.py) in O(touched rows). Operator params still use
    the dense optax optimizer. Returns run(params_small, table, table_state,
    opt_state, pool, structure, key, n_steps, weight, use_hard)."""
    from graphqembed_tpu.training.sparse_adam import lazy_adam_update

    @functools.partial(
        jax.jit,
        static_argnames=("structure", "n_steps", "use_hard"),
        donate_argnames=("small_params", "table", "table_state", "opt_state"),
    )
    def scan_fn(small_params, table, table_state, opt_state, anchors, rels,
                inter_modes, targets, negs, neg_counts, hard, hard_counts,
                structure, key, n_steps, weight, use_hard):
        batch_xs, k_opts = _select_batches(
            cfg, key, n_steps,
            (anchors, rels, inter_modes, targets, negs, neg_counts, hard,
             hard_counts), use_hard, n_keys=3)
        batch_xs["k_opt"] = k_opts

        def body(carry, batch):
            small_params, table, table_state, opt_state = carry
            k_opt = batch["k_opt"]
            ids = jnp.concatenate(
                [batch["anchors"], batch["targets"][:, None],
                 batch["negs"][:, None]], axis=1)
            rows = table[ids]  # [B, A+2, d] — grads stay row-sparse

            def loss_fn(rows, sp):
                return weight * gqe.margin_loss_from_rows(
                    cfg, sp, structure, rows, batch["rels"],
                    batch["inter_modes"])

            loss, (g_rows, g_small) = jax.value_and_grad(
                loss_fn, argnums=(0, 1))(rows, small_params)
            table, table_state = lazy_adam_update(
                table, table_state, ids.reshape(-1),
                g_rows.reshape(-1, rows.shape[-1]), lr=cfg.lr, key=k_opt)
            updates, opt_state = small_optimizer.update(
                g_small, opt_state, small_params)
            small_params = optax.apply_updates(small_params, updates)
            return (small_params, table, table_state, opt_state), loss

        carry, losses = jax.lax.scan(
            body, (small_params, table, table_state, opt_state), batch_xs)
        small_params, table, table_state, opt_state = carry
        return small_params, table, table_state, opt_state, jnp.mean(losses)

    def run(small_params, table, table_state, opt_state, pool: DevicePool,
            structure: str, key, n_steps: int, weight: float, use_hard: bool):
        return scan_fn(small_params, table, table_state, opt_state,
                       pool.anchors, pool.rels, pool.inter_modes, pool.targets,
                       pool.negs, pool.neg_counts, pool.hard, pool.hard_counts,
                       structure, key, n_steps, np.float32(weight), use_hard)

    return run


def make_multitask_mega_step(cfg: GQEConfig, optimizer,
                             data: DeviceTrainData,
                             structures: list[str] | None = None,
                             neighbor_tables=None, mesh=None):
    """Whole multitask ROUNDS in one dispatch: for each of n_rounds, every
    structure takes steps_per weighted train steps (hard-negative alternation
    on intersection structures). One dispatch replaces len(structures) *
    n_rounds dispatches of make_scan_train_step — decisive when the chip sits
    behind a high-RTT tunnel (each dispatch costs ~1.7 s here, vs ~0.3 ms of
    compute per step).

    Key discipline matches make_scan_train_step exactly: structure s in round
    r uses key_s = fold_in(fold_in(key, r), s_index) and per-step
    fold_in(key_s, t) — so the result is bitwise-equal to the equivalent
    sequence of single-structure dispatches (pinned by
    test_mega_step_matches_sequential).

    neighbor_tables (models/encoders.py::NeighborTables, a registered pytree)
    enables the depth>0 SAGE encoder inside the scan; it is passed as a jit
    ARGUMENT, not a closure, so the (possibly tens-of-MB) neighbor arrays are
    device operands rather than literal constants in the serialized program
    (remote compiles reject large constants — docs/DESIGN.md §7).

    mesh: a jax.sharding.Mesh turns this into the MULTI-CHIP production
    mega-step (GSPMD): the [T, B] batch-selection index array carries the DP
    split on the batch axis (the make_sharded_scan_train_step lever,
    parallel/train_step.py), pools and neighbor tables are placed replicated,
    and params are expected row-sharded (parallel.shard_params). Batch draws
    are a pure function of (key, t), so losses match the single-device
    mega-step up to the DP psum's f32 reduction reassociation (pinned by
    test_sharded_trainer.py).

    Returns run(params, opt_state, key, n_rounds, steps_per)
    -> (params, opt_state, losses [n_rounds, n_structures])."""
    from graphqembed_tpu.training.loop import structure_weight

    _check_storage_optimizer(cfg, optimizer)

    structures = list(structures or data.structures)
    weights = [np.float32(structure_weight(cfg, s)) for s in structures]
    use_hards = [s in INTERSECT_STRUCTURES and cfg.hard_neg_alternate
                 for s in structures]
    pools = [data.pools[s] for s in structures]
    b = cfg.batch_size

    idx_constraint = None
    if mesh is not None:
        if isinstance(optimizer, FusedAdamOpt):
            raise ValueError(
                "mesh training uses GSPMD-partitioned XLA ops; FusedAdamOpt's "
                "Pallas kernels are opaque to GSPMD (they would be replicated "
                "wholesale) — use optax.adam / storage_dtype=float32 on a "
                "mesh")
        from jax.sharding import NamedSharding, PartitionSpec
        tb_sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        idx_constraint = (
            lambda idx: jax.lax.with_sharding_constraint(idx, tb_sh))

    def one_structure(params, opt_state, key_s, arrays, tables, structure,
                      weight, use_hard, steps_per):
        batch_xs, _ = _select_batches(cfg, key_s, steps_per, arrays, use_hard,
                                      idx_constraint=idx_constraint)
        if _rows_fast(cfg, optimizer) and jax.default_backend() == "tpu":
            batch_xs = _augment_rows_fast(batch_xs,
                                          params["table"].shape[0],
                                          params["table"].shape[1])
        body = _train_body(cfg, optimizer, structure, weight, tables)
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batch_xs)
        return params, opt_state, jnp.mean(losses)

    @functools.partial(
        jax.jit,
        static_argnames=("n_rounds", "steps_per"),
        donate_argnames=("params", "opt_state"),
    )
    def mega(params, opt_state, key, tables, n_rounds, steps_per,
             *flat_pools):
        per_struct = [flat_pools[i * 8:(i + 1) * 8]
                      for i in range(len(structures))]

        def round_body(carry, r):
            params, opt_state = carry
            kr = jax.random.fold_in(key, r)
            losses = []
            for si, s in enumerate(structures):
                params, opt_state, ml = one_structure(
                    params, opt_state, jax.random.fold_in(kr, si),
                    per_struct[si], tables, s, weights[si], use_hards[si],
                    steps_per)
                losses.append(ml)
            return (params, opt_state), jnp.stack(losses)

        (params, opt_state), losses = jax.lax.scan(
            round_body, (params, opt_state), jnp.arange(n_rounds))
        return params, opt_state, losses

    flat = []
    for p in pools:
        flat += [p.anchors, p.rels, p.inter_modes, p.targets, p.negs,
                 p.neg_counts, p.hard, p.hard_counts]
    tables = neighbor_tables
    if mesh is not None:
        from graphqembed_tpu.parallel.mesh import replicated
        rep = replicated(mesh)
        flat = [jax.device_put(x, rep) for x in flat]
        if tables is not None:
            tables = jax.device_put(tables, rep)

    def run(params, opt_state, key, n_rounds: int, steps_per: int):
        return mega(params, opt_state, key, tables, n_rounds,
                    steps_per, *flat)

    return run


def run_train_device_mega(cfg: GQEConfig, schema: Schema, params: dict,
                          data: DeviceTrainData, val_queries=None,
                          total_steps: int | None = None,
                          burn_in_steps: int | None = None,
                          steps_per: int = 100, key=None, optimizer=None,
                          log=None, neighbor_tables=None,
                          ckpt_manager=None, ckpt_every: int = 0,
                          resume: bool = False, deferred_pools=None,
                          mesh=None):
    """High-level device-resident training: burn-in then multitask rounds,
    each burn-in / inter-eval segment as ONE mega-dispatch
    (make_multitask_mega_step) — the dispatch-economical production driver
    behind the flagship runs and `gqe-train --pipeline device`. Evaluates on
    val_queries every ~cfg.val_every steps (rounded to dispatch boundaries)
    and keeps the best params. Returns a training/loop.py::TrainResult.

    Production features (parity with the host pipeline, at dispatch
    granularity by design — the unit of work here is a segment, not a step):
    - convergence stopping: loop.py::check_conv over the per-dispatch-round
      mean loss series, window rounded from cfg.conv_window steps to rounds
      (burn-in: 1p rounds of steps_per; multitask: rounds of
      n_struct*steps_per);
    - checkpoint/resume: ckpt_manager + ckpt_every save (params, opt_state,
      best_params) at the first dispatch boundary past each multiple;
      resume restores and continues bit-identically — batch selection is
      counter-based (fold_in(key, dispatch_i)), so no host RNG state exists;
    - depth>0: neighbor_tables threads the SAGE encoder into the scan.

    deferred_pools: optional callable () -> dict[str, DevicePool], invoked
    AFTER burn-in and merged into `data` before the multitask phase. Burn-in
    trains on 1p only, so the expensive non-1p pool sampling (C++, host) can
    OVERLAP with burn-in running on the device — pass a callable that joins
    a ThreadPoolExecutor started before this function (the C sampler
    releases the GIL). At paper scale this hides most of the pool build
    behind ~150k burn-in steps.

    mesh: a jax.sharding.Mesh runs the FULL protocol distributed — the
    mesh-reachable production trainer (`gqe-train --pipeline device
    --mesh N`): params are row-sharded/padded here (parallel.shard_params,
    unless already sharded on this mesh), every mega-dispatch is the GSPMD
    sharded mega-step (DP batch split + row-sharded table, XLA-inserted
    collectives), and eval/checkpoint/convergence run unchanged on the
    sharded arrays (orbax is sharding-aware; cross-mesh-shape restore is
    pinned by test_checkpoint.py). Requires storage_dtype=float32 (see
    make_multitask_mega_step).
    """
    import time

    from graphqembed_tpu.training.eval import eval_auc
    from graphqembed_tpu.training.loop import TrainResult, check_conv

    total_steps = total_steps if total_steps is not None else cfg.max_iter
    burn_in_steps = (burn_in_steps if burn_in_steps is not None
                     else min(cfg.max_burn_in, total_steps))
    optimizer = optimizer or default_optimizer(cfg)
    if mesh is not None:
        from graphqembed_tpu.parallel.mesh import shard_params
        params = shard_params(params, mesh)
    opt_state = optimizer.init(params)
    key = key if key is not None else jax.random.key(cfg.seed)
    mega_burn = (make_multitask_mega_step(cfg, optimizer, data, ["1p"],
                                          neighbor_tables, mesh=mesh)
                 if "1p" in data.pools else None)
    # mega_all is built AFTER burn-in (below): with deferred_pools, the
    # non-1p pools may still be sampling on host threads while burn-in runs
    losses: dict[str, list[float]] = {s: [] for s in data.structures}
    burn_series: list[float] = []   # per-round 1p mean losses
    multi_series: list[float] = []  # per-round mean multitask losses
    val_history: list[tuple[int, float]] = []
    # a COPY: `params` is donated to the first dispatch, and best_params must
    # stay live for checkpointing even before the first eval replaces it
    best_macro = -1.0
    best_params = jax.tree.map(lambda x: x.copy(), params)
    done = 0
    dispatch_i = 0
    actual_burn_in = 0
    t_train = 0.0
    t_eval = 0.0
    t_ckpt = 0.0
    t_pool_wait = 0.0
    t_val_wait = 0.0   # blocked on a deferred (callable) val_queries future
    last_ckpt = 0

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
            actual_burn_in = int(meta.get("burn_in_steps", 0))
            best_macro = float(meta.get("best_macro", -1.0))

    def dispatch(fn, rounds, structures):
        nonlocal done, dispatch_i, t_train
        t0 = time.time()
        p, o, mloss = fn(params, opt_state,
                         jax.random.fold_in(key, dispatch_i), rounds,
                         steps_per)
        jax.block_until_ready(mloss)
        t_train += time.time() - t0
        dispatch_i += 1
        done += rounds * len(structures) * steps_per
        ml = np.asarray(mloss)  # [rounds, n_structures]
        for si, s in enumerate(structures):
            losses[s].extend(ml[:, si].tolist())
        return p, o, ml

    def maybe_ckpt(phase: str):
        nonlocal last_ckpt, t_ckpt
        if ckpt_manager is not None and ckpt_every and \
                done - last_ckpt >= ckpt_every:
            tc = time.time()
            ckpt_manager.save_state(
                done,
                {"params": params, "opt_state": opt_state,
                 "best_params": best_params},
                extra={"dispatch_i": dispatch_i, "best_macro": best_macro,
                       "burn_in_steps": actual_burn_in, "phase": phase})
            t_ckpt += time.time() - tc
            last_ckpt = done

    # --- burn-in (1p only), chunked so convergence/ckpt apply ---
    burn_window = max(1, round(cfg.conv_window / steps_per))
    if mega_burn is not None and done < burn_in_steps and actual_burn_in == done:
        chunk_rounds = max(1, min(cfg.val_every, ckpt_every or cfg.val_every)
                           // steps_per)
        while done < burn_in_steps:
            rounds = min(chunk_rounds,
                         max(1, (burn_in_steps - done) // steps_per))
            params, opt_state, ml = dispatch(mega_burn, rounds, ["1p"])
            burn_series.extend(ml[:, 0].tolist())
            actual_burn_in = done
            maybe_ckpt("burn")
            if log:
                log(done, "1p", burn_series[-1])
            if check_conv(burn_series, burn_window, cfg.tol):
                break

    # --- merge deferred pools (overlapped with burn-in on the device) ---
    if deferred_pools is not None:
        tw = time.time()
        merged = deferred_pools()
        t_pool_wait = time.time() - tw
        for s, pool in merged.items():
            data.pools[s] = pool
            data.weights[s] = int(pool.n)
            losses.setdefault(s, [])

    # --- multitask rounds with eval / ckpt / convergence ---
    mega_all = make_multitask_mega_step(cfg, optimizer, data,
                                        neighbor_tables=neighbor_tables,
                                        mesh=mesh)
    n_struct = len(data.structures)
    eval_every = max(1, min(cfg.val_every, total_steps - done)
                     ) if total_steps > done else 1
    multi_window = max(1, round(cfg.conv_window / (n_struct * steps_per)))
    while done < total_steps:
        seg = min(eval_every, total_steps - done)
        rounds = max(1, round(seg / (n_struct * steps_per)))
        params, opt_state, ml = dispatch(mega_all, rounds, data.structures)
        multi_series.extend(ml.mean(axis=1).tolist())
        if val_queries:
            te = time.time()
            from graphqembed_tpu.training.loop import resolve_queries
            val_queries = resolve_queries(val_queries)
            t_val_wait += time.time() - te
            te = time.time()
            aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                            neighbor_tables=neighbor_tables)
            t_eval += time.time() - te
            macro = aucs.get("macro", 0.0)
            val_history.append((done, macro))
            if macro > best_macro:
                best_macro = macro
                best_params = jax.tree.map(lambda x: x.copy(), params)
        maybe_ckpt("multi")
        if log:
            log(done, "multitask", float(np.mean(
                [losses[s][-1] for s in data.structures])))
        if check_conv(multi_series, multi_window, cfg.tol):
            break
    if val_queries and not val_history:
        # Burn-in consumed the whole budget (or total_steps == 0): evaluate
        # once so best_val_auc is never a meaningless -1.
        from graphqembed_tpu.training.loop import resolve_queries
        val_queries = resolve_queries(val_queries)
        aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                        neighbor_tables=neighbor_tables)
        macro = aucs.get("macro", 0.0)
        val_history.append((done, macro))
        best_macro, best_params = macro, params
    return TrainResult(
        params=params,
        best_params=best_params if best_macro >= 0 else params,
        best_val_auc=best_macro,
        steps=done,
        burn_in_steps=actual_burn_in,
        losses=losses,
        val_history=val_history,
        queries_per_sec=(done * cfg.batch_size / t_train) if t_train else 0.0,
        timings={"train_s": t_train, "eval_s": t_eval, "ckpt_s": t_ckpt,
                 "pool_wait_s": t_pool_wait, "val_wait_s": t_val_wait},
    )


def run_train_device(cfg: GQEConfig, schema: Schema, params: dict,
                     data: DeviceTrainData, total_steps: int,
                     burn_in_steps: int = 0, chunk: int = 50,
                     key=None, log=None):
    """Burn-in (1p only) then weighted round-robin multitask, `chunk` steps
    per dispatch. Returns (params, opt_state, losses_by_structure)."""
    from graphqembed_tpu.training.loop import structure_weight

    optimizer = default_optimizer(cfg)
    opt_state = optimizer.init(params)
    scan = make_scan_train_step(cfg, optimizer)
    key = key if key is not None else jax.random.key(cfg.seed)
    losses: dict[str, list[float]] = {s: [] for s in data.structures}
    done = 0
    round_i = 0
    while done < total_steps:
        if done < burn_in_steps and "1p" in data.pools:
            order = ["1p"]
        else:
            order = data.structures
        for s in order:
            if done >= total_steps:
                break
            t = min(chunk, total_steps - done)
            key = jax.random.fold_in(key, round_i)
            params, opt_state, mloss = scan(
                params, opt_state, data.pools[s], s, key, t,
                structure_weight(cfg, s),
                s in INTERSECT_STRUCTURES and cfg.hard_neg_alternate)
            losses[s].append(float(mloss))
            done += t
            round_i += 1
            if log:
                log(done, s, float(mloss))
    return params, opt_state, losses
