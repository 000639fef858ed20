"""Sharded training step: DP over the batch axis + row-sharded embedding
table, compiled by XLA/GSPMD from NamedSharding annotations (SURVEY.md §3, §6
"distributed communication backend").

Two paths:
- `make_sharded_train_step` (this file): jit + NamedSharding — XLA inserts the
  gather/scatter collectives for the row-sharded table and the psum for DP
  grads automatically. This is the correctness/simplicity baseline.
- parallel/gather.py (owner-compute all-to-all gather under shard_map) is the
  explicitly-scheduled path for scaling work, validated bitwise against this.
"""

from __future__ import annotations


import jax
import numpy as np
import optax

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.models import gqe
from graphqembed_tpu.parallel.mesh import (
    batch_sharding,
    param_shardings,
    replicated,
)


def make_sharded_train_step(cfg: GQEConfig, optimizer, mesh, params_like: dict):
    """Returns jitted (params, opt_state, structure, batch...) -> (params,
    opt_state, loss) with explicit input/output shardings over `mesh`."""
    ps = param_shardings(params_like, mesh)
    rep = replicated(mesh)
    b1 = batch_sharding(mesh, 1)
    b2 = batch_sharding(mesh, 2)

    def step(params, opt_state, structure, rels, anchors, targets, negs,
             row_mask, inter_mode_id, weight):
        def loss_fn(p):
            return weight * gqe.margin_loss(
                cfg, p, structure, anchors, rels, inter_mode_id, targets,
                negs, row_mask)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # opt state mirrors param shardings (adam mu/nu embed the param dict
    # tree, so match each opt-state leaf to a param by dict-key suffix —
    # e.g. (..., 'mu', 'proj', 'W') -> ps['proj']['W']; scalars like the
    # adam count have no dict keys and stay replicated)
    _pmap: dict = {}
    jax.tree.map_with_path(
        lambda path, s: _pmap.setdefault(
            tuple(p.key for p in path if hasattr(p, "key")), s),
        ps)

    # shapes of params whose sharding is NOT replicated — used to catch
    # opt-state leaves that silently fall back to replicated (ADVICE r03:
    # an optimizer wrapping param-shaped state under non-dict containers
    # would replicate a table-sized moment without a word)
    _sharded_shapes = {
        tuple(x.shape)
        for x, s in zip(jax.tree.leaves(params_like), jax.tree.leaves(ps))
        if getattr(s, "spec", None) not in (None,) and s != rep
    }

    def opt_shardings(opt_state):
        import warnings

        def leaf_spec(path, x):
            keys = tuple(p.key for p in path if hasattr(p, "key"))
            for i in range(len(keys)):
                if keys[i:] in _pmap:
                    return _pmap[keys[i:]]
            if hasattr(x, "shape") and tuple(x.shape) in _sharded_shapes:
                warnings.warn(
                    f"opt-state leaf at {keys or path} has the shape of a "
                    f"SHARDED param {tuple(x.shape)} but resolved to "
                    "replicated — a wrapped/chained optimizer carrying "
                    "param-shaped state outside dict containers loses its "
                    "sharding; it will be replicated on every device",
                    stacklevel=2)
            return rep
        return jax.tree.map_with_path(
            leaf_spec, opt_state, is_leaf=lambda x: hasattr(x, "ndim"))

    def compile_step(opt_state_like):
        os_ps = opt_shardings(opt_state_like)
        return jax.jit(
            step,
            static_argnames=("structure",),
            in_shardings=(ps, os_ps, rels_s, b2, b1, b1, b1, rep, rep),
            out_shardings=(ps, os_ps, rep),
            donate_argnames=("params", "opt_state"),
        )

    rels_s = rep
    # Keyed on the opt-state tree structure + leaf shapes/dtypes so a second
    # optimizer (or param set) gets its own sharding assignment instead of
    # silently reusing the first compile's.
    _cache: dict = {}

    def _opt_key(opt_state):
        leaves, treedef = jax.tree.flatten(opt_state)
        return (treedef,
                tuple((getattr(x, "shape", ()), str(getattr(x, "dtype", "")))
                      for x in leaves))

    def _rep_global(x):
        """Multi-process jit rejects numpy inputs with (even replicated)
        shardings; every process holds the same value for these, so build
        the replicated global jax.Array explicitly."""
        if jax.process_count() == 1 or isinstance(x, jax.Array):
            return x
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep,
                                            lambda idx: x[idx])

    def sharded_step(params, opt_state, structure, rels, anchors, targets,
                     negs, row_mask, inter_mode_id, weight):
        k = _opt_key(opt_state)
        if k not in _cache:
            _cache[k] = compile_step(opt_state)
        return _cache[k](params, opt_state, structure, _rep_global(rels),
                         anchors, targets, negs, row_mask,
                         _rep_global(np.int32(inter_mode_id)),
                         _rep_global(np.float32(weight)))

    return sharded_step


def make_sharded_scan_train_step(cfg: GQEConfig, optimizer, mesh,
                                 neighbor_tables=None):
    """Sharded version of training/device_data.py::make_scan_train_step: the
    scan mega-step (n_steps per dispatch, on-device batch selection from an
    HBM-resident query pool) compiled by GSPMD over `mesh` — DP over the
    batch dim (with_sharding_constraint on the selected rows) + row-sharded
    embedding table; XLA inserts the table-gather collectives and the grad
    psum. This is the multi-chip production path: the single-chip pipeline's
    dispatch economics (whole training segments per dispatch) with the
    sharding of make_sharded_train_step.

    Numerics match the single-device scan up to f32 reduction order (the DP
    psum reassociates the batch loss sum) — pinned by
    test_sharded_scan_matches_single_device.

    Returns run(params, opt_state, pool, structure, key, n_steps, weight,
    use_hard) -> (params, opt_state, mean_loss). params must already be
    sharded (parallel.shard_params); pool arrays may live on one device —
    they are placed replicated at the first call. neighbor_tables enables
    the depth>0 SAGE encoder inside the sharded scan (tables placed
    replicated; the row-sharded table gathers compile to GSPMD
    collectives)."""
    import functools

    import jax.numpy as jnp

    from graphqembed_tpu.parallel.mesh import batch_sharding

    from jax.sharding import NamedSharding, PartitionSpec

    # [T, B] pre-selected index array: DP split is on the BATCH axis (1)
    tb_sh = NamedSharding(mesh, PartitionSpec(None, "data"))
    b = cfg.batch_size

    @functools.partial(
        jax.jit,
        static_argnames=("structure", "n_steps", "use_hard"),
        donate_argnames=("params", "opt_state"),
    )
    def scan_fn(params, opt_state, anchors, rels, inter_modes, targets, negs,
                neg_counts, hard, hard_counts, tables, structure, key,
                n_steps, weight, use_hard):
        from graphqembed_tpu.training.device_data import _select_batches

        # batch selection hoisted out of the scan body (device_data.py
        # _select_batches — the kernel-count lever); the [T, B] index array
        # carries the DP batch split so every per-step slice is DP-sharded.
        # _hard_step inside honors cfg.hard_neg_frac, matching the
        # single-device scan for non-default fractions too.
        batch_xs, _ = _select_batches(
            cfg, key, n_steps,
            (anchors, rels, inter_modes, targets, negs, neg_counts, hard,
             hard_counts), use_hard,
            idx_constraint=lambda idx: jax.lax.with_sharding_constraint(
                idx, tb_sh))

        def body(carry, batch):
            params, opt_state = carry

            def loss_fn(p):
                encode_fn = None
                if cfg.depth > 0 and tables is not None:
                    from graphqembed_tpu.models.encoders import (
                        make_deep_encoder,
                    )
                    encode_fn = make_deep_encoder(cfg, p, tables, cfg.depth,
                                                  cfg.aggregator)
                return weight * gqe.margin_loss_rows(
                    cfg, p, structure, batch["anchors"], batch["rels"],
                    batch["inter_modes"], batch["targets"], batch["negs"],
                    jnp.ones(b, jnp.bool_), encode_fn=encode_fn)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), batch_xs)
        return params, opt_state, jnp.mean(losses)

    rep = replicated(mesh)
    placed_tables = (None if neighbor_tables is None
                     else jax.device_put(neighbor_tables, rep))

    def run(params, opt_state, pool, structure: str, key, n_steps: int,
            weight: float, use_hard: bool):
        # Placed arrays are stashed ON the pool (not in an id()-keyed dict):
        # object identity can be recycled after GC, which would silently
        # substitute a stale pool's data, and a side dict would pin the
        # replicated HBM copies past the pool's lifetime.
        cached = getattr(pool, "_replicated", None)
        if cached is None or cached[0] != rep:
            placed = tuple(
                jax.device_put(x, rep) for x in
                (pool.anchors, pool.rels, pool.inter_modes, pool.targets,
                 pool.negs, pool.neg_counts, pool.hard, pool.hard_counts))
            pool._replicated = cached = (rep, placed)
        return scan_fn(params, opt_state, *cached[1], placed_tables,
                       structure, key, n_steps, np.float32(weight), use_hard)

    return run
