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

    # opt state mirrors param shardings (adam m/v have param shapes)
    def opt_shardings(opt_state):
        return jax.tree.map(
            lambda x: ps["table"] if (hasattr(x, "ndim") and x.ndim == 2 and
                                      x.shape == params_like["table"].shape)
            else rep,
            opt_state,
            is_leaf=lambda x: hasattr(x, "ndim"),
        )

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
    _cache: dict = {}

    def sharded_step(params, opt_state, structure, rels, anchors, targets,
                     negs, row_mask, inter_mode_id, weight):
        if "fn" not in _cache:
            _cache["fn"] = compile_step(opt_state)
        return _cache["fn"](params, opt_state, structure, rels, anchors,
                            targets, negs, row_mask,
                            np.int32(inter_mode_id), np.float32(weight))

    return sharded_step
