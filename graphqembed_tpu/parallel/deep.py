"""Edge-partitioned SHARDED deep (SAGE) encoding and training — BASELINE
config 5 composed for real: the depth-k encoder of models/encoders.py running
over a row-sharded embedding table and row-sharded per-relation adjacency,
with owner-compute all-to-all boundary exchange (parallel/gather.py) and the
ACTUAL encoder weights (W_self[mode], W_rel[rel], W_pool[rel]) — not the
generic demo weights of parallel/halo.py.

Sharding layout (mesh axis 'data'):
- embedding table [N, d]:        P('data', None)  — node rows partitioned
- flat adjacency [R·F, S] int32: P('data', None)  — (relation, from-node)
  rows partitioned = the edge partition; F = max nodes per from-mode
- node_mode/node_local/mode_rel: replicated (a few N int32s)
- encoder weights:               replicated (M·d² + 2R·d², a few MB)

One hop for a batch-sharded frontier ids [B]:
  1. frontier self rows      — owner-compute gather #1 (boundary exchange)
  2. self-transform matmul   — emitted BEFORE the neighbor exchange is
     consumed, so XLA's latency-hiding scheduler can overlap the MXU work
     with the in-flight all_to_all (the BASELINE "overlapped with
     intersection aggregation" schedule; see docs/overlap evidence)
  3. per-relation neighbor ids — owner-compute gather #2 over the edge
     partition
  4. neighbor (halo) embeddings — owner-compute gather #3
  5. masked aggregate + W_rel transform + relu + l2norm (local compute)

Forward values are BITWISE-equal to encoders.sage_encode: owner-compute
gathers return exact rows (no reduction reassociation) and the local math is
identical — pinned by tests/test_sharded_deep.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.models.encoders import NeighborTables
from graphqembed_tpu.models.gqe import _precision, l2_normalize
from graphqembed_tpu.parallel.gather import sharded_gather


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["flat_nbrs", "node_mode", "node_local", "mode_rel_ids"],
    meta_fields=["sample_size", "max_from"],
)
@dataclasses.dataclass
class ShardedNeighborTables:
    """NeighborTables flattened for row-sharding: flat_nbrs [R·F (padded to a
    mesh multiple), S], row = rel_id·F + local_index — the edge partition."""

    flat_nbrs: jnp.ndarray
    node_mode: jnp.ndarray
    node_local: jnp.ndarray
    mode_rel_ids: jnp.ndarray
    sample_size: int
    max_from: int

    @classmethod
    def build(cls, mesh: Mesh, tables: NeighborTables,
              axis: str = "data") -> "ShardedNeighborTables":
        r, f, s = tables.neighbors.shape
        flat = np.asarray(tables.neighbors).reshape(r * f, s)
        n_shards = mesh.shape[axis]
        pad = (-flat.shape[0]) % n_shards
        if pad:
            flat = np.concatenate(
                [flat, np.full((pad, s), -1, flat.dtype)], axis=0)
        rows = NamedSharding(mesh, P(axis, None))
        rep = NamedSharding(mesh, P())
        return cls(
            flat_nbrs=jax.device_put(jnp.asarray(flat), rows),
            node_mode=jax.device_put(jnp.asarray(tables.node_mode), rep),
            node_local=jax.device_put(jnp.asarray(tables.node_local), rep),
            mode_rel_ids=jax.device_put(jnp.asarray(tables.mode_rel_ids), rep),
            sample_size=tables.sample_size,
            max_from=f,
        )


def sage_encode_sharded(cfg: GQEConfig, mesh: Mesh, table: jnp.ndarray,
                        enc_params: dict, st: ShardedNeighborTables,
                        ids: jnp.ndarray, depth: int = 1,
                        aggregator: str = "mean",
                        axis: str = "data") -> jnp.ndarray:
    """Sharded mirror of models/encoders.py::sage_encode: ids [B]
    batch-sharded P(axis) -> [B, d]. Gathers go owner-compute over the
    row-sharded table/adjacency; everything else is local compute."""
    node_mode = st.node_mode
    node_local = st.node_local
    mode_rel = st.mode_rel_ids
    prec = _precision(cfg)
    # cfg.gather_capacity_factor <= 0 (default): exact worst-case capacity;
    # > 0: capacity-bounded all_to_all (smaller payload, hotspot drops)
    gather = functools.partial(sharded_gather, mesh, axis=axis,
                               capacity_factor=cfg.gather_capacity_factor)

    def embed(ids: jnp.ndarray, k: int) -> jnp.ndarray:
        base = l2_normalize(gather(table, ids))          # boundary exchange
        if k == 0:
            return base
        mode = node_mode[ids]
        local = node_local[ids]
        rels = mode_rel[mode]                            # [B, J] (−1 pad)
        J = rels.shape[1]
        # self transform first: independent of every neighbor exchange below,
        # so the scheduler can overlap the MXU matmul with the all_to_alls
        self_t = jnp.einsum("bd,bde->be", base, enc_params["W_self"][mode],
                            preferred_element_type=jnp.float32,
                            precision=prec)
        # O(1) EXCHANGES PER HOP: the per-relation neighbor-id requests and
        # the neighbor-embedding requests are each batched into a SINGLE
        # owner-compute all_to_all over all J relation slots (the r02 shape
        # issued one per relation per hop — dozens of sequential collective
        # latencies at real relation counts). Local aggregation/matmuls stay
        # per-slot, so forward values remain bitwise-equal to
        # encoders.sage_encode (pinned by test_sharded_deep.py).
        valid_rel = rels >= 0
        rel_safe = jnp.maximum(rels, 0)                  # [B, J]
        flat_rows = rel_safe * st.max_from + local[:, None]
        nb = gather(st.flat_nbrs, flat_rows.reshape(-1)).reshape(
            rels.shape + (st.sample_size,))              # [B, J, S], −1 pad
        nb_mask = (nb >= 0) & valid_rel[:, :, None]
        nb_emb = embed(jnp.maximum(nb, 0).reshape(-1), k - 1).reshape(
            nb.shape + (table.shape[1],))                # [B, J, S, d]
        acc = self_t
        for j in range(J):
            m = nb_mask[:, j, :, None].astype(nb_emb.dtype)
            if aggregator == "mean":
                agg = jnp.sum(nb_emb[:, j] * m, axis=1) / jnp.maximum(
                    jnp.sum(m, axis=1), 1.0)
            elif aggregator == "pool":
                h = jax.nn.relu(jnp.einsum(
                    "bsd,bde->bse", nb_emb[:, j],
                    enc_params["W_pool"][rel_safe[:, j]],
                    preferred_element_type=jnp.float32, precision=prec))
                h = jnp.where(nb_mask[:, j, :, None], h, -jnp.inf)
                agg = jnp.max(h, axis=1)
                agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
            else:
                raise ValueError(aggregator)
            rel_t = jnp.einsum("bd,bde->be", agg,
                               enc_params["W_rel"][rel_safe[:, j]],
                               preferred_element_type=jnp.float32,
                               precision=prec)
            acc = acc + jnp.where(valid_rel[:, j][:, None], rel_t, 0.0)
        return l2_normalize(jax.nn.relu(acc))

    return embed(ids, depth)


def make_sharded_deep_train_step(cfg: GQEConfig, optimizer, mesh: Mesh,
                                 st: ShardedNeighborTables,
                                 axis: str = "data"):
    """Sharded depth>0 training step (rows path): DP batch + row-sharded
    table + edge-partitioned adjacency, SAGE encoding via owner-compute
    gathers, margin loss, psum'd grads (inserted by GSPMD), optimizer update.
    Gradients flow through the all_to_all route back to the owning table
    shards (scatter-add — the reverse of the gather route).

    Returns step(params, opt_state, structure, anchors, rels, inter_modes,
    targets, negs, key) -> (params, opt_state, loss). anchors/rels/... are
    [B, ...] numpy/DeviceArrays; B divisible by the mesh size."""
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.parallel.mesh import batch_sharding

    import optax

    b1 = batch_sharding(mesh, 1)
    b2 = batch_sharding(mesh, 2)

    @functools.partial(jax.jit, static_argnames=("structure",),
                       donate_argnames=("params", "opt_state"))
    def step(params, opt_state, structure, anchors, rels, inter_modes,
             targets, negs, tables):
        anchors = jax.lax.with_sharding_constraint(anchors, b2)
        targets = jax.lax.with_sharding_constraint(targets, b1)

        def loss_fn(p):
            encode_fn = lambda ids: sage_encode_sharded(
                cfg, mesh, p["table"], p["encoder"], tables,
                ids.reshape(-1), depth=cfg.depth,
                aggregator=cfg.aggregator).reshape(
                    ids.shape + (p["table"].shape[1],))
            return gqe.margin_loss_rows(
                cfg, p, structure, anchors, rels, inter_modes, targets,
                negs, jnp.ones(anchors.shape[0], jnp.bool_),
                encode_fn=encode_fn)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def run(params, opt_state, structure, anchors, rels, inter_modes,
            targets, negs):
        return step(params, opt_state, structure, jnp.asarray(anchors),
                    jnp.asarray(rels), jnp.asarray(inter_modes),
                    jnp.asarray(targets), jnp.asarray(negs), st)

    return run
