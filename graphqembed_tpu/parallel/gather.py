"""Owner-compute sharded embedding gather (P4, SURVEY.md §3/§6).

The packed table is row-sharded over the mesh's 'data' axis (EP-analog:
nodes ≈ experts). A device needing arbitrary rows routes requests to the
owning shard and gets rows back — two `all_to_all`s under shard_map:

  1. bucket local ids by owner shard (sort + scatter into [D, C] with a
     static per-owner capacity C);
  2. all_to_all the id buckets (ids ride ICI once);
  3. every device gathers its owned rows for received requests;
  4. all_to_all the rows back; unsort into request order.

Capacity C is static (worst case: all B local ids owned by one shard →
C = B). The whole routine is differentiable: the backward pass is the
reverse route (rows' cotangents all_to_all back to owners, scatter-add into
the table shard) — derived automatically by JAX since every op here is
linear/gather.

This is the explicitly-scheduled alternative to letting GSPMD insert
collectives from NamedSharding (parallel/train_step.py); tests pin both to
the same results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _route_gather(table_shard: jnp.ndarray, ids: jnp.ndarray, axis: str,
                  n_shards: int, rows_per_shard: int) -> jnp.ndarray:
    """Per-device body under shard_map. table_shard [N/D, d]; ids [b] GLOBAL
    row ids (each device has its own b requests) -> [b, d]."""
    b = ids.shape[0]
    owner = ids // rows_per_shard                       # [b]
    local_row = ids % rows_per_shard

    # stable sort by owner; position within owner bucket
    order = jnp.argsort(owner)
    owner_s = owner[order]
    local_s = local_row[order]
    # rank within bucket = index - first index of that owner value
    idx = jnp.arange(b)
    first_of_owner = jnp.searchsorted(owner_s, owner_s, side="left")
    pos = idx - first_of_owner                          # [b] 0..count-1

    # request matrix [D, C]: C = b covers the worst case
    reqs = jnp.full((n_shards, b), -1, ids.dtype)
    reqs = reqs.at[owner_s, pos].set(local_s)

    # exchange requests: recv[p, :] = requests device p has for MY rows
    recv = jax.lax.all_to_all(reqs, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    recv = recv.reshape(n_shards, b)

    # serve: gather owned rows (masked; -1 → row 0, zeroed)
    valid = recv >= 0
    safe = jnp.where(valid, recv, 0)
    rows = table_shard[safe]                            # [D, C, d]
    rows = jnp.where(valid[..., None], rows,
                     jnp.zeros((), rows.dtype))  # keep dtype (int tables too)

    # send rows back: back[p] = rows served BY device p for MY requests
    back = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    back = back.reshape(n_shards, b, -1)

    # pick my requests back out in sorted order, then unsort
    got_sorted = back[owner_s, pos]                     # [b, d]
    out = jnp.zeros_like(got_sorted)
    out = out.at[order].set(got_sorted)
    return out


def sharded_gather(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                   axis: str = "data") -> jnp.ndarray:
    """Gather rows of a row-sharded table for batch-sharded global ids.

    table [N, d] sharded P(axis, None) (N divisible by mesh size);
    ids [B] sharded P(axis) (B divisible by mesh size) -> [B, d] sharded
    P(axis, None)."""
    n_shards = mesh.shape[axis]
    n = table.shape[0]
    assert n % n_shards == 0, (n, n_shards)
    body = functools.partial(_route_gather, axis=axis, n_shards=n_shards,
                             rows_per_shard=n // n_shards)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=P(axis, None),
    )(table, ids)
