"""Owner-compute sharded embedding gather (P4, SURVEY.md §3/§6).

The packed table is row-sharded over the mesh's 'data' axis (EP-analog:
nodes ≈ experts). A device needing arbitrary rows routes requests to the
owning shard and gets rows back — two `all_to_all`s under shard_map:

  1. bucket local ids by owner shard (sort + scatter into [D, C] with a
     static per-owner capacity C);
  2. all_to_all the id buckets (ids ride ICI once);
  3. every device gathers its owned rows for received requests;
  4. all_to_all the rows back; unsort into request order.

Capacity C (the all_to_all payload per peer) is static:
- worst case C = B (capacity_factor <= 0, the default): every request
  always served, even if one shard owns ALL of a device's ids;
- capacity-bounded C = ceil(B/D · capacity_factor) (SURVEY.md §6
  "ragged_all_to_all … or fixed-size padded all-to-all first"): payload
  shrinks D/factor-fold at near-uniform ownership — requests beyond a
  bucket's capacity are DROPPED (zero rows returned). Use
  sharded_gather_with_overflow to observe the (psum'd) drop count;
  GQEConfig.gather_capacity_factor feeds this through parallel/deep.py.

The whole routine is differentiable: the backward pass is the reverse route
(rows' cotangents all_to_all back to owners, scatter-add into the table
shard) — derived automatically by JAX since every op here is linear/gather.

This is the explicitly-scheduled alternative to letting GSPMD insert
collectives from NamedSharding (parallel/train_step.py); tests pin both to
the same results.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def gather_capacity(b: int, n_shards: int, capacity_factor: float) -> int:
    """Static per-owner request capacity C: worst case b when factor <= 0,
    else ceil(b / n_shards * factor) clamped to [1, b]."""
    if capacity_factor <= 0:
        return b
    return max(1, min(b, math.ceil(b / n_shards * capacity_factor)))


def _route_gather(table_shard: jnp.ndarray, ids: jnp.ndarray, axis: str,
                  n_shards: int, rows_per_shard: int,
                  capacity: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device body under shard_map. table_shard [N/D, d]; ids [b] GLOBAL
    row ids (each device has its own b requests) -> ([b, d], overflow count).
    Requests past an owner bucket's capacity are dropped (zero rows)."""
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
    fits = pos < capacity                               # dropped if beyond C
    n_over = jnp.sum(~fits)

    # request matrix [D, C]
    reqs = jnp.full((n_shards, capacity), -1, ids.dtype)
    reqs = reqs.at[owner_s, pos].set(jnp.where(fits, local_s, -1),
                                     mode="drop")

    # exchange requests: recv[p, :] = requests device p has for MY rows
    recv = jax.lax.all_to_all(reqs, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    recv = recv.reshape(n_shards, capacity)

    # serve: gather owned rows (masked; -1 → row 0, zeroed)
    valid = recv >= 0
    safe = jnp.where(valid, recv, 0)
    rows = table_shard[safe]                            # [D, C, d]
    rows = jnp.where(valid[..., None], rows,
                     jnp.zeros((), rows.dtype))  # keep dtype (int tables too)

    # send rows back: back[p] = rows served BY device p for MY requests
    back = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0,
                              tiled=False)
    back = back.reshape(n_shards, capacity, -1)

    # pick my requests back out in sorted order (clip the overflowed
    # positions, then zero them), then unsort
    got_sorted = back[owner_s, jnp.minimum(pos, capacity - 1)]   # [b, d]
    got_sorted = jnp.where(fits[:, None], got_sorted,
                           jnp.zeros((), got_sorted.dtype))
    out = jnp.zeros_like(got_sorted)
    out = out.at[order].set(got_sorted)
    return out, n_over


def _gather_impl(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                 axis: str, capacity_factor: float):
    n_shards = mesh.shape[axis]
    n = table.shape[0]
    assert n % n_shards == 0, (n, n_shards)
    cap = gather_capacity(ids.shape[0] // n_shards, n_shards, capacity_factor)
    body = functools.partial(_route_gather, axis=axis, n_shards=n_shards,
                             rows_per_shard=n // n_shards, capacity=cap)

    def wrapped(table_shard, ids_shard):
        out, n_over = body(table_shard, ids_shard)
        return out, jax.lax.psum(n_over, axis)

    return jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P()),
    )(table, ids)


def sharded_gather(mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
                   axis: str = "data",
                   capacity_factor: float = 0.0) -> jnp.ndarray:
    """Gather rows of a row-sharded table for batch-sharded global ids.

    table [N, d] sharded P(axis, None) (N divisible by mesh size);
    ids [B] sharded P(axis) (B divisible by mesh size) -> [B, d] sharded
    P(axis, None). capacity_factor <= 0 (default): exact worst-case capacity
    (no drops, any ownership skew); > 0: capacity-bounded all_to_all —
    payload ∝ capacity, hotspot overflow rows return zeros (use
    sharded_gather_with_overflow to observe the count)."""
    out, _ = _gather_impl(mesh, table, ids, axis, capacity_factor)
    return out


def sharded_gather_with_overflow(
        mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray,
        axis: str = "data", capacity_factor: float = 0.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sharded_gather + the global (psum'd) count of requests dropped by the
    capacity bound — 0 whenever capacity_factor <= 0 or ownership is within
    the bound. Monitor it when running capacity-bounded production gathers."""
    return _gather_impl(mesh, table, ids, axis, capacity_factor)
