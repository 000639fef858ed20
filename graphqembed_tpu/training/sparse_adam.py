"""Lazy sparse Adam for the embedding table (P3 single-chip performance).

Dense Adam over the whole [N, d] table costs O(N·d) HBM traffic per step —
the measured majority of step time at bench scale and unaffordable at
bio/production scale. Here the table update is O(touched rows):

- the loss is computed from GATHERED rows (grads never densify to [N, d]);
- per-step touched ids are sorted, duplicates segment-summed;
- per-row Adam moments decay lazily: a row untouched for Δ steps carries
  mu ← β1^Δ·mu, nu ← β2^Δ·nu at its next touch (identical to what dense Adam
  would have done to its moments with zero grads);
- bias correction uses the global step count.

Semantics match torch.optim.SparseAdam (the standard choice for embedding
tables), NOT dense Adam: dense Adam also applies a small momentum-tail update
to untouched rows each step. That tail decays geometrically (gone in ~30
steps at β1=0.9) and forgoing it is the standard embedding-training
trade-off; the dense path (make_scan_train_step's optax.adam over the whole
param tree) remains available for strict-parity runs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LazyAdamState(NamedTuple):
    mu: jnp.ndarray      # [N, d]
    nu: jnp.ndarray      # [N, d]
    stamp: jnp.ndarray   # int32 [N] step of last touch
    count: jnp.ndarray   # int32 [] global step


def init_lazy_adam(table: jnp.ndarray) -> LazyAdamState:
    return LazyAdamState(
        mu=jnp.zeros_like(table),
        nu=jnp.zeros_like(table),
        stamp=jnp.zeros(table.shape[0], jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def dedup_row_grads(ids: jnp.ndarray, grads: jnp.ndarray, n_rows: int
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ids [L] (with duplicates), grads [L, d] -> (uids [L], summed [L, d]):
    slot i holds (ids[i], Σ grads over all occurrences of ids[i]) if i is the
    FIRST occurrence, else (sentinel n_rows, don't-care) — scatters with
    mode='drop' ignore sentinels.

    TPU-shaped dedup: sorting inside a train step costs ~ms (bitonic passes),
    so duplicates are resolved with an [L, L] equality matrix instead —
    first-occurrence via argmax over the row, duplicate summation as one
    [L, L] @ [L, d] MXU matmul (L ≈ a few thousand → ~10 µs)."""
    l = ids.shape[0]
    eq = ids[:, None] == ids[None, :]               # [L, L]
    first_idx = jnp.argmax(eq, axis=1)              # first occurrence index
    is_first = first_idx == jnp.arange(l)
    summed = jnp.dot(eq.astype(grads.dtype), grads,
                     preferred_element_type=jnp.float32)
    uids = jnp.where(is_first, ids, n_rows).astype(ids.dtype)
    return uids, summed


def lazy_adam_update(table: jnp.ndarray, state: LazyAdamState,
                     ids: jnp.ndarray, row_grads: jnp.ndarray,
                     lr: float, b1: float = 0.9, b2: float = 0.999,
                     eps: float = 1e-8, key=None
                     ) -> tuple[jnp.ndarray, LazyAdamState]:
    """Apply one lazy-Adam step for the rows in `ids` (duplicates allowed).

    bfloat16 tables (cfg.storage_dtype="bfloat16"): math runs in f32 on the
    gathered rows and the writes are STOCHASTICALLY ROUNDED (requires `key`).
    Nearest rounding would stall the moments — (1−β2)·g² is >8 bits below nu
    — and bias the parameter writes (see ops/fused_adam.py). Only the
    touched [L, d] rows need random bits, so this stays O(touched rows)."""
    n = table.shape[0]
    f32 = jnp.float32
    uids, g = dedup_row_grads(ids, row_grads.astype(f32), n)
    valid = uids < n
    safe = jnp.where(valid, uids, 0)
    t = state.count + 1

    delta = t - 1 - state.stamp[safe]               # steps missed (>= 0)
    decay1 = jnp.power(f32(b1), delta.astype(f32))[:, None]
    decay2 = jnp.power(f32(b2), delta.astype(f32))[:, None]
    mu = state.mu[safe].astype(f32) * decay1 * b1 + (1.0 - b1) * g
    nu = state.nu[safe].astype(f32) * decay2 * b2 + (1.0 - b2) * (g * g)
    tf = t.astype(f32)
    mu_hat = mu / (1.0 - jnp.power(f32(b1), tf))
    nu_hat = nu / (1.0 - jnp.power(f32(b2), tf))
    step = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)

    # uids are unique by construction (duplicates → sentinel): telling XLA so
    # avoids the serialized/sorted scatter path on TPU
    drop = dict(mode="drop", unique_indices=True)
    if table.dtype == jnp.bfloat16:
        assert key is not None, "bf16 sparse Adam needs a PRNG key (SR writes)"
        from graphqembed_tpu.ops.fused_adam import sr_to_bf16_ref
        kp, km, kn = jax.random.split(key, 3)
        bits = lambda k: jax.random.bits(k, step.shape, jnp.uint32)
        new_rows = sr_to_bf16_ref(table[safe].astype(f32) + step, bits(kp))
        table = table.at[uids].set(
            jnp.where(valid[:, None], new_rows, 0).astype(table.dtype), **drop)
        mu_w = sr_to_bf16_ref(mu, bits(km))
        nu_w = sr_to_bf16_ref(nu, bits(kn))
    else:
        table = table.at[uids].add(
            jnp.where(valid[:, None], step, 0.0).astype(table.dtype), **drop)
        mu_w, nu_w = mu, nu
    new_state = LazyAdamState(
        mu=state.mu.at[uids].set(
            jnp.where(valid[:, None], mu_w, 0).astype(state.mu.dtype), **drop),
        nu=state.nu.at[uids].set(
            jnp.where(valid[:, None], nu_w, 0).astype(state.nu.dtype), **drop),
        stamp=state.stamp.at[uids].set(
            jnp.where(valid, t, 0).astype(jnp.int32), **drop),
        count=t,
    )
    return table, new_state


def dense_adam_reference(table, mu, nu, t, grads, lr, b1=0.9, b2=0.999,
                         eps=1e-8):
    """Pure dense Adam step (for tests): returns (table, mu, nu)."""
    mu = b1 * mu + (1 - b1) * grads
    nu = b2 * nu + (1 - b2) * grads * grads
    mu_hat = mu / (1 - b1 ** t)
    nu_hat = nu / (1 - b2 ** t)
    return table - lr * mu_hat / (jnp.sqrt(nu_hat) + eps), mu, nu
