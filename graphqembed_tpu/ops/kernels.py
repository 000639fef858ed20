"""Pallas TPU kernels for the GQE hot loop (BASELINE.json north_star: fused
gather+project/intersection kernels, SDDMM-style negative scoring, gathers at
speed-of-light).

Every kernel has a pure-jnp reference (`*_ref`) used for parity tests
(interpret mode on CPU, SURVEY.md §5.4) and as the non-Pallas path behind
GQEConfig.use_pallas. The ops here are HBM-bandwidth-bound (d=128 rows are
512 B); the kernels' job is to fuse the gather with the normalize / dot so
rows cross HBM once, with the weight matrices held VMEM-resident.

Kernel inventory:
  gather_normalize(table, ids)        — fused embedding gather + L2 norm
  sddmm_scores(q, table, cands)       — fused gather + cosine scoring of
                                        [B, K] candidates (the SDDMM analog:
                                        sampled dense-dense products)
  fused_intersection(zs, pre, post)   — relu(z@pre) → min/mean → @post in one
                                        VMEM-resident call (batch-constant
                                        intersection mode)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_PER_STEP = 256  # batch rows handled per grid step (table rows DMA'd)


# ---------------- gather + normalize ----------------

def gather_normalize_ref(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    x = jnp.take(table, ids, axis=0)
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, 1e-24))


def _gather_norm_kernel(ids_ref, table_ref, out_ref, scratch, sems):
    i = pl.program_id(0)
    tb = scratch.shape[0]
    dmas = []
    for r in range(tb):
        idx = ids_ref[i * tb + r]
        dma = pltpu.make_async_copy(table_ref.at[idx], scratch.at[r],
                                    sems.at[r])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()
    x = scratch[:]
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    out_ref[:] = x / jnp.sqrt(jnp.maximum(sq, 1e-24))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_normalize(table: jnp.ndarray, ids: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused embedding gather + L2 normalize. table [N, d] f32 (HBM resident);
    ids int32 [B] -> [B, d] unit rows."""
    b = ids.shape[0]
    d = table.shape[1]
    tb = min(_ROWS_PER_STEP, b)
    pad = (-b) % tb
    ids_p = jnp.concatenate([ids, jnp.zeros(pad, ids.dtype)]) if pad else ids
    n_steps = (b + pad) // tb
    out = pl.pallas_call(
        _gather_norm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((tb, d), lambda i, ids_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((tb, d), table.dtype),
                pltpu.SemaphoreType.DMA((tb,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b + pad, d), table.dtype),
        interpret=interpret,
    )(ids_p, table)
    return out[:b]


# ---------------- SDDMM-style candidate scoring ----------------

def sddmm_scores_ref(q: jnp.ndarray, table: jnp.ndarray,
                     cands: jnp.ndarray) -> jnp.ndarray:
    """Cosine scores of candidates: q [B, d] (normalized by caller policy),
    cands int32 [B, K] -> [B, K]."""
    c = gather_normalize_ref(table, cands.reshape(-1)).reshape(
        cands.shape + (table.shape[1],))
    return jnp.einsum("bd,bkd->bk", q, c)


def _sddmm_kernel(cands_ref, q_ref, table_ref, out_ref, scratch, sems):
    # Double-buffered row pipeline: while row r's K candidate rows stream in,
    # row r-1 is normalized and scored. Semaphore memory is tiny (a few
    # hundred flags per core), so only 2*K DMA semaphores are live.
    i = pl.program_id(0)
    n_slots, k, d = scratch.shape  # [2, K, d]
    tb = out_ref.shape[0]

    def row_dmas(r):
        # descriptors are reconstructed for start and wait (the standard
        # Pallas double-buffer idiom — they can't be carried through fori)
        slot = r % 2
        return [
            pltpu.make_async_copy(
                table_ref.at[cands_ref[i * tb + r, j]],
                scratch.at[slot, j], sems.at[slot, j])
            for j in range(k)
        ]

    def start_row(r):
        for dma in row_dmas(r):
            dma.start()

    def body(r, _):
        @pl.when(r + 1 < tb)
        def _():
            start_row(r + 1)
        for dma in row_dmas(r):
            dma.wait()
        c = scratch[r % 2]
        sq = jnp.sum(c * c, axis=-1, keepdims=True)
        c = c / jnp.sqrt(jnp.maximum(sq, 1e-24))
        # batch-dim dot_general doesn't lower in Mosaic; multiply+reduce on
        # the VPU is the right shape anyway (K small, d=128 lanes)
        out_ref[r, :] = jnp.sum(q_ref[r][None, :] * c, axis=-1)
        return 0

    start_row(0)
    jax.lax.fori_loop(0, tb, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sddmm_scores(q: jnp.ndarray, table: jnp.ndarray, cands: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused candidate-row gather + normalize + batched dot: the negative-
    sampling scoring kernel (each (i, k) pair is one sampled dense-dense dot —
    an SDDMM with an implicit sampling pattern)."""
    b, k = cands.shape
    # scalar-prefetch (cands) lives in SMEM (~1 MB/core): chunk large batches
    if b > 1024:
        parts = [
            sddmm_scores(q[i:i + 1024], table, cands[i:i + 1024],
                         interpret=interpret)
            for i in range(0, b, 1024)
        ]
        return jnp.concatenate(parts, axis=0)
    d = table.shape[1]
    tb = max(1, min(64, b))
    pad = (-b) % tb
    if pad:
        cands = jnp.concatenate(
            [cands, jnp.zeros((pad, k), cands.dtype)], axis=0)
        q = jnp.concatenate([q, jnp.zeros((pad, d), q.dtype)], axis=0)
    n_steps = (b + pad) // tb
    out = pl.pallas_call(
        _sddmm_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((tb, d), lambda i, c_ref: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((tb, k), lambda i, c_ref: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, k, d), table.dtype),
                pltpu.SemaphoreType.DMA((2, k)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b + pad, k), jnp.float32),
        interpret=interpret,
    )(cands, q, table)
    return out[:b]


# ---------------- fused deep-set intersection ----------------

def fused_intersection_ref(zs: jnp.ndarray, pre: jnp.ndarray,
                           post: jnp.ndarray, kind: str = "min") -> jnp.ndarray:
    """zs [k, B, d]; pre/post [d, d] (batch-constant mode) -> [B, d]."""
    h = jax.nn.relu(jnp.einsum("kbd,de->kbe", zs, pre))
    agg = jnp.min(h, axis=0) if kind == "min" else jnp.mean(h, axis=0)
    return agg @ post


def _intersection_kernel(kind, zs_ref, pre_ref, post_ref, out_ref):
    zs = zs_ref[:]
    k = zs.shape[0]
    hs = [
        jax.nn.relu(jnp.dot(zs[i], pre_ref[:],
                            preferred_element_type=jnp.float32))
        for i in range(k)
    ]
    agg = hs[0]
    for h in hs[1:]:
        agg = jnp.minimum(agg, h) if kind == "min" else agg + h
    if kind == "mean":
        agg = agg / float(k)
    out_ref[:] = jnp.dot(agg, post_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("kind", "interpret"))
def fused_intersection(zs: jnp.ndarray, pre: jnp.ndarray, post: jnp.ndarray,
                       kind: str = "min", interpret: bool = False) -> jnp.ndarray:
    """One VMEM-resident call for relu(z@pre) → Φ → @post. zs [k, B, d]."""
    k, b, d = zs.shape
    return pl.pallas_call(
        functools.partial(_intersection_kernel, kind),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(zs, pre, post)
