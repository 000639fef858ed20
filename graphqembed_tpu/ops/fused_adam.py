"""Fused Adam as a Pallas kernel (P3 single-chip performance).

optax's adam chain (scale_by_adam → scale) lowers to several HBM passes over
the [N, d] moments/params; measured ~0.57 ms/step at N=35k against a ~0.16 ms
bandwidth bound. This kernel does the whole update in ONE pass per tile with
input/output aliasing (params/mu/nu updated in place):

  mu' = β1·mu + (1−β1)·g
  nu' = β2·nu + (1−β2)·g²
  p'  = p − lr·(mu'·c1) / (sqrt(nu'·c2) + ε)

with c1 = 1/(1−β1^t), c2 = 1/(1−β2^t) precomputed as scalars (t is the step
count, carried outside). Bit-equivalent to optax.adam with default
hyper-parameters (pinned by test vs optax over multiple steps).

Leaves of any rank are updated via a [M, d] view (M must be a multiple of 8;
all framework parameter leaves are).

bf16 STORAGE (cfg.storage_dtype="bfloat16"): when p/mu/nu arrive as bfloat16
the kernel upcasts to f32 in VMEM, computes the identical update, and writes
back with STOCHASTIC ROUNDING (pltpu.prng_random_bits + stochastic_round —
bits generated on-core, zero extra HBM traffic). SR is load-bearing, not a
nicety: round-to-nearest bf16 silently stalls Adam — (1−β2)·g² = 0.001·g² is
>8 bits below nu and would round away EVERY step, freezing the second moment
(and similarly mu for small grads). SR makes the write unbiased so the
moments integrate correctly in expectation. This halves the dominant HBM
term of the dense step (docs/DESIGN.md §10). A pure-jnp reference
(adam_step_sr_ref, bitcast add-low-bits-and-truncate) runs the same math on
CPU where the Pallas PRNG primitives have no interpret-mode lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512        # max rows per grid step (f32 leaves)
_TILE_BF16 = 2048  # bf16 leaves: half the bytes/row -> bigger tiles fit
                   # VMEM, and tile size is where the r03 "SR kernel 20%
                   # under its control" gap lived: 440-row tiles 598 GB/s,
                   # 880 -> 706, 1760 -> 736 GB/s (v5e, N=35200x128) — at
                   # parity with the XLA bf16 optax chain's 746


def _pick_tile(m: int, dtype=None, d: int = 128) -> int:
    """Largest multiple-of-8 divisor of m, capped by dtype (see _TILE*).
    Tile size is a first-order cost in BOTH directions: the naive ladder
    (512/256/64/8) dropped a 35200-row table to 64-row tiles — 550 grid
    steps whose per-step overhead tripled kernel time — and capping bf16
    tiles at 512 left ~20% of HBM bandwidth on the table (numbers above).

    The row caps were measured at d=128; the VMEM constraint is BYTES
    (7 aliased buffers × tile·d·itemsize, double-buffered), so the cap
    scales as 128/d — a d=512 leaf gets a 4× smaller row cap instead of
    blowing VMEM at compile time (ADVICE r04)."""
    cap = _TILE_BF16 if dtype == jnp.bfloat16 else _TILE
    cap = max(8, cap * 128 // max(d, 1))
    for t in range(min(cap, m), 7, -1):
        if t % 8 == 0 and m % t == 0:
            return t
    return 8 if m % 8 == 0 else 1


def _adam_kernel(scalars_ref, p_ref, g_ref, mu_ref, nu_ref,
                 p_out, mu_out, nu_out):
    lr = scalars_ref[0]
    b1 = scalars_ref[1]
    b2 = scalars_ref[2]
    eps = scalars_ref[3]
    c1 = scalars_ref[4]
    c2 = scalars_ref[5]
    g = g_ref[:]
    mu = b1 * mu_ref[:] + (1.0 - b1) * g
    nu = b2 * nu_ref[:] + (1.0 - b2) * (g * g)
    mu_out[:] = mu
    nu_out[:] = nu
    p_out[:] = p_ref[:] - lr * (mu * c1) / (jnp.sqrt(nu * c2) + eps)


def _adam_kernel_sr(scalars_ref, seed_ref, p_ref, g_ref, mu_ref, nu_ref,
                    p_out, mu_out, nu_out):
    """bf16-storage variant: f32 math in VMEM, stochastic-rounded bf16
    writes. Seed folds in the grid position so tiles draw distinct bits."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    lr = scalars_ref[0]
    b1 = scalars_ref[1]
    b2 = scalars_ref[2]
    eps = scalars_ref[3]
    c1 = scalars_ref[4]
    c2 = scalars_ref[5]
    g = g_ref[:].astype(jnp.float32)
    mu = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[:].astype(jnp.float32) + (1.0 - b2) * (g * g)
    p = p_ref[:].astype(jnp.float32) - lr * (mu * c1) / (jnp.sqrt(nu * c2) + eps)

    def sr(x):
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
        return pltpu.stochastic_round(x, bits, target_dtype=jnp.bfloat16)

    mu_out[:] = sr(mu)
    nu_out[:] = sr(nu)
    p_out[:] = sr(p)


def sr_to_bf16_ref(x: jnp.ndarray, bits: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp stochastic rounding f32→bf16: add 16 random bits below the
    bf16 mantissa boundary, truncate. Unbiased (E[sr(x)] = x); carry out of
    the mantissa correctly rounds to the next representable bf16."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    u = (u + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32).astype(jnp.bfloat16)


def adam_step_sr_ref(p, g, mu, nu, count, lr, key,
                     b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Reference bf16-storage Adam step (same math as _adam_kernel_sr, jnp
    PRNG instead of the on-core generator — CPU tests and non-TPU backends).
    p/mu/nu bfloat16; g any float dtype. Returns (p', mu', nu') bf16."""
    tf = count.astype(jnp.float32)
    c1 = 1.0 / (1.0 - jnp.float32(b1) ** tf)
    c2 = 1.0 / (1.0 - jnp.float32(b2) ** tf)
    gf = g.astype(jnp.float32)
    mu_f = b1 * mu.astype(jnp.float32) + (1.0 - b1) * gf
    nu_f = b2 * nu.astype(jnp.float32) + (1.0 - b2) * (gf * gf)
    p_f = p.astype(jnp.float32) - lr * (mu_f * c1) / (jnp.sqrt(nu_f * c2) + eps)
    k1, k2, k3 = jax.random.split(key, 3)
    bits = lambda k: jax.random.bits(k, p.shape, jnp.uint32)
    return (sr_to_bf16_ref(p_f, bits(k1)), sr_to_bf16_ref(mu_f, bits(k2)),
            sr_to_bf16_ref(nu_f, bits(k3)))


@functools.partial(jax.jit,
                   static_argnames=("b1", "b2", "eps", "interpret"))
def fused_adam_leaf_sr(p: jnp.ndarray, g: jnp.ndarray, mu: jnp.ndarray,
                       nu: jnp.ndarray, count: jnp.ndarray, seed: jnp.ndarray,
                       lr: float, b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8, interpret: bool = False):
    """One bf16-storage Adam step for one leaf: p/mu/nu bfloat16, updates
    stochastically rounded on-core. seed: int32 scalar, MUST differ per step
    (and per leaf) — fold the step count in. TPU only (the PRNG primitives
    have no interpret-mode lowering); use adam_step_sr_ref elsewhere."""
    assert p.dtype == jnp.bfloat16, p.dtype
    shape = p.shape
    d = shape[-1] if p.ndim > 1 else shape[0]
    m = p.size // d
    view = (m, d)
    tile = _pick_tile(m, jnp.bfloat16, d)
    tf = count.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.float32(lr), jnp.float32(b1), jnp.float32(b2), jnp.float32(eps),
        1.0 / (1.0 - jnp.float32(b1) ** tf),
        1.0 / (1.0 - jnp.float32(b2) ** tf),
    ])
    seed_arr = jnp.reshape(seed.astype(jnp.int32), (1,))
    spec = pl.BlockSpec((tile, d), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    p2, mu2, nu2 = pl.pallas_call(
        _adam_kernel_sr,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(m // tile,),
            in_specs=[spec, spec, spec, spec],
            out_specs=(spec, spec, spec),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(view, jnp.bfloat16),
            jax.ShapeDtypeStruct(view, jnp.bfloat16),
            jax.ShapeDtypeStruct(view, jnp.bfloat16),
        ),
        # p, mu, nu update in place (input indices count scalar prefetch)
        input_output_aliases={2: 0, 4: 1, 5: 2},
        interpret=interpret,
    )(scalars, seed_arr, p.reshape(view), g.reshape(view), mu.reshape(view),
      nu.reshape(view))
    return p2.reshape(shape), mu2.reshape(shape), nu2.reshape(shape)


_ROWS_WINDOW = 256  # sorted-row window width per grad-build matmul
                    # (measured best of 128/256/512/full on v5e at L=2560)


def _adam_kernel_rows_sr(scalars_ref, seed_ref, starts_ref, p_ref, ids_hbm,
                         rows_hbm, mu_ref, nu_ref, p_out, mu_out, nu_out,
                         acc_ref, ids_ref, rows_ref, copy_sems):
    """Sparse-grad dense-Adam with SR writes: the [N, d] gradient is never
    materialized in HBM. Per tile, the grad block is built IN VMEM from the
    batch's row-gradients (pre-sorted by row id outside the kernel):
    windows of W sorted rows are turned into a [W, T] onehot (id == tile row)
    and accumulated with one MXU matmul onehotᵀ @ rows per window. Untouched
    rows get g = 0, so the update keeps exact dense-Adam semantics (moments
    decay everywhere). starts_ref[i] = first sorted row belonging to tile i
    (searchsorted outside); the window loop handles arbitrary skew (a tile
    holding the whole batch just runs more windows)."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0], i)

    # The sorted ids/rows arrive in HBM and are DMA'd ONCE into VMEM
    # scratch that persists across grid steps — a full-array VMEM operand
    # with a constant index map is re-copied EVERY grid step (measured:
    # ~48 us/step of redundant traffic at L=2560 x 80 tiles).
    @pl.when(i == 0)
    def _():
        c1 = pltpu.make_async_copy(ids_hbm, ids_ref, copy_sems.at[0])
        c2 = pltpu.make_async_copy(rows_hbm, rows_ref, copy_sems.at[1])
        c1.start()
        c2.start()
        c1.wait()
        c2.wait()

    lr = scalars_ref[0]
    b1 = scalars_ref[1]
    b2 = scalars_ref[2]
    eps = scalars_ref[3]
    c1 = scalars_ref[4]
    c2 = scalars_ref[5]
    t_rows = p_ref.shape[0]
    w = _ROWS_WINDOW
    start = starts_ref[i]
    end = starts_ref[i + 1]
    tile_lo = i * t_rows

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # w-ALIGNED windows covering [start, end): Mosaic requires vector loads
    # at sublane-aligned offsets, and rows spilling in from neighboring
    # tiles are harmless — their ids fall outside [tile_lo, tile_lo+T) so
    # the onehot match rejects them (as it does the sentinel id n in the
    # padding). STATIC unroll with predicated windows instead of a dynamic
    # fori_loop — a data-dependent trip count blocks Mosaic's cross-grid-
    # step software pipelining; @pl.when windows that don't apply cost a
    # branch, nothing more. Worst-case skew (the whole batch in one tile)
    # is exactly the last unrolled window.
    w0 = start // w
    w1 = pl.cdiv(end, w)
    max_win = pl.cdiv(rows_ref.shape[0], w)

    for k in range(max_win):
        @pl.when(jnp.logical_and(w0 + k < w1, True))
        def _():
            ws = pl.multiple_of((w0 + k) * w, w)
            ids_win = ids_ref[pl.ds(ws, w), :]                # [W, 1] int32
            local = ids_win - tile_lo
            tt = jax.lax.broadcasted_iota(jnp.int32, (w, t_rows), 1)
            oh = (local == tt).astype(jnp.bfloat16)           # [W, T]
            rows_win = rows_ref[pl.ds(ws, w), :]              # [W, d] bf16
            acc_ref[:] += jax.lax.dot_general(
                oh, rows_win, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [T, d]

    g = acc_ref[:]
    mu = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * g
    nu = b2 * nu_ref[:].astype(jnp.float32) + (1.0 - b2) * (g * g)
    p = p_ref[:].astype(jnp.float32) - lr * (mu * c1) / (jnp.sqrt(nu * c2) + eps)

    def sr(x):
        bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
        return pltpu.stochastic_round(x, bits, target_dtype=jnp.bfloat16)

    mu_out[:] = sr(mu)
    nu_out[:] = sr(nu)
    p_out[:] = sr(p)


def rows_pad(length: int) -> int:
    """Padded sorted-row count for fused_adam_table_sorted_rows_sr: any
    w-aligned window read [ws, ws+W) must stay in bounds."""
    w = _ROWS_WINDOW
    return length + w + (-length) % w


def presort_row_ids(ids: jnp.ndarray, n: int, d: int = 128) -> tuple:
    """Sort + pad row ids for the sorted-rows Adam kernel; batchable (the
    hoisted selection sorts ALL T steps' ids in one call — an in-scan sort
    costs ~40 µs/step on v5e, amortized it is ~1 µs).

    ids [..., L] int32 -> (sorted_ids [..., Lpad], order [..., Lpad],
    tile_starts [..., n_tiles+1]). Padding entries have sentinel id n (never
    matches a tile row) and order L (pointing at the caller's appended zero
    grad row). `d` must match the table's trailing dim — the tile grid here
    must agree with fused_adam_table_sorted_rows_sr's (asserted there via
    tile_starts length)."""
    l = ids.shape[-1]
    tile = _pick_tile(n, jnp.bfloat16, d)
    order = jnp.argsort(ids, axis=-1)
    sids = jnp.take_along_axis(ids, order, axis=-1)
    pad = rows_pad(l) - l
    lead = ids.shape[:-1]
    sids = jnp.concatenate(
        [sids, jnp.full(lead + (pad,), n, jnp.int32)], axis=-1)
    order = jnp.concatenate(
        [order, jnp.full(lead + (pad,), l, jnp.int32)], axis=-1)
    bounds = jnp.arange(n // tile + 1, dtype=jnp.int32) * tile
    flat = sids.reshape((-1, sids.shape[-1]))
    starts = jax.vmap(lambda s: jnp.searchsorted(s, bounds))(flat)
    starts = starts.reshape(lead + (bounds.shape[0],)).astype(jnp.int32)
    return sids, order, starts


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps"))
def fused_adam_table_rows_sr(p: jnp.ndarray, mu: jnp.ndarray, nu: jnp.ndarray,
                             ids: jnp.ndarray, row_grads: jnp.ndarray,
                             count: jnp.ndarray, seed: jnp.ndarray, lr,
                             b1: float = 0.9, b2: float = 0.999,
                             eps: float = 1e-8):
    """Dense-semantics bf16 SR Adam for the [N, d] table from SPARSE row
    gradients — the round-4 hot-path optimizer (docs/DESIGN.md §12): the
    dense cotangent (zeros + scatter-add, ~40 µs) and its HBM read inside
    the Adam pass both disappear. ids [L] int32 (duplicates fine), row_grads
    [L, d]. Sorts in-line — prefer presort_row_ids + the _sorted_ variant
    in scan bodies. TPU only (on-core PRNG); adam_step_rows_sr_ref
    elsewhere."""
    n, d = p.shape
    ids = ids.reshape(-1).astype(jnp.int32)
    row_grads = row_grads.reshape(ids.shape[0], d)
    sids, order, starts = presort_row_ids(ids, n, d)
    aug = jnp.concatenate(
        [row_grads.astype(jnp.bfloat16), jnp.zeros((1, d), jnp.bfloat16)])
    srows = aug[order]
    return fused_adam_table_sorted_rows_sr(p, mu, nu, sids, srows, starts,
                                           count, seed, lr, b1, b2, eps)


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps"))
def fused_adam_table_sorted_rows_sr(p, mu, nu, sorted_ids, sorted_rows,
                                    tile_starts, count, seed, lr,
                                    b1: float = 0.9, b2: float = 0.999,
                                    eps: float = 1e-8):
    """Core sorted-rows kernel call: sorted_ids [Lpad] (presort_row_ids),
    sorted_rows [Lpad, d] bf16 (grad rows permuted by `order`, zero row at
    padding), tile_starts [n_tiles+1]."""
    assert p.dtype == jnp.bfloat16, p.dtype
    n, d = p.shape
    tile = _pick_tile(n, jnp.bfloat16, d)
    n_tiles = n // tile
    assert tile_starts.shape[-1] == n_tiles + 1
    sids = sorted_ids
    srows = sorted_rows
    starts = tile_starts
    tf = count.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.float32(lr), jnp.float32(b1), jnp.float32(b2), jnp.float32(eps),
        1.0 / (1.0 - jnp.float32(b1) ** tf),
        1.0 / (1.0 - jnp.float32(b2) ** tf),
    ])
    seed_arr = jnp.reshape(seed.astype(jnp.int32), (1,))
    spec = pl.BlockSpec((tile, d), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.ANY)
    p2, mu2, nu2 = pl.pallas_call(
        _adam_kernel_rows_sr,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,   # scalars, seed, starts
            grid=(n_tiles,),
            in_specs=[spec, hbm, hbm, spec, spec],
            out_specs=(spec, spec, spec),
            scratch_shapes=[
                pltpu.VMEM((tile, d), jnp.float32),
                pltpu.VMEM((sids.shape[0], 1), jnp.int32),
                pltpu.VMEM(srows.shape, jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
        ),
        # p, mu, nu in place (indices count the 3 scalar-prefetch args)
        input_output_aliases={3: 0, 6: 1, 7: 2},
    )(scalars, seed_arr, starts, p, sids[:, None], srows, mu, nu)
    return p2, mu2, nu2


def adam_step_rows_sr_ref(p, mu, nu, ids, row_grads, count, lr, key,
                          b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8):
    """Reference for fused_adam_table_rows_sr (CPU/non-TPU backends): dense
    grad via sorted scatter-add, then the SR Adam reference step."""
    n, d = p.shape
    flat_ids = ids.reshape(-1)
    flat_rows = row_grads.reshape(flat_ids.shape[0], d).astype(jnp.float32)
    order = jnp.argsort(flat_ids)
    g = jnp.zeros((n, d), jnp.float32).at[flat_ids[order]].add(
        flat_rows[order].astype(jnp.bfloat16).astype(jnp.float32),
        indices_are_sorted=True)
    return adam_step_sr_ref(p, g, mu, nu, count, lr, key, b1, b2, eps)


@functools.partial(jax.jit,
                   static_argnames=("b1", "b2", "eps", "interpret"))
def fused_adam_leaf(p: jnp.ndarray, g: jnp.ndarray, mu: jnp.ndarray,
                    nu: jnp.ndarray, count: jnp.ndarray, lr: float,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    interpret: bool = False):
    """One Adam step for one leaf (any shape; leading dims flattened).
    count is the NEW step number (t >= 1). lr may be a traced scalar
    (schedules). Returns (p', mu', nu')."""
    shape = p.shape
    d = shape[-1] if p.ndim > 1 else shape[0]
    m = p.size // d
    view = (m, d)
    tile = _pick_tile(m, p.dtype, d)
    tf = count.astype(jnp.float32)
    scalars = jnp.stack([
        jnp.float32(lr), jnp.float32(b1), jnp.float32(b2), jnp.float32(eps),
        1.0 / (1.0 - jnp.float32(b1) ** tf),
        1.0 / (1.0 - jnp.float32(b2) ** tf),
    ])
    spec = pl.BlockSpec((tile, d), lambda i, s: (i, 0),
                        memory_space=pltpu.VMEM)
    p2, mu2, nu2 = pl.pallas_call(
        _adam_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m // tile,),
            in_specs=[spec, spec, spec, spec],
            out_specs=(spec, spec, spec),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(view, p.dtype),
            jax.ShapeDtypeStruct(view, mu.dtype),
            jax.ShapeDtypeStruct(view, nu.dtype),
        ),
        # p, mu, nu update in place (input indices count scalar prefetch)
        input_output_aliases={1: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, p.reshape(view), g.reshape(view), mu.reshape(view),
      nu.reshape(view))
    return p2.reshape(shape), mu2.reshape(shape), nu2.reshape(shape)


def fused_adam_tree(params, grads, mu, nu, count, lr: float,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    interpret: bool = False, sr_ref: bool | None = None):
    """Apply the fused kernel leaf-wise over a pytree. count is the NEW step
    number. Returns (params', mu', nu').

    bfloat16 leaves (storage_dtype="bfloat16") take the stochastic-rounding
    path: the on-core Pallas kernel on TPU, the jnp reference elsewhere
    (sr_ref overrides the backend auto-detection; both are deterministic
    given `count`, with different — equally valid — bit streams)."""
    on_tpu = jax.default_backend() == "tpu"
    if sr_ref is None:
        sr_ref = not on_tpu
    interpret = interpret or not on_tpu  # Pallas needs interpret off-TPU
    leaves_p, treedef = jax.tree.flatten(params)
    leaves_g = treedef.flatten_up_to(grads)
    leaves_m = treedef.flatten_up_to(mu)
    leaves_v = treedef.flatten_up_to(nu)
    out_p, out_m, out_v = [], [], []
    for li, (p, g, m_, v_) in enumerate(zip(leaves_p, leaves_g, leaves_m,
                                            leaves_v)):
        if p.dtype == jnp.bfloat16:
            # unique stream per (step, leaf)
            seed = count.astype(jnp.int32) * len(leaves_p) + li
            if sr_ref:
                key = jax.random.fold_in(jax.random.key(0), seed)
                p2, m2, v2 = adam_step_sr_ref(p, g, m_, v_, count, lr, key,
                                              b1, b2, eps)
            else:
                p2, m2, v2 = fused_adam_leaf_sr(p, g, m_, v_, count, seed,
                                                lr, b1, b2, eps,
                                                interpret=interpret)
        else:
            p2, m2, v2 = fused_adam_leaf(p, g, m_, v_, count, lr, b1, b2,
                                         eps, interpret=interpret)
        out_p.append(p2)
        out_m.append(m2)
        out_v.append(v2)
    return (jax.tree.unflatten(treedef, out_p),
            jax.tree.unflatten(treedef, out_m),
            jax.tree.unflatten(treedef, out_v))
