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

_TILE = 512  # max rows per grid step


def _pick_tile(m: int) -> int:
    """Largest multiple-of-8 divisor of m, capped at _TILE. Tile size is a
    first-order cost: the naive ladder (512/256/64/8) dropped a 35200-row
    table to 64-row tiles — 550 grid steps whose per-step overhead tripled
    kernel time (measured 252 µs → 105 µs at tile 440 on v5e)."""
    for t in range(min(_TILE, m), 7, -1):
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
    tile = _pick_tile(m)
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
    tile = _pick_tile(m)
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
