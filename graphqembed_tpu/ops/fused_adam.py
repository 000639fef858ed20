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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 512  # rows per grid step (tail handled by shrinking to gcd tile)


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


@functools.partial(jax.jit,
                   static_argnames=("lr", "b1", "b2", "eps", "interpret"))
def fused_adam_leaf(p: jnp.ndarray, g: jnp.ndarray, mu: jnp.ndarray,
                    nu: jnp.ndarray, count: jnp.ndarray, lr: float,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                    interpret: bool = False):
    """One Adam step for one leaf (any shape; leading dims flattened).
    count is the NEW step number (t >= 1). Returns (p', mu', nu')."""
    shape = p.shape
    d = shape[-1] if p.ndim > 1 else shape[0]
    m = p.size // d
    view = (m, d)
    tile = m
    for t in (_TILE, 256, 64, 8, 1):
        if m % t == 0:
            tile = t
            break
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
                    interpret: bool = False):
    """Apply the fused kernel leaf-wise over a pytree. count is the NEW step
    number. Returns (params', mu', nu')."""
    leaves_p, treedef = jax.tree.flatten(params)
    leaves_g = treedef.flatten_up_to(grads)
    leaves_m = treedef.flatten_up_to(mu)
    leaves_v = treedef.flatten_up_to(nu)
    out_p, out_m, out_v = [], [], []
    for p, g, m_, v_ in zip(leaves_p, leaves_g, leaves_m, leaves_v):
        p2, m2, v2 = fused_adam_leaf(p, g, m_, v_, count, lr, b1, b2, eps,
                                     interpret=interpret)
        out_p.append(p2)
        out_m.append(m2)
        out_v.append(v2)
    return (jax.tree.unflatten(treedef, out_p),
            jax.tree.unflatten(treedef, out_m),
            jax.tree.unflatten(treedef, out_v))
