"""Fused Pallas Adam vs optax.adam: multi-step equivalence on pytrees
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graphqembed_tpu.ops.fused_adam import fused_adam_leaf, fused_adam_tree


def test_leaf_matches_optax():
    key = jax.random.key(0)
    p = jax.random.normal(key, (64, 16))
    opt = optax.adam(0.01)
    state = opt.init(p)
    mu = jnp.zeros_like(p)
    nu = jnp.zeros_like(p)
    p_ref = p
    p_ker = p
    for t in range(1, 6):
        g = jax.random.normal(jax.random.fold_in(key, t), (64, 16))
        updates, state = opt.update(g, state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_ker, mu, nu = fused_adam_leaf(p_ker, g, mu, nu, jnp.int32(t), 0.01,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(p_ker), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6)


def test_tree_matches_optax():
    key = jax.random.key(1)
    params = {
        "table": jax.random.normal(key, (40, 8)),
        "proj": {"W": jax.random.normal(jax.random.fold_in(key, 1), (3, 8, 8))},
    }
    opt = optax.adam(0.05)
    state = opt.init(params)
    mu = jax.tree.map(jnp.zeros_like, params)
    nu = jax.tree.map(jnp.zeros_like, params)
    p_ref = params
    p_ker = params
    for t in range(1, 4):
        g = jax.tree.map(
            lambda x: jax.random.normal(jax.random.fold_in(key, 100 + t),
                                        x.shape), params)
        updates, state = opt.update(g, state, p_ref)
        p_ref = optax.apply_updates(p_ref, updates)
        p_ker, mu, nu = fused_adam_tree(p_ker, g, mu, nu, jnp.int32(t), 0.05,
                                        interpret=True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        p_ker, p_ref)
