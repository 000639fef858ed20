"""Owner-compute all-to-all gather tests on the 8-device CPU mesh: forward
matches a plain take; backward (scatter-add to owner shards) matches the
dense gather's gradient; works when all requests hit one owner (capacity
worst case)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from graphqembed_tpu.parallel import make_mesh
from graphqembed_tpu.parallel.gather import sharded_gather


def _setup(n=64, d=16, b=32, seed=0):
    mesh = make_mesh(8)
    key = jax.random.key(seed)
    table = jax.device_put(jax.random.normal(key, (n, d)),
                           NamedSharding(mesh, P("data", None)))
    ids = jax.device_put(
        jax.random.randint(jax.random.key(seed + 1), (b,), 0, n),
        NamedSharding(mesh, P("data")))
    return mesh, table, ids


def test_forward_matches_take():
    mesh, table, ids = _setup()
    got = sharded_gather(mesh, table, ids)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=0)


def test_forward_single_owner_hotspot():
    """All ids on one shard — exercises the worst-case capacity path."""
    mesh = make_mesh(8)
    table = jax.device_put(jax.random.normal(jax.random.key(0), (64, 8)),
                           NamedSharding(mesh, P("data", None)))
    ids = jax.device_put(jnp.full((32,), 3, jnp.int32),
                         NamedSharding(mesh, P("data")))
    got = sharded_gather(mesh, table, ids)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.take(table, ids, axis=0)))


def test_gradient_matches_dense():
    mesh, table, ids = _setup(seed=3)
    w = jax.random.normal(jax.random.key(9), (32, 16))

    def loss_sharded(t):
        return jnp.sum(sharded_gather(mesh, t, ids) * w)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * w)

    g1 = jax.grad(loss_sharded)(table)
    g2 = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6,
                               atol=1e-6)


def test_jit_compiles():
    mesh, table, ids = _setup(seed=5)
    f = jax.jit(lambda t, i: sharded_gather(mesh, t, i))
    got = f(table, ids)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.take(table, ids, axis=0)))
