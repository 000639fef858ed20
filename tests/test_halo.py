"""Edge-partitioned halo expansion tests on the 8-device CPU mesh: sharded
hop equals the single-device reference bit-for-bit; two hops compose."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from graphqembed_tpu.parallel import make_mesh
from graphqembed_tpu.parallel.halo import (
    build_union_neighbor_table,
    expand_hop,
    expand_hop_reference,
)


def _setup(graph):
    mesh = make_mesh(8)
    schema = graph.schema
    n = schema.n_nodes
    pad = (-n) % 8
    key = jax.random.key(0)
    table_h = jax.random.normal(key, (n + pad, 16))
    nbrs_h = build_union_neighbor_table(graph, sample_size=4, seed=1)
    nbrs_h = np.concatenate(
        [nbrs_h, np.full((pad, nbrs_h.shape[1]), -1, np.int32)])
    w_self = jax.random.normal(jax.random.key(1), (16, 16)) / 4
    w_nb = jax.random.normal(jax.random.key(2), (16, 16)) / 4
    table = jax.device_put(table_h, NamedSharding(mesh, P("data", None)))
    nbrs = jax.device_put(jnp.asarray(nbrs_h),
                          NamedSharding(mesh, P("data", None)))
    ids = jax.device_put(
        jax.random.randint(jax.random.key(3), (64,), 0, n),
        NamedSharding(mesh, P("data")))
    return mesh, table_h, nbrs_h, table, nbrs, ids, w_self, w_nb


def test_hop_matches_reference(graph):
    mesh, table_h, nbrs_h, table, nbrs, ids, w_self, w_nb = _setup(graph)
    got = expand_hop(mesh, table, nbrs, ids, w_self, w_nb)
    want = expand_hop_reference(jnp.asarray(table_h), jnp.asarray(nbrs_h),
                               jnp.asarray(np.asarray(ids)), w_self, w_nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)


def test_two_hops_compose(graph):
    """Multi-hop: expand the frontier's neighbors again (ids of hop-2 are the
    first neighbor of each frontier node) — stays finite/unit-norm and
    matches the reference composition."""
    mesh, table_h, nbrs_h, table, nbrs, ids, w_self, w_nb = _setup(graph)
    from graphqembed_tpu.parallel.gather import sharded_gather
    nb1 = sharded_gather(mesh, nbrs, ids)[:, 0]
    nb1 = jnp.maximum(nb1, 0).astype(jnp.int32)
    got = expand_hop(mesh, table, nbrs, nb1, w_self, w_nb)
    nb1_ref = jnp.take(jnp.asarray(nbrs_h), jnp.asarray(np.asarray(ids)),
                       axis=0)[:, 0]
    nb1_ref = jnp.maximum(nb1_ref, 0).astype(jnp.int32)
    want = expand_hop_reference(jnp.asarray(table_h), jnp.asarray(nbrs_h),
                                nb1_ref, w_self, w_nb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)
    norms = np.linalg.norm(np.asarray(got), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
