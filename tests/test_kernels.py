"""Pallas kernel parity vs pure-jnp references (SURVEY.md §5.4): interpret
mode on CPU, random shapes including padding edges (B not a multiple of the
tile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphqembed_tpu.ops import (
    fused_intersection,
    fused_intersection_ref,
    gather_normalize,
    gather_normalize_ref,
    sddmm_scores,
    sddmm_scores_ref,
)


@pytest.mark.parametrize("b", [8, 100, 256])
def test_gather_normalize(b):
    key = jax.random.key(0)
    table = jax.random.normal(key, (500, 128))
    ids = jax.random.randint(jax.random.key(1), (b,), 0, 500)
    got = gather_normalize(table, ids, interpret=True)
    want = gather_normalize_ref(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("b,k", [(16, 4), (50, 7)])
def test_sddmm_scores(b, k):
    key = jax.random.key(2)
    table = jax.random.normal(key, (300, 128))
    q = jax.random.normal(jax.random.key(3), (b, 128))
    cands = jax.random.randint(jax.random.key(4), (b, k), 0, 300)
    got = sddmm_scores(q, table, cands, interpret=True)
    want = sddmm_scores_ref(q, table, cands)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["min", "mean"])
@pytest.mark.parametrize("k", [2, 3])
def test_fused_intersection(kind, k):
    key = jax.random.key(5)
    zs = jax.random.normal(key, (k, 64, 128))
    pre = jax.random.normal(jax.random.key(6), (128, 128)) / 11.3
    post = jax.random.normal(jax.random.key(7), (128, 128)) / 11.3
    got = fused_intersection(zs, pre, post, kind=kind, interpret=True)
    want = fused_intersection_ref(zs, pre, post, kind=kind)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_use_pallas_intersect_toggle(graph):
    """cfg.use_pallas routes intersect() through the fused kernel with the
    same results (kernel-precision tolerance)."""
    import jax
    from graphqembed_tpu.config import GQEConfig
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.models.params import init_params

    with pltpu_interpret():
        cfg_ref = GQEConfig(embed_dim=32, projection="bilinear", use_pallas=False)
        cfg_pal = GQEConfig(embed_dim=32, projection="bilinear", use_pallas=True)
        params = init_params(cfg_ref, graph.schema, jax.random.key(0))
        zs = [jax.random.normal(jax.random.key(i), (100, 32)) for i in range(3)]
        a = gqe.intersect(cfg_ref, params, zs, jnp.int32(2))
        b = gqe.intersect(cfg_pal, params, zs, jnp.int32(2))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def pltpu_interpret():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()
