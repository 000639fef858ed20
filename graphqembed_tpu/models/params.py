"""Parameter pytrees for the GQE model family.

TPU-first layout (SURVEY.md §8 tenets): per-relation and per-mode parameters
are STACKED arrays indexed by dense ids ([R, ...], [M, d, d]) instead of the
reference's dicts of nn.Parameter keyed by relation triple
[R: netquery/decoders.py (conf=H)] — so a batch's operator weights are one
gather + one big MXU matmul, and the whole tree is a flat pytree for optax /
orbax / sharding.

Shapes:
  table:        [N, d]   packed node embedding table (all modes)
  proj/transe:  r  [R, d]          P_r(q) = q + r
  proj/distmult:w  [R, d]          P_r(q) = q ⊙ w_r
  proj/bilinear:W  [R, d, d]       P_r(q) = q @ W_r     (row-vector convention)
  inter/pre:    [M, d, d]          h_i = relu(z_i @ pre_m)
  inter/post:   [M, d, d]          out = Φ(h_i) @ post_m, Φ ∈ {min, mean}
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.graph.schema import Schema


def init_params(cfg: GQEConfig, schema: Schema, key: jax.Array) -> dict:
    d = cfg.embed_dim
    n, r, m = schema.n_nodes, schema.n_relations, len(schema.modes)
    k_table, k_proj, k_pre, k_post = jax.random.split(key, 4)
    params: dict = {
        # normalized at lookup (SURVEY.md §2.3), so unit-variance init is
        # fine. storage_dtype="bfloat16" stores the table (and its Adam
        # moments, via FusedAdamOpt's SR kernel) at half the HBM bytes —
        # the dense step's dominant traffic term (docs/DESIGN.md §10);
        # gqe.encode upcasts to f32 after the gather.
        "table": jax.random.normal(k_table, (n, d), jnp.float32).astype(
            jnp.dtype(cfg.storage_dtype)),
    }
    if cfg.projection == "transe":
        params["proj"] = {"r": jax.random.normal(k_proj, (r, d)) / jnp.sqrt(d)}
    elif cfg.projection == "distmult":
        params["proj"] = {"w": jax.random.normal(k_proj, (r, d))}
    else:  # bilinear — xavier-uniform like the reference's dense R_r (conf=M)
        lim = jnp.sqrt(6.0 / (d + d))
        params["proj"] = {
            "W": jax.random.uniform(k_proj, (r, d, d), jnp.float32, -lim, lim)
        }
    if cfg.learned_intersection:
        lim = jnp.sqrt(6.0 / (d + d))
        params["inter"] = {
            "pre": jax.random.uniform(k_pre, (m, d, d), jnp.float32, -lim, lim),
            "post": jax.random.uniform(k_post, (m, d, d), jnp.float32, -lim, lim),
        }
    if cfg.depth > 0:
        from graphqembed_tpu.models.encoders import init_encoder_params
        params["encoder"] = init_encoder_params(
            cfg, schema, jax.random.fold_in(key, 17))
    return params


def params_to_numpy(params: dict) -> dict:
    return jax.tree.map(lambda x: jax.device_get(x), params)
