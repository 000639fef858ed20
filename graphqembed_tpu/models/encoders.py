"""Embedding encoders (SURVEY.md §1 L2).

Reference capability [R: netquery/encoders.py (conf=H)]:
- DirectEncoder: node id -> embedding row, L2-normalized — in this framework
  that is models/gqe.py::encode over the packed table (no separate class).
- Encoder (depth>0): GraphSAGE-style neighborhood aggregation: a node's
  embedding combines its own features with aggregated neighbor features per
  typed relation, passed through a learned transform + ReLU + normalize
  [R: netquery/encoders.py::Encoder, netquery/aggregators.py::MeanAggregator,
  FastMeanAggregator, PoolAggregator (conf=M on exact composition)].

TPU-native redesign (not a port): the reference walks python adjacency dicts
per batch on the host. Here neighbor sampling is a PRECOMPUTE: for every
relation, a padded int32 neighbor table [n_from, S] (−1 pad) built once from
CSR; depth-k encoding is then k rounds of pure gather + masked aggregation +
matmul, entirely on device with static shapes. Aggregators:
  mean — masked mean of neighbor embeddings (MeanAggregator/FastMean)
  pool — elementwise max over a per-relation MLP of neighbor embeddings
         (PoolAggregator)

h^{k}(v) = l2norm(relu(W_self^{mode} h^{k-1}(v)
                       + Σ_{rel: from_mode(rel)=mode} W_rel Φ(h^{k-1}(N_rel(v)))))
with h^0 = base table rows. Depth 0 == DirectEncoder semantics exactly.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from graphqembed_tpu.config import GQEConfig
from graphqembed_tpu.graph.graph import Graph
from graphqembed_tpu.graph.schema import Schema
from graphqembed_tpu.models.gqe import _precision, l2_normalize


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["neighbors", "node_mode", "node_local", "mode_rel_ids"],
    meta_fields=["sample_size"],
)
@dataclasses.dataclass
class NeighborTables:
    """Padded per-relation neighbor samples + static schema index maps.

    neighbors: int32 [R, max_n_from, S], −1-padded; row r covers the from-mode
    local range of relation r (unused tail rows for smaller modes are −1).
    node_mode: int32 [N] mode id per global node; node_local: int32 [N] local
    index within its mode range.
    """

    neighbors: np.ndarray
    node_mode: np.ndarray
    node_local: np.ndarray
    mode_rel_ids: np.ndarray   # int32 [M, max_rels_per_mode], −1-padded
    sample_size: int

    @classmethod
    def build(cls, graph: Graph, sample_size: int = 8, seed: int = 0
              ) -> "NeighborTables":
        schema = graph.schema
        rng = np.random.default_rng(seed)
        max_from = max(schema.mode_counts[r[0]] for r in schema.relations)
        R = schema.n_relations
        nbrs = np.full((R, max_from, sample_size), -1, np.int64)
        for ri, rel in enumerate(schema.relations):
            lo, hi = schema.mode_range(rel[0])
            indptr, indices = graph.csr(rel)
            for li in range(hi - lo):
                row = indices[indptr[li]:indptr[li + 1]]
                if len(row) == 0:
                    continue
                if len(row) >= sample_size:
                    pick = rng.choice(row, size=sample_size, replace=False)
                else:
                    pick = np.concatenate(
                        [row, rng.choice(row, size=sample_size - len(row))])
                nbrs[ri, li] = pick
        node_mode = np.empty(schema.n_nodes, np.int32)
        node_local = np.empty(schema.n_nodes, np.int32)
        for m in schema.modes:
            lo, hi = schema.mode_range(m)
            node_mode[lo:hi] = schema.mode_id(m)
            node_local[lo:hi] = np.arange(hi - lo)
        max_out = max(len(schema.relations_from(m)) for m in schema.modes)
        mode_rel = np.full((len(schema.modes), max_out), -1, np.int32)
        for mi, m in enumerate(schema.modes):
            for j, rel in enumerate(schema.relations_from(m)):
                mode_rel[mi, j] = schema.rel_id(rel)
        return cls(
            neighbors=nbrs.astype(np.int32),
            node_mode=node_mode,
            node_local=node_local,
            mode_rel_ids=mode_rel,
            sample_size=sample_size,
        )


def init_encoder_params(cfg: GQEConfig, schema: Schema, key: jax.Array) -> dict:
    """Depth>0 encoder weights: W_self [M,d,d], W_rel [R,d,d]; pool aggregator
    MLP W_pool [R,d,d] (used only when aggregator='pool')."""
    d = cfg.embed_dim
    m, r = len(schema.modes), schema.n_relations
    k1, k2, k3 = jax.random.split(key, 3)
    lim = jnp.sqrt(6.0 / (d + d))
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -lim, lim)
    return {"W_self": u(k1, (m, d, d)), "W_rel": u(k2, (r, d, d)),
            "W_pool": u(k3, (r, d, d))}


def make_deep_encoder(cfg: GQEConfig, params: dict, tables: NeighborTables,
                      depth: int, aggregator: str = "mean"):
    """encode_fn closure for models/gqe.py forward paths: params must hold
    'table' and 'encoder' (init_encoder_params). Handles [..]-shaped id
    arrays by flattening (candidates arrive [B] or [B, K])."""

    def encode_fn(ids: jnp.ndarray) -> jnp.ndarray:
        flat = ids.reshape(-1)
        out = sage_encode(cfg, params["table"], params["encoder"], tables,
                          flat, depth=depth, aggregator=aggregator)
        return out.reshape(ids.shape + (params["table"].shape[1],))

    return encode_fn


def sage_encode(cfg: GQEConfig, table: jnp.ndarray, enc_params: dict,
                tables: NeighborTables, ids: jnp.ndarray, depth: int = 1,
                aggregator: str = "mean") -> jnp.ndarray:
    """GraphSAGE-style depth-k encoding of global node ids [B] -> [B, d].

    Static recursion over depth (neighbor fan-out S^depth); all gathers are
    padded/masked. depth=0 reduces to table-gather + normalize.
    """
    neighbors = jnp.asarray(tables.neighbors)
    node_mode = jnp.asarray(tables.node_mode)
    node_local = jnp.asarray(tables.node_local)
    mode_rel = jnp.asarray(tables.mode_rel_ids)
    prec = _precision(cfg)

    def embed(ids: jnp.ndarray, k: int) -> jnp.ndarray:
        base = l2_normalize(jnp.take(table, ids, axis=0))
        if k == 0:
            return base
        mode = node_mode[ids]                      # [B]
        local = node_local[ids]                    # [B]
        rels = mode_rel[mode]                      # [B, J] (−1 pad)
        J = rels.shape[1]
        self_t = jnp.einsum("bd,bde->be", base, enc_params["W_self"][mode],
                            preferred_element_type=jnp.float32, precision=prec)
        acc = self_t
        for j in range(J):
            rel_j = rels[:, j]                     # [B]
            valid_rel = rel_j >= 0
            rel_safe = jnp.maximum(rel_j, 0)
            nb = neighbors[rel_safe, local]        # [B, S] global ids, −1 pad
            nb_mask = (nb >= 0) & valid_rel[:, None]
            nb_safe = jnp.maximum(nb, 0)
            nb_emb = embed(nb_safe.reshape(-1), k - 1).reshape(
                nb.shape + (table.shape[1],))      # [B, S, d]
            m = nb_mask[..., None].astype(nb_emb.dtype)
            if aggregator == "mean":
                agg = jnp.sum(nb_emb * m, axis=1) / jnp.maximum(
                    jnp.sum(m, axis=1), 1.0)
            elif aggregator == "pool":
                h = jax.nn.relu(jnp.einsum(
                    "bsd,bde->bse", nb_emb, enc_params["W_pool"][rel_safe],
                    preferred_element_type=jnp.float32, precision=prec))
                h = jnp.where(nb_mask[..., None], h, -jnp.inf)
                agg = jnp.max(h, axis=1)
                agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
            else:
                raise ValueError(aggregator)
            rel_t = jnp.einsum("bd,bde->be", agg, enc_params["W_rel"][rel_safe],
                               preferred_element_type=jnp.float32,
                               precision=prec)
            acc = acc + jnp.where(valid_rel[:, None], rel_t, 0.0)
        return l2_normalize(jax.nn.relu(acc))

    return embed(ids, depth)
