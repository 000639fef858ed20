"""Edge-partitioned multi-hop neighbor expansion with boundary-embedding
exchange (BASELINE.json config 5; SURVEY.md §6 "long-context analog").

The adjacency (padded per-node neighbor table, the device-side CSR sample)
and the embedding table are both row-sharded over the mesh's 'data' axis —
an edge partition by source node. One hop of SAGE-style expansion for a
sharded frontier:

  1. fetch each frontier node's neighbor list — rows of the sharded neighbor
     table (owner-compute all_to_all, parallel/gather.py);
  2. fetch the BOUNDARY node embeddings — neighbor ids owned by other shards
     ride the same all_to_all route;
  3. aggregate + transform: h = l2norm(relu(x@W_self + mean(nb)@W_nb)).

Overlap: the self-transform x@W_self is data-independent of the boundary
exchange, so it is emitted BEFORE the gather result is consumed. Evidence —
in the AOT-compiled v5e 2x2 schedule with async all-to-all
(experiments/overlap_evidence.py; committed artifact
docs/artifacts/expand_hop_v5e_schedule.txt) the self-transform dot is placed
BETWEEN the boundary all-to-all-start and its -done, i.e. the MXU matmul
executes while the exchange is in flight on ICI. A runtime profile on real
multi-chip hardware remains future validation (1 chip on this box).

Multi-hop = calling expand_hop on the expanded frontier; each hop exchanges
only that hop's boundary (halo) instead of replicating the table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from graphqembed_tpu.models.gqe import l2_normalize
from graphqembed_tpu.parallel.gather import sharded_gather


def expand_hop(mesh: Mesh, table: jnp.ndarray, nbrs: jnp.ndarray,
               ids: jnp.ndarray, w_self: jnp.ndarray, w_nb: jnp.ndarray,
               axis: str = "data") -> jnp.ndarray:
    """One hop of sharded neighbor expansion.

    table [N, d] sharded P(axis, None); nbrs int32 [N, S] (−1 pad) sharded
    P(axis, None); ids int32 [B] sharded P(axis); w_self/w_nb [d, d]
    replicated -> [B, d] sharded P(axis, None)."""
    s = nbrs.shape[1]
    d = table.shape[1]
    # neighbor lists of the frontier (all_to_all #1)
    nb_ids = sharded_gather(mesh, nbrs, ids, axis=axis)          # [B, S]
    mask = nb_ids >= 0
    safe = jnp.where(mask, nb_ids, 0)
    # self embeddings: frontier rows (all_to_all #2)
    x = l2_normalize(sharded_gather(mesh, table, ids, axis=axis))  # [B, d]
    # self transform — independent of the boundary exchange below, so the
    # scheduler can overlap it with the all_to_all
    h_self = jnp.dot(x, w_self, preferred_element_type=jnp.float32)
    # boundary/halo exchange: neighbor embeddings, wherever they are owned
    nb_emb = sharded_gather(mesh, table, safe.reshape(-1), axis=axis)
    nb_emb = l2_normalize(nb_emb).reshape(-1, s, d)
    m = mask[..., None].astype(nb_emb.dtype)
    agg = jnp.sum(nb_emb * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    h_nb = jnp.dot(agg, w_nb, preferred_element_type=jnp.float32)
    return l2_normalize(jax.nn.relu(h_self + h_nb))


def expand_hop_reference(table: jnp.ndarray, nbrs: jnp.ndarray,
                         ids: jnp.ndarray, w_self: jnp.ndarray,
                         w_nb: jnp.ndarray) -> jnp.ndarray:
    """Unsharded single-device reference of expand_hop (for parity tests)."""
    s = nbrs.shape[1]
    d = table.shape[1]
    nb_ids = jnp.take(nbrs, ids, axis=0)
    mask = nb_ids >= 0
    safe = jnp.where(mask, nb_ids, 0)
    x = l2_normalize(jnp.take(table, ids, axis=0))
    h_self = jnp.dot(x, w_self, preferred_element_type=jnp.float32)
    nb_emb = l2_normalize(jnp.take(table, safe.reshape(-1), axis=0))
    nb_emb = nb_emb.reshape(-1, s, d)
    m = mask[..., None].astype(nb_emb.dtype)
    agg = jnp.sum(nb_emb * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    h_nb = jnp.dot(agg, w_nb, preferred_element_type=jnp.float32)
    return l2_normalize(jax.nn.relu(h_self + h_nb))


def build_union_neighbor_table(graph, sample_size: int = 8,
                               seed: int = 0):
    """Relation-agnostic padded neighbor table [N, S] (−1 pad) from the
    graph's CSR — a union sample over all typed relations, the halo demo's
    edge-partitioned adjacency."""
    import numpy as np

    schema = graph.schema
    rng = np.random.default_rng(seed)
    out = np.full((schema.n_nodes, sample_size), -1, np.int32)
    for gid in range(schema.n_nodes):
        mode = schema.mode_of(gid)
        nbrs: list[int] = []
        for rel in schema.relations_from(mode):
            nbrs.extend(graph.neighbors(gid, rel).tolist())
        if not nbrs:
            continue
        nbrs = np.asarray(nbrs)
        if len(nbrs) >= sample_size:
            pick = rng.choice(nbrs, size=sample_size, replace=False)
        else:
            pick = np.concatenate(
                [nbrs, rng.choice(nbrs, size=sample_size - len(nbrs))])
        out[gid] = pick
    return out
