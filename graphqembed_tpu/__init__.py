"""graphqembed_tpu — a TPU-native framework for embedding logical queries on
knowledge graphs (GQE, arXiv:1806.01445), built from scratch in JAX/XLA/Pallas.

Capability parity target: williamleif/graphqembed (the `netquery` package).
The reference mount was empty at build time (see SURVEY.md §0), so parity is
defined operationally by the in-tree PyTorch oracle (`graphqembed_tpu.oracle`)
implementing the semantics of SURVEY.md §2, double-sourced against the paper
and the driver spec (BASELINE.json).

Layering (TPU-first re-design of SURVEY.md §1's layer map):
  graph/     L0  — typed multigraph substrate: packed node-id space, CSR per
                   relation, edge holdout, negative-sample computation
  data/      L1  — query formalism (7 structures), SoA batches with static
                   shapes, offline sampler, pickle import for reference data
  models/    L2-4 — embedding encoder, geometric operators (TransE / DistMult /
                   bilinear projection; deep-set intersection), per-structure
                   jitted forward + margin loss
  ops/       kernels — Pallas TPU kernels with pure-jnp reference paths
  parallel/  mesh, row-sharded embedding tables, shard_map train step
  training/  L5  — burn-in + multi-task loop, AUC/APR eval in JAX, orbax
                   checkpointing, metrics
  oracle/    PyTorch reference implementation for activation/AUC parity
  cli/       L6  — train / eval / sample / bench entry points
"""

__version__ = "0.1.0"

from graphqembed_tpu.config import GQEConfig  # noqa: F401
