"""Multi-host initialization and mesh construction (SURVEY.md §6 distributed
backend row).

On a TPU pod slice each host runs the same program; `initialize_multihost()`
wires them into one JAX runtime (`jax.distributed.initialize` — coordinator
discovery is automatic on TPU from the metadata environment, or explicit via
arguments for CPU/GPU fleets). After initialization `jax.devices()` spans the
whole slice and the standard mesh helpers (parallel/mesh.py) produce global
meshes whose collectives ride ICI within the slice and DCN across slices.

Tested as a REAL 2-process jax.distributed cluster (tests/test_multihost.py:
2 CPU processes x 4 virtual devices = one 8-device mesh; initialize +
global_batch_from_local + a sharded train step across the process boundary,
replicated loss asserted equal on both processes). The single-process no-op
path is what runs on this 1-chip box.

Data placement convention for multi-host training:
- per-host batch shard: each host feeds its own slice of the global batch
  (jax.make_array_from_process_local_data over the 'data'-sharded spec);
- the packed table's row shards live on the devices of whichever host owns
  them; the owner-compute gather (parallel/gather.py) routes cross-host
  requests over DCN exactly like cross-chip requests over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> dict:
    """Initialize the distributed runtime (no-op for a single process).
    Returns a summary dict for logging.

    MUST run before anything touches the XLA backend — so the
    am-I-already-initialized probe cannot be jax.process_count() (that call
    itself initializes the backend; bug found by the 2-process test). We try
    to initialize and tolerate double-initialization instead."""
    if coordinator_address or (num_processes or 0) > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def global_batch_from_local(mesh: Mesh, local_batch, spec=P("data")):
    """Assemble a globally-sharded array from each host's local shard —
    the standard multi-host input pipeline hook."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_batch)
