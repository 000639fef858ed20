"""Device mesh helpers (SURVEY.md §3 parallelism inventory).

The reference is single-process/single-device [R: no torch.distributed
anywhere (conf=H)]; every distributed capability here is new TPU-native
design: a `jax.sharding.Mesh` with axes ('data',) — data parallelism over the
batch dim AND row-sharding of the packed embedding table over the same axis
(the EP-analog of SURVEY.md §3: nodes ≈ experts). Collectives are inserted by
XLA (GSPMD) from NamedSharding annotations and ride ICI on real slices;
tests/dry-runs use a virtual CPU mesh (xla_force_host_platform_device_count).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), (n, len(devs))
    return Mesh(np.array(devs[:n]), (axis,))


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    """('data', 'model') mesh: DP/row-sharding over 'data' plus tensor
    parallelism over 'model' (operator stacks split on the feature dim —
    see param_shardings). TP is a capability for the regime DESIGN.md's TP
    analysis identifies (d in the thousands, or operator stacks too large to
    replicate); at d=128 it is off by default because sub-128 matmul tiles
    under-fill the MXU."""
    devs = jax.devices()
    n = n_data * n_model
    assert n <= len(devs), (n_data, n_model, len(devs))
    return Mesh(np.array(devs[:n]).reshape(n_data, n_model),
                ("data", "model"))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard the packed [N, d] embedding table across the mesh."""
    return NamedSharding(mesh, P("data", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim; replicate the rest."""
    return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))


def param_shardings(params: dict, mesh: Mesh) -> dict:
    """table -> row-sharded over 'data'; operator params -> replicated on a
    1-D mesh (they are tiny: R·d² and M·d² at d=128 is a few MB).

    If the mesh has a 'model' axis (make_mesh_2d), the operator stacks are
    tensor-parallel Megatron-style: the projection stacks and the
    intersection pre-transform are COLUMN-sharded (output-feature dim over
    'model'; each device computes its slice of the output with no
    communication), and the intersection post-transform is ROW-sharded
    (contraction dim over 'model'; GSPMD inserts the psum that completes the
    matmul). Everything else — including depth>0 encoder weights — stays
    replicated. XLA/GSPMD compiles the collectives from these annotations
    alone; the model code is unchanged."""
    ts, rs = table_sharding(mesh), replicated(mesh)
    tp = "model" in mesh.axis_names

    def col(ndim):  # shard the LAST (output-feature) dim
        return NamedSharding(mesh, P(*((None,) * (ndim - 1) + ("model",))))

    def check_div(keys, x, dim):
        n_model = mesh.shape["model"]
        if x.shape[dim] % n_model:
            raise ValueError(
                f"param {'/'.join(map(str, keys))} dim {dim} "
                f"(= {x.shape[dim]}) is not divisible by the 'model' mesh "
                f"axis ({n_model}); pick embed_dim a multiple of n_model "
                f"or a smaller model axis")

    def spec(path, x):
        keys = tuple(getattr(p, "key", None) for p in path)
        if keys and keys[0] == "table":
            return ts
        if not tp:
            return rs
        if keys[:2] in {("proj", "W"), ("proj", "r"), ("proj", "w"),
                        ("inter", "pre")}:
            check_div(keys, x, x.ndim - 1)
            return col(x.ndim)
        if keys[:2] == ("inter", "post"):
            check_div(keys, x, 1)
            return NamedSharding(mesh, P(None, "model", None))
        return rs

    return jax.tree.map_with_path(spec, params)


def pad_table_rows(params: dict, n_shards: int) -> tuple[dict, int]:
    """Pad table rows to a multiple of n_shards (NamedSharding needs even
    shards). Padded rows are never referenced by any id and get zero grads.
    Returns (params, n_padded_rows)."""
    import jax.numpy as jnp

    n = params["table"].shape[0]
    pad = (-n) % n_shards
    if pad:
        params = dict(params)
        params["table"] = jnp.concatenate(
            [params["table"],
             jnp.zeros((pad, params["table"].shape[1]),
                       params["table"].dtype)], axis=0)
    return params, pad


def shard_params(params: dict, mesh: Mesh) -> dict:
    params, _ = pad_table_rows(params, mesh.devices.size)
    return jax.device_put(params, param_shardings(params, mesh))


def mesh_consistent(tree, mesh: Mesh):
    """Re-place every leaf NOT already sharded over `mesh` as replicated on
    it. Needed for checkpoint-restore `like` trees on a mesh: optax scalars
    (e.g. the Adam count, created by jnp.zeros(()) at init) sit on a single
    device, and restoring them that way makes the first post-resume jit
    reject the mixed device sets."""
    rep = replicated(mesh)

    def fix(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, rep)

    return jax.tree.map(fix, tree)
