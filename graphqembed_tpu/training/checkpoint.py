"""Checkpoint / resume (SURVEY.md §6): the reference only torch.save'd the
best state_dict — no optimizer state, no resume [R: utils.py::run_train
(conf=H)]. Here: orbax full train-state checkpoints (params + opt state +
step + host RNG state), sharding-aware on restore, plus a light "best eval"
export, and an oracle-weights conversion helper for parity tests."""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str | Path, params: dict, step: int,
                    opt_state=None, extra: dict | None = None) -> None:
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        ckptr.save(path / "state", state, force=True)
    meta = {"step": step, **(extra or {})}
    (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(path: str | Path, like: dict | None = None):
    """Returns (state dict, meta). `like` is an abstract pytree (e.g. from
    jax.eval_shape / sharded params) for sharding-aware restore; None restores
    as numpy on host."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            state = ckptr.restore(path / "state", like)
        else:
            state = ckptr.restore(path / "state")
    meta = json.loads((path / "meta.json").read_text())
    return state, meta


def latest_step_dir(root: str | Path) -> Path | None:
    """Step-numbered checkpoint dirs: <root>/step_000123."""
    root = Path(root)
    if not root.exists():
        return None
    dirs = sorted(d for d in root.iterdir() if d.name.startswith("step_"))
    return dirs[-1] if dirs else None


class CheckpointManager:
    """Periodic train-state checkpointing with restart-from-latest — the
    preemption/elastic-recovery primitive (SURVEY.md §6 failure detection)."""

    def __init__(self, root: str | Path, keep: int = 3):
        self.root = Path(root)
        self.keep = keep
        self.root.mkdir(parents=True, exist_ok=True)

    def save(self, step: int, params: dict, opt_state, rng_state=None) -> None:
        extra = {}
        if rng_state is not None:
            extra["rng_state"] = _rng_state_to_json(rng_state)
        save_checkpoint(self.root / f"step_{step:08d}", params, step,
                        opt_state=opt_state, extra=extra)
        self._prune()

    def save_state(self, step: int, state: dict,
                   extra: dict | None = None) -> None:
        """Arbitrary-state variant (the device pipeline checkpoints
        {params, opt_state, best_params}; its resume counter state is plain
        JSON in `extra` — no host RNG exists there, batch selection is
        counter-based on device)."""
        path = (self.root / f"step_{step:08d}").absolute()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path / "state", state, force=True)
        (path / "meta.json").write_text(
            json.dumps({"step": step, **(extra or {})}))
        self._prune()

    def _prune(self) -> None:
        dirs = sorted(d for d in self.root.iterdir()
                      if d.name.startswith("step_"))
        for d in dirs[:-self.keep]:
            import shutil
            shutil.rmtree(d)

    def restore_latest(self, like: dict | None = None):
        d = latest_step_dir(self.root)
        if d is None:
            return None
        state, meta = load_checkpoint(d, like)
        if "rng_state" in meta:
            meta["rng_state"] = _rng_state_from_json(meta["rng_state"])
        return state, meta


def _rng_state_to_json(rng: np.random.Generator) -> dict:
    st = rng.bit_generator.state
    return json.loads(json.dumps(st, default=int))


def _rng_state_from_json(st: dict) -> np.random.Generator:
    rng = np.random.default_rng(0)
    rng.bit_generator.state = st
    return rng


def export_for_oracle(params: dict) -> dict:
    """Host numpy copy of params in the shared layout (models/params.py) for
    loading into the PyTorch oracle."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)
