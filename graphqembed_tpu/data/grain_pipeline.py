"""grain-based input pipeline (SURVEY.md §8: "sampling is offline (grain
pipeline)"): deterministic, checkpointable host-side batch streaming from
saved native query sets.

Where TrainData (training/loop.py) holds everything in RAM and DeviceTrainData
uploads everything to HBM, this pipeline targets the beyond-RAM regime:
per-formula npz shards on disk, a grain MapDataset over (formula, row) pairs
with seeded global shuffle, worker-parallel batch assembly, and grain's
iterator checkpointing for exactly-once resume.
"""

from __future__ import annotations

import json
from pathlib import Path

import grain.python as grain
import numpy as np



class QueryShardSource(grain.RandomAccessDataSource):
    """Random access over all queries of ONE structure across its formula
    shards (lazy npz loading, per-shard cache)."""

    def __init__(self, path: str | Path, structure: str,
                 neg_width: int = 16, hard_neg_width: int = 16):
        self.path = Path(path)
        manifest = json.loads((self.path / "manifest.json").read_text())
        self.entries = [e for e in manifest if e["structure"] == structure]
        self.structure = structure
        # fixed widths: formula shards store ragged negative lists; records
        # must be uniform for batching (pad with -1 / truncate)
        self.neg_width = neg_width
        self.hard_neg_width = hard_neg_width
        self._offsets = np.cumsum([0] + [e["count"] for e in self.entries])
        self._cache: dict[int, dict] = {}

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __repr__(self) -> str:
        # grain validates checkpointed iterator state against repr(source);
        # the default repr carries the object address and never matches
        # across processes — keep it stable and content-addressed
        return (f"QueryShardSource(path={self.path}, "
                f"structure={self.structure}, n={len(self)}, "
                f"neg_width={self.neg_width}, "
                f"hard_neg_width={self.hard_neg_width})")

    def _shard(self, si: int) -> dict:
        if si not in self._cache:
            z = np.load(self.path / self.entries[si]["file"])
            self._cache[si] = {k: z[k] for k in z.files}
            self._cache[si]["rels"] = np.asarray(
                self.entries[si]["rels_ids"], np.int32)
        return self._cache[si]

    @staticmethod
    def _fit(row: np.ndarray, width: int) -> np.ndarray:
        if len(row) >= width:
            return row[:width]
        out = np.full(width, -1, row.dtype)
        out[:len(row)] = row
        return out

    def __getitem__(self, idx):
        si = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        row = idx - self._offsets[si]
        shard = self._shard(si)
        negs = self._fit(shard["negs"][row], self.neg_width)
        hard = (self._fit(shard["hard_negs"][row], self.hard_neg_width)
                if "hard_negs" in shard else
                self._fit(negs, self.hard_neg_width))
        return {
            "anchors": shard["anchors"][row],
            "target": shard["targets"][row],
            "negs": negs,
            "hard_negs": hard,
            "rels": shard["rels"],
        }


def _attach_rel_ids(path: str | Path, schema) -> None:
    """Annotate the manifest with dense relation ids once (grain workers then
    never need the Schema object)."""
    path = Path(path)
    mpath = path / "manifest.json"
    manifest = json.loads(mpath.read_text())
    changed = False
    for e in manifest:
        if "rels_ids" not in e:
            e["rels_ids"] = [
                schema.rel_id(tuple(r)) for r in e["rels"]]
            changed = True
    if changed:
        mpath.write_text(json.dumps(manifest, indent=1))


def make_query_loader(path: str | Path, schema, structure: str,
                      batch_size: int, seed: int = 0,
                      worker_count: int = 0) -> grain.DataLoader:
    """Deterministic, resumable batch loader for one structure.

    Batches are dicts of stacked arrays: anchors [B, A], target [B],
    negs [B, K], rels [B, R]. Use `loader.__iter__()` and grain's
    get_state/set_state for checkpointed resume."""
    _attach_rel_ids(path, schema)
    source = QueryShardSource(path, structure)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shuffle=True,
        seed=seed,
        num_epochs=None,  # stream forever
        shard_options=grain.NoSharding(),
    )
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )


def run_train_stream(cfg, schema, params, data_dir, val_queries=None,
                     total_steps: int | None = None,
                     burn_in_steps: int | None = None, seed: int | None = None,
                     worker_count: int = 0, log=None,
                     ckpt_manager=None, ckpt_every: int = 0,
                     resume: bool = False):
    """Beyond-RAM host training: the §2.5 protocol (burn-in → weighted
    multitask, hard-neg alternation, convergence, best-val) streaming batches
    from on-disk npz query shards via grain instead of holding queries in
    RAM (TrainData) or HBM (DeviceTrainData). Batches are mixed-formula, so
    steps run the per-row model path (gqe.margin_loss_rows).

    Checkpoint/resume (ckpt_manager + ckpt_every, resume=True restores the
    latest): saves params/opt_state/best_params via orbax plus — in JSON
    meta — every piece of host state the stream schedule depends on: the
    grain iterator state PER STRUCTURE (exactly-once batch consumption:
    grain replays from the exact record index), the numpy RNG state
    (structure picks + negative draws), the hard-neg toggle, burn-in
    counters, and the convergence-window tails. A killed run therefore
    resumes on the identical batch sequence (pinned by
    tests/test_fault_injection.py).

    Returns a training/loop.py::TrainResult."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from graphqembed_tpu.config import INTERSECT_STRUCTURES, STRUCTURES
    from graphqembed_tpu.models import gqe
    from graphqembed_tpu.training.eval import eval_auc
    from graphqembed_tpu.training.loop import (
        TrainResult,
        check_conv,
        structure_weight,
    )
    import functools
    import time

    seed = cfg.seed if seed is None else seed
    total_steps = total_steps if total_steps is not None else cfg.max_iter
    burn_in_steps = (burn_in_steps if burn_in_steps is not None
                     else cfg.max_burn_in)

    manifest = json.loads((Path(data_dir) / "manifest.json").read_text())
    counts: dict[str, int] = {}
    for e in manifest:
        counts[e["structure"]] = counts.get(e["structure"], 0) + e["count"]
    structures = [s for s in STRUCTURES if counts.get(s)]
    iters = {s: iter(make_query_loader(data_dir, schema, s, cfg.batch_size,
                                       seed=seed, worker_count=worker_count))
             for s in structures}
    tmode = schema.rel_target_mode_ids()

    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)

    @functools.partial(jax.jit, static_argnames=("structure",),
                       donate_argnames=("params", "opt_state"))
    def step(params, opt_state, structure, anchors, rels, modes, targets,
             negs, weight):
        def loss_fn(p):
            return weight * gqe.margin_loss_rows(
                cfg, p, structure, anchors, rels, modes, targets, negs,
                jnp.ones(anchors.shape[0], jnp.bool_))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rng = np.random.default_rng(seed)

    def next_batch(structure: str, hard: bool):
        b = next(iters[structure])
        rels = b["rels"].astype(np.int32)
        if structure in INTERSECT_STRUCTURES:
            col = 0 if structure == "ip" else rels.shape[1] - 1
            modes = tmode[rels[:, col]].astype(np.int32)
        else:
            modes = np.full(len(rels), -1, np.int32)
        pool = b["hard_negs"] if hard else b["negs"]
        # one uniform draw per row from the padded (-1) pool
        width = (pool >= 0).sum(axis=1).clip(min=1)
        j = rng.integers(0, 1 << 30, size=len(pool))
        neg = pool[np.arange(len(pool)), j % width]
        neg = np.where(neg >= 0, neg, b["negs"][:, 0])
        return (b["anchors"].astype(np.int32), rels, modes,
                b["target"].astype(np.int32), neg.astype(np.int32))

    w = np.array([counts[s] for s in structures], np.float64)
    p_struct = w / w.sum()
    losses: dict[str, list[float]] = {s: [] for s in structures}
    burn_series: list[float] = []
    multi_series: list[float] = []
    val_history: list[tuple[int, float]] = []
    # a COPY: params is donated to the first step dispatch, and checkpoints
    # save best_params before any eval has replaced it
    best_val = -1.0
    best_params = jax.tree.map(lambda x: x.copy(), params)
    hard_toggle = 0
    burn_done = 0
    multitask = "1p" not in iters
    step_i = 0
    last_ckpt = 0

    if resume and ckpt_manager is not None:
        restored = ckpt_manager.restore_latest(
            like={"params": params, "opt_state": opt_state,
                  "best_params": params})
        if restored is not None:
            import base64

            state, meta = restored
            params = state["params"]
            opt_state = state["opt_state"]
            best_params = state["best_params"]
            step_i = last_ckpt = int(meta["step"])
            hard_toggle = int(meta["hard_toggle"])
            burn_done = int(meta["burn_done"])
            multitask = bool(meta["multitask"])
            best_val = float(meta["best_val"])
            burn_series = list(meta.get("burn_tail", []))
            multi_series = list(meta.get("multi_tail", []))
            # restore_latest already rehydrated this into a Generator;
            # mutate in place (next_batch closes over `rng`)
            rng.bit_generator.state = meta["rng_state"].bit_generator.state
            for s, st64 in meta["iter_states"].items():
                iters[s].set_state(base64.b64decode(st64))

    def maybe_ckpt():
        nonlocal last_ckpt
        if ckpt_manager is None or not ckpt_every or \
                step_i - last_ckpt < ckpt_every:
            return
        import base64
        import json as _json

        ckpt_manager.save_state(
            step_i,
            {"params": params, "opt_state": opt_state,
             "best_params": best_params},
            extra={
                "hard_toggle": hard_toggle, "burn_done": burn_done,
                "multitask": multitask, "best_val": best_val,
                "burn_tail": burn_series[-cfg.conv_window:],
                "multi_tail": multi_series[-cfg.conv_window:],
                "rng_state": _json.loads(
                    _json.dumps(rng.bit_generator.state, default=int)),
                "iter_states": {
                    s: base64.b64encode(it.get_state()).decode()
                    for s, it in iters.items()},
            })
        last_ckpt = step_i

    t0 = time.perf_counter()
    while step_i < total_steps:
        step_i += 1
        structure = (structures[rng.choice(len(structures), p=p_struct)]
                     if multitask else "1p")
        hard = False
        if structure in INTERSECT_STRUCTURES and cfg.hard_neg_alternate:
            hard = bool(hard_toggle % 2)
            hard_toggle += 1
        anchors, rels, modes, targets, negs = next_batch(structure, hard)
        params, opt_state, loss = step(
            params, opt_state, structure, anchors, rels, modes, targets,
            negs, np.float32(structure_weight(cfg, structure)))
        loss = float(loss)
        losses[structure].append(loss)
        if not multitask:
            burn_done += 1
            burn_series.append(loss)
            if (check_conv(burn_series, cfg.conv_window, cfg.tol)
                    or burn_done >= burn_in_steps):
                multitask = True
        else:
            multi_series.append(loss)
        if log and step_i % 500 == 0:
            log(step_i, structure, loss)
        if val_queries and step_i % cfg.val_every == 0:
            aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed)
            macro = aucs.get("macro", 0.0)
            val_history.append((step_i, macro))
            if macro > best_val:
                best_val = macro
                best_params = jax.tree.map(lambda x: x.copy(), params)
        maybe_ckpt()
        if multitask and check_conv(multi_series, cfg.conv_window, cfg.tol):
            break
    dt = time.perf_counter() - t0
    if best_val < 0:
        best_params = params
    return TrainResult(
        params=params, best_params=best_params, best_val_auc=best_val,
        steps=step_i, burn_in_steps=burn_done, losses=losses,
        val_history=val_history,
        queries_per_sec=step_i * cfg.batch_size / max(dt, 1e-9))
