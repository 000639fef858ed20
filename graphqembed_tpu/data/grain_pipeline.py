"""Beyond-RAM input pipeline (SURVEY.md §8: "sampling is offline (grain
pipeline)"): deterministic, checkpointable streaming from saved npz query
shards.

Where TrainData (training/loop.py) holds everything in RAM and
DeviceTrainData uploads everything to HBM, this pipeline targets the
beyond-RAM regime. Two layers:

- `make_query_loader` / `QueryShardSource`: a grain DataLoader over the
  shards — the general-purpose per-record API (shuffle, batching, grain
  iterator checkpointing).
- `run_train_stream`: the PRODUCTION trainer — windowed HBM staging.
  `NpzStructureStream` assembles fixed-size per-structure windows with
  vectorized numpy fancy-indexing (grain's per-record python path tops out
  ~40k records/s, starving the chip), `WindowPacker` ships a window set as
  ONE packed H2D transfer, a background thread double-buffers assembly +
  upload behind the scan mega-step, and losses drain at shallow sync
  points (the tunneled chip stalls if many dispatches queue before a value
  read). Resume is exactly-once: stream state is (epoch, pos) over seeded
  per-epoch permutations, snapshotted BEFORE each window draw. Measured
  678-811k queries/s/chip sustained (RESULTS_stream.md).
"""

from __future__ import annotations

import json
from pathlib import Path

import grain.python as grain
import jax
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
            if "rels" not in self._cache[si]:
                # formula shard (save_queries): one rels row for the shard;
                # mixed-formula native shards (save_query_arrays) store
                # per-row rels in the npz itself
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
        rels = shard["rels"]
        if rels.ndim == 2:       # mixed-formula native shard: per-row rels
            rels = rels[row]
        return {
            "anchors": shard["anchors"][row],
            "target": shard["targets"][row],
            "negs": negs,
            "hard_negs": hard,
            "rels": rels,
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


class NpzStructureStream:
    """Vectorized, exactly-once record stream over one structure's npz
    shards — the window producer for run_train_stream.

    grain's per-record python path tops out around ~40k records/s/worker,
    which starves a chip consuming millions of queries/s; here a window of W
    records is assembled with numpy fancy-indexing over (mmap-backed where
    uncompressed) shard arrays in milliseconds. The stream state is just
    (epoch, pos) over a seeded per-epoch permutation — trivially
    JSON-serializable and exactly-once on resume (the permutation is a pure
    function of (seed, epoch))."""

    def __init__(self, path: str | Path, structure: str, seed: int = 0,
                 neg_width: int = 16, hard_neg_width: int = 16):
        self.path = Path(path)
        manifest = json.loads((self.path / "manifest.json").read_text())
        self.entries = [e for e in manifest if e["structure"] == structure]
        self.structure = structure
        self.neg_width = neg_width
        self.hard_neg_width = hard_neg_width
        self.shards = []
        for e in self.entries:
            z = np.load(self.path / e["file"], mmap_mode="r")
            self.shards.append({
                "anchors": z["anchors"], "targets": z["targets"],
                "negs": z["negs"],
                "hard_negs": z["hard_negs"] if "hard_negs" in z.files
                else None,
                "rels": z["rels"] if "rels" in z.files
                else np.asarray(e["rels_ids"], np.int32),
            })
        self.offsets = np.cumsum([0] + [e["count"] for e in self.entries])
        self.n = int(self.offsets[-1])
        self.seed = seed
        self.epoch = 0
        self.pos = 0
        self._perm = None
        self._perm_epoch = -1

    def get_state(self) -> dict:
        return {"epoch": self.epoch, "pos": self.pos}

    def set_state(self, st: dict) -> None:
        self.epoch = int(st["epoch"])
        self.pos = int(st["pos"])

    def _permutation(self, epoch: int) -> np.ndarray:
        if self._perm_epoch != epoch:
            rng = np.random.default_rng((self.seed, 0x5EED, epoch))
            self._perm = rng.permutation(self.n)
            self._perm_epoch = epoch
        return self._perm

    def _fit(self, arr: np.ndarray, width: int) -> np.ndarray:
        if arr.shape[1] >= width:
            return arr[:, :width]
        out = np.full((arr.shape[0], width), -1, np.int32)
        out[:, :arr.shape[1]] = arr
        return out

    def draw(self, w: int) -> dict:
        """Next `w` records (advancing the stream): dict with per-row
        anchors [w, A], target [w], negs [w, K] / hard_negs [w, Kh]
        (-1-padded), rels [w, R] — the _window_arrays input shape."""
        idx = []
        while w > 0:
            perm = self._permutation(self.epoch)
            take = min(w, self.n - self.pos)
            idx.append(perm[self.pos:self.pos + take])
            self.pos += take
            w -= take
            if self.pos >= self.n:
                self.epoch += 1
                self.pos = 0
        idx = np.concatenate(idx)
        m = len(idx)
        si = np.searchsorted(self.offsets, idx, side="right") - 1
        a0 = self.shards[0]["anchors"].shape[1]
        r0 = (self.shards[0]["rels"].shape[-1])
        anchors = np.empty((m, a0), np.int32)
        targets = np.empty(m, np.int32)
        negs = np.full((m, self.neg_width), -1, np.int32)
        hard = np.full((m, self.hard_neg_width), -1, np.int32)
        rels = np.empty((m, r0), np.int32)
        for s in np.unique(si):
            sel = si == s
            local = idx[sel] - self.offsets[s]
            sh = self.shards[s]
            anchors[sel] = sh["anchors"][local]
            targets[sel] = sh["targets"][local]
            negs[sel] = self._fit(np.asarray(sh["negs"][local], np.int32),
                                  self.neg_width)
            h = sh["hard_negs"]
            if h is None:
                hard[sel] = negs[sel][:, :self.hard_neg_width]
            else:
                hard[sel] = self._fit(np.asarray(h[local], np.int32),
                                      self.hard_neg_width)
            r = sh["rels"]
            rels[sel] = r[local] if r.ndim == 2 else r[None, :]
        return {"anchors": anchors, "target": targets, "negs": negs,
                "hard_negs": hard, "rels": rels}


_WINDOW_FIELDS = ("anchors", "rels", "inter_modes", "targets", "negs",
                  "neg_counts", "hard", "hard_counts")


class StreamWindow:
    """One structure's staged HBM window: DevicePool-shaped device arrays
    (training/device_data.py scan drivers consume it directly)."""

    def __init__(self, structure: str, arrays: dict):
        import jax.numpy as jnp

        self.structure = structure
        self.n = len(arrays["targets"])
        for f in _WINDOW_FIELDS:
            setattr(self, f, jnp.asarray(arrays[f]))


class WindowPacker:
    """Upload a whole window SET (all structures, all fields) as ONE host
    buffer + one H2D transfer, then carve device arrays with a single
    jitted program. Through a tunneled chip, per-array uploads are
    LATENCY-bound (~10 ms each x 8 fields x n_structures per swap —
    measured to dominate the stream wall), and per-slice device ops would
    trigger one compilation each; this costs one transfer at wire bandwidth
    plus one compile for the run (window shapes are fixed)."""

    def __init__(self):
        self._carve = None
        self._plan = None

    def pack(self, per_struct: dict[str, dict]) -> dict[str, StreamWindow]:
        import jax.numpy as jnp

        blobs, plan = [], []
        off = 0
        for s in sorted(per_struct):
            for f in _WINDOW_FIELDS:
                a = np.ascontiguousarray(np.asarray(per_struct[s][f],
                                                    np.int32))
                blobs.append(a.reshape(-1))
                plan.append((s, f, off, a.size, a.shape))
                off += a.size
        buf = np.concatenate(blobs)
        key = tuple((s, f, o, sz, shp) for s, f, o, sz, shp in plan)
        if self._plan != key:
            self._plan = key

            @jax.jit
            def carve(b):
                return [jnp.reshape(b[o:o + sz], shp)
                        for _, _, o, sz, shp in key]

            self._carve = carve
        parts = self._carve(jnp.asarray(buf))
        out: dict[str, StreamWindow] = {}
        for (s, f, *_), part in zip(plan, parts):
            w = out.get(s)
            if w is None:
                w = out[s] = StreamWindow.__new__(StreamWindow)
                w.structure = s
            setattr(w, f, part)
        for s, w in out.items():
            w.n = len(per_struct[s]["targets"])
        return out


def _window_arrays(batches: list[dict], structure: str, tmode) -> dict:
    """Stack grain batches into DevicePool-style SoA numpy arrays: -1 pads
    become (pool, count) pairs the in-scan negative draw consumes."""
    import numpy as np

    from graphqembed_tpu.config import INTERSECT_STRUCTURES

    cat = lambda k: np.concatenate([b[k] for b in batches])
    anchors = cat("anchors").astype(np.int32)
    targets = cat("target").astype(np.int32)
    rels = cat("rels").astype(np.int32)
    negs = cat("negs").astype(np.int32)
    hard = cat("hard_negs").astype(np.int32)
    if structure in INTERSECT_STRUCTURES:
        col = 0 if structure == "ip" else rels.shape[1] - 1
        inter_modes = tmode[rels[:, col]].astype(np.int32)
    else:
        inter_modes = np.full(len(rels), -1, np.int32)

    def pool(arr, fallback):
        counts = (arr >= 0).sum(axis=1).astype(np.int32)
        out = np.where(arr >= 0, arr, fallback[:, None])
        return out.astype(np.int32), np.maximum(counts, 1)

    # rows with an empty hard pool fall back to their plain pool (same
    # convention as DevicePool)
    none = (hard >= 0).sum(axis=1) == 0
    hard = np.where(none[:, None], negs[:, :hard.shape[1]], hard)
    negs, neg_counts = pool(negs, targets)
    hard, hard_counts = pool(hard, targets)
    return dict(anchors=anchors, rels=rels, inter_modes=inter_modes,
                targets=targets, negs=negs, neg_counts=neg_counts,
                hard=hard, hard_counts=hard_counts)


def run_train_stream(cfg, schema, params, data_dir, val_queries=None,
                     total_steps: int | None = None,
                     burn_in_steps: int | None = None, seed: int | None = None,
                     log=None,
                     ckpt_manager=None, ckpt_every: int = 0,
                     resume: bool = False, steps_per: int = 50,
                     optimizer=None, neighbor_tables=None):
    """Beyond-RAM training with WINDOWED HBM STAGING: grain streams on-disk
    npz query shards into fixed-size per-structure device windows
    (cfg.stream_window records each), the scan mega-step
    (training/device_data.py::make_scan_train_step) trains `steps_per` steps
    per dispatch on the CURRENT windows, and a host thread assembles +
    uploads the NEXT windows in parallel — so the chip never waits on
    per-batch host work. This replaced the one-jitted-step-per-batch stream
    (~3 orders of magnitude slower through a tunneled chip: every step paid
    a host sync).

    Schedule semantics: within a window, batch rows are drawn uniformly by
    the counter-based in-scan selector (a window is a shuffle buffer — each
    staged record is consumed ~cfg.stream_reuse times before the window
    swaps); multitask runs in ROUNDS over all structures (steps_per steps
    each, reference loss weights), and hard negatives alternate per-step
    inside the scan (_hard_step) — the device mega-step schedule at
    dispatch granularity. Convergence is checked on per-round mean losses,
    which are comparable across rounds (every round covers every
    structure).

    Checkpoint/resume stays exactly-once: meta saves the grain iterator
    states snapshotted BEFORE the current windows were drawn (so resume
    re-draws bit-identical windows and the stream position replays exactly),
    plus the host RNG state, window/dispatch counters, and convergence
    tails. Pinned by tests/test_grain_pipeline.py::
    test_run_train_stream_resume_bitwise and the SIGKILL matrix in
    test_fault_injection.py.

    bf16 storage is supported: pass optimizer=FusedAdamOpt(lr) (or leave
    None — default_optimizer(cfg) picks it for storage_dtype="bfloat16").

    Returns a training/loop.py::TrainResult."""
    import time
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import numpy as np

    from graphqembed_tpu.config import INTERSECT_STRUCTURES, STRUCTURES
    from graphqembed_tpu.training.device_data import (
        default_optimizer,
        make_scan_train_step,
    )
    from graphqembed_tpu.training.eval import eval_auc
    from graphqembed_tpu.training.loop import (
        TrainResult,
        check_conv,
        structure_weight,
    )

    seed = cfg.seed if seed is None else seed
    total_steps = total_steps if total_steps is not None else cfg.max_iter
    burn_in_steps = (burn_in_steps if burn_in_steps is not None
                     else cfg.max_burn_in)

    manifest = json.loads((Path(data_dir) / "manifest.json").read_text())
    counts: dict[str, int] = {}
    for e in manifest:
        counts[e["structure"]] = counts.get(e["structure"], 0) + e["count"]
    structures = [s for s in STRUCTURES if counts.get(s)]
    _attach_rel_ids(data_dir, schema)
    # window record count per structure: fixed across windows (no retrace)
    win_n = {s: min(cfg.stream_window,
                    max(counts[s], cfg.batch_size)) for s in structures}
    iters = {s: NpzStructureStream(data_dir, s, seed=seed)
             for s in structures}
    tmode = schema.rel_target_mode_ids()

    optimizer = optimizer or default_optimizer(cfg)
    opt_state = optimizer.init(params)
    # neighbor_tables threads the depth>0 SAGE encoder into the scan
    # (models/encoders.py) — same mechanism as the device pipeline
    scan = make_scan_train_step(cfg, optimizer,
                                neighbor_tables=neighbor_tables)
    master_key = jax.random.key(seed)

    def snapshot_iters() -> dict:
        return {s: it.get_state() for s, it in iters.items()}

    packer = WindowPacker()

    def build_windows() -> dict:
        return packer.pack({
            s: _window_arrays([iters[s].draw(win_n[s])], s, tmode)
            for s in structures})

    # steps each window serves before swapping: ~stream_reuse consumptions
    # of every staged record, rounded to dispatch boundaries
    total_win_records = sum(win_n.values())
    window_budget = max(steps_per, int(
        cfg.stream_reuse * total_win_records / cfg.batch_size))

    losses: dict[str, list[float]] = {s: [] for s in structures}
    burn_series: list[float] = []
    multi_series: list[float] = []
    val_history: list[tuple[int, float]] = []
    best_val = -1.0
    # a COPY: params is donated to the first dispatch, and checkpoints save
    # best_params before any eval has replaced it
    best_params = jax.tree.map(lambda x: x.copy(), params)
    burn_done = 0
    multitask = "1p" not in iters
    step_i = 0
    dispatch_i = 0
    window_done = 0      # steps trained on the current windows
    last_ckpt = 0
    iter_snapshot = snapshot_iters()  # state BEFORE current windows drawn
    t_train = 0.0

    if resume and ckpt_manager is not None:
        restored = ckpt_manager.restore_latest(
            like={"params": params, "opt_state": opt_state,
                  "best_params": params})
        if restored is not None:
            state, meta = restored
            params = state["params"]
            opt_state = state["opt_state"]
            best_params = state["best_params"]
            step_i = last_ckpt = int(meta["step"])
            dispatch_i = int(meta["dispatch_i"])
            window_done = int(meta["window_done"])
            burn_done = int(meta["burn_done"])
            multitask = (bool(meta["multitask"])
                         or burn_done >= burn_in_steps)
            best_val = float(meta["best_val"])
            burn_series = list(meta.get("burn_tail", []))
            multi_series = list(meta.get("multi_tail", []))
            iter_snapshot = dict(meta["iter_states"])
            for name, st in iter_snapshot.items():
                iters[name].set_state(st)

    # draw the current windows (resume re-draws the identical ones: the
    # snapshot above restored the pre-draw iterator states)
    windows = build_windows()
    ex = ThreadPoolExecutor(1)
    next_snapshot = snapshot_iters()
    next_future = ex.submit(build_windows)

    def maybe_ckpt():
        nonlocal last_ckpt
        if ckpt_manager is None or not ckpt_every or \
                step_i - last_ckpt < ckpt_every:
            return
        ckpt_manager.save_state(
            step_i,
            {"params": params, "opt_state": opt_state,
             "best_params": best_params},
            extra={
                "dispatch_i": dispatch_i, "window_done": window_done,
                "burn_done": burn_done, "multitask": multitask,
                "best_val": best_val,
                "burn_tail": burn_series[-cfg.conv_window:],
                "multi_tail": multi_series[-cfg.conv_window:],
                "iter_states": iter_snapshot,
            })
        last_ckpt = step_i

    burn_w = max(1, round(cfg.conv_window / steps_per))
    multi_w = max(1, round(cfg.conv_window / (len(structures) * steps_per)))
    eval_every_d = max(1, round(cfg.val_every / steps_per))
    # bounded async horizon: losses drain at sync points rather than per
    # scan call, but the queue is kept SHALLOW — measured on the tunneled
    # chip, letting many dispatches accumulate and fetching a value late
    # stalls pathologically (60s+ for work that streams in 12s when
    # drained every round), so the default horizon is one round / a couple
    # of burn dispatches
    sync_every = max(1, cfg.stream_sync_every_burn)
    pending = []   # (phase, round_id, structure, t, device_loss)
    round_i = 0
    t_loop0 = time.perf_counter()

    def dispatch_async(structure, params, opt_state, t, phase):
        nonlocal dispatch_i, step_i, window_done
        use_hard = (structure in INTERSECT_STRUCTURES
                    and cfg.hard_neg_alternate)
        params, opt_state, mloss = scan(
            params, opt_state, windows[structure], structure,
            jax.random.fold_in(master_key, dispatch_i), t,
            np.float32(structure_weight(cfg, structure)), use_hard)
        pending.append((phase, round_i, structure, t, mloss))
        dispatch_i += 1
        step_i += t
        window_done += t
        return params, opt_state

    def flush():
        """Drain pending losses (ONE device sync for the whole backlog) into
        the per-structure series; multitask entries aggregate to per-round
        means."""
        if not pending:
            return
        by_round: dict[int, list] = {}
        for phase, ri, structure, t, mloss in pending:
            v = float(mloss)
            losses[structure].append(v)
            if phase == "burn":
                burn_series.append(v)
            else:
                by_round.setdefault(ri, []).append(v)
        pending.clear()
        for ri in sorted(by_round):
            multi_series.append(float(np.mean(by_round[ri])))

    def maybe_ckpt_now():
        if ckpt_manager is not None and ckpt_every and \
                step_i - last_ckpt >= ckpt_every:
            maybe_ckpt()

    def do_eval(params):
        nonlocal best_val, best_params, val_queries
        from graphqembed_tpu.training.loop import resolve_queries
        val_queries = resolve_queries(val_queries)
        aucs = eval_auc(cfg, params, schema, val_queries, seed=cfg.seed,
                        neighbor_tables=neighbor_tables)
        macro = aucs.get("macro", 0.0)
        val_history.append((step_i, macro))
        if macro > best_val:
            best_val = macro
            best_params = jax.tree.map(lambda x: x.copy(), params)

    def sync_point(params, eval_due=False):
        flush()
        if val_queries and eval_due:
            do_eval(params)
        maybe_ckpt_now()
        if log:
            log(step_i, "stream", multi_series[-1] if multi_series
                else (burn_series[-1] if burn_series else 0.0))

    def swap_windows():
        nonlocal windows, iter_snapshot, next_snapshot, next_future, \
            window_done
        windows = next_future.result()
        iter_snapshot = next_snapshot
        next_snapshot = snapshot_iters()
        next_future = ex.submit(build_windows)
        window_done = 0

    try:
        # --- burn-in: 1p only, async dispatches, sync on cadence ---
        last_sync_d = 0
        while not multitask and step_i < total_steps:
            if window_done >= window_budget:
                swap_windows()   # sync-free: losses drain on their own cadence
            t = max(1, min(steps_per, total_steps - step_i,
                           burn_in_steps - step_i))
            params, opt_state = dispatch_async("1p", params, opt_state, t,
                                               "burn")
            burn_done += t
            if burn_done >= burn_in_steps:
                multitask = True
            eval_due = bool(val_queries) and dispatch_i % eval_every_d == 0
            if (eval_due or dispatch_i - last_sync_d >= sync_every
                    or multitask
                    or (ckpt_manager is not None and ckpt_every
                        and step_i - last_ckpt >= ckpt_every)):
                # flip-before-ckpt: a checkpoint at the burn-in boundary
                # must record the post-boundary phase
                sync_point(params, eval_due=eval_due)
                last_sync_d = dispatch_i
                if check_conv(burn_series, burn_w, cfg.tol):
                    multitask = True
        # --- multitask ROUNDS over all structures (device-mega schedule;
        # per-round means are comparable, so convergence is meaningful);
        # sync points land at round boundaries only ---
        last_sync_r = 0
        sync_every_r = max(1, cfg.stream_sync_every_round)
        eval_every_r = max(1, round(cfg.val_every
                                    / (len(structures) * steps_per)))
        while step_i < total_steps:
            if window_done >= window_budget:
                swap_windows()   # sync-free
            for structure in structures:
                if step_i >= total_steps:
                    break
                t = max(1, min(steps_per, total_steps - step_i))
                params, opt_state = dispatch_async(structure, params,
                                                   opt_state, t, "multi")
            round_i += 1
            eval_due = bool(val_queries) and round_i % eval_every_r == 0
            if (eval_due or round_i - last_sync_r >= sync_every_r
                    or step_i >= total_steps
                    or (ckpt_manager is not None and ckpt_every
                        and step_i - last_ckpt >= ckpt_every)):
                sync_point(params, eval_due=eval_due)
                last_sync_r = round_i
                if check_conv(multi_series, multi_w, cfg.tol):
                    break
        flush()
        if val_queries and not val_history:
            do_eval(params)
    finally:
        ex.shutdown(wait=False, cancel_futures=True)
    t_train = time.perf_counter() - t_loop0
    if best_val < 0:
        best_params = params
    return TrainResult(
        params=params, best_params=best_params, best_val_auc=best_val,
        steps=step_i, burn_in_steps=burn_done, losses=losses,
        val_history=val_history,
        queries_per_sec=step_i * cfg.batch_size / max(t_train, 1e-9))
