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
