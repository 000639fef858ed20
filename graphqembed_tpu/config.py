"""Single frozen config for a run (SURVEY.md §6 "Config / flag system").

The reference scattered hyperparameters across per-script argparse flags
[R: netquery/bio/train.py (conf=H)]; here one dataclass is the source of truth,
serialized into the run directory so every run is reproducible from its config.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Any

# The 7 conjunctive query structures, modern names (BASELINE.json "configs").
# Reference names [R: netquery/graph.py (conf=H)]:
#   1-chain→1p, 2-chain→2p, 3-chain→3p, 2-inter→2i, 3-inter→3i,
#   3-inter_chain→pi, 3-chain_inter→ip  (SURVEY.md §2.2).
STRUCTURES = ("1p", "2p", "3p", "2i", "3i", "ip", "pi")
PATH_STRUCTURES = ("1p", "2p", "3p")
INTERSECT_STRUCTURES = ("2i", "3i", "ip", "pi")  # structures with an intersection node

PROJECTION_KINDS = ("transe", "distmult", "bilinear")
INTERSECTION_KINDS = ("min", "mean")
SCORING_KINDS = ("cosine", "dot", "l2")  # edge-scoring decoder family

# Measured production recommendation for payload-bound meshes
# (experiments/gather_waste.py, docs/DESIGN.md §4 addendum): capacity factor
# 2.0 keeps owner-compute gather drops at ~0.03% for QUERY-id traffic
# (anchors/targets/negatives, hub-skewed) while cutting the all-to-all
# payload ~4x vs the exact worst case. SCOPE LIMIT, measured in
# tests/test_sharded_deep.py::test_recommended_capacity_factor: depth>0
# NEIGHBOR traffic is mode-clustered (whole modes land on few shards when
# N/shard is small), which is structurally more skewed — there factor 4.0
# is the recommendation (still halves the worst-case payload; bit-exact in
# the test's deep path). The CONFIG DEFAULT stays exact
# (gather_capacity_factor=0.0 — zero drops under any skew).
RECOMMENDED_GATHER_CAPACITY_FACTOR = 2.0
RECOMMENDED_GATHER_CAPACITY_FACTOR_DEEP = 4.0



@dataclasses.dataclass(frozen=True)
class GQEConfig:
    # --- model (SURVEY.md §2.3) ---
    embed_dim: int = 128
    projection: str = "bilinear"     # --decoder in the reference
    intersection: str = "min"        # SetIntersection aggregation Φ
    scoring: str = "cosine"          # edge score: cosine | dot | -L2 distance
    learned_intersection: bool = True  # SetIntersection vs SimpleSetIntersection
    depth: int = 0                   # 0 = DirectEncoder; >0 = SAGE-style deep encoder
    aggregator: str = "mean"         # deep-encoder neighbor aggregator: mean | pool
    compute_dtype: str = "float32"   # "bfloat16" for perf runs; fp32 for parity
    # Storage precision for the [N, d] node table AND its Adam moments —
    # the dominant HBM traffic of the dense train step (docs/DESIGN.md §10:
    # the step runs AT the roofline of its table traffic; halving table bytes
    # is the identified next lever). "bfloat16" halves those bytes; updates
    # are written with STOCHASTIC ROUNDING (ops/fused_adam.py) because
    # round-to-nearest bf16 stalls the Adam moments ((1-β2)·g² vanishes below
    # bf16's 8-bit mantissa). Operator parameters (proj/inter) stay fp32 —
    # they are KBs and not a traffic term. Quality delta: RESULTS_bf16.md.
    storage_dtype: str = "float32"   # "bfloat16" = bf16 table + moments (SR)

    # --- training protocol (SURVEY.md §2.5) ---
    lr: float = 0.01
    batch_size: int = 512
    max_iter: int = 100_000_000
    max_burn_in: int = 1_000_000
    val_every: int = 5000
    tol: float = 1e-6                # convergence tolerance for check_conv
    conv_window: int = 100           # window of recent losses for convergence
    margin: float = 1.0
    path_weight: float = 0.01        # loss weight for 2p/3p batches
    inter_weight: float = 0.005      # loss weight for 2i/3i/ip/pi batches
    hard_neg_alternate: bool = True  # alternate plain/hard negatives for i-structures
    # Fraction of intersection-structure steps drawing the negative from the
    # HARD pool (device pipelines). 0.5 (default) = the reference's strict
    # step-parity alternation, bit-preserved; other values generalize the
    # schedule (1.0 = every step hard, 0.75 = 3-in-4, ...) — a tuning
    # extension beyond reference semantics for attacking hard-negative AUC
    # at paper scale (RESULTS_bio_paperscale.md). Host loop and oracle keep
    # strict alternation (the parity protocol).
    hard_neg_frac: float = 0.5
    # Anchor/target distribution of the ON-DEVICE (onthefly) sampler's edge
    # picks (training/device_sampler.py::_pick_edges):
    #   "rel":  (DEFAULT) relation-uniform FIRST, then node-uniform within
    #           the relation, for the anchor pick AND hops AND in-branches
    #           — the OFFLINE sampler's protocol (native/sampler.cpp picks
    #           relations uniformly before nodes), which the eval sets are
    #           drawn from. Paper-scale flagship (r05): val 0.8801 / hard
    #           0.7421 / clean 0.757 — above the r04 sampler on every axis
    #           (RESULTS_onthefly_paperscale.md). Edge-frequency-weighted
    #           hops instead starve rare-relation chains (2p −0.10 /
    #           3p −0.14 val).
    #   "node": uniform node (with >=1 out-edge) then uniform out-edge —
    #           oversamples tail nodes; best val at MID-scale
    #           (RESULTS_onthefly_quality.md);
    #   "edge": exactly edge-uniform (the pool/1p protocol distribution).
    # All are rejection-free one/two-randint picks on the flat CSR.
    onthefly_anchor_dist: str = "rel"
    seed: int = 0

    # --- eval (SURVEY.md §2.6) ---
    eval_batch_size: int = 1024
    max_eval_negs: int = 512         # padding cap for full_neg APR eval

    # --- stream pipeline (data/grain_pipeline.py windowed HBM staging) ---
    # Records per structure staged into each HBM window (clamped to the
    # dataset size). Bigger windows = better shuffle locality + fewer
    # host/device round trips, more HBM.
    stream_window: int = 65536
    # Train steps per window = reuse * (window records / batch_size): how
    # many times each staged record is expected to be consumed before the
    # window is swapped. >1 trades strict single-visit streaming for
    # throughput when the host stream is slower than the chip (the usual
    # beyond-RAM case); the grain iterator still advances exactly once per
    # staged record, so resume stays exactly-once. DEFAULT 2.0, set by the
    # r05 matched-budget quality guard (RESULTS_stream_quality.md): at a
    # fixed step budget, reuse throttles how much distinct data the run
    # sees — mid-scale val macro AUC vs the in-RAM device pipeline was
    # -0.005 at reuse 2 but -0.032 at the old default 4 and -0.081 at 8.
    # Raise it only when the host stream genuinely starves the chip, and
    # expect the measured quality cost.
    stream_reuse: float = 2.0
    # Host-sync cadence of the stream loop, in burn-in dispatches /
    # multitask rounds respectively: how much async dispatch depth to allow
    # before fetching a loss value. The defaults encode the TUNNELED-chip
    # measurement (grain_pipeline.py: letting many dispatches accumulate
    # then fetching late stalls pathologically, 60s+ for 12s of work); on a
    # locally attached chip a deeper horizon may overlap more host window
    # assembly — these knobs make that measurable instead of hard-coded
    # (VERDICT r04 weak #5).
    stream_sync_every_burn: int = 2
    stream_sync_every_round: int = 1

    # --- parallel (SURVEY.md §3 parallelism inventory) ---
    mesh_shape: tuple[int, ...] = (1,)
    mesh_axes: tuple[str, ...] = ("data",)
    shard_table: bool = True         # row-shard the packed embedding table
    # Owner-compute gather capacity (parallel/gather.py): <= 0 = exact
    # worst-case capacity C=B (no drops under any ownership skew); > 0 =
    # capacity-bounded all_to_all with C = ceil(B/D * factor) — payload
    # shrinks ~D/factor-fold at near-uniform ownership, hotspot overflow
    # rows are dropped (observable via sharded_gather_with_overflow).
    # Threads into parallel/deep.py's sharded SAGE gathers.
    gather_capacity_factor: float = 0.0

    # --- kernels ---
    # Gates ONLY the per-formula intersect() path (models/gqe.py::intersect);
    # the production rows paths and device pipelines use XLA fusion, which the
    # speed-of-light audit (docs/DESIGN.md §3) found at-roofline for these
    # shapes. The fused Adam kernel is selected by the optimizer
    # (FusedAdamOpt), not by this flag.
    use_pallas: bool = False
    # Opt-in: update the bf16 table from ROW gradients via the sparse-grad
    # dense-Adam SR kernel (ops/fused_adam.py::fused_adam_table_sorted_rows_sr)
    # instead of materializing the [N, d] cotangent. Measured on v5e at
    # N=35k/B=512/3i it LOSES to the dense sorted-scatter path (~99 µs
    # kernel + ~38 µs presort vs ~63 µs scatter chain + 51 µs dense kernel
    # in-context — docs/DESIGN.md §12), so it is off by default; kept as a
    # capability for regimes where the dense sweep dominates (very large N).
    rows_grad_update: bool = False

    def __post_init__(self):
        assert self.projection in PROJECTION_KINDS, self.projection
        assert self.intersection in INTERSECTION_KINDS, self.intersection
        assert self.scoring in SCORING_KINDS, self.scoring
        assert self.aggregator in ("mean", "pool"), self.aggregator
        assert 0 <= self.depth <= 2, self.depth
        assert self.compute_dtype in ("float32", "bfloat16")
        assert self.storage_dtype in ("float32", "bfloat16")
        assert 0.0 <= self.hard_neg_frac <= 1.0, self.hard_neg_frac
        assert self.onthefly_anchor_dist in ("node", "edge", "rel"), \
            self.onthefly_anchor_dist

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "GQEConfig":
        d: dict[str, Any] = json.loads(s)
        for k in ("mesh_shape", "mesh_axes"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)

    def run_hash(self) -> str:
        return hashlib.sha256(self.to_json().encode()).hexdigest()[:12]
