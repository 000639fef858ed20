"""Sweep cfg.hard_neg_frac at mid scale to pick the paper-scale value
(VERDICT r2 item 1: raise paper-scale hard-negative AUC above 0.683 or show
it is the ceiling).

Runs experiments/paperscale.py at a mid-size config (same recipe: all-edges
1p + array fast path, same schedule shape) for each hard_frac, collects val
plain/hard macro AUC, writes RESULTS_hardneg_sweep.{md,json}. The winner
(highest hard macro subject to plain macro within ~0.01 of the best) is the
value the full paper-scale run uses.

Run on the TPU chip:  python experiments/hardneg_sweep.py
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

INTER = ("2i", "3i", "ip", "pi")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fracs", type=float, nargs="+",
                    default=[0.5, 0.75, 1.0])
    ap.add_argument("--scale", type=float, default=8.0)
    ap.add_argument("--n_inter", type=int, default=8000)
    ap.add_argument("--n_val", type=int, default=300)
    ap.add_argument("--steps", type=int, default=40000)
    ap.add_argument("--burn_in", type=int, default=10000)
    args = ap.parse_args()

    rows = []
    for frac in args.fracs:
        out = Path(f"/tmp/hardneg_sweep_{frac}.md")
        cmd = [sys.executable, str(ROOT / "experiments/paperscale.py"),
               "--scale", str(args.scale), "--n_inter", str(args.n_inter),
               "--n_val", str(args.n_val), "--n_test", "50",
               "--steps", str(args.steps), "--burn_in", str(args.burn_in),
               "--hard_frac", str(frac), "--out", str(out)]
        print("RUN", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=ROOT)
        rep = json.loads(out.with_suffix(".json").read_text())
        hard = rep["val_auc_hard"]
        rows.append({
            "hard_frac": frac,
            "val_macro": rep["val_auc"]["macro"],
            "hard_macro": round(
                sum(hard[s] for s in INTER) / len(INTER), 4),
            "hard_per_structure": {s: hard[s] for s in INTER},
            "clean_macro": rep["clean_test_auc"]["macro"],
            "wall_s": rep["wall_s"],
        })
        print(json.dumps(rows[-1]), flush=True)

    # winner: best hard macro among configs whose plain macro is within
    # 0.01 of the best plain macro
    best_plain = max(r["val_macro"] for r in rows)
    ok = [r for r in rows if r["val_macro"] >= best_plain - 0.01]
    winner = max(ok, key=lambda r: r["hard_macro"])

    md_rows = "\n".join(
        f"| {r['hard_frac']} | {r['val_macro']:.3f} | {r['hard_macro']:.3f} "
        f"| " + " ".join(f"{s}={r['hard_per_structure'][s]:.3f}"
                         for s in INTER)
        + f" | {r['clean_macro']:.3f} |"
        for r in rows)
    md = f"""# hard_neg_frac sweep (mid scale, TPU v5e)

Picks the paper-scale `hard_neg_frac` (fraction of intersection-structure
steps drawing HARD negatives; 0.5 = the reference's strict alternation).
Same recipe as `experiments/paperscale.py` at scale={args.scale}
(~{args.n_inter} queries/structure, {args.steps} steps, all-edges 1p pool).

| hard_frac | val macro AUC | val hard macro (i-structs) | per structure | clean macro |
|---|---|---|---|---|
{md_rows}

Winner: **hard_frac={winner['hard_frac']}** (best hard macro among configs
with plain macro within 0.01 of the best) — used by the full paper-scale
runs (RESULTS_bio_paperscale.md / RESULTS_reddit_paperscale.md).

Raw JSON: `RESULTS_hardneg_sweep.json`.
"""
    (ROOT / "RESULTS_hardneg_sweep.md").write_text(md)
    (ROOT / "RESULTS_hardneg_sweep.json").write_text(
        json.dumps({"rows": rows, "winner": winner}, indent=2))
    print("winner:", json.dumps(winner))


if __name__ == "__main__":
    main()
