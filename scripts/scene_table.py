"""Render the per-scene benchmark table from trained-run artifacts.

Scans runs/synth_<scene>/ (or results/synth_<scene>/) for the
reference-format summary files written by cli/test_ransac.py and prints
the markdown table BASELINE.md's per-scene section uses (the 7-Scenes
paper's format: accuracy@5cm5deg + median rot/trans per scene).

Usage: python scripts/scene_table.py [scene ...]
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCENES = sys.argv[1:] or ["gen_fast", "repeat", "bare", "noisy",
                          "clutter"]
LABEL = {"gen_fast": "room (rounds 1-3 benchmark)"}


def read_summary(path: Path):
    if not path.exists():
        return None
    # accuracy meanLoss sdLoss meanEntropy sdEntropy medianRot medianTrans
    vals = path.read_text().split()
    return {"acc": float(vals[0]), "med_rot": float(vals[5]),
            "med_trans_cm": float(vals[6])}


def main():
    rows = []
    for scene in SCENES:
        for root in (REPO / "runs", REPO / "results"):
            d = root / f"synth_{scene}"
            e2e = read_summary(
                d / "ransac_summary_dsac_dense_obj_model_endtoend_rdraw0.txt")
            init = read_summary(
                d / "ransac_summary_dsac_dense_obj_model_init_rdraw0.txt")
            if e2e or init:
                rows.append((scene, init, e2e))
                break
        else:
            rows.append((scene, None, None))

    fmt = lambda r: (f"{r['acc'] * 100:.1f}% / {r['med_rot']:.2f}° / "
                     f"{r['med_trans_cm']:.2f} cm" if r else "—")
    print("| Scene archetype | pretrain-only (init) | end-to-end DSAC |")
    print("|---|---|---|")
    for scene, init, e2e in rows:
        print(f"| {LABEL.get(scene, scene)} | {fmt(init)} | {fmt(e2e)} |")


if __name__ == "__main__":
    main()
