"""Dataset preparation: raw 7-Scenes download -> framework folder layout.

Replaces link_7scenes.py/link_all.sh of the reference: symlinks
seq-XX/frame-XXXXXX.{color.png,depth.png,pose.txt} into
{training|test}/<scene>/{rgb_noseg,depth_noseg,poses}/ according to the
scene's TrainSplit.txt / TestSplit.txt (reference layout
link_7scenes.py:49-125).
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

SCENES = ["chess", "fire", "heads", "office", "pumpkin", "redkitchen",
          "stairs"]


def read_split(path: Path) -> list[int]:
    seqs = []
    for line in path.read_text().split():
        line = line.strip()
        if not line:
            continue
        seqs.append(int(line.lower().replace("sequence", "")))
    return seqs


def link_scene(raw_scene: Path, out_scene: Path):
    for split_file, split_name in [("TrainSplit.txt", "training"),
                                   ("TestSplit.txt", "test")]:
        seqs = read_split(raw_scene / split_file)
        out = out_scene / split_name / raw_scene.name
        for sub in ["rgb_noseg", "depth_noseg", "poses"]:
            (out / sub).mkdir(parents=True, exist_ok=True)
        for seq in seqs:
            seq_dir = raw_scene / f"seq-{seq:02d}"
            for frame in sorted(seq_dir.glob("*.color.png")):
                stem = frame.name.replace(".color.png", "")
                prefix = f"seq{seq:02d}_{stem}"
                for src_suffix, sub, dst_suffix in [
                        (".color.png", "rgb_noseg", ".png"),
                        (".depth.png", "depth_noseg", ".png"),
                        (".pose.txt", "poses", ".txt")]:
                    src = seq_dir / f"{stem}{src_suffix}"
                    dst = out / sub / f"{prefix}{dst_suffix}"
                    if src.exists() and not dst.exists():
                        os.symlink(src.resolve(), dst)
        print(f"linked {raw_scene.name}/{split_name}: "
              f"{len(list((out / 'rgb_noseg').iterdir()))} frames")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("raw", help="directory containing the extracted "
                               "7-Scenes scene folders")
    p.add_argument("out", help="output dataset root")
    p.add_argument("--scenes", nargs="*", default=SCENES)
    args = p.parse_args(argv)
    for scene in args.scenes:
        raw_scene = Path(args.raw) / scene
        if not raw_scene.exists():
            print(f"skipping {scene}: {raw_scene} not found")
            continue
        link_scene(raw_scene, Path(args.out))


if __name__ == "__main__":
    main()
