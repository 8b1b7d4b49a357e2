"""Export the procedural scene as a 7-Scenes-layout dataset on disk.

Writes the exact folder convention the reference's link_7scenes.py
produces (core/dataset.h:290-296) — rgb_noseg/ depth_noseg/ poses/ under
training/<name>/ and test/<name>/, plus scene-level translation.txt,
sensorTrans.dat and default.config — so every CLI program can be driven
through the real `--data` disk path (native PNG decode, pose parsing
with the translation offset and frame correction, depth->GT-coords) on a
box with no dataset egress.  Also doubles as a ready-made demo dataset.

Poses are written in the 7-Scenes camera-to-world text convention via
write_pose_file (the inverse of read_data.cpp:69-133), with a non-zero
scene-centering offset so that path is exercised too.  Depth is exported
RGB-registered, so default.config sets `rd 0` (no re-registration) and
the synthetic camera intrinsics (f=525, 640x480).

Usage:
    python -m dsac_tpu.cli.export_synthetic --out scene_dir \\
        [--train-frames 48] [--test-frames 16] [--name synth]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np

from dsac_tpu.config import DataConfig
from dsac_tpu.data.seven_scenes import write_pose_file, write_sensor_trans
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.utils.logging import blue, green

TRANSLATION_M = np.asarray([1.5, 0.7, 2.1])


def export_split(scene: SyntheticScene, root: Path, n: int, seed: int,
                 translation_m: np.ndarray) -> None:
    """Render n frames (SyntheticSource's key schedule: seed*100003 + i)
    and write them as PNG/PNG/txt triplets."""
    from PIL import Image

    for sub in ("rgb_noseg", "depth_noseg", "poses"):
        (root / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        pose, rgb, depth, _ = scene.frame(jax.random.PRNGKey(
            seed * 100003 + i))
        rgb_u8 = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
        depth_u16 = np.clip(np.asarray(depth), 0, 65535).astype(np.uint16)
        Image.fromarray(rgb_u8).save(root / "rgb_noseg"
                                     / f"frame-{i:06d}.png")
        Image.fromarray(depth_u16.astype(np.int32), mode="I").convert(
            "I;16").save(root / "depth_noseg" / f"frame-{i:06d}.png")
        write_pose_file(root / "poses" / f"frame-{i:06d}.txt",
                        np.asarray(pose.R), np.asarray(pose.t),
                        translation_m)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True,
                   help="scene directory to create")
    p.add_argument("--name", type=str, default="synth",
                   help="dataset name under training/ and test/")
    p.add_argument("--train-frames", type=int, default=48)
    p.add_argument("--test-frames", type=int, default=16)
    p.add_argument("--train-seed", type=int, default=3,
                   help="viewpoint-set key (SyntheticSource semantics)")
    p.add_argument("--test-seed", type=int, default=99,
                   help="disjoint viewpoint set for the test split")
    args = p.parse_args(argv)

    scene = SyntheticScene()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # scene-level metadata (shipped per scene in the reference's tarball)
    (out / "translation.txt").write_text(
        " ".join(f"{v}" for v in TRANSLATION_M) + "\n")
    write_sensor_trans(out / "sensorTrans.dat", np.eye(4))
    d = DataConfig()
    (out / "default.config").write_text(
        "# synthetic scene exported by dsac_tpu.cli.export_synthetic\n"
        f"fl {d.focal_length:g}\n"
        f"iw {d.image_width}\nih {d.image_height}\n"
        "rd 0\n")  # depth is exported RGB-registered

    print(blue(f"Exporting {args.train_frames} training / "
               f"{args.test_frames} test frames to {out}"))
    export_split(scene, out / "training" / args.name, args.train_frames,
                 args.train_seed, TRANSLATION_M)
    export_split(scene, out / "test" / args.name, args.test_frames,
                 args.test_seed, TRANSLATION_M)
    print(green(f"Done. Train with e.g.\n"
                f"  python -m dsac_tpu.cli.train_obj "
                f"--data {out}/training/{args.name} -c {out}/default.config"
                f" --out runs/{args.name}"))


if __name__ == "__main__":
    main()
