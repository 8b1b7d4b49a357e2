"""Native IO + 7-Scenes-layout dataset tests.

A miniature dataset is synthesised on disk (PIL writes the PNGs; the
native C++ library decodes them back) from the procedural scene, so the
whole disk path — PNG decode, threaded prefetch, pose parsing with
translation offset and frame correction, depth->coords GT generation —
is exercised hermetically.
"""

import struct
from pathlib import Path

import jax
import numpy as np
import pytest
from PIL import Image

from dsac_tpu.config import DataConfig
from dsac_tpu.data.seven_scenes import (SevenScenesDataset, parse_pose_file,
                                        read_sensor_trans, read_translation,
                                        write_pose_file, write_sensor_trans)
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.utils import native_io

SCENE = SyntheticScene()


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene") / "training" / "mini"
    (root / "rgb_noseg").mkdir(parents=True)
    (root / "depth_noseg").mkdir()
    (root / "poses").mkdir()

    translation = np.asarray([1.5, 0.7, 2.1])
    (root.parent.parent / "translation.txt").write_text(
        " ".join(map(str, translation)) + "\n")

    frames = []
    for i in range(3):
        pose, rgb, depth, coords = SCENE.frame(jax.random.PRNGKey(i))
        rgb_u8 = np.asarray(rgb, np.float32).astype(np.uint8)
        depth_u16 = np.asarray(depth).astype(np.uint16)
        Image.fromarray(rgb_u8).save(root / "rgb_noseg" / f"frame-{i:06d}.png")
        Image.fromarray(depth_u16.astype(np.int32), mode="I").convert(
            "I;16").save(root / "depth_noseg" / f"frame-{i:06d}.png")
        write_pose_file(root / "poses" / f"frame-{i:06d}.txt",
                        np.asarray(pose.R), np.asarray(pose.t), translation)
        frames.append((np.asarray(pose.R), np.asarray(pose.t), rgb_u8,
                       depth_u16, np.asarray(coords)))
    return root, frames


class TestNativeDecode:
    def test_rgb_roundtrip(self, mini_dataset):
        root, frames = mini_dataset
        path = str(root / "rgb_noseg" / "frame-000000.png")
        w, h, c, b = native_io.png_size(path)
        assert (w, h) == (640, 480)
        img = native_io.read_rgb(path, 640, 480)
        np.testing.assert_array_equal(img, frames[0][2])

    def test_depth16_roundtrip(self, mini_dataset):
        root, frames = mini_dataset
        path = str(root / "depth_noseg" / "frame-000001.png")
        depth = native_io.read_depth16(path, 640, 480)
        np.testing.assert_array_equal(depth, frames[1][3])

    def test_prefetch_loader_order_and_contents(self, mini_dataset):
        root, frames = mini_dataset
        rgbs = sorted(str(p) for p in (root / "rgb_noseg").glob("*.png"))
        depths = sorted(str(p) for p in (root / "depth_noseg").glob("*.png"))
        seq = [2, 0, 1, 2]
        loader = native_io.PrefetchLoader(rgbs, depths, seq, 640, 480,
                                          n_threads=2, capacity=2)
        got = []
        for idx, rgb, depth in loader:
            got.append(idx)
            np.testing.assert_array_equal(rgb, frames[idx][2])
            np.testing.assert_array_equal(depth, frames[idx][3])
        assert got == seq
        loader.close()


class TestPoseParsing:
    def test_roundtrip(self, mini_dataset):
        root, frames = mini_dataset
        translation = read_translation(root.parent.parent / "translation.txt")
        R, t_m = parse_pose_file(root / "poses" / "frame-000000.txt",
                                 translation)
        np.testing.assert_allclose(R, frames[0][0], atol=1e-5)
        np.testing.assert_allclose(t_m * 1000.0, frames[0][1], atol=0.5)

    def test_sensor_trans_reader(self, tmp_path):
        m = np.arange(16, dtype=np.float64).reshape(4, 4)
        raw = struct.pack("<ii", 4, 4) + m.tobytes()
        p = tmp_path / "sensorTrans.dat"
        p.write_bytes(raw)
        out = read_sensor_trans(p)
        np.testing.assert_array_equal(out, m)

    def test_sensor_trans_writer_roundtrip(self, tmp_path):
        m = np.linalg.inv(np.eye(4) + 0.01 * np.arange(16).reshape(4, 4))
        p = tmp_path / "sensorTrans.dat"
        write_sensor_trans(p, m)
        np.testing.assert_array_equal(read_sensor_trans(p), m)


class TestLink7Scenes:
    """link_7scenes on a synthetic raw 7-Scenes tree (VERDICT r4 #5).

    Builds the raw layout the real download has —
    seq-XX/frame-XXXXXX.{color.png,depth.png,pose.txt} plus
    TrainSplit.txt/TestSplit.txt — links it with cli/link_7scenes
    (reference link_7scenes.py:49-125), then drives the linked tree
    through SevenScenesDataset and a full DSAC serve of one frame.
    """

    @pytest.fixture(scope="class")
    def linked(self, tmp_path_factory):
        from dsac_tpu.cli import link_7scenes

        base = tmp_path_factory.mktemp("raw7")
        raw_scene = base / "raw" / "mini7"
        translation = np.asarray([0.9, -0.4, 1.3])
        frames = {}
        for seq in (1, 2):
            seq_dir = raw_scene / f"seq-{seq:02d}"
            seq_dir.mkdir(parents=True)
            for i in range(2):
                pose, rgb, depth, coords = SCENE.frame(
                    jax.random.PRNGKey(10 * seq + i))
                rgb_u8 = np.asarray(rgb, np.float32).astype(np.uint8)
                depth_u16 = np.asarray(depth).astype(np.uint16)
                stem = seq_dir / f"frame-{i:06d}"
                Image.fromarray(rgb_u8).save(f"{stem}.color.png")
                Image.fromarray(depth_u16.astype(np.int32), mode="I").convert(
                    "I;16").save(f"{stem}.depth.png")
                write_pose_file(f"{stem}.pose.txt", np.asarray(pose.R),
                                np.asarray(pose.t), translation)
                frames[(seq, i)] = (np.asarray(pose.R), np.asarray(pose.t),
                                    rgb_u8, depth_u16, np.asarray(coords))
        (raw_scene / "TrainSplit.txt").write_text("sequence1\n")
        (raw_scene / "TestSplit.txt").write_text("sequence2\n")

        out = base / "linked"
        link_7scenes.main([str(base / "raw"), str(out),
                           "--scenes", "mini7", "absent_scene"])
        (out / "translation.txt").write_text(
            " ".join(map(str, translation)) + "\n")
        return out, frames

    def test_split_layout_and_counts(self, linked):
        out, _frames = linked
        for split, seq in [("training", 1), ("test", 2)]:
            root = out / split / "mini7"
            for sub, suffix in [("rgb_noseg", ".png"),
                                ("depth_noseg", ".png"), ("poses", ".txt")]:
                files = sorted((root / sub).iterdir())
                assert [f.name for f in files] == [
                    f"seq{seq:02d}_frame-{i:06d}{suffix}" for i in range(2)]
                assert all(f.is_symlink() for f in files)

    def test_relink_is_idempotent(self, linked):
        from dsac_tpu.cli import link_7scenes

        out, _frames = linked
        link_7scenes.link_scene(out.parent / "raw" / "mini7", out)
        files = list((out / "training" / "mini7" / "rgb_noseg").iterdir())
        assert len(files) == 2

    def test_linked_tree_loads(self, linked):
        out, frames = linked
        ds = SevenScenesDataset(out / "test" / "mini7", register_depth=False)
        assert len(ds) == 2
        rgb, depth, (R, t) = ds[0]
        np.testing.assert_array_equal(rgb, frames[(2, 0)][2])
        np.testing.assert_array_equal(depth, frames[(2, 0)][3])
        np.testing.assert_allclose(R, frames[(2, 0)][0], atol=1e-5)
        np.testing.assert_allclose(t, frames[(2, 0)][1], atol=0.5)

    def test_serve_one_linked_frame(self, linked):
        # end-to-end over the linked tree: GT coords regenerated from the
        # linked depth+pose feed the full DSAC serve (the path real data
        # will take first), and the pose must localize at 5cm/5deg
        import jax.numpy as jnp

        from dsac_tpu.config import DSACConfig, PoseConfig
        from dsac_tpu.geometry import Pose, pose_errors
        from dsac_tpu.ops import soft_inlier_scores
        from dsac_tpu.pipeline import process_frame

        out, frames = linked
        ds = SevenScenesDataset(out / "test" / "mini7", register_depth=False)
        obj = jnp.asarray(ds.get_obj(1))  # (H, W, 3) mm from depth+pose
        rgb = jnp.asarray(ds.get_rgb(1), jnp.float32)
        R, t = ds.get_pose(1)
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=32,
                                         random_draw=False))

        def coord_fn(image, pix):
            return obj[pix[:, 1], pix[:, 0]] / 1000.0

        def score_fn(dm):
            return soft_inlier_scores(dm.reshape(dm.shape[0], -1),
                                      cfg.pose.inlier_threshold_2d,
                                      cfg.pose.score_beta)

        res = process_frame(jax.random.PRNGKey(3), rgb, coord_fn, score_fn,
                            SCENE.camera, cfg, refine_all=False)
        rot_err, t_err = pose_errors(
            res.final, Pose(jnp.asarray(R, jnp.float32),
                            jnp.asarray(t, jnp.float32)))
        assert float(rot_err) < 5.0 and float(t_err) < 50.0


class TestDataset:
    def test_basic_accessors(self, mini_dataset):
        root, frames = mini_dataset
        ds = SevenScenesDataset(root, register_depth=False)
        assert len(ds) == 3
        rgb, depth, (R, t) = ds[1]
        np.testing.assert_array_equal(rgb, frames[1][2])
        np.testing.assert_array_equal(depth, frames[1][3])
        np.testing.assert_allclose(R, frames[1][0], atol=1e-5)
        np.testing.assert_allclose(t, frames[1][1], atol=0.5)

    def test_get_obj_matches_renderer(self, mini_dataset):
        # GT scene coordinates generated from depth+pose must match the
        # synthetic renderer's coordinates (the reference generates GT the
        # same way, core/dataset.h:226-255).
        root, frames = mini_dataset
        ds = SevenScenesDataset(root, register_depth=False)
        obj = ds.get_obj(0)
        gt = frames[0][4]
        valid = frames[0][3] > 0
        err = np.linalg.norm(obj - gt, axis=-1)
        # depth was quantised to integer mm -> small reconstruction error
        assert np.median(err[valid]) < 10.0
        assert (err[valid] < 40.0).mean() > 0.95

    def test_get_eye_depth_consistency(self, mini_dataset):
        root, frames = mini_dataset
        ds = SevenScenesDataset(root, register_depth=False)
        eye = ds.get_eye(2)
        depth = frames[2][3]
        np.testing.assert_allclose(-eye[..., 2][depth > 0],
                                   depth[depth > 0].astype(np.float32),
                                   atol=0.5)

    def test_depth_registration_identity_sensor(self, mini_dataset):
        # with sensorTrans = I and equal intrinsics the registration is a
        # near-identity scatter
        root, frames = mini_dataset
        cfg = DataConfig(secondary_focal_length=525.0)
        ds = SevenScenesDataset(root, config=cfg, register_depth=True)
        depth = ds.get_depth(0)
        raw = frames[0][3]
        overlap = (depth > 0) & (raw > 0)
        assert overlap.mean() > 0.9
        np.testing.assert_allclose(depth[overlap], raw[overlap], atol=1.0)
