"""Real 7-Scenes metadata bytes through the actual parsers.

The 7-Scenes images cannot be downloaded on this box, but the reference
ships the REAL per-scene metadata inside `7scenes.tar.gz`
(default.config, translation.txt, sensorTrans.dat for all seven scenes —
the files link_all.sh / link_7scenes.py place next to each scene).  This
module proves real-data readiness on those actual bytes, not on
synthetic replicas: every file is parsed by the same code paths the CLI
programs use (flags.load, read_translation, read_sensor_trans,
SevenScenesDataset metadata discovery).

Reference: link_all.sh:1-12 (tarball layout), core/properties.cpp:74-86
(sensorTrans load), core/read_data.cpp:69-133 (translation use).
"""

import os
import tarfile
from pathlib import Path

import numpy as np
import pytest

from dsac_tpu import flags
from dsac_tpu.data.seven_scenes import (SevenScenesDataset,
                                        read_sensor_trans, read_translation)

TARBALL = Path("/root/reference/7scenes.tar.gz")
SCENES = ["chess", "fire", "heads", "office", "pumpkin", "redkitchen",
          "stairs"]

pytestmark = pytest.mark.skipif(not TARBALL.exists(),
                                reason="reference tarball not present")


@pytest.fixture(scope="module")
def seven_scenes_root(tmp_path_factory) -> Path:
    """Extract only the metadata files (the image dirs are empty anyway)."""
    root = tmp_path_factory.mktemp("7scenes_meta")
    want = ("default.config", "translation.txt", "sensorTrans.dat")
    with tarfile.open(TARBALL) as tf:
        # per-scene config/sensorTrans are symlinks into 7scenes/metadata/
        members = [m for m in tf.getmembers()
                   if (m.isfile() or m.issym()) and m.name.endswith(want)]
        tf.extractall(root, members=members, filter="data")
    return root / "7scenes"


def test_all_scene_metadata_present(seven_scenes_root):
    for s in SCENES:
        d = seven_scenes_root / f"7scenes_{s}"
        for f in ("default.config", "translation.txt", "sensorTrans.dat"):
            assert (d / f).is_file(), f"{s}: missing {f}"


def test_default_config_through_flags(seven_scenes_root):
    """Each scene's real default.config through the full flags.load path
    (chdir convention = the reference's working-directory convention,
    properties.cpp:277-306)."""
    for s in SCENES:
        d = seven_scenes_root / f"7scenes_{s}"
        cwd = os.getcwd()
        try:
            os.chdir(d)
            cfg, strings = flags.load([])
        finally:
            os.chdir(cwd)
        # dataset parameters (7scenes.tar.gz metadata/default.config)
        assert cfg.data.focal_length == 525.0
        assert cfg.data.x_shift == 0.0 and cfg.data.y_shift == 0.0
        assert cfg.data.raw_data is True
        assert cfg.data.secondary_focal_length == 585.0
        assert cfg.data.raw_x_shift == 0.0 and cfg.data.raw_y_shift == 0.0
        assert cfg.data.image_width == 640
        assert cfg.data.image_height == 480
        # pose parameters
        assert cfg.pose.num_hypotheses == 256
        assert cfg.pose.refinement_steps == 8
        assert cfg.pose.inlier_count_cap == 100
        assert cfg.pose.gradient_subsample == pytest.approx(0.01)
        assert cfg.pose.inlier_threshold_2d == 10.0
        assert cfg.pose.inlier_threshold_3d == 100.0
        assert cfg.pose.random_draw is True


def test_cli_override_beats_real_config(seven_scenes_root):
    d = seven_scenes_root / "7scenes_chess"
    cwd = os.getcwd()
    try:
        os.chdir(d)
        cfg, _ = flags.load(["-rI", "1024", "-rT2D", "5"])
    finally:
        os.chdir(cwd)
    assert cfg.pose.num_hypotheses == 1024
    assert cfg.pose.inlier_threshold_2d == 5.0
    assert cfg.data.focal_length == 525.0  # untouched keys keep file values


# translation.txt first components, straight from the shipped files —
# pinned so a parser regression (token order, locale, row/col swap)
# cannot pass silently.
_EXPECTED_TRANSLATION_X = {
    "chess": 0.6880049706, "fire": 0.900005045264, "heads": 0.138664978757,
    "office": -0.727424987205, "pumpkin": -0.655005017581,
    "redkitchen": -0.483559967621, "stairs": 0.248270025736,
}


def test_translation_values(seven_scenes_root):
    for s in SCENES:
        t = read_translation(seven_scenes_root / f"7scenes_{s}"
                             / "translation.txt")
        assert t.shape == (3,) and t.dtype == np.float64
        assert t[0] == pytest.approx(_EXPECTED_TRANSLATION_X[s], abs=1e-12)
        # scene-centering offsets are metre-scale positions inside a room
        assert np.all(np.abs(t) < 10.0)


def test_sensor_trans_is_rigid_kinect_calibration(seven_scenes_root):
    """All seven shipped sensorTrans.dat are 4x4 rigid transforms
    (depth->RGB extrinsics: near-identity rotation, cm-scale offset)."""
    mats = {}
    for s in SCENES:
        m = read_sensor_trans(seven_scenes_root / f"7scenes_{s}"
                              / "sensorTrans.dat")
        assert m.shape == (4, 4)
        np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=0)
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-6)
        # rotation within a few degrees of identity, offset < 10 cm (in m)
        assert np.trace(R) > 2.99
        assert np.linalg.norm(m[:3, 3]) < 0.1
        mats[s] = m
    # the shipped calibration is one Kinect: identical across scenes
    for s in SCENES[1:]:
        np.testing.assert_array_equal(mats[s], mats["chess"])


def test_dataset_discovers_real_metadata(seven_scenes_root, tmp_path):
    """SevenScenesDataset's metadata walk (root -> parents) on the real
    files: build a minimal split folder inside the real chess scene dir
    and check the dataset picks up the scene's translation + sensorTrans."""
    pytest.importorskip("PIL")
    from PIL import Image

    scene = seven_scenes_root / "7scenes_chess"
    split = scene / "training" / "scene"
    for sub in ("rgb_noseg", "depth_noseg", "poses"):
        (split / sub).mkdir(parents=True, exist_ok=True)
    Image.fromarray(np.zeros((480, 640, 3), np.uint8)).save(
        split / "rgb_noseg" / "frame-000000.png")
    Image.fromarray(np.full((480, 640), 2000, np.uint16)).save(
        split / "depth_noseg" / "frame-000000.png")
    pose = np.eye(4)
    (split / "poses" / "frame-000000.txt").write_text(
        "\n".join(" ".join(f"{v:.6f}" for v in row) for row in pose))

    ds = SevenScenesDataset(split)
    expected_t = read_translation(scene / "translation.txt")
    expected_s = read_sensor_trans(scene / "sensorTrans.dat")
    np.testing.assert_array_equal(ds.translation, expected_t)
    np.testing.assert_array_equal(ds.sensor_trans, expected_s)

    # the real (non-identity) calibration flows through depth registration
    depth = ds.get_depth(0)
    assert depth.shape == (480, 640)
    assert depth.max() > 0
    # pose parsing consumes the real translation offset (mm internal units)
    R, t_mm = ds.get_pose(0)
    assert R.shape == (3, 3) and t_mm.shape == (3,)
    np.testing.assert_allclose(
        np.linalg.norm(t_mm), np.linalg.norm(expected_t) * 1000.0, rtol=1e-6)
