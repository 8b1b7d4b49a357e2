"""7-Scenes-layout dataset: the reference's on-disk convention, rebuilt.

Folder convention (core/dataset.h:290-296, produced by link_7scenes.py):

    <scene>/{training|test}/<name>/
        rgb_noseg/    *.png   8-bit RGB, 640x480
        depth_noseg/  *.png   16-bit grayscale, depth in mm
        poses/        *.txt   4x4 camera-to-world matrix (7-Scenes frame)
    plus per-scene:  translation.txt (scene-centering offset, metres)
                     sensorTrans.dat (depth->RGB extrinsics, generic_io
                     binary: int rows, int cols, doubles row-major)

Semantics replicated from the reference:
  * pose parsing (core/read_data.cpp:69-133): subtract translation.txt
    from the matrix's translation column, right-multiply the axis
    correction diag(1,-1,-1,1), then invert -> scene-to-eye pose in the
    internal frame; translation metres -> mm on use (Hypothesis ctor,
    core/Hypothesis.cpp:53);
  * depth registration (core/dataset.h:93-111 mapDepthToRGB): project
    each depth pixel through the depth sensor's intrinsics, apply
    sensorTrans, reproject with the RGB intrinsics (vectorised scatter
    here vs the reference's per-pixel loop);
  * GT scene-coordinate images (core/dataset.h:226-255 getObj) and
    camera-coordinate images (getEye) from depth via the inverse pinhole
    (core/dataset.cpp:37-56 pxToEye) and the inverse GT pose.

Decoding uses the native libdsac_io (PNG + threaded prefetch) with a PIL
fallback.
"""

from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np

from dsac_tpu.config import DataConfig
from dsac_tpu.utils import native_io


def read_sensor_trans(path: str | Path) -> np.ndarray:
    """generic_io cv::Mat_<double> reader (core/generic_io.h:166-180)."""
    raw = Path(path).read_bytes()
    rows, cols = struct.unpack_from("<ii", raw, 0)
    vals = struct.unpack_from(f"<{rows * cols}d", raw, 8)
    return np.asarray(vals, np.float64).reshape(rows, cols)


def write_sensor_trans(path: str | Path, mat: np.ndarray) -> None:
    """generic_io cv::Mat_<double> writer (core/generic_io.h:150-163):
    int rows, int cols, row-major doubles."""
    m = np.asarray(mat, np.float64)
    Path(path).write_bytes(struct.pack("<ii", *m.shape) + m.tobytes())


def write_pose_file(path: str | Path, R: np.ndarray, t_mm: np.ndarray,
                    translation_m: np.ndarray | None = None) -> None:
    """Inverse of parse_pose_file: internal scene->eye pose back to the
    7-Scenes camera-to-world text convention (re-adding the scene-centering
    offset) — the conversion test_ransac performs before writing estimated
    poses out (core/test_ransac.cpp:170-219)."""
    trans = np.eye(4)
    trans[:3, :3] = np.asarray(R, np.float64)
    trans[:3, 3] = np.asarray(t_mm, np.float64) / 1000.0
    inv = np.linalg.inv(trans)
    correction = np.diag([1.0, -1.0, -1.0, 1.0])
    file_mat = inv @ np.linalg.inv(correction)
    if translation_m is not None:
        file_mat[:3, 3] += translation_m
    lines = [" ".join(f"{v:.9f}" for v in row) for row in file_mat]
    Path(path).write_text("\n".join(lines) + "\n")


def pose_to_7scenes_vec6(R: np.ndarray, t_mm: np.ndarray,
                         translation_m: np.ndarray | None = None
                         ) -> np.ndarray:
    """Internal scene->eye pose -> the reference's exported 6-vector.

    Reproduces the per-frame back-conversion in test_ransac
    (core/test_ransac.cpp:170-219): invert the estimated pose
    (eye->scene, i.e. camera-to-world), undo the axis correction
    (negate columns 1,2), take Rodrigues rotation + translation in
    metres, and re-add the scene-centering translation.txt offset.
    Columns 5-10 of the reference's error file hold this vector.
    """
    M = np.eye(4)
    M[:3, :3] = np.asarray(R, np.float64)
    M[:3, 3] = np.asarray(t_mm, np.float64) / 1000.0
    M = np.linalg.inv(M) @ np.diag([1.0, -1.0, -1.0, 1.0])
    # Rodrigues log of the corrected rotation (Hypothesis.cpp:274-289);
    # so3_log's Shepperd-quaternion path is robust across all of SO(3)
    from dsac_tpu.geometry.rotation import so3_log
    rod = np.asarray(so3_log(np.asarray(M[:3, :3], np.float32)), np.float64)
    t = M[:3, 3]
    if translation_m is not None:
        t = t + np.asarray(translation_m, np.float64)
    return np.concatenate([rod, t])


def read_translation(path: str | Path) -> np.ndarray:
    """translation.txt: one line of 3 floats (metres)."""
    toks = Path(path).read_text().split()
    return np.asarray([float(t) for t in toks[:3]], np.float64)


def parse_pose_file(path: str | Path,
                    translation: np.ndarray | None = None
                    ) -> tuple[np.ndarray, np.ndarray]:
    """7-Scenes pose txt -> (R, t_m): scene->eye rotation + translation (m).

    Mirrors read_data.cpp:69-133: read the top 3 rows of the 4x4
    camera-to-world matrix, subtract the scene-centering offset, apply the
    frame correction (negate columns 1,2), invert.
    """
    rows = []
    with open(path) as f:
        for _ in range(3):
            rows.append([float(t) for t in f.readline().split()[:4]])
    trans = np.eye(4)
    trans[:3, :4] = np.asarray(rows)
    if translation is not None:
        trans[:3, 3] -= translation
    correction = np.diag([1.0, -1.0, -1.0, 1.0])
    trans = trans @ correction
    trans = np.linalg.inv(trans)
    return trans[:3, :3].copy(), trans[:3, 3].copy()


@dataclasses.dataclass
class SevenScenesDataset:
    """One split of one scene, folder-convention compatible.

    Usage: ds = SevenScenesDataset(root); rgb, depth, pose = ds[i].
    """

    root: str | Path
    config: DataConfig = dataclasses.field(default_factory=DataConfig)
    register_depth: bool | None = None  # None -> config.raw_data

    def __post_init__(self):
        root = Path(self.root)
        self.rgb_files = sorted((root / "rgb_noseg").glob("*.png"))
        self.depth_files = sorted((root / "depth_noseg").glob("*.png"))
        self.pose_files = sorted((root / "poses").glob("*.txt"))
        if not self.rgb_files:
            raise FileNotFoundError(f"no rgb_noseg/*.png under {root}")
        # scene-level metadata lives next to or above the split directory
        self.translation = None
        self.sensor_trans = np.eye(4)
        for base in [root, root.parent, root.parent.parent]:
            t = base / "translation.txt"
            if self.translation is None and t.exists():
                self.translation = read_translation(t)
            s = base / "sensorTrans.dat"
            if s.exists() and np.allclose(self.sensor_trans, np.eye(4)):
                self.sensor_trans = read_sensor_trans(s)
        if self.register_depth is None:
            self.register_depth = self.config.raw_data

    def __len__(self) -> int:
        return len(self.rgb_files)

    # ---------------- raw accessors (Dataset::getBGR/getDepth/getInfo) ----

    def get_rgb(self, i: int) -> np.ndarray:
        c = self.config
        return native_io.read_rgb(str(self.rgb_files[i]), c.image_width,
                                  c.image_height)

    def get_depth(self, i: int) -> np.ndarray:
        c = self.config
        depth = native_io.read_depth16(str(self.depth_files[i]),
                                       c.image_width, c.image_height)
        if self.register_depth:
            depth = self.map_depth_to_rgb(depth)
        return depth

    def get_pose(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(R, t_mm) scene->eye in the internal frame."""
        R, t_m = parse_pose_file(self.pose_files[i], self.translation)
        return R, t_m * 1000.0

    # ---------------- derived images --------------------------------------

    def map_depth_to_rgb(self, depth: np.ndarray) -> np.ndarray:
        """Vectorised mapDepthToRGB (core/dataset.h:93-111)."""
        c = self.config
        h, w = depth.shape
        ys, xs = np.nonzero(depth)
        d = depth[ys, xs].astype(np.float64)
        # 3D point through the depth sensor's intrinsics
        ex = (xs - (c.image_width / 2.0 + c.raw_x_shift)) * d \
            / c.secondary_focal_length
        ey = -(ys - (c.image_height / 2.0 + c.raw_y_shift)) * d \
            / c.secondary_focal_length
        ez = -d
        pts = np.stack([ex, ey, ez, np.ones_like(ex)], axis=0)
        pts = self.sensor_trans @ pts
        # reproject with the RGB intrinsics (note: the reference divides by
        # the ORIGINAL depth here, core/dataset.h:107-108)
        nx = (pts[0] * (c.focal_length / d)
              + (c.image_width / 2.0 + c.x_shift) + 0.5).astype(np.int64)
        ny = (-(pts[1] * (c.focal_length / d))
              + (c.image_height / 2.0 + c.y_shift) + 0.5).astype(np.int64)
        ok = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
        out = np.zeros_like(depth)
        out[ny[ok], nx[ok]] = depth[ys[ok], xs[ok]]
        return out

    def px_to_eye(self, depth: np.ndarray) -> np.ndarray:
        """Inverse pinhole: depth (H, W) -> camera coords (H, W, 3) mm
        (core/dataset.cpp:37-56; zero where depth is zero)."""
        c = self.config
        h, w = depth.shape
        xs = np.arange(w)[None, :]
        ys = np.arange(h)[:, None]
        d = depth.astype(np.float64)
        ex = (xs - (c.image_width / 2.0 + c.x_shift)) * d / c.focal_length
        ey = -(ys - (c.image_height / 2.0 + c.y_shift)) * d / c.focal_length
        ez = -d
        eye = np.stack([ex, ey, ez], axis=-1)
        eye[depth == 0] = 0
        return eye.astype(np.float32)

    def get_eye(self, i: int) -> np.ndarray:
        """Camera-coordinate image (Dataset::getEye)."""
        return self.px_to_eye(self.get_depth(i))

    def get_obj(self, i: int) -> np.ndarray:
        """GT scene-coordinate image in mm (Dataset::getObj,
        core/dataset.h:226-255): eye coords through the inverse GT pose;
        zero where depth is missing."""
        depth = self.get_depth(i)
        eye = self.px_to_eye(depth)
        R, t = self.get_pose(i)
        flat = eye.reshape(-1, 3).astype(np.float64)
        scene = (flat - t) @ R  # R^T @ (eye - t), row-vector form
        scene = scene.reshape(eye.shape).astype(np.float32)
        scene[depth == 0] = 0
        return scene

    def __getitem__(self, i: int):
        R, t = self.get_pose(i)
        return self.get_rgb(i), self.get_depth(i), (R, t)

    def prefetch(self, sequence: list[int], n_threads: int = 3,
                 capacity: int = 8):
        """Native threaded prefetch over a frame sequence; yields
        (index, rgb, depth) in order."""
        c = self.config
        return native_io.PrefetchLoader(
            [str(p) for p in self.rgb_files],
            [str(p) for p in self.depth_files] if self.depth_files else None,
            sequence, c.image_width, c.image_height, n_threads, capacity)
