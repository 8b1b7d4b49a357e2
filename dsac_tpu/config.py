"""Static configuration for the DSAC-TPU pipeline.

Replaces the reference's ``GlobalProperties`` singleton
(``core/properties.h:40-141``, defaults at ``core/properties.cpp:39-87``)
with immutable, hashable dataclasses that are passed as *static* arguments
to jitted functions.  Camera intrinsics, which participate in compute, are
a separate small pytree (:class:`Camera`) so they can be traced.

Units follow the reference: millimetres for 3D, pixels for 2D, degrees
for the rotational part of the pose loss.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Pinhole intrinsics (traced pytree).

    The reference builds a 3x3 K matrix in ``GlobalProperties::getCamMat``
    (``core/properties.cpp:308-323``): f on the diagonal, principal point at
    image centre (+ optional shift).  We keep the scalar form.
    """

    focal: jnp.ndarray  # scalar f in pixels
    cx: jnp.ndarray  # principal point x
    cy: jnp.ndarray  # principal point y

    @staticmethod
    def make(focal: float = 525.0, width: int = 640, height: int = 480,
             x_shift: float = 0.0, y_shift: float = 0.0) -> "Camera":
        # reference: centerX = imageWidth/2 + xShift (properties.cpp:310-311)
        return Camera(
            focal=jnp.asarray(focal, jnp.float32),
            cx=jnp.asarray(width / 2.0 + x_shift, jnp.float32),
            cy=jnp.asarray(height / 2.0 + y_shift, jnp.float32),
        )


@dataclasses.dataclass(frozen=True)
class PoseConfig:
    """Hypothesis sampling / scoring / refinement parameters.

    Defaults mirror the reference's ``default.config`` for 7-Scenes
    (``rI 256, rRI 8, rB 100, rSS 0.01, rT2D 10, rT3D 100, rdraw 1``;
    ``core/properties.cpp:39-55``).
    """

    num_hypotheses: int = 256  # rI — hypotheses per frame
    refinement_steps: int = 8  # rRI — outer refinement iterations
    inlier_count_cap: int = 100  # rB — reference caps inliers per re-solve
    gradient_subsample: float = 0.01  # rSS (reference-only; autodiff needs none)
    inlier_threshold_2d: float = 10.0  # rT2D — px
    inlier_threshold_3d: float = 100.0  # rT3D — mm (validation only)
    random_draw: bool = True  # rdraw — sample winner (DSAC) vs argmax (RANSAC)

    # --- TPU-native knobs (no reference counterpart) ---
    # Sharpness of the soft inlier weights sigma((tau - r)/beta) replacing the
    # reference's hard threshold scan (core/cnn.h:1192).
    inlier_beta: float = 1.0
    # Number of re-sampling attempts for a self-consistent minimal set; the
    # reference loops until success (core/cnn.h:1079-1129), we draw a fixed
    # batch of attempts and pick the first valid one.
    sample_attempts: int = 16
    # Gauss-Newton inner iterations per refinement step; the reference runs
    # OpenCV's LM to convergence per step (core/cnn.h:1211), IRLS with a
    # couple of inner steps converges equivalently.
    gn_inner_steps: int = 2
    # Levenberg-Marquardt damping for the normal equations.
    gn_damping: float = 1e-4
    # Refinement aborts below this many (soft) inliers (core/cnn.h:1203: 50).
    min_inliers: float = 50.0
    # Reprojection errors fed to scoring are clamped here
    # (CNN_OBJ_MAXINPUT, core/lua_calls.h:36).
    max_reprojection_error: float = 100.0
    # Minimal set size (4: P3P + disambiguation point, core/test_ransac.cpp).
    min_set_size: int = 4
    # Soft-inlier score sharpness for the scoreless/SoftAM scoring head.
    score_beta: float = 10.0
    # Hypothesis pools above this size are P3P-solved in sequential
    # chunks (ops/sampling.py) to bound the tiny-trailing-dim padding
    # scratch that would otherwise OOM the 16k-hypothesis regime.
    hyp_sample_chunk: int = 2048
    # Two-phase (resample-only-failures) sampling: fraction of the pool
    # re-solved at full attempt depth after the 1-attempt first pass
    # (ops/sampling.py:sample_minimal_sets_two_phase).
    two_phase_budget: float = 0.125


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset geometry parameters (``core/properties.cpp:53-66``)."""

    focal_length: float = 525.0
    x_shift: float = 0.0
    y_shift: float = 0.0
    secondary_focal_length: float = 585.0  # depth sensor
    raw_x_shift: float = 0.0
    raw_y_shift: float = 0.0
    image_width: int = 640
    image_height: int = 480
    raw_data: bool = True  # depth needs registration to RGB

    def camera(self) -> Camera:
        return Camera.make(self.focal_length, self.image_width,
                           self.image_height, self.x_shift, self.y_shift)


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """CNN input geometry (``core/lua_calls.h:30-36``)."""

    rgb_patch_size: int = 42  # CNN_RGB_PATCHSIZE
    subsample_size: int = 40  # CNN_OBJ_PATCHSIZE — scoring grid is 40x40
    score_mean: float = 45.0  # train_score.lua mean normalisation
    rgb_mean: float = 127.0  # train_obj.lua mean normalisation


@dataclasses.dataclass(frozen=True)
class DSACConfig:
    """Top-level bundle passed (statically) through the pipeline."""

    pose: PoseConfig = dataclasses.field(default_factory=PoseConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    net: NetConfig = dataclasses.field(default_factory=NetConfig)


DEFAULT = DSACConfig()
