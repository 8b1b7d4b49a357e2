"""Pinhole projection in the reference's internal frame.

Replaces ``project`` (core/cnn.h:438-456) and the dense per-hypothesis
reprojection-error map ``getDiffMap`` (core/cnn.h:384-427).  The projection
convention is the reference's internal one:

    eye = R @ x + t            (z is NEGATIVE depth; core/dataset.cpp:53)
    u = -f * eye_x / eye_z + cx    ("flip x", core/cnn.h:451)
    v =  f * eye_y / eye_z + cy

which equals the standard OpenCV pinhole after the 180-degree-about-x frame
change (core/types.h:137-151) — so we never leave this frame.

Jacobians of everything here come from JAX autodiff, replacing the
hand-derived ``dProjectdObj``/``dProjectdHyp`` (core/cnn.h:467-591).
"""

from __future__ import annotations

import jax.numpy as jnp

from dsac_tpu.config import Camera
from dsac_tpu.geometry.pose import Pose

_EPS = 1e-8


def transform_to_eye(pose: Pose, x: jnp.ndarray) -> jnp.ndarray:
    """Scene points (..., N, 3) -> eye frame under pose (broadcasting)."""
    return jnp.einsum("...ij,...nj->...ni", pose.R, x) + pose.t[..., None, :]


def project(pose: Pose, x: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Project scene points to pixels.  x: (..., N, 3) -> (..., N, 2).

    Division guarded away from eye_z = 0 (the reference zeroes Jacobians
    there, core/cnn.h:479-480); the guard keeps values and gradients finite.
    """
    eye = transform_to_eye(pose, x)
    z = eye[..., 2]
    z_safe = jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = -cam.focal * eye[..., 0] / z_safe + cam.cx
    v = cam.focal * eye[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1)


def reprojection_errors(pose: Pose, x: jnp.ndarray, pix: jnp.ndarray,
                        cam: Camera, max_error: float = 100.0) -> jnp.ndarray:
    """Clamped reprojection error per point: (..., N).

    Mirrors getDiffMap's ``min(norm(pt - proj), CNN_OBJ_MAXINPUT)``
    (core/cnn.h:419-423).  A point that lands *behind* the camera
    (eye_z > 0 in this frame means behind; valid depths are negative)
    still projects somewhere — exactly like the reference, whose
    cv::projectPoints also doesn't cull — and typically clamps to max_error.
    """
    proj = project(pose, x, cam)
    d = pix - proj
    # Smooth-safe norm: sqrt with tiny floor keeps the autodiff gradient
    # finite at zero error (the reference adds EPS before dividing,
    # core/cnn.h:493).
    err = jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)
    return jnp.minimum(err, max_error)
