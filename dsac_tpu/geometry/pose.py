"""Rigid 6-DoF poses.

Replaces the reference's ``Hypothesis`` class (core/Hypothesis.h:45-243) with
an immutable NamedTuple pytree: ``eye = R @ x + t`` maps scene coordinates
(mm) into the camera ("eye") frame of the reference's internal convention
(x right, y up, z = -depth; see core/dataset.cpp:37-56).

The reference additionally maintains an OpenCV-frame copy of every pose
(``our2cv``/``cv2our``, core/types.h:137-214 — a 180-degree rotation about x).
We work natively in the internal frame everywhere, including projection
(see geometry/projection.py), so no frame juggling survives the rebuild.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dsac_tpu.geometry.rotation import so3_exp, so3_log


class Pose(NamedTuple):
    """R: (..., 3, 3) rotation, t: (..., 3) translation (mm)."""

    R: jnp.ndarray
    t: jnp.ndarray


def identity_pose(batch_shape=(), dtype=jnp.float32) -> Pose:
    R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
    t = jnp.zeros((*batch_shape, 3), dtype=dtype)
    return Pose(R, t)


def compose(a: Pose, b: Pose) -> Pose:
    """a after b: (a*b)(x) = a(b(x)).  Matches Hypothesis::operator*
    (core/Hypothesis.cpp:255-259)."""
    return Pose(a.R @ b.R, jnp.einsum("...ij,...j->...i", a.R, b.t) + a.t)


def invert(p: Pose) -> Pose:
    """Inverse transform (scene pose -> camera pose).  Matches
    ``getInvHyp`` (core/maxloss.h:39-61)."""
    Rt = jnp.swapaxes(p.R, -1, -2)
    return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, p.t))


def transform(p: Pose, x: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points x: (..., N, 3) or (..., 3)."""
    if x.ndim >= 2 and x.shape[-2] != 3:
        # batch of points: (..., N, 3)
        return jnp.einsum("...ij,...nj->...ni", p.R, x) + p.t[..., None, :]
    return jnp.einsum("...ij,...j->...i", p.R, x) + p.t


def pose_to_vec6(p: Pose) -> jnp.ndarray:
    """Pose -> (rodrigues_vec, t) 6-vector.  Matches
    ``Hypothesis::getRodVecAndTrans`` (core/Hypothesis.cpp:274-289)."""
    return jnp.concatenate([so3_log(p.R), p.t], axis=-1)


def pose_from_vec6(v: jnp.ndarray) -> Pose:
    """(rodrigues_vec, t) 6-vector -> Pose.  Matches the Hypothesis
    6-vector constructor (core/Hypothesis.cpp:81-99)."""
    return Pose(so3_exp(v[..., :3]), v[..., 3:])
