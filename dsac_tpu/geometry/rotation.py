"""SO(3) utilities: Rodrigues exp/log maps and angular distance.

Replaces the reference's uses of ``cv::Rodrigues`` (e.g.
core/Hypothesis.cpp:267-289, core/types.h:137-214) and
``Hypothesis::calcAngularDistance`` (core/Hypothesis.cpp:137-143).

All functions operate on the trailing axes and broadcast over leading
batch dimensions; gradients come from autodiff, with Taylor-series
branches (via jnp.where on safe inputs) around the singular points so the
derivatives stay finite at angle -> 0 and angle -> pi.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric cross-product matrix: hat(w) @ v == cross(w, v).

    w: (..., 3) -> (..., 3, 3)
    """
    zeros = jnp.zeros_like(w[..., 0])
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation-vector -> rotation matrix.  w: (..., 3) -> (..., 3, 3).

    R = I + sin(t)/t * W + (1-cos(t))/t^2 * W^2, with Taylor fallbacks so both
    the value and the autodiff derivative are exact near t = 0.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    small = theta_sq < 1e-8
    # Safe theta to avoid NaN gradients from sqrt(0).
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta_sq))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> rotation vector.  R: (..., 3, 3) -> (..., 3).

    Uses the quaternion route (Shepperd's method, branchless via jnp.where)
    which is numerically stable across the whole of SO(3), including
    angle ~ pi where the classic trace formula breaks down.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternion constructions; pick the best-conditioned.
    # q = (w, x, y, z), R rotates by q.
    def cand(t, a, b, c):
        s = jnp.sqrt(jnp.maximum(t, _EPS)) * 2.0  # 4*component
        return s, a / s, b / s, c / s

    # candidate 0: w largest
    s0, x0, y0, z0 = cand(1.0 + tr, m21 - m12, m02 - m20, m10 - m01)
    q0 = jnp.stack([0.25 * s0, x0, y0, z0], axis=-1)
    # candidate 1: x largest
    s1, w1, y1, z1 = cand(1.0 + m00 - m11 - m22, m21 - m12, m01 + m10, m02 + m20)
    q1 = jnp.stack([w1, 0.25 * s1, y1, z1], axis=-1)
    # candidate 2: y largest
    s2, w2, x2, z2 = cand(1.0 - m00 + m11 - m22, m02 - m20, m01 + m10, m12 + m21)
    q2 = jnp.stack([w2, x2, 0.25 * s2, z2], axis=-1)
    # candidate 3: z largest
    s3, w3, x3, y3 = cand(1.0 - m00 - m11 + m22, m10 - m01, m02 + m20, m12 + m21)
    q3 = jnp.stack([w3, x3, y3, 0.25 * s3], axis=-1)

    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(diag, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32),
                            axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonical sign: w >= 0 (angle in [0, pi]).
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)

    w_, v = q[..., 0], q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    # angle = 2*atan2(|v|, w); axis = v/|v|
    angle = 2.0 * jnp.arctan2(vnorm, w_)
    small = vnorm < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w_, _EPS),
                      angle / jnp.where(small, 1.0, vnorm))
    return v * scale[..., None]


def angular_distance_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Angle (degrees) between two rotations via the trace formula.

    Mirrors ``Hypothesis::calcAngularDistance`` (core/Hypothesis.cpp:137-143):
    trace(R1 R2^T) clamped to [-1, 3], angle = acos((tr-1)/2) in degrees.
    The clamp bounds match the reference exactly (it clamps to [-1, 3], not
    [-1, 3] -> note lower bound -1 keeps acos argument >= -1).
    """
    diff = R1 @ jnp.swapaxes(R2, -1, -2)
    tr = jnp.trace(diff, axis1=-2, axis2=-1)
    tr = jnp.clip(tr, -1.0, 3.0)
    # Clamp the acos argument strictly inside [-1, 1] so the autodiff
    # derivative stays finite at 0 and pi.
    arg = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    return jnp.degrees(jnp.arccos(arg))
