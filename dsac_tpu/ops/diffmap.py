"""Dense reprojection-error scoring: the (hypotheses x pixels) hot kernel.

Replaces ``getDiffMap`` (core/cnn.h:384-427), which the reference evaluates
serially per hypothesis under OpenMP (core/cnn.h:1136-1138).  Here the
whole (H, N) error surface is one fused batched computation: a single
(H*3, 3) x (3, N) matmul for the rotations plus vectorised projection —
XLA fuses the elementwise tail into the matmul epilogue.  A Pallas variant
(ops/diffmap_pallas.py) covers the very-large-H regime.

Also provides the soft-inlier scoring head used by the SoftAM/scoreless
configurations: score_h = sum_i sigmoid((tau - r_hi) / beta), a smooth
stand-in for the score CNN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsac_tpu.config import Camera
from dsac_tpu.geometry.pose import Pose

_EPS = 1e-8


def diffmaps(hyps: Pose, coords: jnp.ndarray, pix: jnp.ndarray,
             cam: Camera, max_error: float = 100.0) -> jnp.ndarray:
    """Clamped reprojection errors for every (hypothesis, pixel) pair.

    hyps: Pose with batch shape (H,); coords: (N, 3) mm; pix: (N, 2).
    Returns (H, N) float32 errors clamped at `max_error`
    (CNN_OBJ_MAXINPUT, core/lua_calls.h:36).
    """
    # (H, 3, 3) @ (N, 3)^T -> one big matmul: reshape to (H*3, 3) x (3, N).
    H = hyps.t.shape[0]
    N = coords.shape[0]
    RX = (hyps.R.reshape(H * 3, 3) @ coords.T).reshape(H, 3, N)
    eye = RX + hyps.t[:, :, None]  # (H, 3, N)
    z = eye[:, 2, :]
    z_safe = jnp.where(jnp.abs(z) < _EPS, -_EPS, z)
    u = -cam.focal * eye[:, 0, :] / z_safe + cam.cx
    v = cam.focal * eye[:, 1, :] / z_safe + cam.cy
    du = pix[None, :, 0] - u
    dv = pix[None, :, 1] - v
    err = jnp.sqrt(du * du + dv * dv + _EPS)
    return jnp.minimum(err, max_error)


def soft_inlier_scores(dmaps: jnp.ndarray, threshold: float,
                       beta: float) -> jnp.ndarray:
    """Soft inlier count per hypothesis: (H, N) -> (H,).

    The differentiable scoring head used when no score CNN is attached
    (BASELINE.json config 2).  Equivalent in spirit to RANSAC's inlier
    count; beta controls the softness of the threshold.
    """
    return jnp.sum(jax.nn.sigmoid((threshold - dmaps) / beta), axis=-1)
