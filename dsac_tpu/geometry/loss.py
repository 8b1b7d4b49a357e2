"""Pose losses and pose-error metrics.

Replaces core/maxloss.h: ``maxLoss`` (…:69-79) and its hand-derived
gradient ``dLossMax`` (…:87-198) — the gradient is free via autodiff here,
including the max(rot, trans) branch (jnp.maximum subgradient) that the
reference implements as an explicit if/else over two Jacobian formulas.
"""

from __future__ import annotations

import jax.numpy as jnp

from dsac_tpu.geometry.pose import Pose, invert
from dsac_tpu.geometry.rotation import angular_distance_deg

MAX_LOSS = 1e7  # MAXLOSS clamp (core/maxloss.h:30)


def pose_errors(est: Pose, gt: Pose) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(rot_err_deg, trans_err_mm) between *inverted* poses.

    The reference measures camera-pose error, not scene-pose error: both
    hypotheses are inverted first (core/maxloss.h:71-76, core/cnn.h:1242-1247).
    Broadcasts over leading batch dims.
    """
    inv_est = invert(est)
    inv_gt = invert(gt)
    rot_err = angular_distance_deg(inv_est.R, inv_gt.R)
    t_err = jnp.linalg.norm(inv_est.t - inv_gt.t, axis=-1)
    return rot_err, t_err


def max_loss(est: Pose, gt: Pose) -> jnp.ndarray:
    """min(max(rot_deg, trans_mm / 10), MAXLOSS)  (core/maxloss.h:78).

    trans_mm / 10 converts to centimetres, so the loss is
    max(degrees, centimetres) — the paper's 5cm/5deg criterion is loss < 5.
    """
    rot_err, t_err = pose_errors(est, gt)
    return jnp.minimum(jnp.maximum(rot_err, t_err / 10.0), MAX_LOSS)


def is_correct(est: Pose, gt: Pose,
               rot_thresh_deg: float = 5.0,
               trans_thresh_mm: float = 50.0) -> jnp.ndarray:
    """The 5cm/5deg correctness flag (core/cnn.h:1249-1256)."""
    rot_err, t_err = pose_errors(est, gt)
    return jnp.logical_and(rot_err < rot_thresh_deg, t_err < trans_thresh_mm)


def expected_max_loss(probs: jnp.ndarray, losses: jnp.ndarray) -> jnp.ndarray:
    """E_p[loss] over a hypothesis pool (core/cnn.h:137-151)."""
    return jnp.sum(probs * losses, axis=-1)
