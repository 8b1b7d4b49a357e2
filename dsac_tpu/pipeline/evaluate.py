"""Evaluation: per-frame pose errors and dataset summaries.

Replaces the test_ransac/test_ransac_softam reporting
(core/test_ransac.cpp:221-273): per-frame rotation/translation errors,
the 5cm/5deg accuracy, expected loss, score entropy, and the median
rotation (deg) / translation (reported in cm) summary statistics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from dsac_tpu.geometry.loss import expected_max_loss, max_loss, pose_errors
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.pipeline.forward import FrameResult


class FrameEval(NamedTuple):
    rot_err_deg: jnp.ndarray
    trans_err_mm: jnp.ndarray
    correct: jnp.ndarray  # 5cm/5deg flag (core/cnn.h:1249-1256)
    expected_loss: jnp.ndarray
    entropy: jnp.ndarray
    losses: jnp.ndarray  # (H,) per-hypothesis losses


def evaluate_frame(result: FrameResult, gt: Pose) -> FrameEval:
    losses = max_loss(result.refined, gt)  # (H,)
    exp_loss = expected_max_loss(result.probs, losses)
    rot_err, t_err = pose_errors(result.final, gt)
    correct = jnp.logical_and(rot_err < 5.0, t_err < 50.0)
    return FrameEval(rot_err, t_err, correct, exp_loss, result.entropy,
                     losses)


def summarize(rot_errs_deg: np.ndarray, trans_errs_mm: np.ndarray,
              expected_losses: np.ndarray | None = None,
              entropies: np.ndarray | None = None) -> dict:
    """Dataset summary matching test_ransac.cpp:242-273.

    Median translation is reported in cm (the reference divides by 10 at
    print time, test_ransac.cpp:263).
    """
    rot = np.asarray(rot_errs_deg, np.float64)
    tra = np.asarray(trans_errs_mm, np.float64)
    correct = (rot < 5.0) & (tra < 50.0)
    out = {
        "frames": int(rot.size),
        "accuracy_5cm5deg": float(np.mean(correct)),
        "median_rot_err_deg": float(np.median(rot)),
        "median_trans_err_cm": float(np.median(tra) / 10.0),
    }
    if expected_losses is not None:
        e = np.asarray(expected_losses, np.float64)
        out["mean_expected_loss"] = float(np.mean(e))
        out["std_expected_loss"] = float(np.std(e))
    if entropies is not None:
        h = np.asarray(entropies, np.float64)
        out["mean_entropy_bits"] = float(np.mean(h))
        out["std_entropy_bits"] = float(np.std(h))
    return out
