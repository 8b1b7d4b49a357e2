"""Pose math, minimal solvers, differentiable refinement and losses.

Pure-functional JAX replacements for the reference's CPU geometry layer
(core/Hypothesis.{h,cpp}, core/maxloss.h, and the geometric half of
core/cnn.h).  Every function is f32, vmap/jit-friendly, and differentiable
— the reference's finite-difference machinery (dPNP, dRefine, dLossMax,
dProjectdObj/Hyp) has no counterpart here because JAX autodiff covers it.
"""

from dsac_tpu.geometry.rotation import (
    so3_exp, so3_log, hat, angular_distance_deg,
)
from dsac_tpu.geometry.pose import (
    Pose, identity_pose, compose, invert, transform, pose_to_vec6,
    pose_from_vec6,
)
from dsac_tpu.geometry.kabsch import kabsch
from dsac_tpu.geometry.projection import (
    project, reprojection_errors, transform_to_eye,
)
from dsac_tpu.geometry.loss import max_loss, pose_errors
from dsac_tpu.geometry.p3p import p3p_grunert, solve_pnp_minimal
from dsac_tpu.geometry.gn import gn_pnp, refine_pose
