"""Multi-frame scene-coordinate bundle adjustment via Schur complement.

No reference counterpart (DSAC is strictly single-frame); this is the
BASELINE.json config-5 capability: joint refinement of K keyframe poses
and M shared scene points over their 2D observations, eliminating the
point blocks (Schur complement) and solving the reduced 6Kx6K camera
system.  The distributed form partitions OBSERVATIONS by keyframe across
the 'data' mesh axis and psums the per-point accumulators and the
reduced system — the collectives ride ICI.

Formulation (standard sparse GN/LM):
    r_o = uv_o - project(pose_{k(o)}, X_{j(o)})          (2-vector)
    U_k = sum_{o in k} Jp_o^T Jp_o                       (6x6)
    V_j = sum_{o in j} Jx_o^T Jx_o                       (3x3)
    S   = blockdiag(U) - sum_j G_j V_j^-1 F_j^T          (6Kx6K)
    with G_j, F_j the (6K x 3) stacked cross blocks of point j
    solve S dp = b_red ; back-substitute dx_j.

Weights (e.g. soft inlier weights from the DSAC stage) make it robust.
All shapes are static: observations are a flat (O,) list with frame and
point indices, accumulated via segment_sum.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsac_tpu.config import Camera
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.geometry.rotation import hat, so3_exp

_EPS = 1e-8


class BAProblem(NamedTuple):
    poses: Pose  # (K,) scene->eye
    points: jnp.ndarray  # (M, 3) mm
    frame_idx: jnp.ndarray  # (O,) int32 — observing keyframe
    point_idx: jnp.ndarray  # (O,) int32 — observed point
    uv: jnp.ndarray  # (O, 2) pixel observations
    weights: jnp.ndarray  # (O,) confidence weights


def _obs_residual_jacobians(poses: Pose, points: jnp.ndarray,
                            frame_idx, point_idx, uv, cam: Camera):
    """Per-observation residual r (O,2), Jp (O,2,6), Jx (O,2,3)."""
    R = poses.R[frame_idx]  # (O, 3, 3)
    t = poses.t[frame_idx]
    X = points[point_idx]  # (O, 3)
    rx = jnp.einsum("oij,oj->oi", R, X)
    eye = rx + t
    z = eye[:, 2]
    z_safe = jnp.where(jnp.abs(z) < _EPS, -_EPS, z)
    inv_z = 1.0 / z_safe
    f = cam.focal
    u = -f * eye[:, 0] * inv_z + cam.cx
    v = f * eye[:, 1] * inv_z + cam.cy
    r = uv - jnp.stack([u, v], axis=-1)

    zeros = jnp.zeros_like(z)
    du_de = jnp.stack([-f * inv_z, zeros, f * eye[:, 0] * inv_z * inv_z],
                      axis=-1)
    dv_de = jnp.stack([zeros, f * inv_z, -f * eye[:, 1] * inv_z * inv_z],
                      axis=-1)
    duv_de = jnp.stack([du_de, dv_de], axis=-2)  # (O, 2, 3)

    de_dp = jnp.concatenate(
        [-hat(rx), jnp.broadcast_to(jnp.eye(3), (*rx.shape, 3))],
        axis=-1)  # (O, 3, 6)
    Jp = duv_de @ de_dp  # (O, 2, 6)
    Jx = duv_de @ R  # d eye / d X = R -> (O, 2, 3)
    return r, Jp, Jx


def _accumulate(poses: Pose, points: jnp.ndarray, prob: BAProblem,
                cam: Camera, K: int, M: int):
    """All Schur-system blocks from the local observations."""
    r, Jp, Jx = _obs_residual_jacobians(poses, points, prob.frame_idx,
                                        prob.point_idx, prob.uv, cam)
    w = prob.weights[:, None, None]
    U = jax.ops.segment_sum(
        w * jnp.einsum("oki,okj->oij", Jp, Jp), prob.frame_idx, K)  # (K,6,6)
    V = jax.ops.segment_sum(
        w * jnp.einsum("oki,okj->oij", Jx, Jx), prob.point_idx, M)  # (M,3,3)
    bp = jax.ops.segment_sum(
        jnp.einsum("o,oki,ok->oi", prob.weights, Jp, r), prob.frame_idx,
        K)  # (K, 6)
    bx = jax.ops.segment_sum(
        jnp.einsum("o,oki,ok->oi", prob.weights, Jx, r), prob.point_idx,
        M)  # (M, 3)
    Wpx = prob.weights[:, None, None] * jnp.einsum("oki,okj->oij", Jp,
                                                   Jx)  # (O, 6, 3)
    # stack cross blocks per point into (M, K, 6, 3) via a one-hot frame
    # scatter (K is small — keyframe counts)
    onehot = jax.nn.one_hot(prob.frame_idx, K, dtype=Wpx.dtype)  # (O, K)
    F = jax.ops.segment_sum(
        jnp.einsum("ok,oij->okij", onehot, Wpx), prob.point_idx,
        M)  # (M, K, 6, 3)
    return U, V, bp, bx, F


def _schur_solve(U, V, bp, bx, F, damping: float, K: int):
    """Reduced camera solve + point back-substitution -> (dp (K,6), dx)."""
    M = V.shape[0]
    eye3 = jnp.eye(3)
    Vd = V + damping * (jnp.diagonal(V, axis1=-2, axis2=-1)[..., None]
                        * eye3) + 1e-6 * eye3
    V_inv = jnp.linalg.inv(Vd)  # (M, 3, 3)

    Fm = F.reshape(M, K * 6, 3)
    G = Fm @ V_inv  # (M, 6K, 3)
    S_red = jnp.einsum("mik,mjk->ij", G, Fm)  # (6K, 6K)
    # S = blockdiag(U) - S_red, assembled without a python loop
    S = (-S_red).reshape(K, 6, K, 6)
    S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(U)
    S = S.reshape(K * 6, K * 6)
    diag = jnp.diagonal(S)
    S = S + jnp.diag(damping * jnp.abs(diag) + 1e-6)

    b_red = bp.reshape(K * 6) - jnp.einsum("mij,mj->i", G, bx)
    dp = jnp.linalg.solve(S, b_red).reshape(K, 6)
    dx = jnp.einsum("mij,mj->mi", V_inv,
                    bx - jnp.einsum("mji,j->mi", Fm, dp.reshape(K * 6)))
    return dp, dx


def bundle_adjust(prob: BAProblem, cam: Camera, iters: int = 5,
                  damping: float = 1e-3,
                  fix_first_pose: bool = True,
                  point_prior: float = 0.0) -> tuple[Pose, jnp.ndarray]:
    """Single-device BA.

    Gauge freedom is fixed either by freezing pose 0 (fix_first_pose) or
    by a soft prior pulling each point to its INITIAL position with
    weight `point_prior` (px^2/mm^2).  The prior is the right gauge for
    scene-coordinate problems: the initial points come from
    scene-coordinate regression and are already in the ABSOLUTE scene
    frame, so anchoring the map to them keeps every pose comparable to
    ground truth instead of inheriting the frozen camera's error.
    """
    K = prob.poses.t.shape[0]
    M = prob.points.shape[0]
    points_init = prob.points

    def step(carry, _):
        poses, points = carry
        U, V, bp, bx, F = _accumulate(poses, points, prob, cam, K, M)
        if point_prior > 0.0:
            V = V + point_prior * jnp.eye(3)
            bx = bx + point_prior * (points_init - points)
        dp, dx = _schur_solve(U, V, bp, bx, F, damping, K)
        ok = jnp.all(jnp.isfinite(dp)) & jnp.all(jnp.isfinite(dx))
        dp = jnp.where(ok, dp, 0.0)
        dx = jnp.where(ok, dx, 0.0)
        if fix_first_pose:
            dp = dp.at[0].set(0.0)
        new_poses = Pose(jax.vmap(lambda w, R: so3_exp(w) @ R)(
            dp[:, :3], poses.R), poses.t + dp[:, 3:])
        return (new_poses, points + dx), None

    (poses, points), _ = jax.lax.scan(step, (prob.poses, prob.points),
                                      None, length=iters)
    return poses, points


def distributed_bundle_adjust(prob_local: BAProblem, cam: Camera,
                              axis_name: str, iters: int = 5,
                              damping: float = 1e-3,
                              fix_first_pose: bool = True,
                              point_prior: float = 0.0
                              ) -> tuple[Pose, jnp.ndarray]:
    """Shard_map body: observations partitioned over `axis_name`.

    Each device holds its keyframes' observations; poses/points are
    replicated.  Per-point accumulators (V, bx, F) and the per-frame
    blocks (U, bp) are psum'd so the Schur system is global; the reduced
    solve and updates are computed redundantly on every device (they are
    tiny), keeping the result replicated.  The point prior (see
    bundle_adjust) is added AFTER the psum so it is counted once.
    """
    K = prob_local.poses.t.shape[0]
    M = prob_local.points.shape[0]
    points_init = prob_local.points

    def step(carry, _):
        poses, points = carry
        U, V, bp, bx, F = _accumulate(poses, points, prob_local, cam, K, M)
        U, V, bp, bx, F = jax.lax.psum((U, V, bp, bx, F), axis_name)
        if point_prior > 0.0:
            V = V + point_prior * jnp.eye(3)
            bx = bx + point_prior * (points_init - points)
        dp, dx = _schur_solve(U, V, bp, bx, F, damping, K)
        ok = jnp.all(jnp.isfinite(dp)) & jnp.all(jnp.isfinite(dx))
        dp = jnp.where(ok, dp, 0.0)
        dx = jnp.where(ok, dx, 0.0)
        if fix_first_pose:
            dp = dp.at[0].set(0.0)
        new_poses = Pose(jax.vmap(lambda w, R: so3_exp(w) @ R)(
            dp[:, :3], poses.R), poses.t + dp[:, 3:])
        return (new_poses, points + dx), None

    (poses, points), _ = jax.lax.scan(
        step, (prob_local.poses, prob_local.points), None, length=iters)
    return poses, points
