"""Differentiable Gauss-Newton PnP and soft-inlier pose refinement.

Replaces the reference's refinement stack:
  * OpenCV CV_ITERATIVE (LM) re-solves on inlier sets (core/cnn.h:1211,
    core/cnn.h:832)  ->  weighted Gauss-Newton with LM damping, fixed
    iteration counts under lax.scan;
  * hard inlier threshold scan with a 100-point cap and 50-point abort
    (core/cnn.h:1186-1204)  ->  soft sigmoid inlier weights over ALL
    sampled points (on TPU, processing all 1600 points costs the same as
    a capped subset and removes the data-dependent shapes);
  * finite-difference replay dRefine (core/cnn.h:866-990)  ->  plain
    autodiff through the unrolled scan (jax.checkpoint keeps memory flat).

The residual is the 2D reprojection difference (what CV_ITERATIVE
minimises), with analytic per-point Jacobians assembled in-line — cheaper
and more fusion-friendly than jacfwd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsac_tpu.config import Camera
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.geometry.rotation import hat, so3_exp

_EPS = 1e-8


def solve6_cholesky(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 6x6 SPD solve via fully-unrolled Cholesky.

    A: (..., 6, 6) SPD (Jacobi-normalised + damped normal equations),
    b: (..., 6).  XLA lowers batched jnp.linalg.solve to an LU path that
    serialises badly on TPU; the unrolled Cholesky is pure vectorised
    VPU arithmetic over the batch.  Guarded against non-SPD input by
    flooring the pivots (callers damp A, so pivots are positive anyway).
    """
    L = [[None] * 6 for _ in range(6)]
    for i in range(6):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    # forward substitution L y = b
    y = [None] * 6
    for i in range(6):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        s = y[i]
        for k in range(i + 1, 6):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _residuals_and_jac(pose: Pose, obj: jnp.ndarray, pix: jnp.ndarray,
                       cam: Camera):
    """Per-point residual r_i = observed - projected (..., N, 2) and
    Jacobian J_i = d(projected)/d(omega, dt) (..., N, 2, 6).

    Pose increment convention: R' = exp(omega) R, t' = t + dt, so
    d(eye)/d(omega) = -hat(R @ x), d(eye)/d(dt) = I.
    """
    rx = jnp.einsum("...ij,...nj->...ni", pose.R, obj)  # R @ x
    eye = rx + pose.t[..., None, :]
    z = eye[..., 2]
    # 1 mm physical z floor: points this close to the camera plane are
    # garbage, and tighter floors let Jacobian entries grow towards f32
    # overflow, whose NaNs poison gradients even on masked lanes.
    z_safe = jnp.where(jnp.abs(z) < 1.0, jnp.where(z > 0, 1.0, -1.0), z)
    inv_z = 1.0 / z_safe
    f = cam.focal

    u = -f * eye[..., 0] * inv_z + cam.cx
    v = f * eye[..., 1] * inv_z + cam.cy
    r = pix - jnp.stack([u, v], axis=-1)  # (..., N, 2)

    # d(u,v)/d(eye): u = -f ex/ez + cx -> du/de = (-f/ez, 0, f ex/ez^2)
    #                v =  f ey/ez + cy -> dv/de = (0, f/ez, -f ey/ez^2)
    zeros = jnp.zeros_like(z)
    du_de = jnp.stack([-f * inv_z, zeros, f * eye[..., 0] * inv_z * inv_z],
                      axis=-1)
    dv_de = jnp.stack([zeros, f * inv_z, -f * eye[..., 1] * inv_z * inv_z],
                      axis=-1)
    duv_de = jnp.stack([du_de, dv_de], axis=-2)  # (..., N, 2, 3)

    # d(eye)/d(omega, dt): [-hat(R x) | I]  (..., N, 3, 6)
    de_dw = -hat(rx)  # (..., N, 3, 3)
    de_dt = jnp.broadcast_to(jnp.eye(3, dtype=obj.dtype), de_dw.shape)
    de_dp = jnp.concatenate([de_dw, de_dt], axis=-1)  # (..., N, 3, 6)

    J = duv_de @ de_dp  # (..., N, 2, 6)
    return r, J


def gn_pnp(pose: Pose, obj: jnp.ndarray, pix: jnp.ndarray,
           weights: jnp.ndarray, cam: Camera, iters: int = 4,
           damping: float = 1e-4) -> Pose:
    """Weighted Gauss-Newton PnP from an initial pose.

    obj: (..., N, 3), pix: (..., N, 2), weights: (..., N) >= 0.
    Fixed `iters` LM-damped steps; non-finite updates are rejected
    (keeping the previous pose), mirroring the reference's NaN aborts
    (core/cnn.h:1214-1215).
    """
    def step(carry, _):
        p = carry
        r, J = _residuals_and_jac(p, obj, pix, cam)
        wJ = weights[..., None, None] * J  # (..., N, 2, 6)
        JtJ = jnp.einsum("...nki,...nkj->...ij", wJ, J)  # (..., 6, 6)
        Jtr = jnp.einsum("...nki,...nk->...i", wJ, r)  # (..., 6)
        # Jacobi-normalised, floor-regularised solve.  This must be
        # NaN-FREE even for singular systems (degenerate minimal sets on
        # masked hypothesis lanes): jnp.linalg.solve's VJP multiplies by
        # its primal solution, so a NaN forward here poisons the shared
        # coordinate gradient regardless of downstream masking.  With a
        # unit diagonal + absolute damping the system is always
        # invertible in f32.
        diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)
        dn = jax.lax.rsqrt(diag + 1e-12)  # (..., 6)
        A = dn[..., :, None] * JtJ * dn[..., None, :]
        A = A + (damping + 1e-6) * jnp.eye(6, dtype=r.dtype)
        y = solve6_cholesky(A, dn * Jtr)
        delta = jnp.clip(dn * y, -1e4, 1e4)  # (..., 6); mm / rad bounds
        ok = jnp.all(jnp.isfinite(delta), axis=-1, keepdims=True)
        delta = jnp.where(ok, delta, 0.0)
        new_R = so3_exp(delta[..., :3]) @ p.R
        new_t = p.t + delta[..., 3:]
        return Pose(new_R, new_t), None

    out, _ = jax.lax.scan(step, pose, None, length=iters)
    return out


def soft_inlier_weights(errors: jnp.ndarray, threshold: float,
                        beta: float) -> jnp.ndarray:
    """sigma((tau - r)/beta): smooth version of the reference's hard
    ``diffMap < inlierThreshold2D`` test (core/cnn.h:1192)."""
    return jax.nn.sigmoid((threshold - errors) / beta)


def refine_pose(pose: Pose, obj: jnp.ndarray, pix: jnp.ndarray, cam: Camera,
                steps: int = 8, inner_iters: int = 2,
                threshold: float = 10.0, beta: float = 1.0,
                min_inliers: float = 50.0, damping: float = 1e-4,
                max_error: float = 100.0,
                remat: bool = True) -> tuple[Pose, jnp.ndarray]:
    """Iteratively-reweighted refinement of one (or a batch of) pose(s).

    Mirrors the refinement loop in processImage (core/cnn.h:1168-1230):
      per outer step: recompute reprojection errors -> inlier weights ->
      PnP re-solve seeded with the current pose.  Aborts (freezes the pose)
      when the soft inlier mass drops below `min_inliers`, the analogue of
      the reference's ``localImgPts.size() < 50`` break (core/cnn.h:1203).

    Returns (refined_pose, final_soft_inlier_count).
    """
    def outer(carry, _):
        p, alive = carry
        r, _J = _residuals_and_jac(p, obj, pix, cam)
        err = jnp.sqrt(jnp.sum(r * r, axis=-1) + _EPS)
        err = jnp.minimum(err, max_error)
        w = soft_inlier_weights(err, threshold, beta)
        n_in = jnp.sum(w, axis=-1)
        alive = jnp.logical_and(alive, n_in >= min_inliers)

        new_p = gn_pnp(p, obj, pix, w, cam, iters=inner_iters,
                       damping=damping)
        ok = (jnp.all(jnp.isfinite(new_p.R), axis=(-2, -1))
              & jnp.all(jnp.isfinite(new_p.t), axis=-1))
        keep = jnp.logical_and(alive, ok)
        p = Pose(jnp.where(keep[..., None, None], new_p.R, p.R),
                 jnp.where(keep[..., None], new_p.t, p.t))
        return (p, alive), n_in

    fn = jax.checkpoint(outer) if remat else outer
    alive0 = jnp.ones(pose.t.shape[:-1], bool)
    (refined, _), counts = jax.lax.scan(fn, (pose, alive0), None, length=steps)
    return refined, counts[-1]


def refine_pose_hard(pose: Pose, obj: jnp.ndarray, pix: jnp.ndarray,
                     cam: Camera, steps: int = 8, inner_iters: int = 2,
                     threshold: float = 10.0, inlier_cap: int = 100,
                     min_inliers: float = 50.0, damping: float = 1e-4,
                     max_error: float = 100.0,
                     key: jax.Array | None = None
                     ) -> tuple[Pose, jnp.ndarray]:
    """Reference-faithful refinement: hard threshold + capped re-solves.

    Ablation twin of `refine_pose` reproducing the reference's exact
    inlier policy (core/cnn.h:1186-1204): a point is an inlier iff its
    reprojection error < `threshold` (hard, not sigmoid), each re-solve
    sees at most `inlier_cap` inliers (rB=100 — a uniform random subset,
    like the reference's arbitrary trim of the collected inlier list;
    a *best-by-error* cap would concentrate on one image region and
    bias the solve), and refinement aborts once fewer than `min_inliers`
    hard inliers remain.  Eval-only: the hard gates have zero/undefined
    gradients, so training uses the soft-weight path.

    Returns (refined_pose, final hard inlier count).
    """
    N = obj.shape[-2]
    perm = jax.random.permutation(
        key if key is not None else jax.random.PRNGKey(0), N)
    inv = jnp.argsort(perm)

    def outer(carry, _):
        p, alive = carry
        r, _J = _residuals_and_jac(p, obj, pix, cam)
        err = jnp.sqrt(jnp.sum(r * r, axis=-1) + _EPS)
        err = jnp.minimum(err, max_error)
        inl = err < threshold
        n_in = jnp.sum(inl, axis=-1)
        alive = jnp.logical_and(alive, n_in >= min_inliers)

        # cap: the first `inlier_cap` inliers in a random point order —
        # a uniform random subset with full spatial spread
        inl_p = inl[..., perm]
        csum = jnp.cumsum(inl_p.astype(jnp.int32), axis=-1)
        keep_p = inl_p & (csum <= inlier_cap)
        w = keep_p[..., inv].astype(obj.dtype)

        new_p = gn_pnp(p, obj, pix, w, cam, iters=inner_iters,
                       damping=damping)
        ok = (jnp.all(jnp.isfinite(new_p.R), axis=(-2, -1))
              & jnp.all(jnp.isfinite(new_p.t), axis=-1))
        keep = jnp.logical_and(alive, ok)
        p = Pose(jnp.where(keep[..., None, None], new_p.R, p.R),
                 jnp.where(keep[..., None], new_p.t, p.t))
        return (p, alive), n_in

    alive0 = jnp.ones(pose.t.shape[:-1], bool)
    (refined, _), counts = jax.lax.scan(outer, (pose, alive0), None,
                                        length=steps)
    return refined, counts[-1].astype(jnp.float32)


def implicit_refine_step(pose_star: Pose, obj: jnp.ndarray,
                         pix: jnp.ndarray, cam: Camera,
                         threshold: float = 10.0, beta: float = 1.0,
                         damping: float = 1e-4,
                         max_error: float = 100.0) -> Pose:
    """One differentiable IRLS step from a (stop-gradient) fixed point.

    Training-speed companion to the fused Pallas refinement
    (ops/gn_pallas.py, which has no VJP): run the fused solver to
    convergence under stop_gradient, then take ONE jnp GN step from the
    converged pose.  At an IRLS fixed point the update is ~0, so the
    value is unchanged, while the autodiff derivative of this step is the
    implicit-function derivative of the fixed point w.r.t. the
    coordinates — notably independent of the P3P initialisation, which is
    mathematically correct at convergence (the reference's dRefine keeps
    the init dependence because its 8-step refinement may not converge).
    """
    pose_star = jax.tree.map(jax.lax.stop_gradient, pose_star)
    r, _ = _residuals_and_jac(pose_star, obj, pix, cam)
    err = jnp.minimum(jnp.sqrt(jnp.sum(r * r, axis=-1) + _EPS), max_error)
    w = soft_inlier_weights(err, threshold, beta)
    return gn_pnp(pose_star, obj, pix, w, cam, iters=1, damping=damping)
