"""Fused Pallas kernel for the Gauss-Newton refinement statistics.

The refinement inner loop (geometry/gn.py) spends its time assembling
per-point 2x6 Jacobians as (H, N, 2, 6) HBM tensors and reducing them to
(H, 6, 6) normal equations — memory-bound elementwise work (~7 ms per
pass for H=256, N=1600 on v5e, x24 passes per refine-all).  This kernel
computes, in ONE pass per (hypothesis-tile, point-tile) block with
everything in registers/VMEM:

    soft inlier weights  w_i = sigmoid((tau - r_i)/beta)   (clamped r)
    Jacobian rows        J_u, J_v   (closed form, never materialised)
    JtJ (21 unique entries), Jtr (6), soft inlier count (1)

i.e. the complete IRLS statistics [28 floats per hypothesis], reducing
HBM traffic from ~500 MB to ~kilobytes per pass.  The 6x6 solve + pose
update stay in jnp (they are tiny); see refine_pose_fused.

Used on the serve/eval path; training uses the autodiff-able jnp
implementation (a custom VJP for this kernel is future work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsac_tpu.config import Camera
from dsac_tpu.geometry.gn import solve6_cholesky
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.geometry.rotation import so3_exp

_TH = 64
_TN = 512
_NSTAT = 28  # 21 JtJ + 6 Jtr + 1 soft-inlier count


def _irls_stats_kernel(pose_ref, coords_ref, pix_ref, cam_ref, out_ref):
    poses = pose_ref[:]  # (TH, 12) rows of R then t
    xs = coords_ref[0:1, :]
    ys = coords_ref[1:2, :]
    zs = coords_ref[2:3, :]
    mask = coords_ref[3:4, :]
    f = cam_ref[0]
    cx = cam_ref[1]
    cy = cam_ref[2]
    max_err = cam_ref[3]
    tau = cam_ref[4]
    inv_beta = cam_ref[5]

    def col(i):
        return poses[:, i][:, None]  # (TH, 1)

    # a = R @ x (rotated point), e = a + t
    ax = col(0) * xs + col(1) * ys + col(2) * zs
    ay = col(3) * xs + col(4) * ys + col(5) * zs
    az = col(6) * xs + col(7) * ys + col(8) * zs
    ex = ax + col(9)
    ey = ay + col(10)
    ez = az + col(11)
    # physical 1 mm z-floor (matches geometry/gn.py)
    ez = jnp.where(jnp.abs(ez) < 1.0, jnp.where(ez > 0, 1.0, -1.0), ez)
    inv_z = 1.0 / ez
    fz = f * inv_z
    u = -fz * ex + cx
    v = fz * ey + cy
    ru = pix_ref[0:1, :] - u
    rv = pix_ref[1:2, :] - v
    err = jnp.sqrt(ru * ru + rv * rv + 1e-8)
    err_c = jnp.minimum(err, max_err)
    w = jax.nn.sigmoid((tau - err_c) * inv_beta) * mask

    # J rows (du/dp, dv/dp) in closed form:
    #   du/de = (-f/z, 0, f*ex/z^2) ; dv/de = (0, f/z, -f*ey/z^2)
    #   de/dw = -hat(a) ; de/dt = I
    gx = fz * ex * inv_z  # f*ex/z^2
    gy = fz * ey * inv_z
    ju0 = -fz * 0.0 + gx * ay          # du/dw_x: (-f/z)*0 + gx*ay
    ju1 = -fz * az - gx * ax           # du/dw_y
    ju2 = fz * ay                      # du/dw_z: (-f/z)*(-ay)
    ju3 = -fz                          # du/dt_x
    ju4 = jnp.zeros_like(ju0)
    ju5 = gx
    jv0 = -fz * az - gy * ay           # dv/dw_x: fz*(-az) + (-gy)*(ay)
    jv1 = gy * ax                      # dv/dw_y: (-gy)*(-ax)
    jv2 = fz * ax                      # dv/dw_z
    jv3 = jnp.zeros_like(jv0)
    jv4 = fz
    jv5 = -gy

    ju = (ju0, ju1, ju2, jnp.broadcast_to(ju3, ju0.shape), ju4, ju5)
    jv = (jv0, jv1, jv2, jv3, jnp.broadcast_to(jv4, jv0.shape), jv5)

    stats = []
    for i in range(6):
        for j in range(i, 6):
            stats.append(jnp.sum(w * (ju[i] * ju[j] + jv[i] * jv[j]),
                                 axis=1, keepdims=True))
    for i in range(6):
        stats.append(jnp.sum(w * (ju[i] * ru + jv[i] * rv), axis=1,
                             keepdims=True))
    stats.append(jnp.sum(w, axis=1, keepdims=True))
    block = jnp.concatenate(stats, axis=1)  # (TH, 28)

    jb = pl.program_id(1)

    @pl.when(jb == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += block


@functools.partial(jax.jit, static_argnames=("interpret",))
def irls_stats(hyps_R: jnp.ndarray, hyps_t: jnp.ndarray,
               coords: jnp.ndarray, pix: jnp.ndarray,
               cam_vec: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(H, 28) fused IRLS statistics.  cam_vec = [f, cx, cy, max_err, tau,
    1/beta] float32."""
    H = hyps_R.shape[0]
    N = coords.shape[0]
    Hp = -(-H // _TH) * _TH
    Np = -(-N // _TN) * _TN

    poses = jnp.concatenate([hyps_R.reshape(H, 9), hyps_t], axis=-1)
    poses = jnp.pad(poses, ((0, Hp - H), (0, 0)))
    coords_m = jnp.concatenate([coords.T, jnp.ones((1, N), jnp.float32)],
                               axis=0)
    coords_m = jnp.pad(coords_m, ((0, 0), (0, Np - N)),
                       constant_values=-1.0)
    coords_m = coords_m.at[3, N:].set(0.0)  # mask off padding
    pix_t = jnp.pad(pix.T, ((0, 0), (0, Np - N)))

    out = pl.pallas_call(
        _irls_stats_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, _NSTAT), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Hp // _TH, Np // _TN),
            in_specs=[
                pl.BlockSpec((_TH, 12), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, _TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, _TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_TH, _NSTAT), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(poses, coords_m, pix_t, cam_vec)
    return out[:H]


def unpack_stats(stats: jnp.ndarray):
    """(H, 28) -> (JtJ (H, 6, 6), Jtr (H, 6), n_in (H,))."""
    H = stats.shape[0]
    iu = jnp.triu_indices(6)
    JtJ = jnp.zeros((H, 6, 6), stats.dtype)
    JtJ = JtJ.at[:, iu[0], iu[1]].set(stats[:, :21])
    JtJ = JtJ + jnp.triu(JtJ, 1).transpose(0, 2, 1)
    Jtr = stats[:, 21:27]
    n_in = stats[:, 27]
    return JtJ, Jtr, n_in


def refine_pose_fused(poses: Pose, coords: jnp.ndarray, pix: jnp.ndarray,
                      cam: Camera, steps: int = 16, threshold: float = 10.0,
                      beta: float = 1.0, min_inliers: float = 50.0,
                      damping: float = 1e-4, max_error: float = 100.0,
                      interpret: bool = False) -> tuple[Pose, jnp.ndarray]:
    """IRLS refinement of a whole hypothesis pool with the fused kernel.

    Equivalent fixed point to geometry/gn.py:refine_pose (weights
    recomputed every step; one GN solve per step — use ~2x the steps of
    the 2-inner-iteration jnp version).  Serve/eval path only (no VJP).
    """
    cam_vec = jnp.asarray([cam.focal, cam.cx, cam.cy, max_error, threshold,
                           1.0 / beta], jnp.float32)

    def step(carry, _):
        p, alive = carry
        stats = irls_stats(p.R, p.t, coords, pix, cam_vec,
                           interpret=interpret)
        JtJ, Jtr, n_in = unpack_stats(stats)
        alive = jnp.logical_and(alive, n_in >= min_inliers)
        diag = jnp.diagonal(JtJ, axis1=-2, axis2=-1)
        dn = jax.lax.rsqrt(diag + 1e-12)
        A = dn[..., :, None] * JtJ * dn[..., None, :]
        A = A + (damping + 1e-6) * jnp.eye(6, dtype=A.dtype)
        y = solve6_cholesky(A, dn * Jtr)
        delta = jnp.clip(dn * y, -1e4, 1e4)
        ok = jnp.all(jnp.isfinite(delta), axis=-1)
        keep = alive & ok
        delta = jnp.where(keep[..., None], delta, 0.0)
        new_R = so3_exp(delta[..., :3]) @ p.R
        new_t = p.t + delta[..., 3:]
        return (Pose(new_R, new_t), alive), n_in

    alive0 = jnp.ones(poses.t.shape[:-1], bool)
    (refined, _), counts = jax.lax.scan(step, (poses, alive0), None,
                                        length=steps)
    return refined, counts[-1]
