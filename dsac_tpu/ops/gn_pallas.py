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

Used on the serve/eval path.  Training gradients: the coordinate path
uses the implicit-function step (geometry/gn.py:implicit_refine_step);
the init-pose path uses make_init_sensitivity_refiner below — a custom
VJP whose backward is the reference's central-difference dRefineHyp
batched into one extra kernel launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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


def refine_pose_fused_steps(poses: Pose, coords: jnp.ndarray,
                            pix: jnp.ndarray, cam: Camera, steps: int = 16,
                            threshold: float = 10.0, beta: float = 1.0,
                            min_inliers: float = 50.0, damping: float = 1e-4,
                            max_error: float = 100.0,
                            interpret: bool = False
                            ) -> tuple[Pose, jnp.ndarray]:
    """IRLS refinement as a scan of per-step kernel launches.

    Equivalent fixed point to geometry/gn.py:refine_pose (weights
    recomputed every step; one GN solve per step — use ~2x the steps of
    the 2-inner-iteration jnp version).  Serve/eval path only (no VJP).
    Superseded on TPU by the single-launch refine_pose_fused below (this
    variant pays `steps` kernel launches + scan overhead); kept as the
    cross-checkable reference for it.
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


# ---------------------------------------------------------------------------
# Single-launch variant: the WHOLE IRLS loop (steps x [stats -> Jacobi-
# normalised damped 6x6 Cholesky solve -> Rodrigues pose update]) inside
# one kernel.  The per-step launch + scan overhead of the variant above
# (~0.15 ms x steps over the remote tunnel) disappears; pose state lives
# in registers for the whole refinement.
# ---------------------------------------------------------------------------

_TRI = [(i, j) for i in range(6) for j in range(i, 6)]
_TRI_IDX = {ij: k for k, ij in enumerate(_TRI)}


def _mat_at(m, i, j):
    """Upper-triangle stats list -> symmetric element."""
    return m[_TRI_IDX[(i, j)]] if i <= j else m[_TRI_IDX[(j, i)]]


def _refine_kernel(pose_ref, coords_ref, pix_ref, cam_ref, out_ref, *,
                   steps: int, n_chunks: int, tn: int):
    """Full IRLS refinement for one tile of TH hypotheses.

    pose_ref: (TH, 12) [R row-major | t]; coords_ref: (4, Np) xyz+mask;
    pix_ref: (2, Np); cam_ref: SMEM (8,) [f, cx, cy, max_err, tau,
    1/beta, min_inliers, damping]; out_ref: (TH, 13) [R | t | n_in].
    """
    f = cam_ref[0]
    cx = cam_ref[1]
    cy = cam_ref[2]
    max_err = cam_ref[3]
    tau = cam_ref[4]
    inv_beta = cam_ref[5]
    min_inliers = cam_ref[6]
    damping = cam_ref[7]

    pose0 = pose_ref[:]  # (TH, 12)
    # Mosaic requires a layout-uniform loop carry: a SINGLE (TH, 16) f32
    # matrix [R row-major | t | alive | n_in | pad2], rebuilt by one
    # concatenate per iteration.  (A pytree of per-column (TH, 1) slices
    # keeps each slice's source lane offset and mixes i1/f32 vregs, which
    # fails scf.for legalization on the real TPU backend.)
    carry0 = jnp.concatenate(
        [pose0, jnp.ones((pose0.shape[0], 1), pose0.dtype),
         jnp.zeros((pose0.shape[0], 3), pose0.dtype)], axis=1)

    def body(_, m):
        R = [m[:, i:i + 1] for i in range(9)]
        t = [m[:, 9 + i:10 + i] for i in range(3)]
        alive = m[:, 12:13] > 0.5

        acc = [jnp.zeros_like(R[0]) for _ in range(28)]
        for c in range(n_chunks):
            sl = slice(c * tn, (c + 1) * tn)
            xs = coords_ref[0:1, sl]
            ys = coords_ref[1:2, sl]
            zs = coords_ref[2:3, sl]
            mask = coords_ref[3:4, sl]

            ax = R[0] * xs + R[1] * ys + R[2] * zs
            ay = R[3] * xs + R[4] * ys + R[5] * zs
            az = R[6] * xs + R[7] * ys + R[8] * zs
            ex = ax + t[0]
            ey = ay + t[1]
            ez = az + t[2]
            ez = jnp.where(jnp.abs(ez) < 1.0,
                           jnp.where(ez > 0, 1.0, -1.0), ez)
            inv_z = 1.0 / ez
            fz = f * inv_z
            u = -fz * ex + cx
            v = fz * ey + cy
            ru = pix_ref[0:1, sl] - u
            rv = pix_ref[1:2, sl] - v
            err = jnp.sqrt(ru * ru + rv * rv + 1e-8)
            w = jax.nn.sigmoid((tau - jnp.minimum(err, max_err))
                               * inv_beta) * mask

            gx = fz * ex * inv_z
            gy = fz * ey * inv_z
            zero = jnp.zeros_like(ax)
            ju = (gx * ay, -fz * az - gx * ax, fz * ay,
                  jnp.broadcast_to(-fz, ax.shape), zero, gx)
            jv = (-fz * az - gy * ay, gy * ax, fz * ax,
                  zero, jnp.broadcast_to(fz, ax.shape), -gy)

            k = 0
            for i in range(6):
                for j in range(i, 6):
                    acc[k] += jnp.sum(w * (ju[i] * ju[j] + jv[i] * jv[j]),
                                      axis=1, keepdims=True)
                    k += 1
            for i in range(6):
                acc[21 + i] += jnp.sum(w * (ju[i] * ru + jv[i] * rv),
                                       axis=1, keepdims=True)
            acc[27] += jnp.sum(w, axis=1, keepdims=True)

        n_in = acc[27]
        alive = alive & (n_in >= min_inliers)

        # Jacobi normalisation + damping, then unrolled 6x6 Cholesky —
        # every scalar below is a (TH, 1) vector across hypotheses.
        dn = [jax.lax.rsqrt(_mat_at(acc, i, i) + 1e-12) for i in range(6)]
        A = {(i, j): dn[i] * dn[j] * _mat_at(acc, i, j)
             + ((damping + 1e-6) if i == j else 0.0)
             for i in range(6) for j in range(i, 6)}
        b = [dn[i] * acc[21 + i] for i in range(6)]

        L = [[None] * 6 for _ in range(6)]
        for i in range(6):
            for j in range(i + 1):
                s = A[(j, i)]
                for k2 in range(j):
                    s = s - L[i][k2] * L[j][k2]
                if i == j:
                    L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
                else:
                    L[i][j] = s / L[j][j]
        y = [None] * 6
        for i in range(6):
            s = b[i]
            for k2 in range(i):
                s = s - L[i][k2] * y[k2]
            y[i] = s / L[i][i]
        x = [None] * 6
        for i in reversed(range(6)):
            s = y[i]
            for k2 in range(i + 1, 6):
                s = s - L[k2][i] * x[k2]
            x[i] = s / L[i][i]

        delta = [jnp.clip(dn[i] * x[i], -1e4, 1e4) for i in range(6)]
        ok = alive
        for d in delta:
            ok = ok & (d == d) & (jnp.abs(d) < 1e30)
        delta = [jnp.where(ok, d, 0.0) for d in delta]

        # Rodrigues: R_new = exp(hat(w)) @ R (geometry/rotation.py:so3_exp)
        wx, wy, wz = delta[0], delta[1], delta[2]
        th2 = wx * wx + wy * wy + wz * wz
        small = th2 < 1e-8
        th = jnp.sqrt(jnp.where(small, 1.0, th2))
        ca = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
        cb = jnp.where(small, 0.5 - th2 / 24.0,
                       (1.0 - jnp.cos(th)) / jnp.where(small, 1.0, th2))
        # dR = I + ca*W + cb*W^2, W = hat(w)
        dR = [1.0 + cb * (-wz * wz - wy * wy),
              -ca * wz + cb * wx * wy,
              ca * wy + cb * wx * wz,
              ca * wz + cb * wx * wy,
              1.0 + cb * (-wz * wz - wx * wx),
              -ca * wx + cb * wy * wz,
              -ca * wy + cb * wx * wz,
              ca * wx + cb * wy * wz,
              1.0 + cb * (-wy * wy - wx * wx)]
        newR = [dR[3 * i + 0] * R[0 + j] + dR[3 * i + 1] * R[3 + j]
                + dR[3 * i + 2] * R[6 + j]
                for i in range(3) for j in range(3)]
        newt = [t[i] + delta[3 + i] for i in range(3)]
        alive_f = jnp.where(alive, 1.0, 0.0)
        return jnp.concatenate(
            newR + newt + [alive_f, n_in, jnp.zeros_like(n_in),
                           jnp.zeros_like(n_in)], axis=1)

    m = jax.lax.fori_loop(0, steps, body, carry0)
    out_ref[:, :12] = m[:, :12]
    out_ref[:, 12:13] = m[:, 13:14]


@functools.partial(jax.jit,
                   static_argnames=("steps", "threshold", "beta",
                                    "min_inliers", "damping", "max_error",
                                    "interpret"))
def refine_pose_fused(poses: Pose, coords: jnp.ndarray, pix: jnp.ndarray,
                      cam: Camera, steps: int = 16, threshold: float = 10.0,
                      beta: float = 1.0, min_inliers: float = 50.0,
                      damping: float = 1e-4, max_error: float = 100.0,
                      interpret: bool = False) -> tuple[Pose, jnp.ndarray]:
    """Single-launch fused IRLS refinement of a hypothesis pool.

    Same fixed point and guard semantics as refine_pose_fused_steps /
    geometry/gn.py:refine_pose, but the entire `steps`-iteration loop —
    statistics, Jacobi-normalised damped Cholesky solve, Rodrigues
    update, min-inlier freeze — runs inside ONE Pallas launch per
    hypothesis tile.  Serve/eval path only (no VJP).
    """
    H = poses.t.shape[0]
    N = coords.shape[0]
    tn = _TN
    Hp = -(-H // _TH) * _TH
    Np = -(-N // tn) * tn

    pose12 = jnp.concatenate([poses.R.reshape(H, 9), poses.t], axis=-1)
    pose12 = jnp.pad(pose12, ((0, Hp - H), (0, 0)))
    # padded hypotheses get an identity-ish row; their updates are junk
    # but masked off by the final slice
    pose12 = pose12.at[H:, 0].set(1.0)

    coords_m = jnp.concatenate([coords.T, jnp.ones((1, N), jnp.float32)],
                               axis=0)
    coords_m = jnp.pad(coords_m, ((0, 0), (0, Np - N)),
                       constant_values=-1.0)
    coords_m = coords_m.at[3, N:].set(0.0)  # mask off padding
    pix_t = jnp.pad(pix.T, ((0, 0), (0, Np - N)))
    cam8 = jnp.asarray([cam.focal, cam.cx, cam.cy, max_error, threshold,
                        1.0 / beta, min_inliers, damping], jnp.float32)

    kernel = functools.partial(_refine_kernel, steps=steps,
                               n_chunks=Np // tn, tn=tn)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, 13), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Hp // _TH,),
            in_specs=[
                pl.BlockSpec((_TH, 12), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, Np), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, Np), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_TH, 13), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pose12, coords_m, pix_t, cam8)

    out = out[:H]
    return Pose(out[:, :9].reshape(H, 3, 3), out[:, 9:12]), out[:, 12]


# ---------------------------------------------------------------------------
# Init-pose gradient for the fused refiner: the reference's dRefineHyp
# (cnn_softam.h:738-836) is a 6x6 central-difference Jacobian of the
# truncated refinement w.r.t. its initial pose (eps = 0.001 rad / 1 mm).
# Here the same Jacobian-transpose product is the custom VJP of the fused
# kernel: all 12 probe refinements of every hypothesis run as ONE extra
# Pallas launch (a (12H)-lane pool), replacing the jnp unrolled refine
# that the softam inject_init path used to differentiate through.
# ---------------------------------------------------------------------------

# hat(e_i) basis — a NUMPY constant deliberately: this module is
# imported lazily from inside traced code (make_refiners under
# shard_map), and a module-level jnp array created during a trace
# becomes a leaked tracer poisoning every later use
_E_SKEW = np.asarray(
    [[[0.0, 0, 0], [0, 0, -1], [0, 1, 0]],
     [[0.0, 0, 1], [0, 0, 0], [-1, 0, 0]],
     [[0.0, -1, 0], [1, 0, 0], [0, 0, 0]]], np.float32)


def make_init_sensitivity_refiner(cam: Camera, steps: int,
                                  threshold: float, beta: float,
                                  min_inliers: float, damping: float,
                                  max_error: float,
                                  interpret: bool = False,
                                  eps_rot: float = 1e-3,
                                  eps_t: float = 1.0):
    """refine(R (B,3,3), t (B,3), coords, pix) -> (R*, t*) with an FD
    init-pose VJP.

    Forward = refine_pose_fused at the given truncated step count.
    Backward = J_init^T g, J_init estimated by central differences over
    the 6 tangent dims (R_in = exp(+-eps_rot e_i) R, t_in = t +- eps_t
    e_i) — the truncated-iteration init sensitivity the reference's
    dRefineHyp measures (an implicit-function gradient would be exactly
    zero at a converged fixed point and kill softam's score path).
    coords/pix are runtime ARGUMENTS (they are traced values in the
    pipeline — closing over them leaks tracers out of custom_vjp) and
    receive ZERO cotangents: the coordinate path is the implicit-
    function step's job (make_refiners), adding it here would double-
    count.
    """
    kw = dict(steps=steps, threshold=threshold, beta=beta,
              min_inliers=min_inliers, damping=damping,
              max_error=max_error, interpret=interpret)
    # numpy, not jnp: the factory runs inside traced code (make_refiners
    # under jit/shard_map) and the closure must not capture tracers
    eps = np.asarray([eps_rot] * 3 + [eps_t] * 3, np.float32)

    @jax.custom_vjp
    def refine(R, t, coords, pix):
        out, _n = refine_pose_fused(Pose(R, t), coords, pix, cam, **kw)
        return out.R, out.t

    def fwd(R, t, coords, pix):
        return refine(R, t, coords, pix), (R, t, coords, pix)

    def bwd(res, g):
        R, t, coords, pix = res
        gR, gt = g
        B = R.shape[0]
        # probe pool: (6 dims x {+,-} x B) perturbed init poses
        axes = jnp.eye(3, dtype=jnp.float32)
        dR = so3_exp(eps_rot * axes)  # (3, 3, 3): exp(+eps hat(e_i))
        dRm = so3_exp(-eps_rot * axes)
        Rp = jnp.concatenate([
            jnp.einsum("iab,nbc->inac", dR, R).reshape(3 * B, 3, 3),
            jnp.broadcast_to(R, (3, B, 3, 3)).reshape(3 * B, 3, 3),
            jnp.einsum("iab,nbc->inac", dRm, R).reshape(3 * B, 3, 3),
            jnp.broadcast_to(R, (3, B, 3, 3)).reshape(3 * B, 3, 3),
        ])  # (12B, 3, 3)
        t_off = eps_t * jnp.eye(3, dtype=t.dtype)
        tp = jnp.concatenate([
            jnp.broadcast_to(t, (3, B, 3)).reshape(3 * B, 3),
            (t[None] + t_off[:, None]).reshape(3 * B, 3),
            jnp.broadcast_to(t, (3, B, 3)).reshape(3 * B, 3),
            (t[None] - t_off[:, None]).reshape(3 * B, 3),
        ])  # (12B, 3)
        out, _n = refine_pose_fused(Pose(Rp, tp), coords, pix, cam, **kw)
        oR = out.R.reshape(2, 6, B, 3, 3)  # [{+,-}, dim, B, ...]
        ot = out.t.reshape(2, 6, B, 3)
        JR = (oR[0] - oR[1]) / (2.0 * eps.reshape(6, 1, 1, 1))  # (6,B,3,3)
        Jt = (ot[0] - ot[1]) / (2.0 * eps.reshape(6, 1, 1))  # (6, B, 3)
        # v_i = <g, d(out)/d(tangent_i)>  -> gradient in (omega, dt)
        v = (jnp.einsum("ibjk,bjk->bi", JR, gR)
             + jnp.einsum("ibj,bj->bi", Jt, gt))  # (B, 6)
        # pull the rotation tangent back to an R-matrix cotangent:
        # omega_i = 0.5 tr(hat(e_i)^T dR0 R0^T)  =>
        # gR0 = 0.5 sum_i v_i hat(e_i) R0   (verified: chains to identity
        # through so3_exp/pose_from_vec6 upstream)
        gR0 = 0.5 * jnp.einsum("bi,ijk,bkl->bjl", v[:, :3], _E_SKEW, R)
        gt0 = v[:, 3:]
        return gR0, gt0, jnp.zeros_like(coords), jnp.zeros_like(pix)

    refine.defvjp(fwd, bwd)
    return refine
