"""Pallas TPU kernel for the dense (hypotheses x pixels) scoring surface.

The (H, N) clamped-reprojection-error computation (ops/diffmap.py) is the
per-frame hot kernel the reference evaluates serially per hypothesis
(core/cnn.h:1136-1138).  For the large-H regimes (4k-16k hypotheses,
BASELINE.json config 4) this Pallas version:

  * tiles H into VPU-aligned blocks, keeping the full coordinate block
    in VMEM and streaming pose tiles;
  * fuses transform + projection + norm + clamp + (optionally) the
    soft-inlier score reduction in one pass, so the (H, N) surface never
    round-trips to HBM when only the (H,) scores are needed.

Layout notes: poses are passed as a flattened (H, 12) [R | t] block; the
coordinate block is kept as (3, N) so each kernel line is a (TH, 1) x
(1, TN) broadcast on the VPU — N is the 128-lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 64  # hypothesis tile (sublane-aligned x8)
_TN = 512  # pixel tile (lane-aligned x128)


def _diffmap_kernel(pose_ref, coords_ref, pix_ref, cam_ref, out_ref):
    """One (TH, TN) tile of clamped reprojection errors."""
    poses = pose_ref[:]  # (TH, 12): rows of R then t
    xs = coords_ref[0:1, :]  # (1, TN)
    ys = coords_ref[1:2, :]
    zs = coords_ref[2:3, :]
    f = cam_ref[0]
    cx = cam_ref[1]
    cy = cam_ref[2]
    max_err = cam_ref[3]

    def col(i):
        return poses[:, i][:, None]  # (TH, 1)

    ex = col(0) * xs + col(1) * ys + col(2) * zs + col(9)
    ey = col(3) * xs + col(4) * ys + col(5) * zs + col(10)
    ez = col(6) * xs + col(7) * ys + col(8) * zs + col(11)
    ez = jnp.where(jnp.abs(ez) < 1e-8, -1e-8, ez)
    inv_z = 1.0 / ez
    u = -f * ex * inv_z + cx
    v = f * ey * inv_z + cy
    du = pix_ref[0:1, :] - u
    dv = pix_ref[1:2, :] - v
    err = jnp.sqrt(du * du + dv * dv + 1e-8)
    out_ref[:] = jnp.minimum(err, max_err)


@functools.partial(jax.jit, static_argnames=("max_error", "interpret"))
def diffmaps_pallas(hyps_R: jnp.ndarray, hyps_t: jnp.ndarray,
                    coords: jnp.ndarray, pix: jnp.ndarray,
                    cam_vec: jnp.ndarray, max_error: float = 100.0,
                    interpret: bool = False) -> jnp.ndarray:
    """(H, N) clamped reprojection errors.

    hyps_R: (H, 3, 3); hyps_t: (H, 3); coords: (N, 3) mm; pix: (N, 2);
    cam_vec: (3,) [f, cx, cy].  H and N are padded to tile multiples
    internally; callers slice the result.
    """
    H = hyps_R.shape[0]
    N = coords.shape[0]
    Hp = -(-H // _TH) * _TH
    Np = -(-N // _TN) * _TN

    poses = jnp.concatenate([hyps_R.reshape(H, 9), hyps_t], axis=-1)
    poses = jnp.pad(poses, ((0, Hp - H), (0, 0)))
    # pad with z = -1 to keep the guarded divide well-behaved
    coords_t = jnp.pad(coords.T, ((0, 0), (0, Np - N)),
                       constant_values=-1.0)  # (3, Np)
    pix_t = jnp.pad(pix.T, ((0, 0), (0, Np - N)))  # (2, Np)
    cam4 = jnp.concatenate([cam_vec, jnp.asarray([max_error],
                                                 cam_vec.dtype)])

    grid = (Hp // _TH, Np // _TN)
    out = pl.pallas_call(
        _diffmap_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, Np), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TH, 12), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, _TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, _TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_TH, _TN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(poses, coords_t, pix_t, cam4)
    return out[:H, :N]


def _score_kernel(pose_ref, coords_ref, pix_ref, cam_ref, out_ref):
    """Fused diffmap + soft-inlier score: (TH,) partial sums per N tile."""
    poses = pose_ref[:]
    xs = coords_ref[0:1, :]
    ys = coords_ref[1:2, :]
    zs = coords_ref[2:3, :]
    mask = coords_ref[3:4, :]  # 1 for real pixels, 0 for padding
    f = cam_ref[0]
    cx = cam_ref[1]
    cy = cam_ref[2]
    max_err = cam_ref[3]
    tau = cam_ref[4]
    inv_beta = cam_ref[5]

    def col(i):
        return poses[:, i][:, None]

    ex = col(0) * xs + col(1) * ys + col(2) * zs + col(9)
    ey = col(3) * xs + col(4) * ys + col(5) * zs + col(10)
    ez = col(6) * xs + col(7) * ys + col(8) * zs + col(11)
    ez = jnp.where(jnp.abs(ez) < 1e-8, -1e-8, ez)
    inv_z = 1.0 / ez
    u = -f * ex * inv_z + cx
    v = f * ey * inv_z + cy
    du = pix_ref[0:1, :] - u
    dv = pix_ref[1:2, :] - v
    err = jnp.minimum(jnp.sqrt(du * du + dv * dv + 1e-8), max_err)
    w = jax.nn.sigmoid((tau - err) * inv_beta) * mask
    partial = jnp.sum(w, axis=1, keepdims=True)  # (TH, 1)

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += partial


@functools.partial(jax.jit,
                   static_argnames=("max_error", "threshold", "beta",
                                    "interpret"))
def soft_inlier_scores_pallas(hyps_R: jnp.ndarray, hyps_t: jnp.ndarray,
                              coords: jnp.ndarray, pix: jnp.ndarray,
                              cam_vec: jnp.ndarray,
                              threshold: float = 10.0, beta: float = 10.0,
                              max_error: float = 100.0,
                              interpret: bool = False) -> jnp.ndarray:
    """Fused (H,) soft-inlier scores without materialising (H, N) in HBM."""
    H = hyps_R.shape[0]
    N = coords.shape[0]
    Hp = -(-H // _TH) * _TH
    Np = -(-N // _TN) * _TN

    poses = jnp.concatenate([hyps_R.reshape(H, 9), hyps_t], axis=-1)
    poses = jnp.pad(poses, ((0, Hp - H), (0, 0)))
    mask = jnp.ones((1, N), jnp.float32)
    coords_m = jnp.concatenate([coords.T, mask], axis=0)  # (4, N)
    coords_m = jnp.pad(coords_m, ((0, 0), (0, Np - N)),
                       constant_values=-1.0)
    # padded mask lanes must be 0, not -1
    coords_m = coords_m.at[3, N:].set(0.0)
    pix_t = jnp.pad(pix.T, ((0, 0), (0, Np - N)))
    cam6 = jnp.concatenate([
        cam_vec, jnp.asarray([max_error, threshold, 1.0 / beta],
                             cam_vec.dtype)])

    grid = (Hp // _TH, Np // _TN)
    out = pl.pallas_call(
        _score_kernel,
        out_shape=jax.ShapeDtypeStruct((Hp, 1), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TH, 12), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, _TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, _TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_TH, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(poses, coords_m, pix_t, cam6)
    return out[:H, 0]
