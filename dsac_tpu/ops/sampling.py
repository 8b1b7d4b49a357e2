"""Random sampling: stratified pixel grids and minimal-set hypothesis draws.

Replaces ``stochasticSubSample`` (core/cnn.h:348-374) and the hypothesis
sampling loop of ``processImage`` (core/cnn.h:1079-1129).  The reference's
per-thread mt19937 streams (core/thread_rand.cpp:40-57) become jax.random
key splitting; its unbounded rejection loops become fixed-shape batched
attempts with masked selection (first valid attempt wins), which is the
TPU-legal formulation of "resample until self-consistent".
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import Camera, PoseConfig
from dsac_tpu.geometry.p3p import gn_polish_pose, solve_pnp_minimal
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.geometry.projection import project


def stratified_sample(key: jax.Array, image_width: int, image_height: int,
                      grid: int, patch_size: int) -> jnp.ndarray:
    """One random pixel per cell of a (grid x grid) stratification.

    Mirrors stochasticSubSample (core/cnn.h:348-374): cells of size
    ((W - patch) / grid, (H - patch) / grid) offset by patch/2 so that
    patches fit inside the image; a uniform pixel is drawn in each cell.
    Returns integer pixel coordinates (grid, grid, 2) as (x, y).
    """
    x_stride = (image_width - patch_size) / grid
    y_stride = (image_height - patch_size) / grid
    half = patch_size // 2

    cell_x = jnp.arange(grid, dtype=jnp.float32) * x_stride + half
    cell_y = jnp.arange(grid, dtype=jnp.float32) * y_stride + half
    ox, oy = jnp.meshgrid(cell_x, cell_y, indexing="xy")  # (gy, gx)

    kx, ky = jax.random.split(key)
    ux = jax.random.uniform(kx, (grid, grid)) * x_stride
    uy = jax.random.uniform(ky, (grid, grid)) * y_stride
    px = jnp.floor(ox + ux).astype(jnp.int32)
    py = jnp.floor(oy + uy).astype(jnp.int32)
    return jnp.stack([px, py], axis=-1)  # (row, col, (x, y))


class MinimalSets(NamedTuple):
    """Per-hypothesis minimal-set draw results."""

    indices: jnp.ndarray  # (H, 4) flat indices into the subsampled grid
    poses: Pose  # (H,) P3P poses
    valid: jnp.ndarray  # (H,) bool — solved AND self-consistent


def _has_dup(s: jnp.ndarray) -> jnp.ndarray:
    """Duplicate pixels in a 4-index set make it degenerate; the reference
    re-draws (alreadyChosen, core/cnn.h:1084-1102).  Flag instead."""
    eq = s[:, None] == s[None, :]
    return jnp.sum(eq) > 4  # diagonal contributes exactly 4


def _select(idx_b: jnp.ndarray, poses: Pose, valid: jnp.ndarray,
            worst: jnp.ndarray, polish: bool, coords: jnp.ndarray,
            pix: jnp.ndarray, cam: Camera) -> MinimalSets:
    """Pick the first valid attempt per hypothesis.

    idx_b: (Hb, T, 4); poses (Hb, T); valid/worst (Hb, T).  If no attempt
    is valid the smallest worst-error attempt is used and the hypothesis
    is flagged invalid (downstream scoring buries it, like the
    reference's zero-pose fallback, core/cnn.h:66-77).  With polish=True
    the selected set gets the sub-pixel GN polish (the expensive part —
    3 iterations x 6x6 solve — runs on ONE attempt per hypothesis, 1/T
    the solves; the fused serve path uses this).
    """
    Hb = idx_b.shape[0]
    first_valid = jnp.argmax(valid, axis=-1)  # 0 if none valid
    fallback = jnp.argmin(jnp.where(valid, jnp.inf, worst), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    chosen = jnp.where(any_valid, first_valid, fallback).astype(jnp.int32)

    take = lambda x: jnp.take_along_axis(
        x, chosen.reshape(Hb, 1, *([1] * (x.ndim - 2))), axis=1
    ).squeeze(1)
    sel_idx = take(idx_b)  # (Hb, 4)
    sel_pose = Pose(take(poses.R), take(poses.t))

    if polish:
        polished = gn_polish_pose(sel_pose, coords[sel_idx],
                                  pix[sel_idx].astype(jnp.float32), cam)
        ok = (jnp.all(jnp.isfinite(polished.R), axis=(-2, -1))
              & jnp.all(jnp.isfinite(polished.t), axis=-1))
        keep = any_valid & ok
        sel_pose = Pose(
            jnp.where(keep[:, None, None], polished.R, sel_pose.R),
            jnp.where(keep[:, None], polished.t, sel_pose.t))

    return MinimalSets(indices=sel_idx, poses=sel_pose, valid=any_valid)


def _solve_attempts_fused(key: jax.Array, n_lanes: int, T: int,
                          coords: jnp.ndarray, pix: jnp.ndarray,
                          cam: Camera, thresh: float):
    """Draw + solve (n_lanes, T) candidate minimal sets with the SoA
    Pallas kernel; returns (idx, poses, valid, worst)."""
    from dsac_tpu.ops.p3p_pallas import p3p_solve_pallas

    n = coords.shape[0]
    idx = jax.random.randint(key, (n_lanes, T, 4), 0, n)
    dup = jax.vmap(jax.vmap(_has_dup))(idx)
    obj = coords[idx].reshape(n_lanes * T, 4, 3)
    img = pix[idx].astype(jnp.float32).reshape(n_lanes * T, 4, 2)
    cam_vec = jnp.stack([cam.focal, cam.cx, cam.cy]).astype(jnp.float32)
    flat, solved, worst = p3p_solve_pallas(
        obj, img, cam_vec, interpret=jax.default_backend() != "tpu")
    poses = Pose(flat.R.reshape(n_lanes, T, 3, 3),
                 flat.t.reshape(n_lanes, T, 3))
    worst = worst.reshape(n_lanes, T)
    valid = solved.reshape(n_lanes, T) & (worst < thresh) & ~dup
    return idx, poses, valid, worst


def sample_minimal_sets_two_phase(key: jax.Array, coords: jnp.ndarray,
                                  pix: jnp.ndarray, cam: Camera,
                                  cfg: PoseConfig,
                                  budget_frac: float | None = None
                                  ) -> MinimalSets:
    """Resample-ONLY-failures hypothesis sampling (serve/eval, fused).

    The fixed-T formulation (`sample_minimal_sets`) pays T solves for
    every lane — the worst case for everyone — even though with trained
    coordinates ~95%+ of lanes validate on their first attempt
    (BASELINE.md large-H stage table: 45% of the H=16k budget).  This is
    the faithful restoration of the reference's rejection-loop semantics
    (core/cnn.h:1079-1129, "retry until valid") in fixed shapes:

      phase 1: ONE attempt per lane (H solves);
      phase 2: the (few) failed lanes are compacted into a fixed budget
               of K = ceil(H * budget_frac) lanes and re-solved at full
               depth T-1 (K*(T-1) solves), then scattered back.

    Expected solves: H + K*(T-1) ≈ H(1 + budget*(T-1)) vs H*T —
    ~5.7x fewer at T=16, budget 1/8.  Lanes that fail phase 1 and miss
    the budget stay invalid, like a lane whose T fixed attempts all
    fail; when MORE than K lanes fail phase 1 (a cold/untrained
    coordinate net — not a serving configuration) the pool degrades to
    ~K + first-attempt-valid hypotheses, which still localizes whenever
    the fixed-T pool would (a 32-hypothesis pool of valid draws is a
    working RANSAC; garbage coordinates defeat both paths equally).
    There is deliberately NO in-graph fixed-T fallback: a lax.cond
    branch taken per frame turns, under the serve batch vmap, into
    cond's batching rule broadcasting every branch constant — including
    the P3P kernel's (3,) SMEM camera operand, whose batched (B, 3)
    form Mosaic's SMEM tiling rejects.
    """
    H, T = cfg.num_hypotheses, cfg.sample_attempts
    thresh = cfg.inlier_threshold_2d
    if budget_frac is None:
        budget_frac = getattr(cfg, "two_phase_budget", 0.125)
    if T <= 1:
        return sample_minimal_sets(key, coords, pix, cam, cfg, fused=True)
    K = max(1, int(np.ceil(H * budget_frac)))
    k1, k2 = jax.random.split(key)

    idx1, poses1, valid1, worst1 = _solve_attempts_fused(
        k1, H, 1, coords, pix, cam, thresh)
    sel1 = _select(idx1, poses1, valid1, worst1, True, coords, pix, cam)

    order = jnp.argsort(sel1.valid)  # invalid lanes first
    lanes = order[:K]
    idx2, poses2, valid2, worst2 = _solve_attempts_fused(
        k2, K, T - 1, coords, pix, cam, thresh)
    sel2 = _select(idx2, poses2, valid2, worst2, True, coords, pix, cam)
    take = ~sel1.valid[lanes] & sel2.valid  # only rescue failures
    R = sel1.poses.R.at[lanes].set(
        jnp.where(take[:, None, None], sel2.poses.R, sel1.poses.R[lanes]))
    t = sel1.poses.t.at[lanes].set(
        jnp.where(take[:, None], sel2.poses.t, sel1.poses.t[lanes]))
    indices = sel1.indices.at[lanes].set(
        jnp.where(take[:, None], sel2.indices, sel1.indices[lanes]))
    valid = sel1.valid.at[lanes].set(sel1.valid[lanes] | sel2.valid)
    return MinimalSets(indices=indices, poses=Pose(R, t), valid=valid)


def sample_minimal_sets(key: jax.Array, coords: jnp.ndarray,
                        pix: jnp.ndarray, cam: Camera,
                        cfg: PoseConfig, fused: bool = False) -> MinimalSets:
    """Draw one self-consistent 4-point minimal set + P3P pose per hypothesis.

    coords: (N, 3) predicted scene coordinates (mm) at the N subsampled
    pixels; pix: (N, 2) their pixel locations.

    The reference resamples each hypothesis until P3P succeeds and all four
    points reproject within the inlier threshold (core/cnn.h:1081-1128).
    Here each of H hypotheses draws `cfg.sample_attempts` candidate sets up
    front; the first valid one is selected branchlessly.

    fused=True solves all H x T attempts with the structure-of-arrays
    Pallas kernel (ops/p3p_pallas.py) — ~10x faster on TPU, forward-only
    (serve/eval; training keeps the differentiable jnp path).  The two
    paths differ in WHERE the GN polish runs: the jnp path polishes every
    attempt before the consistency check (marginal sets that only
    converge under GN stay valid — important for gradient flow from
    weakly-trained coordinate nets, where raw-P3P consistency can reject
    the whole pool and zero the score gradients); the fused path checks
    raw P3P output (reference-faithful: OpenCV's closed-form CV_P3P is
    also checked raw, core/cnn.h:1111-1126) and polishes only the
    selected set — measured bit-identical serve accuracy with trained
    coords, at 1/T the polish cost.
    """
    if fused == "two_phase":
        return sample_minimal_sets_two_phase(key, coords, pix, cam, cfg)
    n = coords.shape[0]
    H, T = cfg.num_hypotheses, cfg.sample_attempts

    if fused:
        idx, poses, valid, worst = _solve_attempts_fused(
            key, H, T, coords, pix, cam, cfg.inlier_threshold_2d)
        return _select(idx, poses, valid, worst, True, coords, pix, cam)

    idx = jax.random.randint(key, (H, T, 4), 0, n)  # with replacement
    dup = jax.vmap(jax.vmap(_has_dup))(idx)  # (H, T)

    def block(args):
        """Solve one block of hypotheses: idx_b (Hb, T, 4), dup_b (Hb, T)."""
        idx_b, dup_b = args
        obj = coords[idx_b]  # (Hb, T, 4, 3)
        img = pix[idx_b].astype(jnp.float32)  # (Hb, T, 4, 2)

        solve = jax.vmap(jax.vmap(
            lambda o, p: solve_pnp_minimal(o, p, cam)))
        poses, solved = solve(obj, img)  # Pose (Hb, T), (Hb, T)

        # Self-consistency: all four support points must reproject within
        # the inlier threshold (core/cnn.h:1117-1126).
        reproj = project(poses, obj, cam)  # (Hb, T, 4, 2)
        err = jnp.linalg.norm(reproj - img, axis=-1)  # (Hb, T, 4)
        worst = jnp.max(err, axis=-1)  # (Hb, T)
        valid = solved & (worst < cfg.inlier_threshold_2d) & ~dup_b
        return _select(idx_b, poses, valid, worst, False, coords, pix,
                       cam)

    # Very-large-H pools (4k-16k, BASELINE config 4) are solved in
    # sequential chunks: the P3P/triad math carries (..., T, 4, 3, 3)
    # intermediates whose tiny trailing dims pad ~50x on TPU tile
    # layouts — chunking bounds that scratch at a constant.  (The fused
    # path above needs no chunking: its SoA layout never pads.)
    chunk = cfg.hyp_sample_chunk
    if 0 < chunk < H and H % chunk == 0:
        out = jax.lax.map(block, (idx.reshape(H // chunk, chunk, T, 4),
                                  dup.reshape(H // chunk, chunk, T)))
        return jax.tree.map(
            lambda x: x.reshape(H, *x.shape[2:]), out)
    return block((idx, dup))


def sample_hypotheses(key: jax.Array, coords: jnp.ndarray, pix: jnp.ndarray,
                      cam: Camera, cfg: PoseConfig) -> MinimalSets:
    """Alias with the pipeline-facing name."""
    return sample_minimal_sets(key, coords, pix, cam, cfg)
