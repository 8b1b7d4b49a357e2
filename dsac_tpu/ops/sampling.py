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

from dsac_tpu.config import Camera, PoseConfig
from dsac_tpu.geometry.p3p import solve_pnp_minimal
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


def sample_minimal_sets(key: jax.Array, coords: jnp.ndarray,
                        pix: jnp.ndarray, cam: Camera,
                        cfg: PoseConfig) -> MinimalSets:
    """Draw one self-consistent 4-point minimal set + P3P pose per hypothesis.

    coords: (N, 3) predicted scene coordinates (mm) at the N subsampled
    pixels; pix: (N, 2) their pixel locations.

    The reference resamples each hypothesis until P3P succeeds and all four
    points reproject within the inlier threshold (core/cnn.h:1081-1128).
    Here each of H hypotheses draws `cfg.sample_attempts` candidate sets up
    front; the first valid one is selected branchlessly.  If none is valid
    the attempt with the smallest worst-point reprojection error is used
    and the hypothesis is flagged invalid (downstream scoring will bury it,
    like the reference's zero-pose fallback, core/cnn.h:66-77).
    """
    n = coords.shape[0]
    H, T = cfg.num_hypotheses, cfg.sample_attempts

    idx = jax.random.randint(key, (H, T, 4), 0, n)  # with replacement

    def block(idx_b):
        """Solve one block of hypotheses: idx_b (Hb, T, 4)."""
        Hb = idx_b.shape[0]

        # Duplicate pixels inside a set make it degenerate; the reference
        # re-draws (alreadyChosen, core/cnn.h:1084-1102).  Flag instead.
        def has_dup(s):
            eq = s[:, None] == s[None, :]
            return jnp.sum(eq) > 4  # diagonal contributes exactly 4

        dup = jax.vmap(jax.vmap(has_dup))(idx_b)  # (Hb, T)

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
        consistent = worst < cfg.inlier_threshold_2d

        valid = solved & consistent & ~dup
        # First valid attempt; if none, smallest worst-error attempt.
        first_valid = jnp.argmax(valid, axis=-1)  # 0 if none valid
        fallback = jnp.argmin(jnp.where(valid, jnp.inf, worst), axis=-1)
        any_valid = jnp.any(valid, axis=-1)
        chosen = jnp.where(any_valid, first_valid,
                           fallback).astype(jnp.int32)

        take = lambda x: jnp.take_along_axis(
            x, chosen.reshape(Hb, 1, *([1] * (x.ndim - 2))), axis=1
        ).squeeze(1)
        return MinimalSets(
            indices=take(idx_b),
            poses=Pose(take(poses.R), take(poses.t)),
            valid=any_valid,
        )

    # Very-large-H pools (4k-16k, BASELINE config 4) are solved in
    # sequential chunks: the P3P/triad math carries (..., T, 4, 3, 3)
    # intermediates whose tiny trailing dims pad ~50x on TPU tile
    # layouts — chunking bounds that scratch at a constant.
    chunk = cfg.hyp_sample_chunk
    if 0 < chunk < H and H % chunk == 0:
        out = jax.lax.map(block, idx.reshape(H // chunk, chunk, T, 4))
        return jax.tree.map(
            lambda x: x.reshape(H, *x.shape[2:]), out)
    return block(idx)


def sample_hypotheses(key: jax.Array, coords: jnp.ndarray, pix: jnp.ndarray,
                      cam: Camera, cfg: PoseConfig) -> MinimalSets:
    """Alias with the pipeline-facing name."""
    return sample_minimal_sets(key, coords, pix, cam, cfg)
