"""Kabsch / Umeyama rigid alignment of 3D-3D correspondences.

Replaces ``Hypothesis::calcRigidBodyTransform`` (core/Hypothesis.cpp:145-200):
SVD of the centred covariance with a determinant-sign flip, returning the
rigid transform mapping point set A onto point set B.

Also provides a branch-free *triad* alignment for exactly three exact
correspondences (the P3P back-end) that avoids SVD entirely — on TPU,
tiny batched SVDs serialize badly, while the triad construction is pure
vectorised arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from dsac_tpu.geometry.pose import Pose


def kabsch(a: jnp.ndarray, b: jnp.ndarray,
           weights: jnp.ndarray | None = None) -> Pose:
    """Least-squares rigid transform with R @ a_i + t ~= b_i.

    a, b: (..., N, 3); weights: optional (..., N) non-negative.
    Mirrors the reference math: covariance = centred_A^T centred_B,
    SVD, flip the smallest singular direction if det < 0
    (core/Hypothesis.cpp:176-200).
    """
    if weights is None:
        w = jnp.ones(a.shape[:-1], a.dtype)
    else:
        w = weights
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(wsum, 1e-12)
    ca = jnp.sum(wn[..., None] * a, axis=-2)
    cb = jnp.sum(wn[..., None] * b, axis=-2)
    a0 = a - ca[..., None, :]
    b0 = b - cb[..., None, :]
    # cov[i, j] = sum_n w_n * a0[n, i] * b0[n, j]
    cov = jnp.einsum("...n,...ni,...nj->...ij", wn, a0, b0)
    u, _, vt = jnp.linalg.svd(cov)
    # R maps a -> b: R = V diag(1,1,s) U^T with s = sign(det(V U^T))
    det = jnp.linalg.det(jnp.swapaxes(vt, -1, -2) @ jnp.swapaxes(u, -1, -2))
    d = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)],
                  axis=-1)
    R = jnp.einsum("...ji,...j,...kj->...ik", vt, d, u)
    t = cb - jnp.einsum("...ij,...j->...i", R, ca)
    return Pose(R, t)


def triad_align(a: jnp.ndarray, b: jnp.ndarray) -> Pose:
    """Exact rigid alignment from 3 non-collinear correspondences.

    a, b: (..., 3, 3) (three points, last axis xyz).  Builds an orthonormal
    triad from (p1-p0, p2-p0) in each frame; R = triad_b @ triad_a^T.
    Exact when the correspondence is exact (the P3P case, where camera-frame
    points are constructed from the solved depths) and far cheaper on TPU
    than a batched 3x3 SVD.
    """
    def normalize(x):
        # sqrt(|x|^2 + eps) keeps both value AND gradient finite at x = 0
        # (x / max(|x|, eps) has a NaN gradient exactly at zero, which
        # poisons shared upstream gradients even on masked lanes).
        return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)

    def triad(p):
        e0 = p[..., 1, :] - p[..., 0, :]
        e1 = p[..., 2, :] - p[..., 0, :]
        n0 = normalize(e0)
        n2 = normalize(jnp.cross(n0, e1))
        n1 = jnp.cross(n2, n0)
        return jnp.stack([n0, n1, n2], axis=-1)  # columns are the triad

    ta = triad(a)
    tb = triad(b)
    R = tb @ jnp.swapaxes(ta, -1, -2)
    centroid_a = jnp.mean(a, axis=-2)
    centroid_b = jnp.mean(b, axis=-2)
    t = centroid_b - jnp.einsum("...ij,...j->...i", R, centroid_a)
    return Pose(R, t)
