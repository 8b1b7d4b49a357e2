"""Batched, differentiable minimal PnP (P3P, Grunert's method).

Replaces every ``safeSolvePnP(..., CV_P3P)`` call site in the reference
(hypothesis sampling core/cnn.h:1111, score path core/cnn.h:662, refinement
replay core/cnn.h:799) and makes the reference's finite-difference Jacobian
``dPNP`` (core/cnn.h:164-209) obsolete: gradients flow by autodiff with an
implicit-function Newton step at the quartic root.

TPU-first design notes:
  * no data-dependent control flow — the quartic is solved in closed form
    (Ferrari + trigonometric resolvent cubic, branchless jnp.where; the
    TPU backend has no complex64, so everything stays real), all four
    roots kept, non-real ones masked;
  * no SVD — candidate poses come from an exact orthonormal-triad
    alignment (geometry/kabsch.py:triad_align);
  * disambiguation among the <=4 P3P solutions uses the 4th
    correspondence, mirroring OpenCV's 4-point P3P behaviour that the
    reference leans on (its self-consistency check, core/cnn.h:1117-1126);
  * everything vmaps over the hypothesis axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsac_tpu.config import Camera
from dsac_tpu.geometry.kabsch import triad_align
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.geometry.projection import project

_EPS = 1e-12


def pixel_bearings(pix: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Unit bearing vectors in the eye frame for pixels (..., 2) -> (..., 3).

    Inverse of the projection convention u = -f*X/Z + cx, v = f*Y/Z + cy
    with Z = -depth: direction ((u-cx)/f, -(v-cy)/f, -1) normalised.
    """
    x = (pix[..., 0] - cam.cx) / cam.focal
    y = -(pix[..., 1] - cam.cy) / cam.focal
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _cbrt(x: jnp.ndarray) -> jnp.ndarray:
    """Real cube root with sign (TPU-safe, no complex)."""
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def _cubic_max_real_root(b: jnp.ndarray, c: jnp.ndarray,
                         d: jnp.ndarray) -> jnp.ndarray:
    """Largest real root of t^3 + b t^2 + c t + d, branchless.

    Cardano for one real root (disc >= 0), trigonometric form for three
    (disc < 0), both evaluated and selected with jnp.where — no complex
    arithmetic, because this TPU backend has no complex64 support.
    """
    # depress: t = s - b/3  ->  s^3 + p s + q
    p = c - b * b / 3.0
    q = 2.0 * b ** 3 / 27.0 - b * c / 3.0 + d
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # Cardano branch (one real root)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_card = _cbrt(-q / 2.0 + sq) + _cbrt(-q / 2.0 - sq)

    # Trigonometric branch (three real roots) — valid when p < 0
    p_neg = jnp.minimum(p, -1e-20)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(arg) / 3.0
    # k = 0 gives the largest of the three roots
    t_trig = m * jnp.cos(theta)

    t = jnp.where(disc >= 0.0, t_card, t_trig)
    return t - b / 3.0


def _solve_quartic_real(coeffs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real roots of a quartic (Ferrari's method, branchless, f32).

    coeffs: (..., 5) highest power first.  Returns (roots (..., 4),
    is_real (..., 4)); non-real root slots hold harmless values and are
    masked out.  Roots carry no gradient — callers Newton-polish with
    differentiable coefficients to recover implicit-function gradients.
    """
    a4 = coeffs[..., 0]
    scale = jnp.where(jnp.abs(a4) < 1e-12,
                      jnp.where(a4 < 0, -1e-12, 1e-12), a4)
    # When a4 ~ 0 (quartic degenerating to a cubic: borderline geometries)
    # the monic coefficients blow up and their 4th powers reach Inf,
    # producing NaN roots in the FORWARD pass.  Clamp: affected lanes are
    # geometrically degenerate and masked by callers; genuinely valid
    # lanes stay below the clamp, and the caller's Newton polish against
    # the true coefficients restores full accuracy regardless.
    clamp = lambda x: jnp.clip(x, -1e4, 1e4)
    b = clamp(coeffs[..., 1] / scale)
    c = clamp(coeffs[..., 2] / scale)
    d = clamp(coeffs[..., 3] / scale)
    e = clamp(coeffs[..., 4] / scale)

    # depressed quartic y^4 + p y^2 + q y + r, x = y - b/4
    b2 = b * b
    p = c - 3.0 * b2 / 8.0
    q = d - b * c / 2.0 + b * b2 / 8.0
    r = e - b * d / 4.0 + b2 * c / 16.0 - 3.0 * b2 * b2 / 256.0

    # resolvent cubic: 8m^3 + 8p m^2 + (2p^2 - 8r) m - q^2 = 0
    # -> m^3 + p m^2 + (p^2/4 - r) m - q^2/8 = 0 ; take the largest real
    # root, which is >= 0 (cubic is -q^2/8 <= 0 at m=0, +inf at +inf).
    m = _cubic_max_real_root(p, p * p / 4.0 - r, -q * q / 8.0)
    m = jnp.maximum(m, 0.0)

    s2 = 2.0 * m
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    q_over_2s = q / jnp.maximum(2.0 * s, 1e-12)

    # biquadratic fallback when q ~ 0 and m ~ 0:
    #   y^2 = (-p +/- sqrt(p^2 - 4r)) / 2
    biq = (jnp.abs(q) < 1e-10) & (s < 1e-10)
    disc_b = p * p - 4.0 * r
    y2a = (-p + jnp.sqrt(jnp.maximum(disc_b, 0.0))) / 2.0
    y2b = (-p - jnp.sqrt(jnp.maximum(disc_b, 0.0))) / 2.0

    # two quadratics: y^2 -/+ s y + (p/2 + m +/- q/(2s)) = 0
    c1 = p / 2.0 + m + q_over_2s
    c2 = p / 2.0 + m - q_over_2s
    disc1 = s2 / 4.0 - c1  # (s/2)^2 - c1   for y^2 - s y + c1
    disc2 = s2 / 4.0 - c2  # for y^2 + s y + c2
    sq1 = jnp.sqrt(jnp.maximum(disc1, 0.0))
    sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))

    y_quads = jnp.stack([
        s / 2.0 + sq1, s / 2.0 - sq1,
        -s / 2.0 + sq2, -s / 2.0 - sq2,
    ], axis=-1)
    real_quads = jnp.stack([disc1, disc1, disc2, disc2], axis=-1) >= -1e-6

    sq_b_a = jnp.sqrt(jnp.maximum(y2a, 0.0))
    sq_b_b = jnp.sqrt(jnp.maximum(y2b, 0.0))
    y_biq = jnp.stack([sq_b_a, -sq_b_a, sq_b_b, -sq_b_b], axis=-1)
    real_biq = (jnp.stack([disc_b, disc_b, disc_b, disc_b], axis=-1) >= 0) & \
        (jnp.stack([y2a, y2a, y2b, y2b], axis=-1) >= 0)

    y = jnp.where(biq[..., None], y_biq, y_quads)
    is_real = jnp.where(biq[..., None], real_biq, real_quads)
    roots = y - b[..., None] / 4.0
    return jax.lax.stop_gradient(roots), is_real


def _newton_polish_real(coeffs: jnp.ndarray, v0: jnp.ndarray,
                        steps: int = 3, grad_floor: float = 1e-2
                        ) -> jnp.ndarray:
    """Newton refinement of a real quartic root with BOUNDED gradients.

    Value: `steps` Newton iterations (gradient-free).  Gradient: one final
    implicit-function-theorem step — v_out = v - p(v)/p'(v) with v and
    p'(v) held constant — whose derivative d v*/d coeffs = -(dp/dc)/p'(v)
    is the exact implicit derivative away from double roots and is capped
    by `grad_floor` at them.  Differentiating the iteration chain instead
    amplifies the near-singular 1/p' factor three-fold, which overflows
    f32 for degenerate (duplicate-point) sets and poisons shared upstream
    gradients — degenerate sets are masked, but their NaNs would not be.
    """
    cs = jax.lax.stop_gradient(coeffs)

    def poly(cf, v):
        return ((((cf[..., 0] * v + cf[..., 1]) * v + cf[..., 2]) * v
                 + cf[..., 3]) * v + cf[..., 4])

    def dpoly(cf, v):
        return (((4.0 * cf[..., 0] * v + 3.0 * cf[..., 1]) * v
                 + 2.0 * cf[..., 2]) * v + cf[..., 3])

    v = v0
    for _ in range(steps):
        dpv = dpoly(cs, v)
        dpv = jnp.where(jnp.abs(dpv) < 1e-10,
                        jnp.sign(dpv) * 1e-10 + 1e-12, dpv)
        v = v - jnp.clip(poly(cs, v) / dpv, -10.0, 10.0)
        v = jnp.clip(v, -100.0, 100.0)

    v = jax.lax.stop_gradient(v)
    dpv = jax.lax.stop_gradient(dpoly(cs, v))
    dpv = jnp.where(dpv >= 0, jnp.maximum(dpv, grad_floor),
                    jnp.minimum(dpv, -grad_floor))
    return v - jnp.clip(poly(coeffs, v) / dpv, -10.0, 10.0)


def p3p_grunert(obj: jnp.ndarray, bear: jnp.ndarray) -> tuple[jnp.ndarray,
                                                              jnp.ndarray]:
    """Grunert P3P: ranges (s1, s2, s3) along three bearings.

    obj:  (..., 3, 3) scene points (mm), bear: (..., 3, 3) unit bearings.
    Returns (ranges, valid): ranges (..., 4, 3) for up to four solutions and
    a (..., 4) bool mask of geometrically valid ones.
    """
    x1, x2, x3 = obj[..., 0, :], obj[..., 1, :], obj[..., 2, :]
    f1, f2, f3 = bear[..., 0, :], bear[..., 1, :], bear[..., 2, :]

    a2 = jnp.sum((x2 - x3) ** 2, axis=-1)  # side a opposite vertex 1
    b2 = jnp.sum((x1 - x3) ** 2, axis=-1)
    c2 = jnp.sum((x1 - x2) ** 2, axis=-1)
    b2_safe = jnp.maximum(b2, _EPS)

    ca = jnp.sum(f2 * f3, axis=-1)  # cos(alpha)
    cb = jnp.sum(f1 * f3, axis=-1)  # cos(beta)
    cg = jnp.sum(f1 * f2, axis=-1)  # cos(gamma)

    # Side-length ratios are O(1) for genuine triangles; near-coincident
    # points (degenerate sets on masked lanes) drive them towards 1e18,
    # whose squares overflow f32 into Inf/NaN — which then leaks into
    # shared gradients through primal-multiplying VJPs.  Clamp hard; the
    # affected sets are flagged invalid below anyway.
    ratio = lambda x: jnp.clip(x / b2_safe, -1e4, 1e4)
    q = ratio(a2 - c2)
    s = ratio(a2 + c2)

    A4 = (q - 1.0) ** 2 - 4.0 * ratio(c2) * ca ** 2
    A3 = 4.0 * (q * (1.0 - q) * cb - (1.0 - s) * ca * cg
                + 2.0 * ratio(c2) * ca ** 2 * cb)
    A2 = 2.0 * (q ** 2 - 1.0 + 2.0 * q ** 2 * cb ** 2
                + 2.0 * ratio(b2 - c2) * ca ** 2
                - 4.0 * s * ca * cb * cg
                + 2.0 * ratio(b2 - a2) * cg ** 2)
    A1 = 4.0 * (-q * (1.0 + q) * cb + 2.0 * ratio(a2) * cg ** 2 * cb
                - (1.0 - s) * ca * cg)
    A0 = (1.0 + q) ** 2 - 4.0 * ratio(a2) * cg ** 2

    coeffs = jnp.stack([A4, A3, A2, A1, A0], axis=-1)
    # Normalise to unit max-coefficient: roots are invariant under scaling,
    # and with O(1) coefficients the Newton-polish BACKWARD stays far from
    # f32 overflow (raw coefficients reach ~1e8 for near-degenerate sets;
    # their backward products overflow on TPU where CPU still squeaks by).
    # stop_gradient on the norm is exact: the root is scale-invariant, so
    # holding the scale constant does not change its derivative.
    norm = jax.lax.stop_gradient(
        jnp.max(jnp.abs(coeffs), axis=-1, keepdims=True)) + 1e-12
    coeffs = coeffs / norm
    roots, is_real = _solve_quartic_real(coeffs)  # (..., 4), no grad

    v = _newton_polish_real(coeffs[..., None, :], roots)  # (..., 4) with grads

    # u from the linear relation (Haralick eq. for Grunert's method).
    # Denominator floor is 1e-3, not epsilon: near-zero denominators only
    # occur for degenerate (masked) sets, and a tiny floor makes the
    # division's BACKWARD (-num/denom^2) overflow f32.
    denom_u = 2.0 * (cg[..., None] - v * ca[..., None])
    denom_u = jnp.where(jnp.abs(denom_u) < 1e-3,
                        jnp.where(denom_u < 0, -1e-3, 1e-3), denom_u)
    u = ((-1.0 + q[..., None]) * v ** 2
         - 2.0 * q[..., None] * cb[..., None] * v
         + 1.0 + q[..., None]) / denom_u

    u = jnp.clip(u, -1e3, 1e3)
    s1_sq = b2_safe[..., None] / jnp.maximum(
        1.0 + v ** 2 - 2.0 * v * cb[..., None], _EPS)
    s1 = jnp.clip(jnp.sqrt(jnp.maximum(s1_sq, _EPS)), 0.0, 1e6)  # <= 1 km
    s2 = u * s1
    s3 = v * s1

    ranges = jnp.stack([s1, s2, s3], axis=-1)  # (..., 4 solutions, 3)
    # Degenerate sets (coincident points) are invalid — the analogue of the
    # reference's no-duplicate-points rule in minimal-set sampling
    # (core/cnn.h:1084, alreadyChosen).
    nondegen = jnp.minimum(jnp.minimum(a2, b2), c2) > 1.0  # > 1 mm^2
    valid = (is_real & (v > 0) & (u > 0)
             & jnp.all(jnp.isfinite(ranges), axis=-1)
             & nondegen[..., None])
    # Sanitize invalid solutions at the SOURCE: NaN/Inf must never enter
    # the graph even on masked lanes — their backward (0 cotangent x NaN
    # local Jacobian) would contaminate the shared coordinate gradients.
    ranges = jnp.where(valid[..., None], ranges, 1000.0)
    return ranges, valid


def gn_polish_pose(pose: Pose, obj: jnp.ndarray, pix: jnp.ndarray,
                    cam: Camera, iters: int = 3) -> Pose:
    """A few unweighted Gauss-Newton steps on the minimal set.

    Cleans up f32 quartic noise and mirrors the sub-pixel-exact P3P the
    reference gets from OpenCV's double-precision solver.  Imported lazily
    to avoid a circular import with geometry/gn.py.
    """
    from dsac_tpu.geometry.gn import gn_pnp
    w = jnp.ones(obj.shape[:-1], obj.dtype)
    return gn_pnp(pose, obj, pix, w, cam, iters=iters, damping=1e-6)


def solve_pnp_minimal(obj: jnp.ndarray, pix: jnp.ndarray, cam: Camera,
                      polish_iters: int = 3) -> tuple[Pose, jnp.ndarray]:
    """4-point minimal PnP: P3P on points 0..2, disambiguated by point 3.

    obj: (..., 4, 3) scene points (mm); pix: (..., 4, 2) pixels.
    Returns (pose, valid).  Invalid solves return the identity pose with
    valid=False — the analogue of safeSolvePnP's zero-pose fallback
    (core/cnn.h:66-77).
    """
    bear = pixel_bearings(pix, cam)  # (..., 4, 3)
    ranges, valid = p3p_grunert(obj[..., :3, :], bear[..., :3, :])

    # Camera-frame points for each candidate: Y_i = s_i * f_i.
    cam_pts = ranges[..., :, None] * bear[..., None, :3, :]  # (...,4,3pts,3)
    obj3 = jnp.broadcast_to(obj[..., None, :3, :], cam_pts.shape)
    cand = triad_align(obj3, cam_pts)  # Pose with batch (..., 4)
    # Belt-and-braces: masked lanes must stay finite (see p3p_grunert).
    cand_ok = (jnp.all(jnp.isfinite(cand.R), axis=(-2, -1))
               & jnp.all(jnp.isfinite(cand.t), axis=-1))
    eye_c = jnp.broadcast_to(jnp.eye(3, dtype=cand.R.dtype), cand.R.shape)
    cand = Pose(jnp.where(cand_ok[..., None, None], cand.R, eye_c),
                jnp.where(cand_ok[..., None], cand.t, 0.0))
    valid = valid & cand_ok

    # Disambiguate with the 4th point: smallest reprojection error wins.
    # (OpenCV's 4-point P3P does the same selection internally.)
    obj4 = jnp.broadcast_to(obj[..., 3, :][..., None, :],
                            cand.t.shape)  # (..., 4cand, 3)
    p4 = project(cand, obj4[..., None, :], cam)  # (..., 4cand, 1, 2)
    err4 = jnp.linalg.norm(p4[..., 0, :] - pix[..., 3, :][..., None, :],
                           axis=-1)
    # Behind-camera solutions (eye_z > 0) are invalid in this frame.
    eye4 = jnp.einsum("...ij,...j->...i", cand.R, obj4) + cand.t
    front = eye4[..., 2] < 0
    valid = valid & front & jnp.all(jnp.isfinite(cand.R), axis=(-2, -1))

    err4 = jnp.where(valid, err4, jnp.inf)
    best = jnp.argmin(err4, axis=-1).astype(jnp.int32)

    R = jnp.take_along_axis(cand.R, best[..., None, None, None],
                            axis=-3)[..., 0, :, :]
    t = jnp.take_along_axis(cand.t, best[..., None, None],
                            axis=-2)[..., 0, :]
    any_valid = jnp.any(valid, axis=-1)

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    pose = Pose(jnp.where(any_valid[..., None, None], R, eye3),
                jnp.where(any_valid[..., None], t, jnp.zeros_like(t)))

    if polish_iters > 0:
        polished = gn_polish_pose(pose, obj, pix, cam, iters=polish_iters)
        ok = (jnp.all(jnp.isfinite(polished.R), axis=(-2, -1))
              & jnp.all(jnp.isfinite(polished.t), axis=-1))
        keep = (any_valid & ok)[..., None]
        pose = Pose(jnp.where(keep[..., None], polished.R, pose.R),
                    jnp.where(keep, polished.t, pose.t))
    return pose, any_valid
