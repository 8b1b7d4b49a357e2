"""Fused Pallas TPU kernel for batched minimal P3P (serve/eval path).

The hypothesis-sampling stage solves H x T candidate minimal sets per
frame (the reference's rejection loop, core/cnn.h:1079-1129).  The jnp
implementation (geometry/p3p.py) is correct and differentiable but
layout-bound on TPU: its (..., 3, 3) / (..., 4, 3) intermediates pad to
(8, 128) tiles, so 4096 solves move >1 GB of padded tiles for ~30 MFLOP
of actual math.

This kernel computes the whole solve in structure-of-arrays form — the
attempt axis IS the 128-lane axis, every intermediate is a (1, TN)
vector register — fusing:

    pixel bearings -> Grunert quartic coefficients -> closed-form quartic
    (Cardano/trigonometric resolvent) -> Newton polish -> ranges ->
    triad alignment (R, t per root) -> 4th-point disambiguation ->
    worst-of-4 support reprojection error (the self-consistency metric)

in one pass with no HBM intermediates.  Forward-only (no VJP): training
uses the differentiable jnp path, exactly like ops/gn_pallas.py.

Mosaic has no acos/cbrt primitives: cbrt is exp(log|x|/3) with sign, and
the resolvent's arccos uses an Abramowitz-Stegun 4.4.45 polynomial
(|err| < 7e-5 rad) — both only seed the 3-step Newton polish, which
restores full f32 root accuracy (same principle as the jnp solver, whose
closed-form roots carry no gradients/accuracy guarantees either).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsac_tpu.geometry.pose import Pose

_TN = 1024  # attempt tile (lane-aligned x128)
_EPS = 1e-12
_BIG = 1e30


def _acos_poly(x):
    """Abramowitz & Stegun 4.4.45 arccos on [-1, 1] (|err| < 6.7e-5 rad)."""
    ax = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = 1.5707963 + ax * (-0.2121144 + ax * (0.0742610 + ax * -0.0187293))
    r = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * p
    return jnp.where(x < 0.0, 3.14159265358979 - r, r)


def _cbrt_vec(x):
    """Signed real cube root via exp/log (Mosaic has no cbrt)."""
    ax = jnp.abs(x)
    r = jnp.exp(jnp.log(jnp.maximum(ax, 1e-30)) / 3.0)
    r = jnp.where(ax < 1e-30, 0.0, r)
    return jnp.where(x < 0.0, -r, r)


def _p3p_kernel(obj_ref, pix_ref, cam_ref, out_ref):
    """One block of TN attempts; every local below is a (1, TN) vector.

    obj_ref: (12, TN) scene points (mm), rows x1 y1 z1 ... x4 y4 z4.
    pix_ref: (8, TN) pixels, rows u1 v1 ... u4 v4.
    cam_ref: SMEM (3,) [f, cx, cy].
    out_ref: (14, TN): rows 0-8 R (row-major), 9-11 t, 12 valid, 13 worst
    support-point reprojection error.
    """
    f = cam_ref[0]
    cx = cam_ref[1]
    cy = cam_ref[2]

    X = [(obj_ref[3 * i:3 * i + 1, :], obj_ref[3 * i + 1:3 * i + 2, :],
          obj_ref[3 * i + 2:3 * i + 3, :]) for i in range(4)]

    def bearing(i):
        bx = (pix_ref[2 * i:2 * i + 1, :] - cx) / f
        by = -(pix_ref[2 * i + 1:2 * i + 2, :] - cy) / f
        inv = jax.lax.rsqrt(bx * bx + by * by + 1.0)
        return (bx * inv, by * inv, -inv)

    def dot(a, b):
        return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

    def sub(a, b):
        return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    def normalize(a):
        inv = jax.lax.rsqrt(dot(a, a) + _EPS)
        return (a[0] * inv, a[1] * inv, a[2] * inv)

    F = [bearing(i) for i in range(4)]

    # ---- Grunert coefficients (geometry/p3p.py:p3p_grunert) ----
    d23 = sub(X[1], X[2])
    d13 = sub(X[0], X[2])
    d12 = sub(X[0], X[1])
    a2 = dot(d23, d23)
    b2 = dot(d13, d13)
    c2 = dot(d12, d12)
    b2s = jnp.maximum(b2, _EPS)

    ca = dot(F[1], F[2])
    cb = dot(F[0], F[2])
    cg = dot(F[0], F[1])

    ratio = lambda x: jnp.clip(x / b2s, -1e4, 1e4)
    q = ratio(a2 - c2)
    s = ratio(a2 + c2)

    A4 = (q - 1.0) ** 2 - 4.0 * ratio(c2) * ca * ca
    A3 = 4.0 * (q * (1.0 - q) * cb - (1.0 - s) * ca * cg
                + 2.0 * ratio(c2) * ca * ca * cb)
    A2 = 2.0 * (q * q - 1.0 + 2.0 * q * q * cb * cb
                + 2.0 * ratio(b2 - c2) * ca * ca
                - 4.0 * s * ca * cb * cg
                + 2.0 * ratio(b2 - a2) * cg * cg)
    A1 = 4.0 * (-q * (1.0 + q) * cb + 2.0 * ratio(a2) * cg * cg * cb
                - (1.0 - s) * ca * cg)
    A0 = (1.0 + q) ** 2 - 4.0 * ratio(a2) * cg * cg

    norm = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(A4), jnp.abs(A3)),
                    jnp.maximum(jnp.abs(A2), jnp.abs(A1))),
        jnp.abs(A0)) + _EPS
    A4, A3, A2, A1, A0 = (A / norm for A in (A4, A3, A2, A1, A0))

    # ---- closed-form quartic (geometry/p3p.py:_solve_quartic_real) ----
    scale = jnp.where(jnp.abs(A4) < _EPS,
                      jnp.where(A4 < 0, -_EPS, _EPS), A4)
    clamp = lambda x: jnp.clip(x, -1e4, 1e4)
    b = clamp(A3 / scale)
    c = clamp(A2 / scale)
    d = clamp(A1 / scale)
    e = clamp(A0 / scale)

    bb = b * b
    p = c - 3.0 * bb / 8.0
    qq = d - b * c / 2.0 + b * bb / 8.0
    r = e - b * d / 4.0 + bb * c / 16.0 - 3.0 * bb * bb / 256.0

    # largest real root of m^3 + p m^2 + (p^2/4 - r) m - q^2/8
    cb3, cc3, cd3 = p, p * p / 4.0 - r, -qq * qq / 8.0
    p3 = cc3 - cb3 * cb3 / 3.0
    q3 = 2.0 * cb3 ** 3 / 27.0 - cb3 * cc3 / 3.0 + cd3
    disc3 = (q3 / 2.0) ** 2 + (p3 / 3.0) ** 3
    sq3 = jnp.sqrt(jnp.maximum(disc3, 0.0))
    t_card = _cbrt_vec(-q3 / 2.0 + sq3) + _cbrt_vec(-q3 / 2.0 - sq3)
    p_neg = jnp.minimum(p3, -1e-20)
    mm = 2.0 * jnp.sqrt(-p_neg / 3.0)
    arg = jnp.clip(3.0 * q3 / (p_neg * mm), -1.0, 1.0)
    t_trig = mm * jnp.cos(_acos_poly(arg) / 3.0)
    m = jnp.where(disc3 >= 0.0, t_card, t_trig) - cb3 / 3.0
    m = jnp.maximum(m, 0.0)

    s2q = 2.0 * m
    sq = jnp.sqrt(jnp.maximum(s2q, 0.0))
    q_over_2s = qq / jnp.maximum(2.0 * sq, _EPS)

    biq = (jnp.abs(qq) < 1e-10) & (sq < 1e-10)
    disc_b = p * p - 4.0 * r
    sqdb = jnp.sqrt(jnp.maximum(disc_b, 0.0))
    y2a = (-p + sqdb) / 2.0
    y2b = (-p - sqdb) / 2.0

    c1 = p / 2.0 + m + q_over_2s
    c2q = p / 2.0 + m - q_over_2s
    disc1 = s2q / 4.0 - c1
    disc2 = s2q / 4.0 - c2q
    sq1 = jnp.sqrt(jnp.maximum(disc1, 0.0))
    sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))

    sq_ba = jnp.sqrt(jnp.maximum(y2a, 0.0))
    sq_bb = jnp.sqrt(jnp.maximum(y2b, 0.0))

    y_quads = (sq / 2.0 + sq1, sq / 2.0 - sq1,
               -sq / 2.0 + sq2, -sq / 2.0 - sq2)
    real_quads = (disc1 >= -1e-6, disc1 >= -1e-6,
                  disc2 >= -1e-6, disc2 >= -1e-6)
    y_biq = (sq_ba, -sq_ba, sq_bb, -sq_bb)
    real_biq = ((disc_b >= 0) & (y2a >= 0), (disc_b >= 0) & (y2a >= 0),
                (disc_b >= 0) & (y2b >= 0), (disc_b >= 0) & (y2b >= 0))

    roots = [jnp.where(biq, yb, yq) - b / 4.0
             for yb, yq in zip(y_biq, y_quads)]
    # select between boolean masks in float form — Mosaic has no i1
    # vector select (i8->i1 truncation is unsupported)
    is_real = [jnp.where(biq, jnp.where(rb, 1.0, 0.0),
                         jnp.where(rq, 1.0, 0.0)) > 0.5
               for rb, rq in zip(real_biq, real_quads)]

    # ---- Newton polish against the normalised coefficients ----
    def poly(v):
        return (((A4 * v + A3) * v + A2) * v + A1) * v + A0

    def dpoly(v):
        return ((4.0 * A4 * v + 3.0 * A3) * v + 2.0 * A2) * v + A1

    def polish(v):
        for _ in range(3):
            dpv = dpoly(v)
            dpv = jnp.where(jnp.abs(dpv) < 1e-10,
                            jnp.where(dpv < 0, -1e-10, 1e-10) + 1e-12, dpv)
            v = v - jnp.clip(poly(v) / dpv, -10.0, 10.0)
            v = jnp.clip(v, -100.0, 100.0)
        return v

    roots = [polish(v) for v in roots]

    nondegen = jnp.minimum(jnp.minimum(a2, b2), c2) > 1.0  # > 1 mm^2

    # triad of the scene points is root-independent — hoist it
    e0a = sub(X[1], X[0])
    e1a = sub(X[2], X[0])
    n0a = normalize(e0a)
    n2a = normalize(cross(n0a, e1a))
    n1a = cross(n2a, n0a)
    cXx = (X[0][0] + X[1][0] + X[2][0]) / 3.0
    cXy = (X[0][1] + X[1][1] + X[2][1]) / 3.0
    cXz = (X[0][2] + X[1][2] + X[2][2]) / 3.0

    one = jnp.ones_like(a2)
    zero = jnp.zeros_like(a2)
    best_err = jnp.full_like(a2, _BIG)
    bR = [one, zero, zero, zero, one, zero, zero, zero, one]  # identity
    bt = [zero, zero, zero]
    any_valid = a2 < -1.0  # all-False

    for k in range(4):
        v = roots[k]
        denom_u = 2.0 * (cg - v * ca)
        denom_u = jnp.where(jnp.abs(denom_u) < 1e-3,
                            jnp.where(denom_u < 0, -1e-3, 1e-3), denom_u)
        u = jnp.clip(((q - 1.0) * v * v - 2.0 * q * cb * v + 1.0 + q)
                     / denom_u, -1e3, 1e3)
        s1_sq = b2s / jnp.maximum(1.0 + v * v - 2.0 * v * cb, _EPS)
        s1 = jnp.clip(jnp.sqrt(jnp.maximum(s1_sq, _EPS)), 0.0, 1e6)
        s2r = u * s1
        s3r = v * s1
        rvalid = is_real[k] & (v > 0) & (u > 0) & nondegen

        Y = [(s1 * F[0][0], s1 * F[0][1], s1 * F[0][2]),
             (s2r * F[1][0], s2r * F[1][1], s2r * F[1][2]),
             (s3r * F[2][0], s3r * F[2][1], s3r * F[2][2])]

        e0b = sub(Y[1], Y[0])
        e1b = sub(Y[2], Y[0])
        n0b = normalize(e0b)
        n2b = normalize(cross(n0b, e1b))
        n1b = cross(n2b, n0b)

        # R = tb @ ta^T = n0b n0a^T + n1b n1a^T + n2b n2a^T
        Rk = []
        for bi in range(3):
            for ai in range(3):
                Rk.append(n0b[bi] * n0a[ai] + n1b[bi] * n1a[ai]
                          + n2b[bi] * n2a[ai])

        cYx = (Y[0][0] + Y[1][0] + Y[2][0]) / 3.0
        cYy = (Y[0][1] + Y[1][1] + Y[2][1]) / 3.0
        cYz = (Y[0][2] + Y[1][2] + Y[2][2]) / 3.0
        tk = [cYx - (Rk[0] * cXx + Rk[1] * cXy + Rk[2] * cXz),
              cYy - (Rk[3] * cXx + Rk[4] * cXy + Rk[5] * cXz),
              cYz - (Rk[6] * cXx + Rk[7] * cXy + Rk[8] * cXz)]

        # 4th-point disambiguation (geometry/p3p.py:316-329)
        ex = Rk[0] * X[3][0] + Rk[1] * X[3][1] + Rk[2] * X[3][2] + tk[0]
        ey = Rk[3] * X[3][0] + Rk[4] * X[3][1] + Rk[5] * X[3][2] + tk[1]
        ez = Rk[6] * X[3][0] + Rk[7] * X[3][1] + Rk[8] * X[3][2] + tk[2]
        front = ez < 0.0
        ezg = jnp.where(jnp.abs(ez) < 1e-8, -1e-8, ez)
        up = -f * ex / ezg + cx
        vp = f * ey / ezg + cy
        du = pix_ref[6:7, :] - up
        dv = pix_ref[7:8, :] - vp
        err4 = jnp.sqrt(du * du + dv * dv + 1e-8)

        ok = rvalid & front
        any_valid = any_valid | ok
        err4m = jnp.where(ok, err4, _BIG)
        take = err4m < best_err
        best_err = jnp.where(take, err4m, best_err)
        bR = [jnp.where(take, rk, br) for rk, br in zip(Rk, bR)]
        bt = [jnp.where(take, tk_, bt_) for tk_, bt_ in zip(tk, bt)]

    # identity fallback on fully-invalid lanes (safeSolvePnP zero pose,
    # core/cnn.h:66-77)
    idn = [one, zero, zero, zero, one, zero, zero, zero, one]
    bR = [jnp.where(any_valid, br, ii) for br, ii in zip(bR, idn)]
    bt = [jnp.where(any_valid, bt_, zero) for bt_ in bt]

    # worst reprojection error over the 4 support points with the
    # selected pose — the self-consistency metric (core/cnn.h:1117-1126)
    worst = jnp.zeros_like(a2)
    for i in range(4):
        ex = bR[0] * X[i][0] + bR[1] * X[i][1] + bR[2] * X[i][2] + bt[0]
        ey = bR[3] * X[i][0] + bR[4] * X[i][1] + bR[5] * X[i][2] + bt[1]
        ez = bR[6] * X[i][0] + bR[7] * X[i][1] + bR[8] * X[i][2] + bt[2]
        ezg = jnp.where(jnp.abs(ez) < 1e-8, -1e-8, ez)
        up = -f * ex / ezg + cx
        vp = f * ey / ezg + cy
        du = pix_ref[2 * i:2 * i + 1, :] - up
        dv = pix_ref[2 * i + 1:2 * i + 2, :] - vp
        worst = jnp.maximum(worst, jnp.sqrt(du * du + dv * dv + 1e-8))

    for j in range(9):
        out_ref[j:j + 1, :] = bR[j]
    for j in range(3):
        out_ref[9 + j:10 + j, :] = bt[j]
    out_ref[12:13, :] = jnp.where(any_valid, 1.0, 0.0)
    out_ref[13:14, :] = worst


@functools.partial(jax.jit, static_argnames=("interpret",))
def p3p_solve_pallas(obj: jnp.ndarray, pix: jnp.ndarray,
                     cam_vec: jnp.ndarray, interpret: bool = False
                     ) -> tuple[Pose, jnp.ndarray, jnp.ndarray]:
    """Batched 4-point minimal P3P, fused + structure-of-arrays.

    obj: (N, 4, 3) scene points (mm); pix: (N, 4, 2) pixels;
    cam_vec: (3,) [f, cx, cy].  Returns (Pose (N,), valid (N,) bool,
    worst (N,) max support-point reprojection error).  Forward-only —
    the training path uses geometry/p3p.py:solve_pnp_minimal.
    """
    N = obj.shape[0]
    Np = -(-N // _TN) * _TN

    obj_soa = jnp.pad(obj.reshape(N, 12).T.astype(jnp.float32),
                      ((0, 0), (0, Np - N)))  # (12, Np)
    pix_soa = jnp.pad(pix.reshape(N, 8).T.astype(jnp.float32),
                      ((0, 0), (0, Np - N)))  # (8, Np)

    out = pl.pallas_call(
        _p3p_kernel,
        out_shape=jax.ShapeDtypeStruct((14, Np), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Np // _TN,),
            in_specs=[
                pl.BlockSpec((12, _TN), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, _TN), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((14, _TN), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(obj_soa, pix_soa, cam_vec.astype(jnp.float32))

    out = out[:, :N]
    R = out[:9].T.reshape(N, 3, 3)
    t = out[9:12].T
    valid = out[12] > 0.5
    worst = out[13]
    return Pose(R, t), valid, worst
