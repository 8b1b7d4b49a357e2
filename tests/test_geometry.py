"""Unit tests for the geometry core against closed-form cases.

Strategy per SURVEY.md §4: each kernel is validated against analytically
known answers (P3P on exact synthetic correspondences must reproduce the
generating pose — the template is the reference's own self-consistency
check at core/cnn.h:1117-1126), and differentiable paths are gradchecked
against finite differences (the reference's FD machinery is the oracle).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsac_tpu.config import Camera
from dsac_tpu.geometry import (
    Pose, angular_distance_deg, compose, hat, invert, kabsch, max_loss,
    pose_errors, pose_from_vec6, pose_to_vec6, project, so3_exp, so3_log,
    transform,
)
from dsac_tpu.geometry.kabsch import triad_align
from dsac_tpu.geometry.loss import is_correct


def random_rotation(rng, n=()):
    w = rng.normal(size=(*n, 3)) * 1.5
    return np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))


def random_pose(rng, n=()):
    R = random_rotation(rng, n)
    t = rng.normal(size=(*n, 3)) * 1000.0
    return Pose(jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32))


class TestRotation:
    def test_exp_identity(self):
        R = so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-6)

    def test_exp_90deg_z(self):
        R = so3_exp(jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(R, expected, atol=1e-6)

    def test_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3)).astype(np.float32)
        # keep |w| < pi for uniqueness of the log
        w = w / (1e-9 + np.linalg.norm(w, axis=-1, keepdims=True)) \
            * rng.uniform(0.001, 3.1, size=(64, 1)).astype(np.float32)
        R = so3_exp(jnp.asarray(w))
        w2 = so3_log(R)
        np.testing.assert_allclose(w2, w, atol=2e-3)

    def test_log_near_pi(self):
        w = jnp.asarray([np.pi - 1e-4, 0.0, 0.0], jnp.float32)
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(w2, w, atol=1e-3)

    def test_log_small_angle(self):
        w = jnp.asarray([1e-5, -2e-5, 1e-5], jnp.float32)
        w2 = so3_log(so3_exp(w))
        np.testing.assert_allclose(w2, w, atol=1e-6)

    def test_angular_distance(self, rng):
        R1 = jnp.asarray(random_rotation(rng))
        angle = 37.0
        Rdelta = so3_exp(jnp.asarray([0, np.radians(angle), 0], jnp.float32))
        R2 = Rdelta @ R1
        d = angular_distance_deg(R1, R2)
        np.testing.assert_allclose(d, angle, atol=0.01)

    def test_hat_cross(self, rng):
        a = jnp.asarray(rng.normal(size=3), jnp.float32)
        b = jnp.asarray(rng.normal(size=3), jnp.float32)
        np.testing.assert_allclose(hat(a) @ b, jnp.cross(a, b), atol=1e-6)

    def test_exp_gradient_finite_at_zero(self):
        g = jax.jacobian(so3_exp)(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        # d(exp)/dw at 0 is the generator basis: dR/dw_k = hat(e_k)
        for k in range(3):
            e = np.zeros(3, np.float32)
            e[k] = 1
            np.testing.assert_allclose(g[..., k], hat(jnp.asarray(e)),
                                       atol=1e-5)


class TestPose:
    def test_compose_invert(self, rng):
        a = random_pose(rng)
        b = random_pose(rng)
        x = jnp.asarray(rng.normal(size=3) * 500, jnp.float32)
        y1 = transform(a, transform(b, x))
        y2 = transform(compose(a, b), x)
        np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-2)
        xi = transform(invert(a), transform(a, x))
        np.testing.assert_allclose(xi, x, rtol=1e-4, atol=1e-2)

    def test_vec6_roundtrip(self, rng):
        p = random_pose(rng, (8,))
        v = pose_to_vec6(p)
        p2 = pose_from_vec6(v)
        np.testing.assert_allclose(p2.R, p.R, atol=1e-4)
        np.testing.assert_allclose(p2.t, p.t, atol=1e-3)


class TestKabsch:
    def test_recovers_pose(self, rng):
        gt = random_pose(rng)
        pts = jnp.asarray(rng.normal(size=(20, 3)) * 800, jnp.float32)
        moved = transform(gt, pts)
        est = kabsch(pts, moved)
        np.testing.assert_allclose(est.R, gt.R, atol=1e-4)
        np.testing.assert_allclose(est.t, gt.t, rtol=1e-3, atol=0.5)

    def test_weighted_ignores_outliers(self, rng):
        gt = random_pose(rng)
        pts = jnp.asarray(rng.normal(size=(20, 3)) * 800, jnp.float32)
        moved = np.array(transform(gt, pts))
        moved[-3:] += 5000.0  # corrupt
        w = np.ones(20, np.float32)
        w[-3:] = 0.0
        est = kabsch(pts, jnp.asarray(moved), jnp.asarray(w))
        np.testing.assert_allclose(est.R, gt.R, atol=1e-4)

    def test_triad_exact_three_points(self, rng):
        gt = random_pose(rng)
        pts = jnp.asarray(rng.normal(size=(3, 3)) * 800, jnp.float32)
        moved = transform(gt, pts)
        est = triad_align(pts, moved)
        np.testing.assert_allclose(est.R, gt.R, atol=1e-4)
        np.testing.assert_allclose(est.t, gt.t, rtol=1e-3, atol=0.5)

    def test_batched(self, rng):
        gt = random_pose(rng, (5,))
        pts = jnp.asarray(rng.normal(size=(5, 10, 3)) * 500, jnp.float32)
        moved = jnp.einsum("bij,bnj->bni", gt.R, pts) + gt.t[:, None]
        est = kabsch(pts, moved)
        np.testing.assert_allclose(est.R, gt.R, atol=1e-4)


class TestProjection:
    def test_principal_ray(self):
        cam = Camera.make(525.0, 640, 480)
        # point straight ahead: eye = (0, 0, -1000) -> principal point
        pose = Pose(jnp.eye(3), jnp.asarray([0.0, 0.0, 0.0]))
        x = jnp.asarray([[0.0, 0.0, -1000.0]])
        uv = project(pose, x, cam)
        np.testing.assert_allclose(uv[0], [320.0, 240.0], atol=1e-4)

    def test_known_offsets(self):
        # eye = (100, 0, -1000): u = -f*100/-1000 + cx = 0.1f + cx (x right
        # maps to +u via the double negation) ; y up maps to -v.
        cam = Camera.make(500.0, 640, 480)
        pose = Pose(jnp.eye(3), jnp.zeros(3))
        uv = project(pose, jnp.asarray([[100.0, 0.0, -1000.0],
                                        [0.0, 100.0, -1000.0]]), cam)
        np.testing.assert_allclose(uv[0], [320.0 + 50.0, 240.0], atol=1e-3)
        np.testing.assert_allclose(uv[1], [320.0, 240.0 - 50.0], atol=1e-3)


class TestLoss:
    def test_zero_for_identical(self, rng):
        p = random_pose(rng)
        # guard: identical poses -> loss ~ 0; the acos-argument clamp that
        # keeps gradients finite puts a ~0.03 deg floor on the angle, which
        # is negligible against the 5 deg correctness threshold.
        loss = max_loss(p, p)
        assert float(loss) < 0.05

    def test_translation_dominates(self, rng):
        gt = random_pose(rng)
        # shift the camera centre by exactly 120mm -> loss = 12 (cm)
        inv = invert(gt)
        shifted = Pose(inv.R, inv.t + jnp.asarray([120.0, 0, 0]))
        est = invert(shifted)
        np.testing.assert_allclose(max_loss(est, gt), 12.0, rtol=1e-3)

    def test_rotation_dominates(self, rng):
        gt = random_pose(rng)
        inv = invert(gt)
        rot = Pose(so3_exp(jnp.asarray([0.0, 0.0, np.radians(20)])) @ inv.R,
                   inv.t)
        est = invert(rot)
        rot_err, t_err = pose_errors(est, gt)
        np.testing.assert_allclose(rot_err, 20.0, rtol=1e-3)
        loss = max_loss(est, gt)
        assert float(loss) >= 20.0 - 1e-2

    def test_correct_flag(self, rng):
        gt = random_pose(rng)
        inv = invert(gt)
        near = invert(Pose(inv.R, inv.t + jnp.asarray([30.0, 0, 0])))
        far = invert(Pose(inv.R, inv.t + jnp.asarray([80.0, 0, 0])))
        assert bool(is_correct(near, gt))
        assert not bool(is_correct(far, gt))

    def test_gradient_flows(self, rng):
        gt = random_pose(rng)
        v_est = pose_to_vec6(gt) + jnp.asarray([0.01, 0, 0, 30.0, 0, 0])

        def f(v):
            return max_loss(pose_from_vec6(v), gt)

        g = jax.grad(f)(v_est)
        assert np.all(np.isfinite(g))
        assert np.any(np.abs(g) > 0)

    def test_gradient_matches_fd(self, rng):
        # The reference computes this gradient by hand (dLossMax,
        # core/maxloss.h:87-198); FD is our oracle for the autodiff version.
        gt = random_pose(rng)
        v_est = pose_to_vec6(gt) + jnp.asarray(
            [0.05, -0.02, 0.01, 40.0, -25.0, 10.0], jnp.float32)

        def f(v):
            return max_loss(pose_from_vec6(v.astype(jnp.float32)), gt)

        g = np.asarray(jax.grad(f)(v_est))
        for k in range(6):
            eps = 1e-3 if k < 3 else 1.0
            e = np.zeros(6, np.float32)
            e[k] = eps
            fd = (float(f(v_est + e)) - float(f(v_est - e))) / (2 * eps)
            np.testing.assert_allclose(g[k], fd, rtol=0.05, atol=1e-3)
