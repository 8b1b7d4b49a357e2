"""P3P minimal solver and Gauss-Newton refinement tests.

P3P on exact synthetic correspondences must reproduce the generating pose
(the reference's own self-consistency requirement, core/cnn.h:1117-1126);
GN must converge from perturbed initialisations and reject outliers via
the soft inlier weights.  Gradients are checked against finite differences
(the reference's dPNP/dRefine FD machinery is the oracle we replace).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsac_tpu.config import Camera
from dsac_tpu.geometry import (
    Pose, gn_pnp, invert, max_loss, pose_errors, project, refine_pose,
    so3_exp, solve_pnp_minimal, transform,
)
from dsac_tpu.geometry.p3p import p3p_grunert, pixel_bearings

CAM = Camera.make(525.0, 640, 480)


def make_scene(rng, n_points=4, spread=1000.0, depth=(1500.0, 3500.0)):
    """Random camera pose + scene points that project inside the image.

    Build points in the EYE frame first (in front of the camera: z < 0),
    then pull them back to the scene frame with a random pose — guarantees
    visibility regardless of the pose.
    """
    w = rng.normal(size=3).astype(np.float32)
    R = np.array(so3_exp(jnp.asarray(w)))
    t = (rng.normal(size=3) * 800).astype(np.float32)
    pose = Pose(jnp.asarray(R), jnp.asarray(t))

    x = rng.uniform(-spread, spread, size=n_points).astype(np.float32)
    y = rng.uniform(-spread * 0.75, spread * 0.75, size=n_points).astype(np.float32)
    z = -rng.uniform(*depth, size=n_points).astype(np.float32)
    eye_pts = jnp.asarray(np.stack([x, y, z], -1))
    scene_pts = transform(invert(pose), eye_pts)
    pix = project(pose, eye_pts * 0 + eye_pts, CAM)  # project eye pts
    # projection expects scene pts + pose; use identity for eye pts
    pix = project(Pose(jnp.eye(3), jnp.zeros(3)), eye_pts, CAM)
    return pose, scene_pts, pix


class TestBearings:
    def test_bearing_roundtrip(self, rng):
        pose, scene, pix = make_scene(rng)
        bear = pixel_bearings(pix, CAM)
        # bearing * range should reconstruct the eye point
        eye = transform(pose, scene)
        ranges = jnp.linalg.norm(eye, axis=-1)
        np.testing.assert_allclose(bear * ranges[:, None], eye,
                                   rtol=1e-4, atol=0.5)


class TestP3P:
    def test_ranges_exact(self, rng):
        pose, scene, pix = make_scene(rng, n_points=3)
        eye = transform(pose, scene)
        gt_ranges = np.linalg.norm(np.array(eye), axis=-1)
        bear = pixel_bearings(pix, CAM)
        ranges, valid = p3p_grunert(scene, bear)
        assert bool(jnp.any(valid))
        # one of the <=4 solutions must match the true ranges
        errs = np.abs(np.array(ranges) - gt_ranges[None, :]).max(-1)
        errs[~np.array(valid)] = np.inf
        assert errs.min() < 2.0  # mm, on ~2-3m ranges

    def test_solve_recovers_pose(self, rng):
        for _ in range(20):
            pose, scene, pix = make_scene(rng)
            est, valid = solve_pnp_minimal(scene, pix, CAM)
            assert bool(valid)
            rot_err, t_err = pose_errors(est, pose)
            assert float(rot_err) < 0.5, float(rot_err)
            assert float(t_err) < 20.0, float(t_err)  # mm

    def test_batched_vmap(self, rng):
        poses, scenes, pixs = [], [], []
        for _ in range(16):
            p, s, px = make_scene(rng)
            poses.append(p)
            scenes.append(s)
            pixs.append(px)
        scene_b = jnp.stack(scenes)
        pix_b = jnp.stack(pixs)
        est, valid = jax.vmap(lambda o, p: solve_pnp_minimal(o, p, CAM))(
            scene_b, pix_b)
        assert bool(jnp.all(valid))
        gt = Pose(jnp.stack([p.R for p in poses]),
                  jnp.stack([p.t for p in poses]))
        rot_err, t_err = pose_errors(est, gt)
        assert float(jnp.max(rot_err)) < 0.5
        assert float(jnp.max(t_err)) < 20.0

    def test_degenerate_collinear_flagged(self, rng):
        # collinear points: no valid solution should be reported as usable
        pose, scene, pix = make_scene(rng)
        scene = np.array(scene)
        scene[1] = scene[0] + np.array([10.0, 0, 0])
        scene[2] = scene[0] + np.array([20.0, 0, 0])
        est, valid = solve_pnp_minimal(jnp.asarray(scene), pix, CAM)
        # must not produce NaNs even when degenerate
        assert np.all(np.isfinite(np.array(est.R)))
        assert np.all(np.isfinite(np.array(est.t)))

    def test_duplicate_point_set_gradient_finite(self):
        # Regression: this exact configuration (points 1 and 2 identical —
        # a duplicate minimal-set draw) produced a near-double quartic root
        # whose Newton-chain gradient overflowed f32 on TPU and poisoned
        # the shared coordinate gradient during e2e training.
        obj = jnp.asarray([[3030.5723, 1564.1547, 4060.9712],
                           [3347.4216, 2073.6963, 3925.5176],
                           [3347.4216, 2073.6963, 3925.5176],
                           [2829.0405, 1739.2445, 3840.0574]])
        pix = jnp.asarray([[68.0, 308.0], [64.0, 101.0], [64.0, 101.0],
                           [241.0, 263.0]])

        def f(o):
            est, valid = solve_pnp_minimal(o, pix, CAM)
            return jnp.sum(est.t) * 1e-3 + jnp.sum(est.R)

        g = jax.grad(f)(obj)
        assert np.all(np.isfinite(np.array(g))), g
        # and the magnitude must be sane (bounded implicit gradient)
        assert float(jnp.max(jnp.abs(g))) < 1e6

    def test_gradient_flows_through_solver(self, rng):
        pose, scene, pix = make_scene(rng)

        def f(s):
            est, _ = solve_pnp_minimal(s, pix, CAM)
            return jnp.sum(est.t)

        g = jax.grad(f)(scene)
        assert np.all(np.isfinite(np.array(g)))
        assert np.any(np.abs(np.array(g)) > 0)


class TestGN:
    def test_converges_from_perturbed(self, rng):
        pose, scene, pix = make_scene(rng, n_points=64)
        w0 = jnp.asarray(rng.normal(size=3) * 0.03, jnp.float32)
        pert = Pose(so3_exp(w0) @ pose.R,
                    pose.t + jnp.asarray(rng.normal(size=3) * 50, jnp.float32))
        weights = jnp.ones(64)
        est = gn_pnp(pert, scene, pix, weights, CAM, iters=6)
        rot_err, t_err = pose_errors(est, pose)
        assert float(rot_err) < 0.1
        assert float(t_err) < 5.0

    def test_weighted_rejects_outliers(self, rng):
        pose, scene, pix = make_scene(rng, n_points=64)
        pix_np = np.array(pix)
        pix_np[-16:] += rng.uniform(50, 150, size=(16, 2))  # corrupt
        w = np.ones(64, np.float32)
        w[-16:] = 0.0
        w0 = jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)
        pert = Pose(so3_exp(w0) @ pose.R, pose.t + 30.0)
        est = gn_pnp(pert, scene, jnp.asarray(pix_np), jnp.asarray(w), CAM,
                     iters=6)
        rot_err, t_err = pose_errors(est, pose)
        assert float(rot_err) < 0.1
        assert float(t_err) < 5.0


class TestRefine:
    def _noisy_scene(self, rng, n=1600, outlier_frac=0.3, noise=3.0):
        pose, scene, pix = make_scene(rng, n_points=n)
        scene = np.array(scene)
        n_out = int(n * outlier_frac)
        idx = rng.choice(n, size=n_out, replace=False)
        scene[idx] += rng.normal(size=(n_out, 3)) * 800  # coordinate outliers
        scene += rng.normal(size=(n, 3)) * noise  # mm noise everywhere
        return pose, jnp.asarray(scene), pix

    def test_refines_to_gt_with_outliers(self, rng):
        pose, scene, pix = self._noisy_scene(rng)
        w0 = jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)
        init = Pose(so3_exp(w0) @ pose.R,
                    pose.t + jnp.asarray(rng.normal(size=3) * 40, jnp.float32))
        refined, n_in = refine_pose(init, scene, pix, CAM, steps=8)
        rot_err, t_err = pose_errors(refined, pose)
        assert float(rot_err) < 0.5
        assert float(t_err) < 15.0
        assert float(n_in) > 50

    def test_hard_capped_variant_matches_soft(self, rng):
        """The reference-faithful hard/capped refinement (rB=100 cap,
        <50 abort; core/cnn.h:1186-1204) must reach the same fixed point
        as the soft-weight redesign on a standard noisy scene."""
        from dsac_tpu.geometry.gn import refine_pose_hard

        pose, scene, pix = self._noisy_scene(rng)
        w0 = jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)
        init = Pose(so3_exp(w0) @ pose.R,
                    pose.t + jnp.asarray(rng.normal(size=3) * 40,
                                         jnp.float32))
        hard, n_hard = refine_pose_hard(init, scene, pix, CAM, steps=8,
                                        inlier_cap=100)
        rot_err, t_err = pose_errors(hard, pose)
        assert float(rot_err) < 0.7
        assert float(t_err) < 25.0
        # hard count is an integer count of err<tau points, capped input
        assert 50 <= float(n_hard) <= 1600
        # totally-off init: frozen, like the soft path
        bad = Pose(jnp.eye(3), jnp.asarray([0.0, 0.0, -50000.0]))
        frozen, _ = refine_pose_hard(bad, scene, pix, CAM, steps=8)
        np.testing.assert_allclose(np.array(frozen.t), np.array(bad.t))

    def test_aborts_on_too_few_inliers(self, rng):
        pose, scene, pix = make_scene(rng, n_points=100)
        # totally wrong init, far from any inliers -> pose must stay frozen
        init = Pose(jnp.eye(3), jnp.asarray([0.0, 0.0, -50000.0]))
        refined, n_in = refine_pose(init, scene, pix, CAM, steps=8,
                                    min_inliers=50.0)
        np.testing.assert_allclose(np.array(refined.t), np.array(init.t))

    def test_batch_vmap_refine(self, rng):
        pose, scene, pix = self._noisy_scene(rng, n=400)
        # Perturbations in the realistic basin: pipeline inits come from
        # self-consistency-checked P3P (core/cnn.h:1117-1126), so they start
        # well inside the inlier threshold; hypotheses farther out trip the
        # min-inlier abort by design (reference parity, core/cnn.h:1203).
        inits = Pose(
            jnp.stack([so3_exp(jnp.asarray(rng.normal(size=3) * 0.006,
                                           jnp.float32)) @ pose.R
                       for _ in range(8)]),
            jnp.stack([pose.t + jnp.asarray(rng.normal(size=3) * 15,
                                            jnp.float32)
                       for _ in range(8)]))
        refined, n_in = jax.vmap(
            lambda p0: refine_pose(p0, scene, pix, CAM, steps=8))(inits)
        rot_err, t_err = pose_errors(refined, pose)
        assert float(jnp.max(rot_err)) < 1.0
        assert float(jnp.max(t_err)) < 20.0

    def test_gradient_wrt_coords_matches_fd(self, rng):
        # The analogue of dRefine (core/cnn.h:866-990): d(pose)/d(coords)
        # by autodiff vs central differences on the soft refinement itself.
        pose, scene, pix = self._noisy_scene(rng, n=200, outlier_frac=0.1)
        init = Pose(so3_exp(jnp.asarray([0.01, -0.01, 0.005])) @ pose.R,
                    pose.t + jnp.asarray([20.0, -10.0, 15.0]))

        def f(s):
            refined, _ = refine_pose(init, s, pix, CAM, steps=3)
            return jnp.sum(refined.t)

        g = np.array(jax.grad(f)(scene))
        assert np.all(np.isfinite(g))
        # FD check on a handful of coordinates
        s0 = np.array(scene)
        for (i, c) in [(0, 0), (7, 1), (100, 2)]:
            eps = 1.0  # mm
            sp = s0.copy(); sp[i, c] += eps
            sm = s0.copy(); sm[i, c] -= eps
            fd = (float(f(jnp.asarray(sp))) - float(f(jnp.asarray(sm)))) / (2 * eps)
            np.testing.assert_allclose(g[i, c], fd, rtol=0.15, atol=5e-3)
