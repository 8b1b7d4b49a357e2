"""Implicit-function refinement gradients vs unrolled autodiff.

The reference differentiates refinement by finite-difference replay of the
whole 8-step loop (dRefine, core/cnn.h:866-990).  The rebuild's fast
training mode instead takes the implicit-function gradient at the IRLS
fixed point (pipeline/forward.py:make_refiners "implicit"/"implicit_jnp").
These tests establish that the implicit gradient agrees with the exact
autodiff-through-the-unrolled-scan gradient — (a) at a converged fixed
point on raw geometry, and (b) end-to-end through the full DSAC pipeline
objective at training scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsac_tpu.config import Camera, DataConfig, DSACConfig, NetConfig, PoseConfig
from dsac_tpu.geometry.gn import implicit_refine_step, refine_pose
from dsac_tpu.geometry.pose import Pose, pose_to_vec6
from dsac_tpu.geometry.rotation import so3_exp


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _scene(rng, n=256, noise=2.0, outlier_frac=0.2):
    """Random points in front of a random camera + noisy coords (mm)."""
    cam = Camera.make(focal=525.0, width=640, height=480)
    R = so3_exp(jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32))
    t = jnp.asarray([40.0, -30.0, -2500.0], jnp.float32)
    pose = Pose(R, t)
    # scene points: sample in eye space (visible), pull back to scene space
    eye = np.stack([rng.uniform(-800, 800, n), rng.uniform(-600, 600, n),
                    rng.uniform(-4000, -1500, n)], axis=-1).astype(np.float32)
    obj = (np.asarray(R).T @ (eye - np.asarray(t)).T).T
    eyej = jnp.asarray(eye)
    u = -float(cam.focal) * eyej[:, 0] / eyej[:, 2] + cam.cx
    v = float(cam.focal) * eyej[:, 1] / eyej[:, 2] + cam.cy
    pix = jnp.stack([u, v], axis=-1)
    # corrupt the coords: inlier noise + gross outliers
    noise_mm = rng.normal(size=obj.shape) * noise
    outliers = rng.uniform(size=n) < outlier_frac
    noise_mm[outliers] += rng.normal(size=(outliers.sum(), 3)) * 500.0
    coords = jnp.asarray(obj + noise_mm, jnp.float32)
    return cam, pose, coords, pix


class TestImplicitGeometryGrad:
    def test_implicit_matches_unrolled_at_fixed_point(self, rng):
        """At a converged IRLS fixed point the one-step implicit gradient
        equals the autodiff-through-the-scan gradient."""
        cam, gt, coords, pix = _scene(rng)
        # perturbed init, like a noisy P3P hypothesis
        dR = so3_exp(jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32))
        init = Pose(dR @ gt.R, gt.t + jnp.asarray(
            rng.normal(size=3) * 20.0, jnp.float32))
        w = jnp.asarray(rng.normal(size=6), jnp.float32)  # probe direction

        steps = 20  # enough to converge

        def loss_unrolled(c):
            refined, _ = refine_pose(init, c, pix, cam, steps=steps,
                                     inner_iters=2, remat=False)
            return jnp.sum(w * pose_to_vec6(refined))

        def loss_implicit(c):
            refined, _ = refine_pose(
                jax.tree.map(jax.lax.stop_gradient, init),
                jax.lax.stop_gradient(c), pix, cam, steps=steps,
                inner_iters=2, remat=False)
            stepped = implicit_refine_step(refined, c, pix, cam)
            return jnp.sum(w * pose_to_vec6(stepped))

        g_unrolled = jax.grad(loss_unrolled)(coords)
        g_implicit = jax.grad(loss_implicit)(coords)
        assert np.all(np.isfinite(g_implicit))
        cos = _cosine(g_unrolled, g_implicit)
        ratio = float(jnp.linalg.norm(g_implicit)
                      / (jnp.linalg.norm(g_unrolled) + 1e-30))
        assert cos > 0.97, f"gradient cosine {cos}"
        assert 0.7 < ratio < 1.4, f"gradient magnitude ratio {ratio}"


class TestFDInitSensitivity:
    def test_fd_init_vjp_matches_unrolled_autodiff(self, rng):
        """The fused kernel's init-pose custom VJP (the reference's FD
        dRefineHyp, one batched Pallas launch) must agree with autodiff
        through the truncated jnp unroll — the gradient softam's
        inject_init path used to compute the slow way.  Compared at the
        tangent (vec6) level, which is what pose_from_vec6 feeds it."""
        from dsac_tpu.geometry.pose import compose
        from dsac_tpu.ops.gn_pallas import make_init_sensitivity_refiner

        cam, gt, coords, pix = _scene(rng, n=256)
        # FAR init + few steps: refinement does NOT converge, so the
        # truncated init sensitivity is genuinely non-zero (the regime
        # softam's averaged pose lives in — a near-converged fixed point
        # would make both gradients ~0 and the comparison pure f32
        # noise).  inner_iters=1 makes the jnp map identical to the
        # kernel's one-solve-per-reweight iteration, so the two
        # gradients estimate the SAME function.
        dR = so3_exp(jnp.asarray(rng.normal(size=3) * 0.15, jnp.float32))
        init = Pose(dR @ gt.R, gt.t + jnp.asarray(
            rng.normal(size=3) * 300.0, jnp.float32))
        w = jnp.asarray(rng.normal(size=6), jnp.float32)
        steps = 4

        def param(v6):
            # tangent parameterisation around `init`
            return Pose(so3_exp(v6[:3]) @ init.R, init.t + v6[3:])

        def loss_unroll(v6):
            refined, _ = refine_pose(param(v6), coords, pix, cam,
                                     steps=steps, inner_iters=1,
                                     remat=False)
            return jnp.sum(w * pose_to_vec6(refined))

        fd = make_init_sensitivity_refiner(
            cam, steps=steps, threshold=10.0,
            beta=1.0, min_inliers=50.0, damping=1e-4, max_error=100.0,
            interpret=True)

        def loss_fd(v6):
            p = param(v6)
            R, t = fd(p.R[None], p.t[None], coords, pix)
            return jnp.sum(w * pose_to_vec6(Pose(R[0], t[0])))

        z = jnp.zeros(6)
        g_u = np.asarray(jax.grad(loss_unroll)(z), np.float64)
        g_f = np.asarray(jax.grad(loss_fd)(z), np.float64)
        assert np.all(np.isfinite(g_f))
        # the gradient must be genuinely non-trivial in this regime
        assert np.linalg.norm(g_u) > 1e-2, g_u
        cos = _cosine(g_u, g_f)
        ratio = float(np.linalg.norm(g_f)
                      / (np.linalg.norm(g_u) + 1e-30))
        assert cos > 0.97, f"init-gradient cosine {cos}"
        assert 0.8 < ratio < 1.25, f"init-gradient magnitude ratio {ratio}"

    def test_fd_init_value_is_fused_forward(self, rng):
        from dsac_tpu.ops.gn_pallas import (make_init_sensitivity_refiner,
                                            refine_pose_fused)

        cam, gt, coords, pix = _scene(rng, n=256)
        init = Pose(gt.R[None], (gt.t + 30.0)[None])
        fd = make_init_sensitivity_refiner(
            cam, steps=8, threshold=10.0, beta=1.0,
            min_inliers=50.0, damping=1e-4, max_error=100.0,
            interpret=True)
        R, t = fd(init.R, init.t, coords, pix)
        ref, _ = refine_pose_fused(init, coords, pix, cam, steps=8,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(R), np.asarray(ref.R),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), np.asarray(ref.t),
                                   atol=1e-4)


class TestImplicitPipelineGrad:
    @pytest.fixture(scope="class")
    def pipeline(self):
        from dsac_tpu.data.synthetic import SyntheticScene
        from dsac_tpu.models import DenseCoordNet, ScoreNet
        from dsac_tpu.models.coord_net import gather_dense_coords

        cfg = DSACConfig(
            pose=PoseConfig(num_hypotheses=32, sample_attempts=8,
                            refinement_steps=8, min_inliers=50.0),
            data=DataConfig(image_width=320, image_height=240,
                            focal_length=260.0),
            net=NetConfig(subsample_size=40, rgb_patch_size=16),
        )
        scene = SyntheticScene(width=320, height=240, focal=260.0)
        cam = scene.camera
        coord_net = DenseCoordNet(width=16)
        score_net = ScoreNet(width_mult=0.25)

        pose, rgb, depth, coords = scene.frame(jax.random.PRNGKey(5))
        cp = coord_net.init(jax.random.PRNGKey(1), rgb[None])
        sp = score_net.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))

        def coord_apply(params, image, pix):
            cmap = coord_net.apply(params, image[None])[0]
            return gather_dense_coords(cmap, pix, stride=8)

        def score_apply(params, dm):
            return score_net.apply(params, dm)

        return cfg, cam, rgb, pose, cp, sp, coord_apply, score_apply

    def test_chunked_implicit_step_grads_identical(self, pipeline,
                                                   monkeypatch):
        """Large-H refine-all memory bounding: the lax.map-chunked
        implicit step (make_refiners) must produce the SAME objective
        and coord gradients as the direct step — chunking is a memory
        layout choice, not a semantic one."""
        from dsac_tpu.pipeline import forward as fwd_mod
        from dsac_tpu.pipeline.train import e2e_expected_loss

        cfg, cam, rgb, gt, cp, sp, coord_apply, score_apply = pipeline
        key = jax.random.PRNGKey(13)

        def grads():
            (obj, _), g_c = jax.value_and_grad(
                e2e_expected_loss, argnums=0, has_aux=True)(
                    cp, sp, key, rgb, gt, coord_apply, score_apply,
                    cam, cfg, False, refine_mode="implicit_jnp")
            return float(obj), g_c

        obj_d, g_d = grads()  # H=32 < default chunk: direct path
        for ch in (8, 7):  # exact multiple AND ragged tail (28 + 4)
            monkeypatch.setattr(fwd_mod, "_IMPLICIT_STEP_CHUNK", ch)
            obj_c, g_c = grads()
            assert obj_c == pytest.approx(obj_d, rel=1e-6), ch
            for a, b in zip(jax.tree_util.tree_leaves(g_d),
                            jax.tree_util.tree_leaves(g_c)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-4, atol=1e-7)

    def test_e2e_objective_grad_cosine(self, pipeline):
        """Full-pipeline coord-net gradients: implicit vs unrolled.

        The two modes share the identical forward (same key, same
        hypotheses); their E[loss] values must agree tightly and the
        coordinate-net parameter gradients must be strongly aligned.
        """
        from dsac_tpu.pipeline.train import e2e_expected_loss

        cfg, cam, rgb, gt, cp, sp, coord_apply, score_apply = pipeline
        key = jax.random.PRNGKey(11)

        def grads(mode):
            (obj, aux), (g_c, g_s) = jax.value_and_grad(
                e2e_expected_loss, argnums=(0, 1), has_aux=True)(
                    cp, sp, key, rgb, gt, coord_apply, score_apply,
                    cam, cfg, False, refine_mode=mode)
            return obj, g_c, g_s

        obj_u, gc_u, gs_u = grads(False)
        obj_i, gc_i, gs_i = grads("implicit_jnp")

        assert np.isfinite(float(obj_i))
        # same forward -> near-identical objective
        assert abs(float(obj_u) - float(obj_i)) < 0.05 * (
            abs(float(obj_u)) + 1e-3)

        flat = lambda tree: np.concatenate(
            [np.asarray(l).ravel() for l in jax.tree_util.tree_leaves(tree)])
        fc_u, fc_i = flat(gc_u), flat(gc_i)
        assert np.all(np.isfinite(fc_i))
        cos = _cosine(fc_u, fc_i)
        assert cos > 0.9, f"coord grad cosine {cos}"
        # score-path gradients are identical math (REINFORCE term), only
        # the losses differ slightly through the refined poses
        cos_s = _cosine(flat(gs_u), flat(gs_i))
        assert cos_s > 0.95, f"score grad cosine {cos_s}"
