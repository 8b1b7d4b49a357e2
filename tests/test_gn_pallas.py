"""Fused IRLS kernel vs the jnp reference implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import Camera
from dsac_tpu.geometry.gn import (_residuals_and_jac, refine_pose,
                                  soft_inlier_weights)
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.geometry.rotation import so3_exp
from dsac_tpu.ops.gn_pallas import irls_stats, refine_pose_fused, \
    unpack_stats

CAM = Camera.make(525.0, 640, 480)


def _problem(rng, H=16, N=700):
    Rs = so3_exp(jnp.asarray(rng.normal(size=(H, 3)) * 0.5, jnp.float32))
    ts = jnp.asarray(rng.normal(size=(H, 3)) * 300, jnp.float32)
    ts = ts.at[:, 2].add(-2500.0)
    coords = jnp.asarray(np.stack(
        [rng.uniform(-1000, 1000, N), rng.uniform(-800, 800, N),
         rng.uniform(-500, 500, N)], -1), jnp.float32)
    pix = jnp.asarray(np.stack([rng.uniform(0, 640, N),
                                rng.uniform(0, 480, N)], -1), jnp.float32)
    return Pose(Rs, ts), coords, pix


def reference_stats(hyps, coords, pix, tau=10.0, beta=1.0, max_err=100.0):
    obj = jnp.broadcast_to(coords, (hyps.t.shape[0], *coords.shape))
    r, J = _residuals_and_jac(hyps, obj, pix, CAM)
    err = jnp.minimum(jnp.sqrt(jnp.sum(r * r, -1) + 1e-8), max_err)
    w = soft_inlier_weights(err, tau, beta)
    JtJ = jnp.einsum("hn,hnki,hnkj->hij", w, J, J)
    Jtr = jnp.einsum("hn,hnki,hnk->hi", w, J, r)
    return JtJ, Jtr, jnp.sum(w, -1)


class TestIrlsStats:
    def test_matches_reference(self, rng):
        hyps, coords, pix = _problem(rng)
        cam_vec = jnp.asarray([525.0, 320.0, 240.0, 100.0, 10.0, 1.0],
                              jnp.float32)
        stats = irls_stats(hyps.R, hyps.t, coords, pix, cam_vec,
                           interpret=True)
        JtJ, Jtr, n_in = unpack_stats(stats)
        JtJ_ref, Jtr_ref, n_ref = reference_stats(hyps, coords, pix)
        np.testing.assert_allclose(np.array(n_in), np.array(n_ref),
                                   rtol=1e-3, atol=0.05)
        np.testing.assert_allclose(np.array(Jtr), np.array(Jtr_ref),
                                   rtol=2e-3, atol=2.0)
        np.testing.assert_allclose(np.array(JtJ), np.array(JtJ_ref),
                                   rtol=2e-3, atol=2.0)

    def test_fused_refine_matches_jnp_refine(self, rng):
        # same fixed point as the autodiff-able refinement
        hyps, coords, pix = _problem(rng, H=8)
        gt = Pose(hyps.R[0], hyps.t[0])
        # build coords consistent with gt so refinement has a target
        from dsac_tpu.geometry import invert, project, transform
        eye = np.stack([rng.uniform(-1200, 1200, 900),
                        rng.uniform(-900, 900, 900),
                        -rng.uniform(1500, 3500, 900)], -1).astype(np.float32)
        scene = transform(invert(gt), jnp.asarray(eye))
        pix2 = project(Pose(jnp.eye(3), jnp.zeros(3)), jnp.asarray(eye), CAM)
        scene = scene + jnp.asarray(rng.normal(size=(900, 3)) * 4,
                                    jnp.float32)
        pert = Pose(
            jnp.stack([so3_exp(jnp.asarray(rng.normal(size=3) * 0.005,
                                           jnp.float32)) @ gt.R
                       for _ in range(8)]),
            jnp.stack([gt.t + jnp.asarray(rng.normal(size=3) * 15,
                                          jnp.float32) for _ in range(8)]))

        ref, n_ref = jax.vmap(lambda p0: refine_pose(
            p0, scene, pix2, CAM, steps=8))(pert)
        fused, n_fused = refine_pose_fused(pert, scene, pix2, CAM,
                                           steps=16, interpret=True)
        np.testing.assert_allclose(np.array(fused.t), np.array(ref.t),
                                   atol=2.0)
        np.testing.assert_allclose(np.array(fused.R), np.array(ref.R),
                                   atol=1e-4)

    def test_single_launch_matches_step_scan(self, rng):
        """The single-launch kernel (whole IRLS loop in one pallas_call)
        must reproduce the per-step-launch variant exactly: same stats
        body, same Jacobi/Cholesky/Rodrigues math, same freeze guards."""
        from dsac_tpu.geometry import invert, project, transform
        from dsac_tpu.ops.gn_pallas import refine_pose_fused_steps

        gt = Pose(so3_exp(jnp.asarray(rng.normal(size=3) * 0.4,
                                      jnp.float32)),
                  jnp.asarray([100.0, -60.0, -2300.0], jnp.float32))
        eye = np.stack([rng.uniform(-1200, 1200, 700),
                        rng.uniform(-900, 900, 700),
                        -rng.uniform(1500, 3500, 700)], -1).astype(np.float32)
        scene = transform(invert(gt), jnp.asarray(eye))
        pix2 = project(Pose(jnp.eye(3), jnp.zeros(3)), jnp.asarray(eye), CAM)
        scene = scene + jnp.asarray(rng.normal(size=(700, 3)) * 6,
                                    jnp.float32)
        pert = Pose(
            jnp.stack([so3_exp(jnp.asarray(rng.normal(size=3) * 0.01,
                                           jnp.float32)) @ gt.R
                       for _ in range(5)]),
            jnp.stack([gt.t + jnp.asarray(rng.normal(size=3) * 30,
                                          jnp.float32) for _ in range(5)]))

        a, n_a = refine_pose_fused_steps(pert, scene, pix2, CAM, steps=12,
                                         interpret=True)
        b, n_b = refine_pose_fused(pert, scene, pix2, CAM, steps=12,
                                   interpret=True)
        np.testing.assert_allclose(np.array(b.t), np.array(a.t), atol=1e-2)
        np.testing.assert_allclose(np.array(b.R), np.array(a.R), atol=1e-5)
        np.testing.assert_allclose(np.array(n_b), np.array(n_a), rtol=1e-4)
