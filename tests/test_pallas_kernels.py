"""Pallas kernel correctness vs the XLA reference implementation.

Runs in interpreter mode on CPU (the compiled path is exercised on real
TPU by bench/verify drives — the axon CPU farm cannot compile Mosaic).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import Camera
from dsac_tpu.geometry import Pose, so3_exp
from dsac_tpu.ops.diffmap import diffmaps, soft_inlier_scores
from dsac_tpu.ops.diffmap_pallas import (diffmaps_pallas,
                                         soft_inlier_scores_pallas)

CAM = Camera.make(525.0, 640, 480)


def _random_problem(rng, H=100, N=700):
    Rs = so3_exp(jnp.asarray(rng.normal(size=(H, 3)) * 0.5, jnp.float32))
    ts = jnp.asarray(rng.normal(size=(H, 3)) * 300, jnp.float32)
    ts = ts.at[:, 2].add(-2500.0)
    coords = jnp.asarray(
        np.stack([rng.uniform(-1000, 1000, N), rng.uniform(-800, 800, N),
                  rng.uniform(-500, 500, N)], -1), jnp.float32)
    pix = jnp.asarray(
        np.stack([rng.uniform(0, 640, N), rng.uniform(0, 480, N)], -1),
        jnp.float32)
    return Pose(Rs, ts), coords, pix


def cam_vec():
    return jnp.asarray([float(CAM.focal), float(CAM.cx), float(CAM.cy)],
                       jnp.float32)


class TestDiffmapPallas:
    def test_matches_xla_reference(self, rng):
        hyps, coords, pix = _random_problem(rng)
        ref = diffmaps(hyps, coords, pix, CAM)
        out = diffmaps_pallas(hyps.R, hyps.t, coords, pix, cam_vec(),
                              interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-4, atol=1e-2)

    def test_nonaligned_shapes(self, rng):
        hyps, coords, pix = _random_problem(rng, H=37, N=130)
        ref = diffmaps(hyps, coords, pix, CAM)
        out = diffmaps_pallas(hyps.R, hyps.t, coords, pix, cam_vec(),
                              interpret=True)
        assert out.shape == ref.shape == (37, 130)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-4, atol=1e-2)


class TestScoresPallas:
    def test_matches_xla_reference(self, rng):
        hyps, coords, pix = _random_problem(rng, H=64, N=1600)
        dm = diffmaps(hyps, coords, pix, CAM)
        ref = soft_inlier_scores(dm, 10.0, 10.0)
        out = soft_inlier_scores_pallas(hyps.R, hyps.t, coords, pix,
                                        cam_vec(), interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-3, atol=0.05)

    def test_padding_not_counted(self, rng):
        # N not a multiple of the tile: padded lanes must not contribute
        hyps, coords, pix = _random_problem(rng, H=8, N=100)
        dm = diffmaps(hyps, coords, pix, CAM)
        ref = soft_inlier_scores(dm, 10.0, 10.0)
        out = soft_inlier_scores_pallas(hyps.R, hyps.t, coords, pix,
                                        cam_vec(), interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-3, atol=0.05)


class TestP3PPallas:
    """Fused SoA P3P kernel vs the jnp solver (geometry/p3p.py)."""

    def _problem(self, rng, N=512, noise=0.0):
        from dsac_tpu.data.synthetic import SyntheticScene
        from dsac_tpu.ops.sampling import stratified_sample

        scene = SyntheticScene()
        _, _, _, cgt = scene.frame(jax.random.PRNGKey(0))
        samp = stratified_sample(jax.random.PRNGKey(3), 640, 480, 40,
                                 42).reshape(-1, 2)
        coords = cgt[samp[:, 1], samp[:, 0]].astype(jnp.float32)  # mm
        if noise:
            coords = coords + jnp.asarray(
                rng.normal(size=coords.shape) * noise, jnp.float32)
        idx = jax.random.randint(jax.random.PRNGKey(5), (N, 4), 0, 1600)
        return (coords[idx], samp[idx].astype(jnp.float32),
                scene.camera)

    def test_matches_jnp_solver(self, rng):
        from dsac_tpu.geometry.p3p import solve_pnp_minimal
        from dsac_tpu.geometry.projection import project
        from dsac_tpu.ops.p3p_pallas import p3p_solve_pallas

        obj, img, cam = self._problem(rng, noise=4.0)
        cv = jnp.asarray([cam.focal, cam.cx, cam.cy], jnp.float32)
        pp, pvalid, pworst = p3p_solve_pallas(obj, img, cv, interpret=True)
        jp, jvalid = jax.vmap(
            lambda o, p: solve_pnp_minimal(o, p, cam, polish_iters=0))(
                obj, img)
        rp = project(jp, obj, cam)
        jworst = np.asarray(
            jnp.max(jnp.linalg.norm(rp - img, axis=-1), axis=-1))

        # consistency decisions agree on almost all lanes ...
        pc = np.asarray(pvalid) & (np.asarray(pworst) < 10.0)
        jc = jvalid_np = np.asarray(jvalid) & (jworst < 10.0)
        assert (pc == jc).mean() > 0.9
        assert pc.mean() > 0.2  # plenty of consistent sets on GT coords

        # ... and on agreeing consistent lanes the poses match up to
        # alternate-root ties (both self-consistent, both accepted by
        # the pipeline; the tie rate is small)
        both = pc & jc
        dR = np.abs(np.asarray(pp.R) - np.asarray(jp.R)
                    ).reshape(len(obj), -1).max(1)
        same_root = dR < 1e-2
        assert same_root[both].mean() > 0.75
        assert np.median(dR[both]) < 1e-3
        # alternate roots must still be self-consistent
        ties = both & ~same_root
        if ties.any():
            assert np.median(np.asarray(pworst)[ties]) < 10.0

    def test_invalid_lanes_identity_and_finite(self, rng):
        from dsac_tpu.ops.p3p_pallas import p3p_solve_pallas

        obj, img, cam = self._problem(rng, N=128)
        # degenerate: all four points coincident
        obj = obj.at[0].set(jnp.broadcast_to(obj[0, 0], (4, 3)))
        cv = jnp.asarray([cam.focal, cam.cx, cam.cy], jnp.float32)
        pp, valid, worst = p3p_solve_pallas(obj, img, cv, interpret=True)
        assert not bool(valid[0])
        np.testing.assert_allclose(np.asarray(pp.R[0]), np.eye(3),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(pp.t[0]), 0.0, atol=1e-6)
        for leaf in (pp.R, pp.t, worst):
            assert np.all(np.isfinite(np.asarray(leaf)))

    def test_fused_sampling_pipeline_localizes(self, rng):
        from dsac_tpu.config import DSACConfig, PoseConfig
        from dsac_tpu.data.synthetic import SyntheticScene
        from dsac_tpu.geometry import pose_errors
        from dsac_tpu.pipeline import process_frame

        scene = SyntheticScene()
        pose, rgb, _, cgt = scene.frame(jax.random.PRNGKey(42))

        def coord_fn(image, pix):
            return cgt[pix[:, 1], pix[:, 0]] / 1000.0

        score_fn = lambda dm: soft_inlier_scores(
            dm.reshape(dm.shape[0], -1), 10.0, 10.0)
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=32,
                                         random_draw=False))
        res = process_frame(jax.random.PRNGKey(1), rgb, coord_fn, score_fn,
                            scene.camera, cfg, refine_all=False,
                            fused_sampling=True)
        rot, trans = pose_errors(res.final, pose)
        assert float(rot) < 5.0 and float(trans) < 50.0
        assert bool(jnp.any(res.hyp_valid))
