"""Ops + full-pipeline tests on synthetic scenes.

The pipeline is validated with a ground-truth-oracle coordinate function
(GT coords + noise + outliers) before any CNN enters: DSAC must localize
correctly when coordinates are mostly right — this is the golden-pipeline
test of SURVEY.md §4(c).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsac_tpu.config import Camera, DSACConfig, PoseConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.geometry import Pose, invert, pose_errors, transform
from dsac_tpu.models.coord_net import gather_dense_coords
from dsac_tpu.ops import (diffmaps, draw_hypothesis, sample_minimal_sets,
                          shannon_entropy, soft_inlier_scores, softmax_scores,
                          stratified_sample)
from dsac_tpu.pipeline import evaluate_frame, process_frame, \
    process_frame_softam, verified_selection

SCENE = SyntheticScene()
CAM = SCENE.camera
CFG = DSACConfig()


class TestStratified:
    def test_one_sample_per_cell(self):
        s = stratified_sample(jax.random.PRNGKey(0), 640, 480, 40, 42)
        assert s.shape == (40, 40, 2)
        px = np.array(s)
        # patch borders respected (core/cnn.h:353-361)
        assert px[..., 0].min() >= 21 and px[..., 0].max() <= 640 - 21
        assert px[..., 1].min() >= 21 and px[..., 1].max() <= 480 - 21
        # stratification: x grows along columns, y along rows
        xs = px[..., 0]
        assert (xs[:, 1:] > xs[:, :-1] - 16).all()
        ys = px[..., 1]
        assert (ys[1:, :] > ys[:-1, :] - 12).all()

    def test_different_keys_differ(self):
        a = stratified_sample(jax.random.PRNGKey(0), 640, 480, 40, 42)
        b = stratified_sample(jax.random.PRNGKey(1), 640, 480, 40, 42)
        assert np.any(np.array(a) != np.array(b))


class TestSynthetic:
    def test_render_shapes_and_ranges(self):
        pose, rgb, depth, coords = SCENE.frame(jax.random.PRNGKey(3))
        assert rgb.shape == (480, 640, 3)
        assert np.array(rgb).min() >= 0 and np.array(rgb).max() <= 255
        d = np.array(depth)
        assert (d > 0).all() and d.max() < 7000  # inside a 4x3x4 m room
        c = np.array(coords)
        assert c.min() > -1 and c[..., 0].max() < 4001

    def test_coords_consistent_with_depth_projection(self):
        # transform GT coords into eye frame: z must equal -depth
        pose, rgb, depth, coords = SCENE.frame(jax.random.PRNGKey(4))
        pts = coords.reshape(-1, 3)[::1997]
        eye = transform(pose, pts)
        d = np.array(depth).reshape(-1)[::1997]
        np.testing.assert_allclose(-np.array(eye[:, 2]), d, rtol=1e-3,
                                   atol=2.0)

    def test_texture_deterministic(self):
        p = jnp.asarray([[1000.0, 500.0, 2000.0]])
        c1 = SCENE.texture(p)
        c2 = SCENE.texture(p)
        np.testing.assert_array_equal(np.array(c1), np.array(c2))


def oracle_coord_fn(coords_gt, noise_mm=5.0, outlier_frac=0.25, seed=0):
    """A coord_fn that returns GT coords (metres) + noise + outliers."""
    rng = np.random.default_rng(seed)

    def fn(image, pix):
        pix_np = pix  # (N, 2) traced; use gather on the GT map
        c = coords_gt[pix_np[:, 1], pix_np[:, 0]]  # (N, 3) mm
        n = c.shape[0]
        noise = jnp.asarray(rng.normal(size=(n, 3)) * noise_mm, jnp.float32)
        out_mask = jnp.asarray(
            rng.random(n) < outlier_frac, jnp.float32)[:, None]
        outliers = jnp.asarray(rng.uniform(0, 3000, size=(n, 3)), jnp.float32)
        c = c + noise
        c = (1 - out_mask) * c + out_mask * outliers
        return c / 1000.0  # metres, like the CNN

    return fn


class TestHypothesisSampling:
    def test_valid_and_consistent(self):
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(5))
        fn = oracle_coord_fn(coords_gt, noise_mm=2.0, outlier_frac=0.0)
        s = stratified_sample(jax.random.PRNGKey(6), 640, 480, 40, 42)
        pix = s.reshape(-1, 2)
        coords = fn(None, pix) * 1000.0
        cfg = PoseConfig(num_hypotheses=32)
        sets = sample_minimal_sets(jax.random.PRNGKey(7), coords,
                                   pix.astype(jnp.float32), CAM, cfg)
        assert int(sets.valid.sum()) >= 30
        # sampled hypotheses should be near the GT pose with clean coords
        rot_err, t_err = pose_errors(sets.poses, pose)
        assert float(jnp.median(rot_err[sets.valid])) < 3.0
        assert float(jnp.median(t_err[sets.valid])) < 120.0

    def test_diffmaps_low_at_gt(self):
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(8))
        s = stratified_sample(jax.random.PRNGKey(9), 640, 480, 40, 42)
        pix = s.reshape(-1, 2).astype(jnp.float32)
        coords = coords_gt[s[..., 1], s[..., 0]].reshape(-1, 3)
        gt_batch = Pose(pose.R[None], pose.t[None])
        dm = diffmaps(gt_batch, coords, pix, CAM)
        assert float(jnp.median(dm)) < 1.0  # GT pose reprojects exactly

    def test_soft_inlier_scores_rank_gt_highest(self):
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(10))
        s = stratified_sample(jax.random.PRNGKey(11), 640, 480, 40, 42)
        pix = s.reshape(-1, 2).astype(jnp.float32)
        coords = coords_gt[s[..., 1], s[..., 0]].reshape(-1, 3)
        # pool: GT + 7 perturbed poses
        from dsac_tpu.geometry import so3_exp
        Rs, ts = [pose.R], [pose.t]
        rng = np.random.default_rng(0)
        for _ in range(7):
            Rs.append(so3_exp(jnp.asarray(rng.normal(size=3) * 0.05,
                                          jnp.float32)) @ pose.R)
            ts.append(pose.t + jnp.asarray(rng.normal(size=3) * 100,
                                           jnp.float32))
        pool = Pose(jnp.stack(Rs), jnp.stack(ts))
        dm = diffmaps(pool, coords, pix, CAM)
        scores = soft_inlier_scores(dm, 10.0, 10.0)
        assert int(jnp.argmax(scores)) == 0


class TestSelect:
    def test_softmax_and_entropy(self):
        scores = jnp.asarray([0.0, 0.0, 0.0, 0.0])
        p = softmax_scores(scores)
        np.testing.assert_allclose(np.array(p), 0.25, rtol=1e-6)
        np.testing.assert_allclose(float(shannon_entropy(p)), 2.0, rtol=1e-5)

    def test_draw_argmax_mode(self):
        scores = jnp.asarray([0.0, 5.0, 1.0])
        idx = draw_hypothesis(jax.random.PRNGKey(0), scores, False)
        assert int(idx) == 1

    def test_draw_random_mode_follows_distribution(self):
        scores = jnp.asarray([0.0, 4.0])
        draws = [int(draw_hypothesis(jax.random.PRNGKey(i), scores, True))
                 for i in range(100)]
        assert np.mean(draws) > 0.85  # p(1) = sigmoid(4) ~ 0.982


@pytest.fixture(scope="module")
def frame_and_oracle():
    pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(42))
    fn = oracle_coord_fn(coords_gt, noise_mm=8.0, outlier_frac=0.3)
    return pose, rgb, fn


class TestFullPipeline:
    def _score_fn(self, dm):
        return soft_inlier_scores(dm.reshape(dm.shape[0], -1),
                                  CFG.pose.inlier_threshold_2d,
                                  CFG.pose.score_beta)

    def test_dsac_localizes(self, frame_and_oracle):
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=64))
        res = process_frame(jax.random.PRNGKey(1), rgb, fn, self._score_fn,
                            CAM, cfg)
        ev = evaluate_frame(res, pose)
        assert bool(ev.correct), (float(ev.rot_err_deg),
                                  float(ev.trans_err_mm))
        assert float(ev.rot_err_deg) < 2.0
        assert float(ev.trans_err_mm) < 30.0

    def test_dsac_serve_path(self, frame_and_oracle):
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=64,
                                         random_draw=False))
        res = process_frame(jax.random.PRNGKey(2), rgb, fn, self._score_fn,
                            CAM, cfg, refine_all=False)
        rot_err, t_err = pose_errors(res.final, pose)
        assert float(rot_err) < 5.0 and float(t_err) < 50.0

    def test_large_h_fused_scoring(self, frame_and_oracle):
        """H=4096 regime (BASELINE config 4) with the fused Pallas
        scoring path: no (H, N) surface is materialised, scores match the
        jnp soft-inlier head, and the pipeline still localizes."""
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=4096,
                                         sample_attempts=4,
                                         random_draw=False))
        res = process_frame(jax.random.PRNGKey(4), rgb, fn, None, CAM, cfg,
                            refine_all=False, scoring="fused_soft")
        assert res.dmaps.shape[0] == 0  # never materialised
        rot_err, t_err = pose_errors(res.final, pose)
        assert float(rot_err) < 5.0 and float(t_err) < 50.0

        # the fused kernel's scores must equal the jnp scoring head
        pix = res.sampling.reshape(-1, 2).astype(jnp.float32)
        dm = diffmaps(res.hyps, res.coords, pix, CAM,
                      cfg.pose.max_reprojection_error)
        ref = soft_inlier_scores(dm, cfg.pose.inlier_threshold_2d,
                                 cfg.pose.score_beta)
        valid = np.asarray(res.hyp_valid)
        np.testing.assert_allclose(np.asarray(res.scores)[valid],
                                   np.asarray(ref)[valid],
                                   rtol=1e-4, atol=1e-2)

    def test_softam_localizes(self, frame_and_oracle):
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=64))
        res = process_frame_softam(jax.random.PRNGKey(3), rgb, fn,
                                   self._score_fn, CAM, cfg)
        rot_err, t_err = pose_errors(res.final, pose)
        assert float(rot_err) < 5.0 and float(t_err) < 50.0

    def test_verified_selection(self, frame_and_oracle):
        """Consensus re-selection picks the max-inlier refined hypothesis
        and rescues the frame when the score head is adversarial."""
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=64,
                                         random_draw=False))

        def bad_score_fn(dm):  # prefers HIGH reprojection error
            return -self._score_fn(dm)

        res = process_frame(jax.random.PRNGKey(7), rgb, fn, bad_score_fn,
                            CAM, cfg)
        sel = verified_selection(res)
        # chosen = argmax of masked final inlier counts
        counts = np.where(np.asarray(res.hyp_valid),
                          np.asarray(res.inlier_counts), -1.0)
        assert int(sel.chosen) == int(np.argmax(counts))
        i = int(sel.chosen)
        np.testing.assert_allclose(np.asarray(sel.final.t),
                                   np.asarray(res.refined.t)[i])
        # the adversarial score draw is wrong; consensus still localizes
        rot_err, t_err = pose_errors(sel.final, pose)
        assert float(rot_err) < 5.0 and float(t_err) < 50.0

    def test_verify_topk_serve(self, frame_and_oracle):
        """Top-K verified serving: a score head that inverts the ranking
        (worst hypothesis scored highest) still serves a correct pose,
        because the K refined candidates are re-ranked by final inlier
        consensus.  K must include a good hypothesis, so use K close to
        the pool size for the adversarial case."""
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=64,
                                         random_draw=False))

        def bad_score_fn(dm):
            return -self._score_fn(dm)

        res = process_frame(jax.random.PRNGKey(8), rgb, fn, bad_score_fn,
                            CAM, cfg, refine_all=False, verify_topk=64)
        rot_err, t_err = pose_errors(res.final, pose)
        assert float(rot_err) < 5.0 and float(t_err) < 50.0
        # served pose is consistent with the writeback pool at `chosen`
        np.testing.assert_allclose(
            np.asarray(res.final.t),
            np.asarray(res.refined.t)[int(res.chosen)])
        # honest head + small K: still correct
        res2 = process_frame(jax.random.PRNGKey(8), rgb, fn,
                             self._score_fn, CAM, cfg, refine_all=False,
                             verify_topk=4)
        rot_err, t_err = pose_errors(res2.final, pose)
        assert float(rot_err) < 5.0 and float(t_err) < 50.0
        # refined_mask flags exactly the refined slots per mode
        assert int(np.asarray(res2.refined_mask).sum()) == 4
        assert bool(np.asarray(res2.refined_mask)[int(res2.chosen)])
        res3 = process_frame(jax.random.PRNGKey(8), rgb, fn,
                             self._score_fn, CAM, cfg, refine_all=False)
        mask3 = np.asarray(res3.refined_mask)
        assert mask3.sum() == 1 and bool(mask3[int(res3.chosen)])
        res4 = process_frame(jax.random.PRNGKey(8), rgb, fn,
                             self._score_fn, CAM, cfg, refine_all=True)
        assert np.asarray(res4.refined_mask).all()

    def test_pipeline_jits(self, frame_and_oracle):
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=16))
        f = jax.jit(functools.partial(process_frame, coord_fn=fn,
                                      score_fn=self._score_fn, cam=CAM,
                                      cfg=cfg))
        res = f(jax.random.PRNGKey(4), image=rgb)
        assert res.probs.shape == (16,)
        assert np.isfinite(np.array(res.entropy))

    def test_deterministic_under_same_key(self, frame_and_oracle):
        # The reference's thread-parallelism makes hypothesis sampling
        # nondeterministic under OpenMP scheduling (SURVEY.md §5); here
        # the whole pipeline is a pure function of its key: identical
        # inputs -> bitwise-identical outputs.  (Needs a PURE coord
        # oracle — the fixture's draws fresh numpy noise per call.)
        pose, rgb, _ = frame_and_oracle
        _, _, _, coords_gt = SCENE.frame(jax.random.PRNGKey(42))

        def fn(image, pix):
            return coords_gt[pix[:, 1], pix[:, 0]] / 1000.0

        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=16))
        r1 = process_frame(jax.random.PRNGKey(5), rgb, fn, self._score_fn,
                           CAM, cfg)
        r2 = process_frame(jax.random.PRNGKey(5), rgb, fn, self._score_fn,
                           CAM, cfg)
        np.testing.assert_array_equal(np.array(r1.final.t),
                                      np.array(r2.final.t))
        np.testing.assert_array_equal(np.array(r1.scores),
                                      np.array(r2.scores))

    def test_batched_serve(self, frame_and_oracle):
        from dsac_tpu.pipeline.forward import process_frames_batched
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=16,
                                         random_draw=False))
        B = 3
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        images = jnp.broadcast_to(rgb, (B, *rgb.shape))
        res = process_frames_batched(keys, images, fn, self._score_fn,
                                     CAM, cfg)
        assert res.final.t.shape == (B, 3)
        rot_err, t_err = pose_errors(res.final, pose)
        assert float(jnp.max(rot_err)) < 5.0

    def test_full_pipeline_gradient_matches_fd(self):
        # The end-to-end oracle check the reference can't do analytically:
        # d E[loss] / d (coordinate bias) by autodiff vs central
        # differences THROUGH THE ENTIRE PIPELINE (P3P sampling, scoring,
        # softmax, GN refinement).  Uses a CLEAN oracle (no outliers):
        # with outliers, +/-eps probes flip the discrete attempt/candidate
        # selections and FD straddles a (masked) discontinuity — the same
        # reason the reference replays refinement with frozen pixelIdxs
        # in its own FD (core/cnn.h:778).
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(42))
        fn = oracle_coord_fn(coords_gt, noise_mm=2.0, outlier_frac=0.0)
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=8))
        key = jax.random.PRNGKey(11)

        def loss_of_bias(delta):
            def fn2(image, pix):
                return fn(image, pix) + delta
            res = process_frame(key, rgb, fn2, self._score_fn, CAM, cfg)
            ev = evaluate_frame(res, pose)
            return ev.expected_loss

        g = np.asarray(jax.grad(loss_of_bias)(jnp.zeros(3)))
        assert np.all(np.isfinite(g))
        fd = np.zeros(3)
        for k in range(3):
            eps = 2e-3  # metres (2 mm), the reference's dRefine epsilon
            e = np.zeros(3, np.float32)
            e[k] = eps
            fd[k] = (float(loss_of_bias(jnp.asarray(e)))
                     - float(loss_of_bias(jnp.asarray(-e)))) / (2 * eps)
        # FD through the full f32 pipeline is noisy (loss differences of
        # ~0.05 against values of ~5), so check direction + scale rather
        # than per-component tight equality (component-level FD checks in
        # test_p3p_gn.py / test_geometry.py are the precise ones).
        cos = float(np.dot(g, fd) / (np.linalg.norm(g) * np.linalg.norm(fd)
                                     + 1e-12))
        assert cos > 0.8, (g, fd, cos)
        assert 0.3 < np.linalg.norm(g) / (np.linalg.norm(fd) + 1e-12) < 3.0

    def test_expected_loss_gradient_wrt_coords(self, frame_and_oracle):
        # The e2e training signal: d E[loss] / d coords must be finite and
        # nonzero — this is the quantity the reference assembles by hand
        # through dRefine + dSMScore (train_ransac.cpp:303-401).
        pose, rgb, fn = frame_and_oracle
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=8))
        key = jax.random.PRNGKey(5)

        def loss_of_coords(delta):
            def fn2(image, pix):
                return fn(image, pix) + delta
            res = process_frame(key, rgb, fn2, self._score_fn, CAM, cfg)
            ev = evaluate_frame(res, pose)
            return ev.expected_loss

        g = jax.grad(loss_of_coords)(jnp.zeros(3))
        assert np.all(np.isfinite(np.array(g)))
        assert np.any(np.abs(np.array(g)) > 0)
