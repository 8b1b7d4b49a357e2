"""SoftAM serving parity: the fast serve kernels on the soft-argmax path.

Round-3 asymmetry (VERDICT weak #6): process_frame_softam had no fused
options and serve --mesh routed softam nowhere.  These tests pin the
closed gap: fused sampling + fused scoring + fused refinement produce a
localizing averaged pose, single-chip and hyp-sharded (Pallas kernels
run interpreted on the CPU farm).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import DataConfig, DSACConfig, PoseConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.geometry.loss import pose_errors
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.ops import soft_inlier_scores
from dsac_tpu.pipeline.forward import (process_frame_softam,
                                       process_frames_batched)

W, H = 160, 120
SCENE = SyntheticScene(width=W, height=H, focal=130.0)
CFG = DSACConfig(data=DataConfig(image_width=W, image_height=H,
                                 focal_length=130.0),
                 pose=PoseConfig(num_hypotheses=32, random_draw=False))


def _oracle():
    pose, _rgb, _depth, coords = SCENE.frame(jax.random.PRNGKey(17))
    gt_map = jnp.asarray(coords)

    def coord_fn(img, pix):
        return gt_map[pix[:, 1], pix[:, 0]] / 1000.0

    def score_fn(dm):
        return soft_inlier_scores(dm.reshape(dm.shape[0], -1),
                                  CFG.pose.inlier_threshold_2d,
                                  CFG.pose.score_beta)

    return pose, gt_map, coord_fn, score_fn


class TestSoftamFusedServe:
    def test_single_chip_fused_kernels_localize(self):
        gt, gt_map, coord_fn, score_fn = _oracle()
        res = process_frame_softam(
            jax.random.PRNGKey(0), jnp.zeros((H, W, 3)), coord_fn,
            score_fn, SCENE.camera, CFG, refine_mode="fused",
            fused_sampling=True, scoring="fused_soft")
        rot_e, t_e = pose_errors(res.final, gt)
        assert float(rot_e) < 2.0 and float(t_e) < 50.0, (float(rot_e),
                                                          float(t_e))

    def test_batched_softam_serve(self):
        gt, gt_map, coord_fn, score_fn = _oracle()
        res = process_frames_batched(
            jax.random.split(jax.random.PRNGKey(1), 2),
            jnp.zeros((2, H, W, 3)), coord_fn, score_fn, SCENE.camera,
            CFG, softam=True, fused_refine=True, fused_sampling=True,
            scoring="fused_soft")
        assert res.final.R.shape == (2, 3, 3)
        rot_e, t_e = pose_errors(res.final, Pose(
            jnp.broadcast_to(gt.R, (2, 3, 3)),
            jnp.broadcast_to(gt.t, (2, 3))))
        assert np.all(np.asarray(rot_e) < 2.0)
        assert np.all(np.asarray(t_e) < 50.0)

    def test_sharded_softam_serve(self):
        from dsac_tpu.parallel import make_mesh, sharded_serve_step
        gt, gt_map, _cf, _sf = _oracle()
        mesh = make_mesh(2, 4)

        def oracle_coord_apply(params, gmap, pix):
            return gmap[pix[:, 1], pix[:, 0]] / 1000.0

        def soft_score_apply(params, dm):
            return soft_inlier_scores(dm.reshape(dm.shape[0], -1),
                                      CFG.pose.inlier_threshold_2d,
                                      CFG.pose.score_beta)

        serve = sharded_serve_step(mesh, oracle_coord_apply,
                                   soft_score_apply, SCENE.camera, CFG,
                                   fused_sampling=True,
                                   refine_mode="fused", softam=True)
        keys = jax.random.split(jax.random.PRNGKey(3), 2)
        maps = jnp.stack([gt_map, gt_map])
        R, t, scores, ent, chosen = serve({}, {}, keys, maps)
        rot_e, t_e = pose_errors(
            Pose(R, t), Pose(jnp.broadcast_to(gt.R, (2, 3, 3)),
                             jnp.broadcast_to(gt.t, (2, 3))))
        assert np.all(np.asarray(rot_e) < 2.0), np.asarray(rot_e)
        assert np.all(np.asarray(t_e) < 50.0), np.asarray(t_e)
        assert scores.shape == (2, CFG.pose.num_hypotheses)
