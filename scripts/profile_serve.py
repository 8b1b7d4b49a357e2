"""Stage-level timing breakdown of the serve pipeline on the current device.

Times each stage of process_frame in isolation (jitted, device-synced):
coordinate CNN, hypothesis sampling (P3P), dense scoring, score CNN,
refinement — to direct optimisation work.  Run on the real TPU.
"""

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import DSACConfig, PoseConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.geometry.gn import refine_pose
from dsac_tpu.models import DenseCoordNet, ScoreNet
from dsac_tpu.models.coord_net import gather_dense_coords
from dsac_tpu.ops.diffmap import diffmaps, soft_inlier_scores
from dsac_tpu.ops.sampling import sample_minimal_sets, stratified_sample
from dsac_tpu.utils.timing import time_jitted_amortized as timed


def main(H=256, attempts=16):
    scene = SyntheticScene()
    cam = scene.camera
    cfg = DSACConfig(pose=PoseConfig(num_hypotheses=H,
                                     sample_attempts=attempts))
    pose, rgb, depth, coords_gt = scene.frame(jax.random.PRNGKey(0))

    coord_net = DenseCoordNet()
    score_net = ScoreNet()
    cp = coord_net.init(jax.random.PRNGKey(1), rgb[None])
    sp = score_net.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))

    key = jax.random.PRNGKey(3)
    sampling = stratified_sample(key, 640, 480, 40, 42)
    pix = sampling.reshape(-1, 2)
    pixf = pix.astype(jnp.float32)

    timings = {}

    cnn = lambda img: coord_net.apply(cp, img[None])[0]
    timings["coord_cnn_dense"] = timed(cnn, rgb, reps=20)

    cmap = jax.jit(cnn)(rgb)
    gather = lambda cm: gather_dense_coords(cm, pix) * 1000.0
    timings["coord_gather"] = timed(gather, cmap)
    coords = jax.jit(gather)(cmap)

    samp = functools.partial(sample_minimal_sets, cam=cam, cfg=cfg.pose)
    timings["p3p_sampling"] = timed(
        lambda c: samp(key, c, pixf), coords, reps=20)
    sets = jax.jit(samp)(key, coords, pixf)

    dm_fn = lambda p_, c: diffmaps(p_, c, pixf, cam)
    timings["diffmaps_xla"] = timed(dm_fn, sets.poses, coords, vary=1)
    dm = jax.jit(dm_fn)(sets.poses, coords)

    try:
        from dsac_tpu.ops.diffmap_pallas import (diffmaps_pallas,
                                                 soft_inlier_scores_pallas)
        cam_vec = jnp.asarray([float(cam.focal), float(cam.cx),
                               float(cam.cy)], jnp.float32)
        pk = lambda R, t, c: diffmaps_pallas(R, t, c, pixf, cam_vec)
        timings["diffmaps_pallas"] = timed(pk, sets.poses.R,
                                           sets.poses.t, coords, vary=2)
        sk = lambda R, t, c: soft_inlier_scores_pallas(
            R, t, c, pixf, cam_vec)
        timings["scores_fused_pallas"] = timed(sk, sets.poses.R,
                                               sets.poses.t, coords, vary=2)
    except Exception as e:  # pallas unavailable on this backend
        timings["pallas_error"] = str(e)[:120]

    score = lambda d: score_net.apply(sp, d.reshape(-1, 40, 40))
    timings["score_cnn"] = timed(score, dm)

    soft = lambda d: soft_inlier_scores(d, 10.0, 10.0)
    timings["soft_inlier_score_xla"] = timed(soft, dm)

    ref1 = lambda p0R, p0t, c: refine_pose(
        jax.tree.map(lambda x: x[0], sets.poses)._replace(R=p0R, t=p0t),
        c, pixf, cam, steps=8)
    timings["refine_one"] = timed(ref1, sets.poses.R[0],
                                  sets.poses.t[0], coords, vary=2, reps=20)

    try:
        from dsac_tpu.ops.gn_pallas import refine_pose_fused
        reff = lambda R, t, c: refine_pose_fused(
            type(sets.poses)(R[:1], t[:1]), c, pixf, cam, steps=16,
            interpret=jax.default_backend() != "tpu")
        timings["refine_one_fused_pallas"] = timed(
            reff, sets.poses.R, sets.poses.t, coords, vary=2, reps=20)
    except Exception as e:
        timings["fused_refine_error"] = str(e)[:120]

    if H <= 4096:
        # vmapped whole-pool refinement: the (H, N, 2, 6) Jacobian pads
        # to T(4,128) tiles on TPU — at H=16384 that allocation alone is
        # ~54 GB, and no serve mode refines the full pool at that scale
        refall = lambda R, t, c: jax.vmap(
            lambda r_, t_: refine_pose(type(sets.poses)(r_, t_), c, pixf,
                                       cam, steps=8))(R, t)
        timings["refine_all_H"] = timed(refall, sets.poses.R,
                                        sets.poses.t, coords, vary=2,
                                        reps=5, iters=3)

    from dsac_tpu.ops.select import draw_hypothesis
    topk = lambda s: jax.lax.top_k(s, 16)
    scores = jnp.asarray(np.random.default_rng(0).normal(size=(H,)),
                         jnp.float32)
    timings["top_k16"] = timed(topk, scores)
    timings["softmax_draw"] = timed(
        lambda s: draw_hypothesis(jax.random.PRNGKey(0), s, True), scores)

    try:
        sampf = functools.partial(sample_minimal_sets, cam=cam,
                                  cfg=cfg.pose, fused=True)
        timings["p3p_sampling_fused"] = timed(
            lambda c: sampf(key, c, pixf), coords, reps=20)
    except Exception as e:
        timings["fused_sampling_error"] = str(e)[:120]

    # ---- batch-8 amortized per-frame stage costs (the bench/serve
    # operating point: batching keeps the CNN matmuls on the MXU) ----
    B = 8
    imgs = jnp.stack([rgb] * B)
    batched = {}
    cnnb = lambda im: coord_net.apply(cp, im)
    batched["coord_cnn_dense"] = timed(cnnb, imgs, reps=20) / B
    coords_b = jnp.stack([coords] * B)
    sampb = lambda cs: jax.vmap(lambda c: sample_minimal_sets(
        key, c, pixf, cam, cfg.pose, fused=True).poses.t)(cs)
    try:
        batched["p3p_sampling_fused"] = timed(sampb, coords_b,
                                              reps=20) / B
    except Exception as e:
        batched["sampling_error"] = str(e)[:120]
    try:
        from dsac_tpu.ops.diffmap_pallas import soft_inlier_scores_pallas
        cam_vec = jnp.asarray([float(cam.focal), float(cam.cx),
                               float(cam.cy)], jnp.float32)
        scb = lambda cs: jax.vmap(lambda c: soft_inlier_scores_pallas(
            sets.poses.R, sets.poses.t, c, pixf, cam_vec))(cs)
        batched["scores_fused"] = timed(scb, coords_b, reps=20) / B
        dmb = lambda cs: jax.vmap(lambda c: score_net.apply(
            sp, diffmaps(sets.poses, c, pixf, cam).reshape(-1, 40, 40)))(
                cs)
        batched["diffmaps_plus_score_cnn"] = timed(dmb, coords_b,
                                                   reps=20) / B
        from dsac_tpu.ops.gn_pallas import refine_pose_fused
        refb = lambda cs: jax.vmap(lambda c: refine_pose_fused(
            type(sets.poses)(sets.poses.R[:1], sets.poses.t[:1]), c, pixf,
            cam, steps=16)[0].t)(cs)
        batched["refine_winner_fused"] = timed(refb, coords_b,
                                               reps=20) / B
    except Exception as e:
        batched["pallas_error"] = str(e)[:120]

    out = {k: (round(v * 1000, 3) if isinstance(v, float) else v)
           for k, v in timings.items()}
    outb = {k: (round(v * 1000, 3) if isinstance(v, float) else v)
            for k, v in batched.items()}
    print(json.dumps({"H": H, "attempts": attempts, "ms": out,
                      "ms_per_frame_batch8": outb}, indent=2))


if __name__ == "__main__":
    import sys

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    main(H)
