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
from dsac_tpu.utils.timing import time_jitted


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

    cnn = jax.jit(lambda img: coord_net.apply(cp, img[None])[0])
    timings["coord_cnn_dense"] = time_jitted(cnn, rgb)

    cmap = cnn(rgb)
    gather = jax.jit(lambda cm: gather_dense_coords(cm, pix) * 1000.0)
    timings["coord_gather"] = time_jitted(gather, cmap)
    coords = gather(cmap)

    samp = jax.jit(functools.partial(sample_minimal_sets, cam=cam,
                                     cfg=cfg.pose))
    timings["p3p_sampling"] = time_jitted(
        lambda: samp(key, coords, pixf), iters=10)
    sets = samp(key, coords, pixf)

    dm_fn = jax.jit(lambda p_, c: diffmaps(p_, c, pixf, cam))
    timings["diffmaps_xla"] = time_jitted(dm_fn, sets.poses, coords)
    dm = dm_fn(sets.poses, coords)

    try:
        from dsac_tpu.ops.diffmap_pallas import (diffmaps_pallas,
                                                 soft_inlier_scores_pallas)
        cam_vec = jnp.asarray([float(cam.focal), float(cam.cx),
                               float(cam.cy)], jnp.float32)
        pk = jax.jit(lambda R, t, c: diffmaps_pallas(R, t, c, pixf, cam_vec))
        timings["diffmaps_pallas"] = time_jitted(pk, sets.poses.R,
                                                 sets.poses.t, coords)
        sk = jax.jit(lambda R, t, c: soft_inlier_scores_pallas(
            R, t, c, pixf, cam_vec))
        timings["scores_fused_pallas"] = time_jitted(sk, sets.poses.R,
                                                     sets.poses.t, coords)
    except Exception as e:  # pallas unavailable on this backend
        timings["pallas_error"] = str(e)[:120]

    score = jax.jit(lambda d: score_net.apply(sp, d.reshape(-1, 40, 40)))
    timings["score_cnn"] = time_jitted(score, dm)

    soft = jax.jit(lambda d: soft_inlier_scores(d, 10.0, 10.0))
    timings["soft_inlier_score_xla"] = time_jitted(soft, dm)

    ref1 = jax.jit(lambda p0R, p0t, c: refine_pose(
        jax.tree.map(lambda x: x[0], sets.poses)._replace(R=p0R, t=p0t),
        c, pixf, cam, steps=8))
    timings["refine_one"] = time_jitted(ref1, sets.poses.R[0],
                                        sets.poses.t[0], coords)

    refall = jax.jit(lambda R, t, c: jax.vmap(
        lambda r_, t_: refine_pose(type(sets.poses)(r_, t_), c, pixf, cam,
                                   steps=8))(R, t))
    timings["refine_all_H"] = time_jitted(refall, sets.poses.R,
                                          sets.poses.t, coords, iters=5)

    out = {k: (round(v * 1000, 3) if isinstance(v, float) else v)
           for k, v in timings.items()}
    print(json.dumps({"H": H, "attempts": attempts, "ms": out}, indent=2))


if __name__ == "__main__":
    import sys

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    main(H)
