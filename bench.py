"""Headline benchmark: relocalizations/s/chip on the test_ransac path.

BASELINE.json config 1: single-frame relocalization with a scene-coordinate
CNN + 256-hypothesis DSAC inference (score CNN scoring, winner refinement).
The flagship DenseCoordNet runs the full 640x480 frame; hypothesis
sampling / dense scoring / GN refinement run exactly as in serving.

Baseline: the reference publishes no throughput numbers (BASELINE.md);
contemporary reports of the CPU(OpenMP)+1-GPU reference put it around
0.5 s/frame with per-stage runtime prints (core/cnn.h:1060-1232) — we use
2.0 relocalizations/s as a generous reference estimate.  The north-star
target is >= 10x that (>= 20 fps/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_RELOC_PER_S = 2.0


def main():
    from dsac_tpu.config import DSACConfig, PoseConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.models import DenseCoordNet, ScoreNet
    from dsac_tpu.models.coord_net import gather_dense_coords
    from dsac_tpu.pipeline import process_frame

    scene = SyntheticScene()
    cam = scene.camera
    cfg = DSACConfig(pose=PoseConfig(num_hypotheses=256, random_draw=False))

    coord_net = DenseCoordNet()
    score_net = ScoreNet()

    pose, rgb, depth, coords_gt = scene.frame(jax.random.PRNGKey(0))
    coord_params = coord_net.init(jax.random.PRNGKey(1), rgb[None])
    score_params = score_net.init(jax.random.PRNGKey(2),
                                  jnp.zeros((1, 40, 40)))

    def coord_apply(image, pix):
        cmap = coord_net.apply(coord_params, image[None])[0]
        return gather_dense_coords(cmap, pix, stride=8)

    def score_apply(dm):
        return score_net.apply(score_params, dm)

    from dsac_tpu.pipeline.forward import process_frames_batched

    B = 8  # serve batch: keeps CNN matmuls large on the MXU

    @jax.jit
    def serve(keys, images):
        res = process_frames_batched(keys, images, coord_apply, score_apply,
                                     cam, cfg, refine_all=False,
                                     fused_refine=True)
        return res.final.R, res.final.t

    images = jnp.broadcast_to(rgb, (B, *rgb.shape))
    keys = jax.random.split(jax.random.PRNGKey(3), B)

    out = serve(keys, images)  # compile + warmup
    jax.block_until_ready(out)

    n = 16
    t0 = time.perf_counter()
    for i in range(n):
        out = serve(jax.random.split(jax.random.PRNGKey(i), B), images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    value = n * B / dt
    print(json.dumps({
        "metric": "relocalizations_per_s_per_chip",
        "value": round(value, 2),
        "unit": "frames/s (256 hyps, 640x480, DenseCoordNet+ScoreNet)",
        "vs_baseline": round(value / BASELINE_RELOC_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
