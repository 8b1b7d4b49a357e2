"""Serve throughput in the very-large-H regime (BASELINE config 4).

The reference caps at 256 hypotheses because its scoring loop is serial
per hypothesis (core/cnn.h:1135-1141); the scaled analogue runs 4k-16k
hypotheses with the fused Pallas scoring kernel (reprojection + clamp +
soft-inlier reduction in one VMEM pass, ops/diffmap_pallas.py) and the
fused Pallas IRLS winner refinement.

Usage: python scripts/bench_large_h.py [H ...]   (default: 256 4096 16384)
Prints one JSON line per H with reloc/s at batch 8.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def _fence(tree):
    """Hard device fence (block_until_ready is unreliable on the axon
    tunnel -- see dsac_tpu.utils.timing.fence)."""
    from dsac_tpu.utils.timing import fence
    fence(tree)


def main():
    # optional "--attempts N" anywhere in argv: P3P candidate sets per
    # hypothesis (default PoseConfig's 16).  The sampling stage is the
    # dominant large-H cost (H x attempts solves); huge pools tolerate
    # fewer attempts because pool redundancy replaces per-hypothesis
    # retries.
    argv = sys.argv[1:]
    attempts = None
    if "--attempts" in argv:
        i = argv.index("--attempts")
        attempts = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    # --two-phase: resample-only-failures sampling (ops/sampling.py) —
    # phase-1 single attempt + budgeted re-solve, full --attempts depth
    # retained for the failures
    two_phase = "--two-phase" in argv
    if two_phase:
        argv.remove("--two-phase")
    budget = None
    if "--budget" in argv:
        i = argv.index("--budget")
        budget = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    hyps = [int(h) for h in argv] or [256, 4096, 16384]

    from dsac_tpu.config import DSACConfig, PoseConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.models import DenseCoordNet
    from dsac_tpu.models.coord_net import gather_dense_coords
    from dsac_tpu.pipeline.forward import process_frames_batched

    scene = SyntheticScene()
    cam = scene.camera
    coord_net = DenseCoordNet()
    pose, rgb, depth, coords_gt = scene.frame(jax.random.PRNGKey(0))
    params = coord_net.init(jax.random.PRNGKey(1), rgb[None])

    def coord_apply(image, pix):
        cmap = coord_net.apply(params, image[None])[0]
        return gather_dense_coords(cmap, pix, stride=8)

    B = 8
    images = jnp.broadcast_to(rgb, (B, *rgb.shape))

    for H in hyps:
        kw = {} if attempts is None else {"sample_attempts": attempts}
        if budget is not None:
            kw["two_phase_budget"] = budget
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=H,
                                         random_draw=False, **kw))

        @jax.jit
        def serve(keys):
            res = process_frames_batched(
                keys, images, coord_apply, None, cam, cfg,
                refine_all=False, fused_refine=True,
                scoring="fused_soft",
                fused_sampling="two_phase" if two_phase else True)
            return res.final.R, res.final.t

        keys = jax.random.split(jax.random.PRNGKey(3), B)
        t0 = time.perf_counter()
        out = serve(keys)
        _fence(out)
        compile_s = time.perf_counter() - t0

        n = 8
        t0 = time.perf_counter()
        for i in range(n):
            out = serve(jax.random.split(jax.random.PRNGKey(i), B))
        _fence(out)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "relocalizations_per_s_per_chip",
            "value": round(n * B / dt, 2),
            "unit": f"frames/s (H={H}, fused scoring+refine, batch {B})",
            "sampling": "two_phase" if two_phase else "fixed",
            **({"budget": budget} if budget is not None else {}),
            "attempts": attempts if attempts is not None else 16,
            "compile_s": round(compile_s, 1),
        }))


if __name__ == "__main__":
    main()
