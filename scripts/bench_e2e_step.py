"""Time one end-to-end DSAC training round per refine-gradient mode.

Usage: python scripts/bench_e2e_step.py [--hyps H] [unroll|implicit|...]

Full-scale setup (640x480, H=256, full-width DenseCoordNet + ScoreNet,
8 refinement steps) on whatever backend JAX selects; prints wall-clock
per training round for each requested mode.  The reference's analogue is
the dRefine-dominated backward at train_ransac.cpp:303-401.
"""

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
    argv = sys.argv[1:]
    hyps = 256
    if "--hyps" in argv:
        i = argv.index("--hyps")
        hyps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    modes = argv or ["implicit", "unroll"]

    from dsac_tpu.config import DSACConfig, PoseConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.models import DenseCoordNet, ScoreNet
    from dsac_tpu.models.coord_net import gather_dense_coords
    from dsac_tpu.pipeline.train import e2e_step, make_e2e_state

    scene = SyntheticScene()
    cam = scene.camera
    cfg = DSACConfig(pose=PoseConfig(num_hypotheses=hyps))

    coord_net = DenseCoordNet()
    score_net = ScoreNet()
    pose, rgb, depth, coords = scene.frame(jax.random.PRNGKey(0))
    cp = coord_net.init(jax.random.PRNGKey(1), rgb[None])
    sp = score_net.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))

    def coord_apply(params, image, pix):
        cmap = coord_net.apply(params, image[None])[0]
        return gather_dense_coords(cmap, pix, stride=8)

    def score_apply(params, dm):
        return score_net.apply(params, dm)

    if hyps > 512:
        # very-large-H training regime: the score CNN's conv activations
        # at batch H (H x 40x40 x up-to-512ch) alone exceed v5e HBM
        # (measured: 36.1 G needed at H=4096); the regime's scoring head
        # is the parameter-free soft-inlier reduction (BASELINE config 4)
        # for training exactly like serving
        from dsac_tpu.ops import soft_inlier_scores

        def score_apply(params, dm):
            return soft_inlier_scores(
                dm.reshape(dm.shape[0], -1),
                cfg.pose.inlier_threshold_2d, cfg.pose.score_beta)

        sp = {}
        print(f"H={hyps}: soft-inlier training head (score CNN at this "
              f"batch exceeds HBM)")

    state = make_e2e_state(cp, sp)

    for mode in modes:
        # "softam_<mode>" benches the soft-argmax objective's round
        softam = mode.startswith("softam_")
        rm = mode[len("softam_"):] if softam else mode
        rm = False if rm == "unroll" else rm
        import functools
        step_fn = jax.jit(functools.partial(
            e2e_step, coord_apply=coord_apply, score_apply=score_apply,
            cam=cam, cfg=cfg, softam=softam, refine_mode=rm))
        t0 = time.perf_counter()
        s, loss, aux = step_fn(state, jax.random.PRNGKey(3), rgb, pose)
        _fence(loss)
        compile_s = time.perf_counter() - t0

        n = 10
        t0 = time.perf_counter()
        s2 = state
        for i in range(n):
            s2, loss, aux = step_fn(s2, jax.random.PRNGKey(10 + i), rgb,
                                    pose)
        _fence(loss)
        dt = (time.perf_counter() - t0) / n
        print(f"H={hyps} mode={mode:13s} round={dt*1e3:8.1f} ms  "
              f"(compile {compile_s:.0f} s)  E[loss]={float(loss):.3f} "
              f"grad_finite={bool(aux['grad_finite'])}")


if __name__ == "__main__":
    main()
