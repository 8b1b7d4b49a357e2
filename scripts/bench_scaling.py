"""Scaling-efficiency benchmark: sharded e2e step throughput vs mesh size.

Measures frames/s of the sharded training step on (data x hyp) meshes of
increasing size and reports efficiency vs linear scaling from the
1-device run.  On this dev box only a virtual CPU farm is available
(one real TPU chip), so CPU-farm numbers validate the SPMD structure and
collective overheads qualitatively; run on a real slice for BASELINE
numbers (the program is identical).

Known sharding caveats measured here:
  * the dense coordinate FCN is spatially sharded over the 'hyp' axis via
    ppermute halo exchange (parallel/sharded.py:banded_dense_coords), so
    dense-arch meshes with hyp>1 split the CNN FLOPs too (pass
    --replicated-fcn to measure the old replicated layout);
  * a virtual farm of N devices on fewer physical cores caps efficiency
    at cores/N regardless of program quality.

Usage:  python scripts/bench_scaling.py [--cpu-farm 8]
"""

import argparse
import json
import time


def _fence(tree):
    """Hard device fence (block_until_ready is unreliable on the axon
    tunnel -- see dsac_tpu.utils.timing.fence)."""
    from dsac_tpu.utils.timing import fence
    fence(tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-farm", type=int, default=0,
                    help="force a virtual CPU device farm of this size")
    ap.add_argument("--frames-per-device", type=int, default=2)
    ap.add_argument("--hyps", type=int, default=64)
    ap.add_argument("--replicated-fcn", action="store_true",
                    help="replicate the dense FCN over 'hyp' instead of "
                         "the banded halo-exchange sharding")
    args = ap.parse_args()

    import os
    if args.cpu_farm:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_farm}")
    import jax
    if args.cpu_farm:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from dsac_tpu.config import DSACConfig, PoseConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.geometry.pose import Pose
    from dsac_tpu.models import DenseCoordNet, ScoreNet
    from dsac_tpu.models.coord_net import gather_dense_coords
    from dsac_tpu.parallel import make_mesh, sharded_e2e_step

    n_dev = len(jax.devices())
    scene = SyntheticScene()
    cam = scene.camera
    cfg = DSACConfig(pose=PoseConfig(num_hypotheses=args.hyps,
                                     sample_attempts=8))
    coord_net = DenseCoordNet(width=32)
    score_net = ScoreNet(width_mult=0.5)

    def make_coord_apply(n_hyp_shards):
        if args.replicated_fcn or n_hyp_shards == 1:
            def coord_apply(params, image, pix):
                cmap = coord_net.apply(params, image[None])[0]
                return gather_dense_coords(cmap, pix, stride=8)
            return coord_apply, False
        from dsac_tpu.parallel.sharded import banded_dense_coords

        def coord_apply(params, image, pix):
            apply_full = lambda img: coord_net.apply(params, img[None])[0]
            cmap = banded_dense_coords(apply_full, image,
                                       n_shards=n_hyp_shards)
            return gather_dense_coords(cmap, pix, stride=8)
        return coord_apply, True

    def score_apply(params, dm):
        return score_net.apply(params, dm)

    # pre-render a frame pool
    frames, Rs, ts = [], [], []
    for i in range(8):
        pose, rgb, depth, coords = scene.frame(jax.random.PRNGKey(i))
        frames.append(np.asarray(rgb))
        Rs.append(np.asarray(pose.R))
        ts.append(np.asarray(pose.t))

    cp = coord_net.init(jax.random.PRNGKey(1), jnp.asarray(frames[0])[None])
    sp = score_net.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))
    c_opt = optax.sgd(1e-5, momentum=0.9)
    s_opt = optax.sgd(1e-7, momentum=0.9)

    results = {}
    meshes = []
    d = 1
    while d <= n_dev:
        hyp_shards = [h for h in (1, 2, 4) if h <= d and args.hyps % h == 0
                      and d % h == 0]
        meshes.append((d // hyp_shards[-1], hyp_shards[-1]))
        d *= 2
    for (nd, nh) in meshes:
        n = nd * nh
        mesh = make_mesh(nd, nh)
        B = args.frames_per_device * nd
        images = jnp.asarray(np.stack([frames[i % 8] for i in range(B)]))
        gt = Pose(jnp.asarray(np.stack([Rs[i % 8] for i in range(B)])),
                  jnp.asarray(np.stack([ts[i % 8] for i in range(B)])))
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        coord_apply, collective = make_coord_apply(nh)
        step = sharded_e2e_step(mesh, coord_apply, score_apply, cam, cfg,
                                c_opt, s_opt, coord_collective=collective)
        state = (cp, sp, c_opt.init(cp), s_opt.init(sp))
        out = step(*state, keys, images, gt.R, gt.t)
        _fence(out)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            out = step(*state, keys, images, gt.R, gt.t)
        _fence(out)
        dt = (time.perf_counter() - t0) / iters
        fps = B / dt
        results[f"{nd}x{nh}"] = {"devices": n, "frames_per_s": round(fps, 3)}
        print(f"mesh {nd}x{nh} ({n} dev): {fps:.2f} frames/s")

    base = next(iter(results.values()))
    for k, v in results.items():
        lin = base["frames_per_s"] * v["devices"] / base["devices"]
        v["efficiency_vs_linear"] = round(v["frames_per_s"] / lin, 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
