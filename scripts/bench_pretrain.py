"""Pre-training throughput: updates/s for both coordinate-net arches.

VERDICT item 9: the reference-parity patch arch (42x42 patches,
core/train_obj.cpp:47-102, 300k-update budget) must train fast over a
high-dispatch-latency remote-TPU tunnel.  Both arches stage the frame
pool on device and fuse --steps-per-call updates into one lax.scan
dispatch (pipeline/train.py: dense_coord_pretrain_many /
patch_coord_pretrain_many); this script measures the steady-state update
rate of exactly those loops.

Usage: python scripts/bench_pretrain.py [--frames 48] [--steps 200]
Prints one JSON line per arch.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fence(tree):
    """Hard device fence (block_until_ready is unreliable on the axon
    tunnel -- see dsac_tpu.utils.timing.fence)."""
    from dsac_tpu.utils.timing import fence
    fence(tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--steps", type=int, default=200,
                    help="updates fused per dispatch")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64,
                    help="patch batch (reference: 64, train_obj.lua:8)")
    ap.add_argument("--dense-batch", type=int, default=2)
    args = ap.parse_args()

    from dsac_tpu.config import DSACConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.models import DenseCoordNet, PatchCoordNet
    from dsac_tpu.pipeline.train import (coord_pretrain_optimizer,
                                         dense_coord_pretrain_many,
                                         patch_coord_pretrain_many)

    cfg = DSACConfig()
    scene = SyntheticScene()
    P = cfg.net.rgb_patch_size
    half = P // 2

    rgbs, objs, valid_px = [], [], []
    for i in range(args.frames):
        _, rgb, _, coords = scene.frame(jax.random.PRNGKey(1000 + i))
        rgb, coords = np.asarray(rgb), np.asarray(coords)
        rgbs.append(rgb)
        objs.append(coords)
        valid = np.argwhere(np.abs(coords).sum(-1) > 0)
        valid = valid[(valid[:, 0] >= half)
                      & (valid[:, 0] < rgb.shape[0] - half)
                      & (valid[:, 1] >= half)
                      & (valid[:, 1] < rgb.shape[1] - half)]
        valid_px.append(valid[:, ::-1].astype(np.int32))
    images_d = jax.device_put(np.stack(rgbs))
    objs_d = jax.device_put(np.stack(objs))

    stride = 8
    gts = np.stack([o[stride // 2::stride, stride // 2::stride] / 1000.0
                    for o in objs])
    masks = (np.abs(gts).sum(-1) > 0).astype(np.float32)
    gts_d, masks_d = jax.device_put(gts), jax.device_put(masks)

    rng = np.random.default_rng(0)
    opt = coord_pretrain_optimizer()
    results = {}

    # ---- dense FCN ----
    net = DenseCoordNet()
    params = net.init(jax.random.PRNGKey(1), images_d[:1])
    opt_state = opt.init(params)
    many = jax.jit(functools.partial(
        dense_coord_pretrain_many, apply_fn=lambda p, x: net.apply(p, x),
        optimizer=opt, n_updates=args.steps, batch=args.dense_batch))
    out = many(params, opt_state, jax.random.PRNGKey(0), images_d, gts_d,
               masks_d)
    _fence(out)  # compile + warmup
    t0 = time.perf_counter()
    for r in range(args.reps):
        out = many(out[0], out[1], jax.random.PRNGKey(r + 1), images_d,
                   gts_d, masks_d)
    _fence(out)
    dt = time.perf_counter() - t0
    results["dense"] = args.reps * args.steps / dt

    # ---- patch arch (reference parity) ----
    net = PatchCoordNet()
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, P, P, 3)))
    opt_state = opt.init(params)
    many = jax.jit(functools.partial(
        patch_coord_pretrain_many, apply_fn=lambda p, x: net.apply(p, x),
        optimizer=opt, patch_size=P))

    def schedule(k):
        fi = rng.integers(args.frames, size=(k, args.batch))
        pxy = np.empty((k, args.batch, 2), np.int32)
        for u in range(k):
            for b, fr in enumerate(fi[u]):
                v = valid_px[fr]
                pxy[u, b] = v[rng.integers(len(v))]
        return jnp.asarray(fi.astype(np.int32)), jnp.asarray(pxy)

    fi, pxy = schedule(args.steps)
    out = many(params, opt_state, images_d, objs_d, fi, pxy)
    _fence(out)
    scheds = [schedule(args.steps) for _ in range(args.reps)]  # host cost
    t0 = time.perf_counter()
    for fi, pxy in scheds:
        out = many(out[0], out[1], images_d, objs_d, fi, pxy)
    _fence(out)
    dt = time.perf_counter() - t0
    results["patch"] = args.reps * args.steps / dt

    for arch, ups in results.items():
        print(json.dumps({
            "metric": f"coord_pretrain_updates_per_s_{arch}",
            "value": round(ups, 1),
            "unit": f"updates/s (batch "
                    f"{args.dense_batch if arch == 'dense' else args.batch},"
                    f" {args.steps} steps/dispatch)",
            "reference_budget_minutes": round(300_000 / ups / 60, 1),
        }))


if __name__ == "__main__":
    main()
