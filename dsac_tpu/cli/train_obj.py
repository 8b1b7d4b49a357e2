"""Coordinate-CNN pre-training (the reference's train_obj program).

Mirrors train_obj.cpp:292-332: rounds sample random frames and random
on-object pixels, L1 loss on GT scene coordinates in metres, Adam 1e-4
halved every 50k updates, periodic snapshots (obj_model_init).  The dense
flagship trains on whole frames against stride-8 GT coordinate maps; the
patch arch reproduces the reference's 42x42-patch regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.models.coord_net import extract_patches
from dsac_tpu.pipeline.train import (coord_pretrain_optimizer,
                                     coord_pretrain_step,
                                     dense_coord_pretrain_many,
                                     dense_coord_pretrain_step)
from dsac_tpu.utils import checkpoint as ckpt
from dsac_tpu.utils.logging import TrainingLog, blue, green
from dsac_tpu.cli import common


def downsample_obj(obj: np.ndarray, stride: int = 8):
    """GT coord map + validity mask at the dense net's output stride."""
    sub = obj[stride // 2::stride, stride // 2::stride]
    mask = (np.abs(sub).sum(-1) > 0).astype(np.float32)
    return sub / 1000.0, mask  # metres


def main(argv=None):
    p = common.make_parser(__doc__)
    p.add_argument("--updates", type=int, default=300_000,
                   help="total updates (reference: 300k, train_obj.cpp:203)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--frames-per-round", type=int, default=100)
    p.add_argument("--patches-per-frame", type=int, default=512)
    p.add_argument("--snapshot-every", type=int, default=1000)
    p.add_argument("--steps-per-call", type=int, default=50,
                   help="dense mode: updates fused into one device "
                        "dispatch (amortises remote-TPU latency)")
    p.add_argument("--dense-batch", type=int, default=1)
    args, cfg, strings = common.parse_with_flags(p, argv)
    if args.rounds is not None:
        args.updates = args.rounds

    source = common.frame_source(args, cfg)
    coord_net, _, _, _ = common.build_models(args, cfg)
    rng = np.random.default_rng(args.seed)

    opt = coord_pretrain_optimizer()
    start_update = 0
    if args.arch == "dense":
        sample = source.get(0)
        params = coord_net.init(jax.random.PRNGKey(args.seed),
                                jnp.asarray(sample.rgb)[None])
        opt_state = opt.init(params)
        # resume from the latest snapshot if one exists (full train state,
        # unlike the reference's weights-only torch.save)
        try:
            snap = ckpt.restore(args.out, ckpt.OBJ_INIT,
                                {"params": params, "opt_state": opt_state,
                                 "step": 0})
            params, opt_state = snap["params"], snap["opt_state"]
            start_update = int(snap["step"])
            print(blue(f"Resumed obj_model_init at update {start_update}."))
        except FileNotFoundError:
            pass
        many_fn = jax.jit(functools.partial(
            dense_coord_pretrain_many,
            apply_fn=lambda p_, x: coord_net.apply(p_, x), optimizer=opt,
            n_updates=args.steps_per_call, batch=args.dense_batch))
    else:
        params = coord_net.init(jax.random.PRNGKey(args.seed),
                                jnp.zeros((1, cfg.net.rgb_patch_size,
                                           cfg.net.rgb_patch_size, 3)))
        opt_state = opt.init(params)
        step_fn = jax.jit(functools.partial(
            coord_pretrain_step,
            apply_fn=lambda p_, x: coord_net.apply(p_, x), optimizer=opt))

    log = TrainingLog(f"{args.out}/obj_training_loss.txt")
    print(blue(f"Pre-training coordinate CNN ({args.arch}) for "
               f"{args.updates} updates."))

    # prestage the whole dense-mode frame pool on device once — per-update
    # host involvement is then one dispatch per --steps-per-call updates
    if args.arch == "dense":
        rgbs, gts, masks_ = [], [], []
        for i in range(len(source)):
            f = source.get(i)
            gt, mask = downsample_obj(f.obj)
            rgbs.append(f.rgb)
            gts.append(gt)
            masks_.append(mask)
        images_d = jax.device_put(np.stack(rgbs))
        gts_d = jax.device_put(np.stack(gts))
        masks_d = jax.device_put(np.stack(masks_))

    update = start_update
    while update < args.updates:
        if args.arch == "dense":
            key = jax.random.PRNGKey(int(rng.integers(2 ** 31)))
            params, opt_state, losses = many_fn(params, opt_state, key,
                                                images_d, gts_d, masks_d)
            loss = losses[-1]
            update += args.steps_per_call
        else:
            # assemble a round of patches (train_obj.cpp:47-102)
            patches, labels = [], []
            for _ in range(max(1, args.frames_per_round // 10)):
                f = source.get(int(rng.integers(len(source))))
                valid = np.argwhere(np.abs(f.obj).sum(-1) > 0)
                half = cfg.net.rgb_patch_size // 2
                valid = valid[(valid[:, 0] >= half)
                              & (valid[:, 0] < f.rgb.shape[0] - half)
                              & (valid[:, 1] >= half)
                              & (valid[:, 1] < f.rgb.shape[1] - half)]
                take = valid[rng.integers(len(valid),
                                          size=args.patches_per_frame)]
                pix = jnp.asarray(take[:, ::-1].copy())  # (y,x) -> (x,y)
                patches.append(extract_patches(jnp.asarray(f.rgb), pix,
                                               cfg.net.rgb_patch_size))
                labels.append(f.obj[take[:, 0], take[:, 1]] / 1000.0)
            patches = jnp.concatenate(patches)
            labels = jnp.asarray(np.concatenate(labels))
            order = rng.permutation(len(patches))
            for b0 in range(0, len(order) - args.batch + 1, args.batch):
                sel = jnp.asarray(order[b0:b0 + args.batch])
                params, opt_state, loss = step_fn(
                    params, opt_state, patches[sel], labels[sel])
                update += 1
                if update >= args.updates:
                    break

        if update % 50 == 0 or update >= args.updates:
            log.append(update, float(loss))
            print(f"update {update}: L1 {float(loss):.4f} m")
        if update % args.snapshot_every == 0 or update >= args.updates:
            ckpt.save(args.out, ckpt.OBJ_INIT,
                      {"params": params, "opt_state": opt_state,
                       "step": update}, step=update)
    print(green(f"Done; snapshots in {args.out}/{ckpt.OBJ_INIT}"))
    return params


if __name__ == "__main__":
    main()
