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
                                     dense_coord_pretrain_step,
                                     patch_coord_pretrain_many)
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
                   help="updates fused into one device dispatch via "
                        "lax.scan (both arches; amortises remote-TPU "
                        "latency).  1 = legacy host-side patch batching")
    p.add_argument("--dense-batch", type=int, default=1)
    # the reference gates this behind the DOVALIDATION compile flag
    # (train_obj.cpp:36, :309-331); here it's runtime
    p.add_argument("--validate-every", type=int, default=0,
                   help="held-out validation (loss + inlier ratio @ rT3D,"
                        " train_obj.cpp:104-122) every N updates")
    p.add_argument("--validate-frames", type=int, default=8)
    args, cfg, strings = common.parse_with_flags(p, argv)
    if args.rounds is not None:
        args.updates = args.rounds

    source = common.frame_source(args, cfg)
    coord_net, _, _, _ = common.build_models(args, cfg)
    rng = np.random.default_rng(args.seed)
    mesh = common.parse_mesh(args.mesh)
    if mesh is not None:
        n_dev = mesh.devices.size
        print(blue(f"Data-parallel pre-training over mesh "
                   f"{dict(mesh.shape)} ({n_dev} devices)."))

    opt = coord_pretrain_optimizer()
    start_update = 0
    if args.arch != "patch":
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
        if mesh is not None:
            from dsac_tpu.parallel.pretrain import \
                sharded_dense_pretrain_many
            many_fn = sharded_dense_pretrain_many(
                mesh, lambda p_, x: coord_net.apply(p_, x), opt,
                n_updates=args.steps_per_call, batch=args.dense_batch)
        else:
            many_fn = jax.jit(functools.partial(
                dense_coord_pretrain_many,
                apply_fn=lambda p_, x: coord_net.apply(p_, x), optimizer=opt,
                n_updates=args.steps_per_call, batch=args.dense_batch))
    else:
        params = coord_net.init(jax.random.PRNGKey(args.seed),
                                jnp.zeros((1, cfg.net.rgb_patch_size,
                                           cfg.net.rgb_patch_size, 3)))
        opt_state = opt.init(params)
        try:
            snap = ckpt.restore(args.out, ckpt.OBJ_INIT,
                                {"params": params, "opt_state": opt_state,
                                 "step": 0})
            params, opt_state = snap["params"], snap["opt_state"]
            start_update = int(snap["step"])
            print(blue(f"Resumed obj_model_init at update {start_update}."))
        except FileNotFoundError:
            pass
        step_fn = jax.jit(functools.partial(
            coord_pretrain_step,
            apply_fn=lambda p_, x: coord_net.apply(p_, x), optimizer=opt))
        if mesh is not None:
            if args.steps_per_call <= 1:
                raise SystemExit("--mesh patch training requires "
                                 "--steps-per-call > 1 (fused schedule)")
            if args.batch % n_dev:
                raise SystemExit(f"--batch {args.batch} not divisible by "
                                 f"{n_dev} mesh devices")
            from dsac_tpu.parallel.pretrain import \
                sharded_patch_pretrain_many
            patch_many_fn = sharded_patch_pretrain_many(
                mesh, lambda p_, x: coord_net.apply(p_, x), opt,
                patch_size=cfg.net.rgb_patch_size)
        else:
            patch_many_fn = jax.jit(functools.partial(
                patch_coord_pretrain_many,
                apply_fn=lambda p_, x: coord_net.apply(p_, x), optimizer=opt,
                patch_size=cfg.net.rgb_patch_size))

    log = TrainingLog(f"{args.out}/obj_training_loss.txt")
    print(blue(f"Pre-training coordinate CNN ({args.arch}) for "
               f"{args.updates} updates."))

    # ---- held-out validation: masked L1 (m) + inlier ratio @ rT3D ----
    # (train_obj.cpp:104-122 getInliers; DOVALIDATION loop :309-331)
    val_fn = None
    if args.validate_every > 0:
        # same SCENE as training (archetypes!), disjoint viewpoint seed
        val_source = (common.SyntheticSource(args.validate_frames, seed=777,
                                             scene=getattr(source, "scene",
                                                           None))
                      if not args.data else source)
        v_rgbs, v_gts, v_masks = [], [], []
        for i in range(min(args.validate_frames, len(val_source))):
            f = val_source.get(i)
            gt, mask = downsample_obj(f.obj)
            v_rgbs.append(f.rgb)
            v_gts.append(gt)
            v_masks.append(mask)
        v_images = jax.device_put(np.stack(v_rgbs))
        v_gtm = jax.device_put(np.stack(v_gts))
        v_mask = jax.device_put(np.stack(v_masks))
        rt3d_m = cfg.pose.inlier_threshold_3d / 1000.0  # mm -> metres

        @jax.jit
        def _validate_dense(params):
            pred = coord_net.apply(params, v_images)  # (F, H/8, W/8, 3) m
            d = jnp.sqrt(jnp.sum((pred - v_gtm) ** 2, axis=-1) + 1e-12)
            n = jnp.maximum(jnp.sum(v_mask), 1.0)
            loss = jnp.sum(d * v_mask) / n
            inliers = jnp.sum((d < rt3d_m) * v_mask) / n
            return loss, inliers

        if args.arch != "patch":
            val_fn = _validate_dense
        else:
            from dsac_tpu.models.coord_net import extract_patches as _ep

            v_patches, v_labels = [], []
            vrng = np.random.default_rng(777)
            half = cfg.net.rgb_patch_size // 2
            for i in range(min(args.validate_frames, len(val_source))):
                f = val_source.get(i)
                valid = np.argwhere(np.abs(f.obj).sum(-1) > 0)
                valid = valid[(valid[:, 0] >= half)
                              & (valid[:, 0] < f.rgb.shape[0] - half)
                              & (valid[:, 1] >= half)
                              & (valid[:, 1] < f.rgb.shape[1] - half)]
                take = valid[vrng.integers(len(valid), size=128)]
                pix = jnp.asarray(take[:, ::-1].copy())
                v_patches.append(_ep(jnp.asarray(f.rgb), pix,
                                     cfg.net.rgb_patch_size))
                v_labels.append(f.obj[take[:, 0], take[:, 1]] / 1000.0)
            v_patches = jnp.concatenate(v_patches)
            v_labels = jnp.asarray(np.concatenate(v_labels))

            @jax.jit
            def _validate_patch(params):
                pred = coord_net.apply(params, v_patches)  # (N, 3) m
                d = jnp.sqrt(jnp.sum((pred - v_labels) ** 2, axis=-1)
                             + 1e-12)
                return jnp.mean(d), jnp.mean(d < rt3d_m)

            val_fn = _validate_patch
        val_log = TrainingLog(f"{args.out}/obj_validation_loss.txt")
        next_val = ((start_update // args.validate_every) + 1) \
            * args.validate_every

    # prestage the whole dense-mode frame pool on device once — per-update
    # host involvement is then one dispatch per --steps-per-call updates
    if args.arch != "patch":
        rgbs, gts, masks_ = [], [], []
        for i in range(len(source)):
            f = source.get(i)
            gt, mask = downsample_obj(f.obj)
            rgbs.append(f.rgb)
            gts.append(gt)
            masks_.append(mask)
        if mesh is not None:
            # pool sharded over ALL mesh devices; params replicated
            from jax.sharding import NamedSharding, PartitionSpec
            from dsac_tpu.parallel.pretrain import shard_pool
            images_d, gts_d, masks_d = shard_pool(
                mesh, np.stack(rgbs), np.stack(gts), np.stack(masks_))
            rep = NamedSharding(mesh, PartitionSpec())
            params, opt_state = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), rep),
                (params, opt_state))
        else:
            images_d = jax.device_put(np.stack(rgbs))
            gts_d = jax.device_put(np.stack(gts))
            masks_d = jax.device_put(np.stack(masks_))
    elif args.steps_per_call > 1:
        # fused patch mode: stage frames + GT maps on device, precompute
        # per-frame valid (on-object, border-respecting) pixel lists, and
        # dispatch lax.scan blocks of updates with a host-built schedule
        rgbs, objs, valid_px = [], [], []
        half = cfg.net.rgb_patch_size // 2
        for i in range(len(source)):
            f = source.get(i)
            rgbs.append(f.rgb)
            objs.append(f.obj)
            valid = np.argwhere(np.abs(f.obj).sum(-1) > 0)
            valid = valid[(valid[:, 0] >= half)
                          & (valid[:, 0] < f.rgb.shape[0] - half)
                          & (valid[:, 1] >= half)
                          & (valid[:, 1] < f.rgb.shape[1] - half)]
            valid_px.append(valid[:, ::-1].astype(np.int32))  # (x, y)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from dsac_tpu.parallel.pretrain import shard_pool
            images_d, objs_d = shard_pool(mesh, np.stack(rgbs),
                                          np.stack(objs))
            rep_sh = NamedSharding(mesh, PartitionSpec())
            params, opt_state = jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), rep_sh),
                (params, opt_state))
            pool_sh = NamedSharding(mesh, PartitionSpec(("data", "hyp")))
            F_local = images_d.shape[0] // n_dev
            b_local = args.batch // n_dev

            def patch_schedule(k):
                # per-device schedules with pool-LOCAL frame indices
                # (global row d*F_local+local wraps the repeat-padding)
                fi = rng.integers(F_local, size=(n_dev, k, b_local))
                pxy = np.empty((n_dev, k, b_local, 2), np.int32)
                for d in range(n_dev):
                    for u in range(k):
                        for b in range(b_local):
                            g = (d * F_local + fi[d, u, b]) % len(source)
                            v = valid_px[g]
                            pxy[d, u, b] = v[rng.integers(len(v))]
                return (jax.device_put(fi.astype(np.int32), pool_sh),
                        jax.device_put(pxy, pool_sh))
        else:
            images_d = jax.device_put(np.stack(rgbs))
            objs_d = jax.device_put(np.stack(objs))

            def patch_schedule(k):
                fi = rng.integers(len(source), size=(k, args.batch))
                pxy = np.empty((k, args.batch, 2), np.int32)
                for u in range(k):
                    for b, fr in enumerate(fi[u]):
                        v = valid_px[fr]
                        pxy[u, b] = v[rng.integers(len(v))]
                return jnp.asarray(fi.astype(np.int32)), jnp.asarray(pxy)

    update = start_update
    while update < args.updates:
        if args.arch != "patch":
            key = jax.random.PRNGKey(int(rng.integers(2 ** 31)))
            params, opt_state, losses = many_fn(params, opt_state, key,
                                                images_d, gts_d, masks_d)
            loss = losses[-1]
            update += args.steps_per_call
        elif args.steps_per_call > 1:
            k = min(args.steps_per_call, args.updates - update)
            fi, pxy = patch_schedule(k)
            params, opt_state, losses = patch_many_fn(
                params, opt_state, images_d, objs_d, fi, pxy)
            loss = losses[-1]
            update += k
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
        if val_fn is not None and update >= next_val:
            next_val += args.validate_every
            v_loss, v_inl = val_fn(params)
            # `<update> <valLoss> <valInliers>` (train_obj.cpp:329)
            val_log.append(update, float(v_loss),
                           {"inliers": float(v_inl)})
            print(blue(f"validation @ {update}: L1 {float(v_loss):.4f} m, "
                       f"inliers@rT3D {float(v_inl) * 100:.1f}%"))
        if update % args.snapshot_every == 0 or update >= args.updates:
            ckpt.save(args.out, ckpt.OBJ_INIT,
                      {"params": params, "opt_state": opt_state,
                       "step": update}, step=update)
    print(green(f"Done; snapshots in {args.out}/{ckpt.OBJ_INIT}"))
    return params


if __name__ == "__main__":
    main()
