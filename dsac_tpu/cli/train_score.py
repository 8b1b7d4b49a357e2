"""Score-CNN pre-training (the reference's train_score program).

Mirrors train_score.cpp:265-405: per round, frames are subsampled, the
coordinate CNN predicts coordinates, the GT pose is perturbed at two
noise bands, diff maps are rendered against the PREDICTED coordinates,
and the score CNN regresses -10 * maxLoss with L1/Adam.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.pipeline.train import (score_pretrain_optimizer,
                                     score_pretrain_round)
from dsac_tpu.utils import checkpoint as ckpt
from dsac_tpu.utils.logging import TrainingLog, blue, green
from dsac_tpu.cli import common


def main(argv=None):
    p = common.make_parser(__doc__)
    p.add_argument("--training-rounds", type=int, default=80,
                   help="reference: 80 (train_score.cpp:269)")
    p.add_argument("--frames-per-round", type=int, default=100)
    p.add_argument("--hyps-per-frame", type=int, default=16)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--stage-frames", type=int, default=512,
                   help="max frames staged on device for the fused "
                        "rounds (bounds HBM/tunnel cost on big splits)")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="Adam lr (reference 1e-4, train_score.lua:13); the "
                        "labels are O(-100), so short demo runs benefit "
                        "from a hotter rate")
    args, cfg, strings = common.parse_with_flags(p, argv)
    if args.rounds is not None:
        args.training_rounds = args.rounds

    source = common.frame_source(args, cfg)
    coord_net, score_net, coord_apply, score_apply = common.build_models(
        args, cfg)
    rng = np.random.default_rng(args.seed)
    cam = cfg.data.camera()

    # load the pre-trained coordinate net (obj_model_init)
    try:
        snap = ckpt.restore(args.out, ckpt.OBJ_INIT)
        coord_params = snap["params"]
        print(blue("Loaded obj_model_init."))
    except Exception:
        print(blue("No obj_model_init found; using random coordinate net."))
        sample = source.get(0)
        if args.arch != "patch":
            coord_params = coord_net.init(jax.random.PRNGKey(1),
                                          jnp.asarray(sample.rgb)[None])
        else:
            coord_params = coord_net.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, cfg.net.rgb_patch_size,
                           cfg.net.rgb_patch_size, 3)))

    grid = cfg.net.subsample_size
    score_params = score_net.init(jax.random.PRNGKey(2),
                                  jnp.zeros((1, grid, grid)))
    opt = score_pretrain_optimizer(args.lr)
    opt_state = opt.init(score_params)

    # stage the frame pool on device once; each round is then ONE
    # dispatch (pipeline/train.py:score_pretrain_round) instead of the
    # reference's ~30 host/device boundaries (train_score.cpp:271-373)
    n_f = max(1, args.frames_per_round // 10)
    mesh = common.parse_mesh(args.mesh)
    if mesh is not None:
        # data-parallel round: the heavy per-frame diff-map generation
        # shards over ALL mesh devices; the Adam scan stays replicated
        # (schedule-identical to the single-device round)
        from jax.sharding import NamedSharding, PartitionSpec
        from dsac_tpu.parallel.pretrain import (shard_pool,
                                                sharded_score_pretrain_round)
        n_dev = mesh.devices.size
        n_f = -(-n_f // n_dev) * n_dev  # round up to a full device sweep
        print(blue(f"Sharded rounds over mesh {dict(mesh.shape)}: "
                   f"{n_f} frames/round."))
        frames_np = common.stage_frame_pool(source, rng, args.stage_frames,
                                            as_numpy=True)
        images_d, gt_R, gt_t = shard_pool(mesh, *frames_np)
        pool_local = images_d.shape[0] // n_dev
        rep = NamedSharding(mesh, PartitionSpec())
        pool_sh = NamedSharding(mesh, PartitionSpec(("data", "hyp")))
        score_params, opt_state, coord_params = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), rep),
            (score_params, opt_state, coord_params))
        round_fn = sharded_score_pretrain_round(
            mesh, coord_apply,
            lambda p_, d: score_net.apply(p_, d), cam, cfg,
            n_hyps=args.hyps_per_frame, batch=args.batch, optimizer=opt)
    else:
        images_d, gt_R, gt_t = common.stage_frame_pool(source, rng,
                                                       args.stage_frames)
        # images/gt/coord_params are call ARGUMENTS, not jit-captured
        # constants: a closed-over 512-frame pool would be inlined into
        # the HLO and break the remote compile (payload >1.9 GB)
        round_fn = jax.jit(functools.partial(
            score_pretrain_round, coord_apply=coord_apply,
            score_apply=lambda p_, d: score_net.apply(p_, d), cam=cam,
            cfg=cfg, n_hyps=args.hyps_per_frame, batch=args.batch,
            optimizer=opt))
    pool = images_d.shape[0]

    log = TrainingLog(f"{args.out}/score_training_loss.txt")
    update = 0
    for rnd in range(args.training_rounds):
        key_round = jax.random.PRNGKey(int(rng.integers(2 ** 31)))
        perm = jnp.asarray(
            rng.permutation(n_f * args.hyps_per_frame), jnp.int32)
        if mesh is not None:
            # pool-LOCAL frame ids, laid out in device-linear order
            fidx = jax.device_put(
                rng.integers(pool_local, size=n_f).astype(np.int32),
                pool_sh)
            keys = jax.device_put(
                np.asarray(jax.random.split(key_round, n_f)), pool_sh)
            perm = jax.device_put(np.asarray(perm), rep)
            score_params, opt_state, losses = round_fn(
                score_params, opt_state, fidx, keys, perm, images_d,
                gt_R, gt_t, coord_params)
        else:
            fidx = jnp.asarray(rng.integers(pool, size=n_f), jnp.int32)
            keys = jax.random.split(key_round, n_f)
            score_params, opt_state, losses = round_fn(
                score_params, opt_state, fidx, keys, perm,
                images=images_d, gt_R=gt_R, gt_t=gt_t,
                coord_params=coord_params)
        update += int(losses.shape[0])
        loss = float(losses[-1])
        log.append(rnd, loss)
        print(f"round {rnd}: score L1 {loss:.3f}")
        if (rnd + 1) % 10 == 0 or rnd == args.training_rounds - 1:
            ckpt.save(args.out, ckpt.SCORE_INIT,
                      {"params": score_params, "opt_state": opt_state,
                       "step": update}, step=update)
    print(green(f"Done; snapshots in {args.out}/{ckpt.SCORE_INIT}"))
    return score_params


if __name__ == "__main__":
    main()
