"""Production relocalization serving: queue-scan batched inference.

The reference's test_ransac is a per-frame loop with three host/device
boundaries per frame (core/test_ransac.cpp:104-240).  This program is the
TPU-native serving shape: the frame queue is staged on device once, and
one fused lax.scan dispatch serves `--queue` batches of `--batch` frames
(coordinate CNN -> P3P hypothesis sampling -> dense scoring -> softmax
draw -> winner refinement; winner-only refinement is the low-latency
serve mode).  Per-dispatch tunnel latency amortises across
queue x batch frames, which is how serving exceeds the ~25 ms/dispatch
floor of remote-TPU links.

Reports throughput + accuracy@5cm5deg (when GT poses are available,
core/cnn.h:1249-1256) as one JSON line, and optionally exports each
estimated pose in the 7-Scenes convention (test_ransac.cpp:198-233).
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.pipeline.forward import process_frames_batched
from dsac_tpu.utils import checkpoint as ckpt
from dsac_tpu.utils.timing import fence
from dsac_tpu.utils.logging import blue, green
from dsac_tpu.cli import common


def _serve_mesh(args, cfg, cam, coord_net, coord_apply, coord_params,
                score_params, score_apply, use_score_net, images, frames,
                have_gt, source=None):
    """--mesh DxH serving: hyp-sharded SPMD over a device mesh.

    Frames shard over 'data', the hypothesis pool (and, for dense archs,
    the FCN's rows via ppermute halo exchange) over 'hyp'; the fast serve
    kernels (fused SoA P3P + single-launch IRLS) run per shard exactly as
    in the single-chip program (parallel/sharded.py).  The queue is
    dispatched pipelined (non-blocking) so per-dispatch tunnel latency
    overlaps device compute.
    """
    from dsac_tpu.parallel import sharded_serve_step
    from dsac_tpu.parallel.mesh import DATA_AXIS, HYP_AXIS
    from dsac_tpu.cli.common import mesh_coord_apply, parse_mesh

    mesh = parse_mesh(args.mesh)
    n_data, n_hyp = mesh.shape[DATA_AXIS], mesh.shape[HYP_AXIS]
    B, Q = args.batch, args.queue
    if B % n_data:
        raise SystemExit(f"--batch {B} not divisible by data axis {n_data}")
    if cfg.pose.num_hypotheses % n_hyp:
        raise SystemExit(f"-rI {cfg.pose.num_hypotheses} not divisible "
                         f"by hyp axis {n_hyp}")

    capply, coord_collective = mesh_coord_apply(args, coord_net,
                                                coord_apply, n_hyp)
    if use_score_net:
        sapply = score_apply
    else:
        soft_fn = common.soft_inlier_score_fn(cfg)
        sapply = lambda params, dm: soft_fn(dm)
        score_params = {}

    refine_mode = ("auto" if args.fused_refine is None
                   else "fused" if args.fused_refine else False)
    serve = sharded_serve_step(mesh, capply, sapply, cam, cfg,
                               coord_collective=coord_collective,
                               verify_topk=args.verify_topk,
                               fused_sampling=("two_phase"
                                               if args.two_phase_sampling
                                               else args.fused_refine),
                               refine_mode=refine_mode,
                               scoring=("fused_soft" if args.fused_scoring
                                        else "cnn"),
                               softam=args.softam)

    # orbax-restored params are COMMITTED to a single device; re-place
    # them replicated over the mesh or shard_map rejects the inputs
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    coord_params, score_params = jax.tree.map(
        lambda x: jax.device_put(x, rep) if isinstance(x, jax.Array)
        else x, (coord_params, score_params))

    keys = jnp.stack([
        jax.random.split(jax.random.PRNGKey(args.seed + q), B)
        for q in range(Q)])  # (Q, B, 2)
    print(blue(f"Serving {B * Q} staged frames over mesh "
               f"{dict(mesh.shape)}, queue {Q} x batch {B} ..."))
    out = serve(coord_params, score_params, keys[0], images[0])  # compile
    fence(out)  # block_until_ready is unreliable over the axon tunnel

    t0 = time.perf_counter()
    outs = []
    for r in range(args.reps):  # pipelined: block once at the end
        for q in range(Q):
            outs.append(serve(coord_params, score_params, keys[q],
                              images[q]))
    fence(outs)
    dt = time.perf_counter() - t0
    reloc_per_s = args.reps * Q * B / dt

    last = outs[-Q:]
    R = np.concatenate([np.asarray(o[0]) for o in last])  # (Q*B, 3, 3)
    t = np.concatenate([np.asarray(o[1]) for o in last])

    if args.export_poses:
        from dsac_tpu.data.seven_scenes import write_pose_file
        translation_m = getattr(getattr(source, "ds", None),
                                "translation", None)
        pose_dir = Path(args.export_poses)
        pose_dir.mkdir(parents=True, exist_ok=True)
        # only the DISTINCT frames (the staged queue wraps around the
        # source; duplicates would mint pose files for frame indices
        # that don't exist in the dataset), like the single-chip path
        n_distinct = min(len(source), len(frames)) if source else \
            len(frames)
        for i in range(n_distinct):
            write_pose_file(pose_dir / f"frame-{i:06d}.pose.txt",
                            R[i], t[i], translation_m)
        print(green(f"Exported {n_distinct} poses to {pose_dir}"))

    acc = None
    if have_gt:
        from dsac_tpu.geometry.loss import pose_errors
        from dsac_tpu.geometry.pose import Pose
        gt_R = jnp.asarray(np.stack([np.asarray(f.pose.R) for f in frames]))
        gt_t = jnp.asarray(np.stack([np.asarray(f.pose.t) for f in frames]))
        rot_err, t_err = pose_errors(Pose(jnp.asarray(R), jnp.asarray(t)),
                                     Pose(gt_R, gt_t))
        acc = float(np.mean(np.asarray((rot_err < 5.0) & (t_err < 50.0))))

    print(json.dumps({
        "metric": "serve_relocalizations_per_s",
        "value": round(reloc_per_s, 2),
        "unit": f"frames/s (H={cfg.pose.num_hypotheses}, "
                f"mesh {dict(mesh.shape)}, queue {Q} x batch {B})",
        "accuracy_5cm5deg": acc,
        "backend": jax.default_backend(),
        "mesh": args.mesh,
        **({"variant": "softam"} if args.softam else {}),
    }))
    return reloc_per_s


def main(argv=None):
    p = common.make_parser(__doc__)
    p.add_argument("--model", choices=["endtoend", "best", "init", "none"],
                   default="endtoend")
    p.add_argument("--softam", action="store_true",
                   help="serve the soft-argmax variant (softmax-weighted "
                        "pool average refined; cnn_softam.h:960-1180) "
                        "with the same fast kernels — loads the softam "
                        "checkpoints")
    p.add_argument("--batch", type=int, default=8,
                   help="frames per vmapped serve batch (MXU utilisation)")
    p.add_argument("--queue", type=int, default=8,
                   help="batches fused into one lax.scan dispatch")
    p.add_argument("--reps", type=int, default=3,
                   help="timing repetitions over the staged queue")
    p.add_argument("--export-poses", type=str, default=None,
                   help="write estimated poses as 7-Scenes pose files")
    p.add_argument("--fused-refine", action="store_true", default=None,
                   help="fused Pallas IRLS winner refinement (default on "
                        "TPU)")
    p.add_argument("--verify-topk", type=int, default=0,
                   help="refine the K best-scored hypotheses and serve "
                        "the max-inlier-consensus one (robust to score "
                        "misdraws on OOD frames; 0 = winner only)")
    p.add_argument("--fused-scoring", action="store_true",
                   help="score with the fused reprojection+soft-inlier "
                        "kernel instead of the score CNN (the very-"
                        "large-H regime: the (H, N) surface never "
                        "materialises in HBM)")
    p.add_argument("--two-phase-sampling", action="store_true",
                   help="resample-only-failures hypothesis sampling: one "
                        "P3P attempt per lane, then only failed lanes "
                        "(budget H/8, PoseConfig.two_phase_budget) "
                        "re-solve at full --attempts depth. Restores the "
                        "reference's retry-until-valid semantics "
                        "(core/cnn.h:1079-1129) at ~1/5 the solves; a "
                        "TRAINED coordinate net is assumed — with a cold "
                        "net, lanes beyond the budget stay flagged "
                        "invalid (graceful pool degradation, no "
                        "fixed-depth fallback)")
    p.add_argument("--two-phase-budget", type=float, default=None,
                   help="fraction of the pool re-solved at full depth in "
                        "phase 2 (PoseConfig.two_phase_budget, default "
                        "0.125; 0.0625 measured at H=16k: 45.0 reloc/s "
                        "= 2x the fixed path)")
    p.add_argument("--attempts", type=int, default=None,
                   help="P3P candidate minimal sets per hypothesis "
                        "(default PoseConfig.sample_attempts=16, the "
                        "bounded analogue of the reference's retry loop, "
                        "core/cnn.h:1079-1129). Sampling dominates the "
                        "large-H serve cost; big pools tolerate fewer "
                        "attempts because pool redundancy replaces "
                        "per-hypothesis retries (BASELINE.md)")
    args, cfg, strings = common.parse_with_flags(p, argv)
    if args.attempts is not None or args.two_phase_budget is not None:
        import dataclasses
        over = {}
        if args.attempts is not None:
            over["sample_attempts"] = args.attempts
        if args.two_phase_budget is not None:
            over["two_phase_budget"] = args.two_phase_budget
        cfg = dataclasses.replace(cfg, pose=dataclasses.replace(
            cfg.pose, **over))

    if args.fused_refine is None:
        args.fused_refine = jax.default_backend() == "tpu"
    if args.softam and args.verify_topk:
        print(blue("NOTE: --verify-topk is a no-op with --softam (the "
                   "soft-argmax average IS the served pose; there is no "
                   "pool selection to verify)."))
        args.verify_topk = 0

    source = common.frame_source(args, cfg, "test")
    coord_net, score_net, coord_apply, score_apply = common.build_models(
        args, cfg)
    cam = cfg.data.camera()
    grid = cfg.net.subsample_size
    sample = source.get(0)

    coord_params, _, score_params, use_score_net = common.load_eval_params(
        args, cfg, coord_net, score_net, sample, softam=args.softam,
        strings=strings)
    if use_score_net:
        score_fn = lambda dm: score_apply(score_params, dm)
    else:
        print(blue("Scoring with the soft-inlier head."))
        score_fn = common.soft_inlier_score_fn(cfg)

    # ---- stage the frame queue on device: (queue, batch, H, W, 3) ----
    B, Q = args.batch, args.queue
    n = min(len(source), B * Q)
    frames = [source.get(i % len(source)) for i in range(B * Q)]
    images = jnp.asarray(np.stack([f.rgb for f in frames])
                         .reshape(Q, B, *frames[0].rgb.shape))
    have_gt = all(f.pose is not None for f in frames)

    if args.mesh:
        return _serve_mesh(args, cfg, cam, coord_net, coord_apply,
                           coord_params, score_params, score_apply,
                           use_score_net, images, frames, have_gt,
                           source=source)

    serve_batch = functools.partial(
        process_frames_batched,
        coord_fn=lambda img, pix: coord_apply(coord_params, img, pix),
        score_fn=score_fn, cam=cam, cfg=cfg, refine_all=False,
        fused_refine=args.fused_refine,
        fused_sampling=("two_phase" if args.two_phase_sampling
                        else args.fused_refine),  # same backend gate
        scoring="fused_soft" if args.fused_scoring else "cnn",
        verify_topk=args.verify_topk, softam=args.softam)

    @jax.jit
    def serve_queue(key, q_images):
        def body(_, xs):
            k, imgs = xs
            res = serve_batch(jax.random.split(k, B), imgs)
            return None, (res.final.R, res.final.t)

        _, (R, t) = jax.lax.scan(body, None,
                                 (jax.random.split(key, Q), q_images))
        return R, t

    print(blue(f"Serving {B * Q} staged frames ({n} distinct), "
               f"queue {Q} x batch {B}, "
               f"refine={'fused' if args.fused_refine else 'jnp'} ..."))
    out = serve_queue(jax.random.PRNGKey(args.seed), images)  # compile
    fence(out)  # block_until_ready is unreliable over the axon tunnel
    t0 = time.perf_counter()
    for r in range(args.reps):
        out = serve_queue(jax.random.PRNGKey(args.seed + r), images)
    fence(out)
    dt = time.perf_counter() - t0
    reloc_per_s = args.reps * Q * B / dt

    R, t = np.asarray(out[0]).reshape(Q * B, 3, 3), \
        np.asarray(out[1]).reshape(Q * B, 3)

    acc = None
    if have_gt:
        from dsac_tpu.geometry.loss import pose_errors
        from dsac_tpu.geometry.pose import Pose
        gt_R = jnp.asarray(np.stack([np.asarray(f.pose.R) for f in frames]))
        gt_t = jnp.asarray(np.stack([np.asarray(f.pose.t) for f in frames]))
        rot_err, t_err = pose_errors(Pose(jnp.asarray(R), jnp.asarray(t)),
                                     Pose(gt_R, gt_t))
        acc = float(np.mean(np.asarray((rot_err < 5.0) & (t_err < 50.0))))

    if args.export_poses:
        from dsac_tpu.data.seven_scenes import write_pose_file
        translation_m = getattr(getattr(source, "ds", None),
                                "translation", None)
        pose_dir = Path(args.export_poses)
        pose_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            write_pose_file(pose_dir / f"frame-{i:06d}.pose.txt",
                            R[i], t[i], translation_m)
        print(green(f"Exported {n} poses to {pose_dir}"))

    print(json.dumps({
        "metric": "serve_relocalizations_per_s",
        "value": round(reloc_per_s, 2),
        "unit": f"frames/s (H={cfg.pose.num_hypotheses}, "
                f"queue {Q} x batch {B})",
        "accuracy_5cm5deg": acc,
        "backend": jax.default_backend(),
        **({"variant": "softam"} if args.softam else {}),
    }))
    return reloc_per_s


if __name__ == "__main__":
    main()
