"""Evaluation over a test split (the reference's test_ransac program).

Mirrors test_ransac.cpp:41-282: per frame, run the full DSAC forward,
measure rotation/translation error of the selected refined pose against
GT, write the per-frame error file and the summary (accuracy@5cm5deg,
mean±σ expected loss, mean±σ entropy, median rot deg, median trans cm).
`--softam` evaluates the soft-argmax variant (test_ransac_softam.cpp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.pipeline import (evaluate_frame, process_frame,
                               process_frame_softam, summarize,
                               verified_selection)
from dsac_tpu.utils.logging import TestLog, blue, green, red
from dsac_tpu.cli import common


def main(argv=None, softam: bool = False):
    p = common.make_parser(__doc__)
    p.add_argument("--softam", action="store_true", default=softam)
    p.add_argument("--model", choices=["endtoend", "best", "init", "none"],
                   default="endtoend",
                   help="which snapshots to evaluate; 'best' prefers the "
                        "validation-selected *_best snapshots that "
                        "train_ransac --validate-every writes (falls "
                        "back to endtoend, then init); 'none' runs the "
                        "soft-inlier scoring head with an untrained or "
                        "init coordinate net")
    p.add_argument("--fused-refine", action="store_true",
                   help="use the fused Pallas IRLS refinement kernel "
                        "(TPU only; ~50x faster eval)")
    p.add_argument("--export-poses", type=str, default=None,
                   help="also write each estimated pose as a 7-Scenes "
                        "4x4 pose file under this directory")
    p.add_argument("--fused-scoring", action="store_true",
                   help="fuse reprojection + soft-inlier scoring in one "
                        "Pallas pass (the 4k-16k hypothesis regime; "
                        "implies soft-inlier scoring, no score CNN)")
    p.add_argument("--refine-variant", choices=["soft", "hard"],
                   default="soft",
                   help="'hard' = reference-faithful hard-threshold "
                        "refinement with the rB=100 cap and <50 abort "
                        "(ablation; core/cnn.h:1186-1204)")
    p.add_argument("--select", choices=["score", "inlier"],
                   default="score",
                   help="winner selection: 'score' = the reference's "
                        "pre-refinement score softmax draw; 'inlier' = "
                        "post-refinement consensus (largest final "
                        "soft-inlier count; robust to overconfident "
                        "score-CNN outliers)")
    args, cfg, strings = common.parse_with_flags(p, argv)

    source = common.frame_source(args, cfg, "test")
    coord_net, score_net, coord_apply, score_apply = common.build_models(
        args, cfg)
    cam = cfg.data.camera()
    grid = cfg.net.subsample_size
    sample = source.get(0)

    # model loading: endtoend > init > random (shared with cli/serve.py)
    coord_params, coord_src, score_params, use_score_net = \
        common.load_eval_params(args, cfg, coord_net, score_net, sample,
                                softam=args.softam, strings=strings)
    if use_score_net:
        score_fn = lambda dm: score_apply(score_params, dm)
    else:
        print(blue("Scoring with the soft-inlier head."))
        score_fn = common.soft_inlier_score_fn(cfg)

    fwd = process_frame_softam if args.softam else process_frame
    extra = ({"refine_mode": "fused" if args.fused_refine else False}
             if args.softam else {"fused_refine": args.fused_refine})
    if not args.softam and args.fused_scoring:
        extra["scoring"] = "fused_soft"
    if not args.softam and args.refine_variant == "hard":
        extra["fused_refine"] = "hard"
    def _fwd(key, image):
        res = fwd(key, image,
                  coord_fn=lambda img, pix: coord_apply(coord_params, img,
                                                        pix),
                  score_fn=score_fn, cam=cam, cfg=cfg, **extra)
        if not args.softam and args.select == "inlier":
            res = verified_selection(res)
        return res

    run = jax.jit(_fwd)

    variant = "softam" if args.softam else "dsac"
    tag = f"{variant}_{args.arch}_{coord_src}_rdraw{int(cfg.pose.random_draw)}"
    if not args.softam and args.select == "inlier":
        tag += "_selinlier"
    if not args.softam and args.refine_variant == "hard":
        tag += "_hardref"
    if not args.softam and args.fused_scoring:
        tag += f"_fusedscore_h{cfg.pose.num_hypotheses}"
    log = TestLog(args.out, tag)

    # scene-centering offset for the exported-pose back-conversion
    # (test_ransac.cpp:206-219 re-reads translation.txt)
    from dsac_tpu.data.seven_scenes import (pose_to_7scenes_vec6,
                                            write_pose_file)
    translation_m = getattr(getattr(source, "ds", None), "translation", None)
    if args.export_poses:
        from pathlib import Path
        pose_dir = Path(args.export_poses)
        pose_dir.mkdir(parents=True, exist_ok=True)

    n = len(source) if args.rounds is None else min(args.rounds, len(source))
    rots, trans, exps, ents = [], [], [], []

    def record(i, expected, ent, winner_loss, est_R, est_t, gt_pose):
        from dsac_tpu.geometry.loss import pose_errors
        from dsac_tpu.geometry.pose import Pose as _Pose
        rot_e, t_e = pose_errors(_Pose(jnp.asarray(est_R),
                                       jnp.asarray(est_t)), gt_pose)
        rot, te = float(rot_e), float(t_e)
        rots.append(rot)
        trans.append(te)
        exps.append(float(expected))
        ents.append(float(ent))
        vec6 = pose_to_7scenes_vec6(np.asarray(est_R), np.asarray(est_t),
                                    translation_m)
        log.frame(float(expected), float(ent), float(winner_loss), te, rot,
                  vec6)
        if args.export_poses:
            write_pose_file(pose_dir / f"frame-{i:06d}.pose.txt",
                            np.asarray(est_R), np.asarray(est_t),
                            translation_m)
        colour = green if (rot < 5.0 and te < 50.0) else red
        print(colour(f"frame {i}: rot {rot:.2f} deg, trans {te:.1f} mm"))

    mesh = common.parse_mesh(args.mesh)
    if mesh is not None:
        # batched mesh evaluation: frames over 'data', the hypothesis
        # pool (refined in full, as the reference's test loop does) over
        # 'hyp'; winner selection is argmax (the -rdraw 0 convention)
        from dsac_tpu.parallel.mesh import DATA_AXIS, HYP_AXIS
        from dsac_tpu.parallel.pretrain import sharded_eval_step
        from jax.sharding import NamedSharding, PartitionSpec
        n_data, n_hyp = mesh.shape[DATA_AXIS], mesh.shape[HYP_AXIS]
        if cfg.pose.num_hypotheses % n_hyp:
            raise SystemExit(f"-rI {cfg.pose.num_hypotheses} not divisible"
                             f" by hyp axis {n_hyp}")
        if cfg.pose.random_draw:
            print(blue("NOTE: --mesh evaluation selects by argmax "
                       "(evaluate with -rdraw 0 for parity)."))
        # modes the sharded eval body does not implement must fail
        # loudly, not silently run something else under the same tag
        unsupported = [flag for flag, on in [
            ("--fused-scoring", args.fused_scoring),
            ("--select inlier", args.select == "inlier"),
            ("--refine-variant hard", args.refine_variant == "hard"),
        ] if on]
        if unsupported:
            raise SystemExit(f"--mesh evaluation does not support "
                             f"{', '.join(unsupported)}; run them "
                             "single-chip, or use cli/serve.py --mesh "
                             "for fused-scoring throughput runs")
        capply, coord_collective = common.mesh_coord_apply(
            args, coord_net, coord_apply, n_hyp)
        if use_score_net:
            sapply = score_apply
        else:
            soft_fn = common.soft_inlier_score_fn(cfg)
            sapply = lambda params, dm: soft_fn(dm)
            score_params = {}
        step = sharded_eval_step(
            mesh, capply, sapply, cam, cfg,
            coord_collective=coord_collective,
            refine_mode=("fused" if args.fused_refine else "auto"),
            softam=args.softam)
        rep = NamedSharding(mesh, PartitionSpec())
        coord_params, score_params = jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), rep),
            (coord_params, score_params))
        for b0 in range(0, n, n_data):
            idx = [min(b0 + j, n - 1) for j in range(n_data)]  # pad tail
            fs = [source.get(i) for i in idx]
            keys = jnp.stack([jax.random.PRNGKey(args.seed * 131 + i)
                              for i in idx])
            imgs = jnp.asarray(np.stack([f.rgb for f in fs]))
            gR = jnp.asarray(np.stack([np.asarray(f.pose.R) for f in fs]))
            gT = jnp.asarray(np.stack([np.asarray(f.pose.t) for f in fs]))
            exp_b, ent_b, wl_b, R_b, t_b = step(coord_params, score_params,
                                                keys, imgs, gR, gT)
            for j in range(n_data):
                i = b0 + j
                if i >= n:
                    break
                record(i, np.asarray(exp_b)[j], np.asarray(ent_b)[j],
                       np.asarray(wl_b)[j], np.asarray(R_b)[j],
                       np.asarray(t_b)[j], fs[j].pose)
    else:
        for i in range(n):
            f = source.get(i)
            res = run(jax.random.PRNGKey(args.seed * 131 + i),
                      image=jnp.asarray(f.rgb))
            ev = evaluate_frame(res, f.pose)
            record(i, ev.expected_loss, ev.entropy,
                   ev.losses[int(res.chosen)], res.final.R, res.final.t,
                   f.pose)

    stats = summarize(np.asarray(rots), np.asarray(trans),
                      np.asarray(exps), np.asarray(ents))
    log.summary(stats)
    log.close()
    print(green(
        f"accuracy@5cm5deg {stats['accuracy_5cm5deg']*100:.1f}%  "
        f"median rot {stats['median_rot_err_deg']:.2f} deg  "
        f"median trans {stats['median_trans_err_cm']:.2f} cm"))
    return stats


if __name__ == "__main__":
    main()
