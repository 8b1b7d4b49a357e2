"""Multi-keyframe bundle adjustment over served DSAC poses.

No reference counterpart — the reference is strictly single-frame
(test_ransac.cpp:104-240 serves every frame independently).  This
program surfaces the rebuild's config-5 capability: serve K keyframes
with the DSAC pipeline, data-associate their predicted scene
coordinates into shared 3D points (voxel merge — scene-coordinate
regression gives metric correspondences for free), and jointly refine
all K poses + M points with the Schur-complement bundle adjustment
(parallel/ba.py), weighting each observation by the serve stage's
soft-inlier confidence.  Reports pose error vs GT before/after and the
weighted reprojection RMSE drop as one JSON line.

With --mesh DxH the observations are partitioned by keyframe over the
'data' axis and the Schur accumulators psum'd (distributed BA); the
hyp axis is unused here.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.cli import common
from dsac_tpu.geometry.gn import soft_inlier_weights
from dsac_tpu.geometry.loss import pose_errors
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.geometry.projection import project
from dsac_tpu.parallel.ba import BAProblem, bundle_adjust
from dsac_tpu.pipeline.forward import process_frame
from dsac_tpu.utils.logging import blue, green


def _serve_keyframes(args, cfg, cam, coord_apply, coord_params, score_fn,
                     frames):
    """Serve each keyframe -> (poses, coords (K,N,3) mm, pix, weights)."""
    on_tpu = jax.default_backend() == "tpu"
    run = jax.jit(functools.partial(
        process_frame,
        coord_fn=lambda img, pix: coord_apply(coord_params, img, pix),
        score_fn=score_fn, cam=cam, cfg=cfg, refine_all=False,
        fused_refine=on_tpu, fused_sampling=on_tpu,
        verify_topk=args.verify_topk))

    R, t, coords, pix, weights = [], [], [], [], []
    for i, f in enumerate(frames):
        res = run(jax.random.PRNGKey(args.seed + i), jnp.asarray(f.rgb))
        p = res.final
        pxf = res.sampling.reshape(-1, 2).astype(jnp.float32)
        err = jnp.linalg.norm(project(p, res.coords, cam) - pxf, axis=-1)
        w = soft_inlier_weights(err, cfg.pose.inlier_threshold_2d,
                                cfg.pose.inlier_beta)
        R.append(np.asarray(p.R))
        t.append(np.asarray(p.t))
        coords.append(np.asarray(res.coords))
        pix.append(np.asarray(pxf))
        weights.append(np.asarray(w))
    return (Pose(jnp.asarray(np.stack(R)), jnp.asarray(np.stack(t))),
            np.stack(coords), np.stack(pix), np.stack(weights))


def relative_pose_errors(est: Pose, gt: Pose):
    """Median-friendly pairwise relative errors (gauge-invariant).

    For every ordered pair (i, j): the relative transform
    T_ij = T_i ∘ T_j⁻¹ compared against ground truth's.  Returns
    (rot_deg (P,), trans_mm (P,)) over all i<j pairs.
    """
    R = np.asarray(est.R)
    t = np.asarray(est.t)
    Rg = np.asarray(gt.R)
    tg = np.asarray(gt.t)
    K = R.shape[0]
    rot, trans = [], []
    for i in range(K):
        for j in range(i + 1, K):
            Rij = R[i] @ R[j].T
            tij = t[i] - Rij @ t[j]
            Gij = Rg[i] @ Rg[j].T
            gij = tg[i] - Gij @ tg[j]
            dR = Rij @ Gij.T
            ang = np.degrees(np.arccos(
                np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)))
            rot.append(ang)
            trans.append(float(np.linalg.norm(tij - gij)))
    return np.asarray(rot), np.asarray(trans)


def associate_voxels(coords_mm: np.ndarray, weights: np.ndarray,
                     voxel_mm: float):
    """Merge per-frame predicted coordinates into shared 3D points.

    coords_mm (K, N, 3) -> (points (M, 3) weighted-mean init,
    point_idx (K*N,) int32).  Observations whose predicted coordinates
    fall in the same voxel are treated as views of one scene point —
    the data association a feature-matching SfM front end would
    provide, obtained directly from scene-coordinate regression.
    """
    K, N, _ = coords_mm.shape
    flat = coords_mm.reshape(-1, 3)
    keys = np.floor(flat / voxel_mm).astype(np.int64)
    _, point_idx, counts = np.unique(keys, axis=0, return_inverse=True,
                                     return_counts=True)
    M = counts.shape[0]
    w = np.maximum(weights.reshape(-1), 1e-6)
    wsum = np.zeros(M)
    points = np.zeros((M, 3))
    np.add.at(wsum, point_idx, w)
    np.add.at(points, point_idx, w[:, None] * flat)
    points /= wsum[:, None]
    return points, point_idx.astype(np.int32)


def main(argv=None):
    p = common.make_parser(__doc__)
    p.add_argument("--model", choices=["endtoend", "best", "init", "none"],
                   default="endtoend")
    p.add_argument("--keyframes", type=int, default=8)
    p.add_argument("--voxel-mm", type=float, default=30.0,
                   help="data-association voxel size; keep near the "
                        "coordinate noise scale — larger voxels merge "
                        "physically distinct points and corrupt the "
                        "structure")
    p.add_argument("--ba-iters", type=int, default=10)
    p.add_argument("--ba-damping", type=float, default=1e-3)
    p.add_argument("--point-prior", type=float, default=0.01,
                   help="soft prior (px^2/mm^2) anchoring points to "
                        "their scene-coordinate-regressed positions; "
                        "fixes the gauge in the ABSOLUTE scene frame "
                        "(0 = freeze pose 0 instead)")
    p.add_argument("--verify-topk", type=int, default=0)
    p.add_argument("--grid", type=int, default=None,
                   help="subsample grid per keyframe (GxG points; default "
                        "cfg.net.subsample_size). BA pays off when "
                        "per-frame information is scarce — a full 40x40 "
                        "grid already saturates the coordinate CNN's "
                        "precision per frame")
    args, cfg, strings = common.parse_with_flags(p, argv)
    if args.grid:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, net=dataclasses.replace(cfg.net,
                                         subsample_size=args.grid))
    if args.rounds is not None:
        args.keyframes = args.rounds

    if not args.data and not args.synthetic:
        args.synthetic = args.keyframes
    source = common.frame_source(args, cfg)
    coord_net, score_net, coord_apply, score_apply = common.build_models(
        args, cfg)
    cam = cfg.data.camera()
    frames = [source.get(i) for i in range(min(len(source),
                                               args.keyframes))]
    K = len(frames)

    coord_params, coord_src, score_params, use_score_net = \
        common.load_eval_params(args, cfg, coord_net, score_net, frames[0],
                                strings=strings)
    if args.grid:
        use_score_net = False  # the score CNN is 40x40-specific
    if use_score_net:
        score_fn = lambda dm: score_apply(score_params, dm)
    else:
        print(blue("Scoring with the soft-inlier head."))
        score_fn = common.soft_inlier_score_fn(cfg)

    print(blue(f"Serving {K} keyframes ({coord_src} weights) ..."))
    served, coords, pix, weights = _serve_keyframes(
        args, cfg, cam, coord_apply, coord_params, score_fn, frames)

    points0, point_idx = associate_voxels(coords, weights, args.voxel_mm)
    M = points0.shape[0]
    O = point_idx.shape[0]
    frame_idx = np.repeat(np.arange(K, dtype=np.int32),
                          coords.shape[1])
    shared = int((np.bincount(point_idx, minlength=M) > 1).sum())
    print(blue(f"Associated {O} observations into {M} points "
               f"({shared} observed 2+ times, voxel {args.voxel_mm} mm)."))

    prob = BAProblem(
        poses=served,
        points=jnp.asarray(points0, jnp.float32),
        frame_idx=jnp.asarray(frame_idx),
        point_idx=jnp.asarray(point_idx),
        uv=jnp.asarray(pix.reshape(-1, 2), jnp.float32),
        weights=jnp.asarray(weights.reshape(-1), jnp.float32))

    def wrmse(poses, points):
        pred = project(Pose(poses.R[prob.frame_idx],
                            poses.t[prob.frame_idx]),
                       points[prob.point_idx][:, None], cam)[:, 0]
        e2 = jnp.sum((pred - prob.uv) ** 2, axis=-1)
        return float(jnp.sqrt(jnp.sum(prob.weights * e2)
                              / jnp.sum(prob.weights)))

    rmse0 = wrmse(served, prob.points)
    if args.mesh:
        # distributed BA: observations partitioned by keyframe over
        # 'data' (frame-major layout -> contiguous per-device blocks),
        # Schur accumulators psum'd (parallel/ba.py)
        from jax.sharding import PartitionSpec as P
        from dsac_tpu.parallel.ba import distributed_bundle_adjust
        from dsac_tpu.parallel.mesh import DATA_AXIS
        mesh = common.parse_mesh(args.mesh)
        n_data = mesh.shape[DATA_AXIS]
        if K % n_data:
            raise SystemExit(f"--keyframes {K} not divisible by data "
                             f"axis {n_data}")
        ba = jax.jit(jax.shard_map(
            functools.partial(
                distributed_bundle_adjust, cam=cam, axis_name=DATA_AXIS,
                iters=args.ba_iters, damping=args.ba_damping,
                point_prior=args.point_prior,
                fix_first_pose=(args.point_prior == 0.0)),
            mesh=mesh,
            in_specs=(BAProblem(Pose(P(), P()), P(), P(DATA_AXIS),
                                P(DATA_AXIS), P(DATA_AXIS),
                                P(DATA_AXIS)),),
            out_specs=(Pose(P(), P()), P()),
            check_vma=False,
        ))
    else:
        ba = jax.jit(functools.partial(
            bundle_adjust, cam=cam, iters=args.ba_iters,
            damping=args.ba_damping, point_prior=args.point_prior,
            fix_first_pose=(args.point_prior == 0.0)))
    poses_ba, points_ba = ba(prob)
    rmse1 = wrmse(poses_ba, points_ba)

    rec = {"metric": "ba_weighted_reproj_rmse_px",
           "keyframes": K, "points": M, "observations": O,
           "before": round(rmse0, 4), "after": round(rmse1, 4),
           "iters": args.ba_iters}

    have_gt = all(f.pose is not None for f in frames)
    if have_gt:
        gt = Pose(jnp.asarray(np.stack([np.asarray(f.pose.R)
                                        for f in frames])),
                  jnp.asarray(np.stack([np.asarray(f.pose.t)
                                        for f in frames])))
        r0, t0 = pose_errors(served, gt)
        r1, t1 = pose_errors(poses_ba, gt)
        rr0, rt0 = relative_pose_errors(served, gt)
        rr1, rt1 = relative_pose_errors(poses_ba, gt)
        rec.update({
            "median_rot_deg_before": round(float(np.median(r0)), 4),
            "median_rot_deg_after": round(float(np.median(r1)), 4),
            "median_trans_mm_before": round(float(np.median(t0)), 3),
            "median_trans_mm_after": round(float(np.median(t1)), 3),
            # gauge-invariant: pairwise relative transforms vs GT.  The
            # absolute metric is entangled with the map gauge (the
            # coordinate CNN's systematic bias defines the anchor);
            # relative geometry is what multi-view consistency improves.
            "median_rel_rot_deg_before": round(float(np.median(rr0)), 4),
            "median_rel_rot_deg_after": round(float(np.median(rr1)), 4),
            "median_rel_trans_mm_before": round(float(np.median(rt0)), 3),
            "median_rel_trans_mm_after": round(float(np.median(rt1)), 3),
        })
        print(green(
            f"BA: reproj {rmse0:.3f} -> {rmse1:.3f} px; median abs "
            f"{np.median(r0):.3f} deg / {np.median(t0):.2f} mm -> "
            f"{np.median(r1):.3f} deg / {np.median(t1):.2f} mm; "
            f"median rel {np.median(rr0):.3f} deg / {np.median(rt0):.2f} "
            f"mm -> {np.median(rr1):.3f} deg / {np.median(rt1):.2f} mm"))
    else:
        print(green(f"BA: reproj {rmse0:.3f} -> {rmse1:.3f} px"))

    print(json.dumps(rec))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "ba_summary.json").write_text(json.dumps(rec, indent=1))
    return rec


if __name__ == "__main__":
    main()
