"""Bundle-adjustment tests: synthetic multi-keyframe problems.

Single-device BA must recover perturbed poses+points; the distributed
(observation-partitioned) version must match it.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dsac_tpu.config import Camera
from dsac_tpu.geometry import Pose, invert, pose_errors, project, so3_exp, \
    transform
from dsac_tpu.parallel.ba import (BAProblem, bundle_adjust,
                                  distributed_bundle_adjust)
from dsac_tpu.parallel.mesh import make_mesh

CAM = Camera.make(525.0, 640, 480)


def make_ba_problem(rng, K=4, M=200, obs_per_frame=150, pose_noise=0.01,
                    point_noise=15.0):
    """K cameras in a ring viewing a shared point cloud."""
    # shared points in a box in front of the origin
    points = np.stack([
        rng.uniform(-1500, 1500, M), rng.uniform(-1000, 1000, M),
        rng.uniform(-500, 500, M)], -1).astype(np.float32)

    poses_R, poses_t, frame_idx, point_idx, uv = [], [], [], [], []
    for k in range(K):
        w = rng.normal(size=3) * 0.1
        R = np.array(so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.array([rng.uniform(-300, 300), rng.uniform(-300, 300),
                      -rng.uniform(2500, 3500)], np.float32)
        pose = Pose(jnp.asarray(R), jnp.asarray(t))
        proj = np.array(project(pose, jnp.asarray(points), CAM))
        vis = ((proj[:, 0] > 10) & (proj[:, 0] < 630) & (proj[:, 1] > 10)
               & (proj[:, 1] < 470))
        vis_ids = np.nonzero(vis)[0]
        take = vis_ids[rng.integers(len(vis_ids), size=obs_per_frame)]
        poses_R.append(R)
        poses_t.append(t)
        frame_idx.extend([k] * obs_per_frame)
        point_idx.extend(take.tolist())
        uv.append(proj[take] + rng.normal(size=(obs_per_frame, 2)) * 0.3)

    gt_poses = Pose(jnp.asarray(np.stack(poses_R)),
                    jnp.asarray(np.stack(poses_t)))
    # perturb everything except pose 0 (the gauge anchor)
    pert_R = [poses_R[0]]
    pert_t = [poses_t[0]]
    for k in range(1, K):
        dw = rng.normal(size=3) * pose_noise
        pert_R.append(np.array(so3_exp(jnp.asarray(dw, jnp.float32)))
                      @ poses_R[k])
        pert_t.append(poses_t[k] + rng.normal(size=3) * point_noise * 2)
    init_poses = Pose(jnp.asarray(np.stack(pert_R), jnp.float32),
                      jnp.asarray(np.stack(pert_t), jnp.float32))
    init_points = jnp.asarray(
        points + rng.normal(size=points.shape) * point_noise, jnp.float32)

    prob = BAProblem(
        poses=init_poses, points=init_points,
        frame_idx=jnp.asarray(frame_idx, jnp.int32),
        point_idx=jnp.asarray(point_idx, jnp.int32),
        uv=jnp.asarray(np.concatenate(uv), jnp.float32),
        weights=jnp.ones(len(frame_idx), jnp.float32))
    return prob, gt_poses, jnp.asarray(points)


def mean_reproj_error(poses, points, prob):
    R = poses.R[prob.frame_idx]
    t = poses.t[prob.frame_idx]
    X = points[prob.point_idx]
    eye = jnp.einsum("oij,oj->oi", R, X) + t
    z = jnp.where(jnp.abs(eye[:, 2]) < 1e-8, -1e-8, eye[:, 2])
    u = -CAM.focal * eye[:, 0] / z + CAM.cx
    v = CAM.focal * eye[:, 1] / z + CAM.cy
    return float(jnp.mean(jnp.linalg.norm(
        prob.uv - jnp.stack([u, v], -1), axis=-1)))


class TestSingleDeviceBA:
    def test_reduces_reprojection_error_and_recovers_poses(self, rng):
        prob, gt_poses, gt_points = make_ba_problem(rng)
        e0 = mean_reproj_error(prob.poses, prob.points, prob)
        poses, points = jax.jit(functools.partial(
            bundle_adjust, cam=CAM, iters=8))(prob)
        e1 = mean_reproj_error(poses, points, prob)
        assert e1 < e0 * 0.2, (e0, e1)
        # fixing only pose 0 leaves the similarity gauge's scale direction
        # free, so GT comparison has a gauge-drift floor; reprojection
        # error above is the sharp criterion
        rot_err, t_err = pose_errors(poses, gt_poses)
        assert float(jnp.max(rot_err)) < 0.6
        assert float(jnp.max(t_err)) < 60.0

    def test_weights_zero_out_outlier_observations(self, rng):
        prob, gt_poses, gt_points = make_ba_problem(rng)
        uv = np.array(prob.uv)
        n = uv.shape[0]
        bad = rng.choice(n, n // 5, replace=False)
        uv[bad] += rng.uniform(50, 200, size=(len(bad), 2))
        w = np.ones(n, np.float32)
        w[bad] = 0.0
        prob2 = prob._replace(uv=jnp.asarray(uv), weights=jnp.asarray(w))
        poses, points = bundle_adjust(prob2, CAM, iters=8)
        rot_err, t_err = pose_errors(poses, gt_poses)
        assert float(jnp.max(rot_err)) < 0.6
        assert float(jnp.max(t_err)) < 60.0


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        prob, gt_poses, gt_points = make_ba_problem(rng, K=4,
                                                    obs_per_frame=152)
        ref_poses, ref_points = bundle_adjust(prob, CAM, iters=5)

        mesh = make_mesh(4, 1)
        # partition observations by frame: each of the 4 'data' shards gets
        # one keyframe's observations (equal counts -> even split)
        order = np.argsort(np.array(prob.frame_idx), kind="stable")
        shuffled = jax.tree.map(lambda x: x[jnp.asarray(order)] if
                                x.ndim >= 1 and x.shape[0] == len(order)
                                else x, prob)

        fn = jax.jit(jax.shard_map(
            functools.partial(distributed_bundle_adjust, cam=CAM,
                              axis_name="data", iters=5),
            mesh=mesh,
            in_specs=(BAProblem(Pose(P(), P()), P(), P("data"), P("data"),
                                P("data"), P("data")),),
            out_specs=(Pose(P(), P()), P()),
            check_vma=False,
        ))
        poses, points = fn(shuffled)
        np.testing.assert_allclose(np.array(poses.R), np.array(ref_poses.R),
                                   atol=5e-4)
        np.testing.assert_allclose(np.array(poses.t), np.array(ref_poses.t),
                                   atol=2.0)
        np.testing.assert_allclose(np.array(points), np.array(ref_points),
                                   atol=2.0)


class TestServeBADemo:
    def test_voxel_association_ba_improves_served_poses(self, rng):
        """The refine_ba program's chain on a noisy oracle: per-frame
        scene-coordinate noise is averaged out by the voxel merge and
        the exact-pixel observations pull the perturbed poses back."""
        from dsac_tpu.cli.refine_ba import associate_voxels
        from dsac_tpu.data.synthetic import SyntheticScene

        scene = SyntheticScene()
        cam = scene.camera
        K = 6
        gt_R, gt_t, sv_R, sv_t, coords, pix = [], [], [], [], [], []
        for k in range(K):
            pose, rgb, depth, cgt = scene.frame(jax.random.PRNGKey(40 + k))
            cgt = np.asarray(cgt)
            ys, xs = np.mgrid[24:456:16, 24:616:16]
            valid = np.abs(cgt[ys, xs]).sum(-1) > 0
            ys, xs = ys[valid], xs[valid]
            take = rng.integers(len(ys), size=400)
            ys, xs = ys[take], xs[take]
            coords.append(cgt[ys, xs] + rng.normal(size=(400, 3)) * 20.0)
            pix.append(np.stack([xs, ys], -1).astype(np.float32))
            gt_R.append(np.asarray(pose.R))
            gt_t.append(np.asarray(pose.t))
            # "served" poses: GT perturbed (the estimate BA must improve)
            dw = rng.normal(size=3) * 0.006
            sv_R.append(np.asarray(so3_exp(jnp.asarray(dw, jnp.float32)))
                        @ gt_R[-1])
            sv_t.append(gt_t[-1] + rng.normal(size=3) * 15.0)

        gt = Pose(jnp.asarray(np.stack(gt_R)), jnp.asarray(np.stack(gt_t)))
        served = Pose(jnp.asarray(np.stack(sv_R)),
                      jnp.asarray(np.stack(sv_t)))
        coords = np.stack(coords)
        weights = np.ones((K, 400), np.float32)
        points0, point_idx = associate_voxels(coords, weights, 60.0)
        shared = (np.bincount(point_idx) > 1).sum()
        assert shared > 50  # the merge must actually associate frames

        prob = BAProblem(
            poses=served, points=jnp.asarray(points0, jnp.float32),
            frame_idx=jnp.asarray(np.repeat(np.arange(K, dtype=np.int32),
                                            400)),
            point_idx=jnp.asarray(point_idx),
            uv=jnp.asarray(np.concatenate(pix)),
            weights=jnp.asarray(weights.reshape(-1)))
        # point-prior gauge: the noisy-but-absolute scene-coordinate
        # points anchor the map, every pose stays GT-comparable
        poses_ba, _ = bundle_adjust(prob, cam, iters=10,
                                    fix_first_pose=False,
                                    point_prior=0.01)

        r0, t0 = pose_errors(served, gt)
        r1, t1 = pose_errors(poses_ba, gt)
        assert float(np.median(np.asarray(t1))) < \
            0.6 * float(np.median(np.asarray(t0))), (t0, t1)
        assert float(np.median(np.asarray(r1))) < \
            float(np.median(np.asarray(r0))), (r0, r1)
