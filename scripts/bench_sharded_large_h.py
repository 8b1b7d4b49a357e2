"""Hypothesis-sharded serving at H=16k on a mesh (BASELINE config 4).

BASELINE.md's very-large-H rows are single-chip; this script evidences
the "runs multi-chip" claim for the 4k-16k regime: H=16384 serving with
the pool sharded over the mesh's 'hyp' axis (parallel/sharded.py:
sharded_serve_step — local sampling/scoring per shard, collective
softmax + argmax across shards), checked for correctness against GT and
timed against the identical program on ONE device of the same backend.

Real multi-chip hardware is not reachable from this box, so the run
uses the virtual 8-device CPU farm (like tests/ and the driver's
dryrun): the CORRECTNESS evidence is exact; the timing is a farm-
relative scaling indication only (8 virtual devices share the host's
cores — per-chip speed claims stay with the single-chip TPU rows).

Usage:  python scripts/bench_sharded_large_h.py [H] [B]
Writes results/sharded_large_h.json and prints one JSON line.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from dsac_tpu.config import DSACConfig, PoseConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.geometry.loss import pose_errors
    from dsac_tpu.geometry.pose import Pose
    from dsac_tpu.ops import soft_inlier_scores
    from dsac_tpu.parallel import make_mesh, sharded_serve_step

    cfg = DSACConfig(pose=PoseConfig(num_hypotheses=H, sample_attempts=4,
                                     random_draw=False))
    scene = SyntheticScene()
    cam = scene.camera

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    maps, Rs, ts = [], [], []
    for i in range(B):
        pose, _rgb, _d, coords = scene.frame(jax.random.PRNGKey(50 + i))
        maps.append(coords)
        Rs.append(pose.R)
        ts.append(pose.t)
    maps = jnp.stack(maps)
    gt = Pose(jnp.stack(Rs), jnp.stack(ts))

    def oracle_coord_apply(params, gt_map, pix):
        return (gt_map[pix[:, 1], pix[:, 0]] + params["bias"]) / 1000.0

    def soft_score_apply(params, dm):
        return params["gain"] * soft_inlier_scores(
            dm.reshape(dm.shape[0], -1), cfg.pose.inlier_threshold_2d,
            cfg.pose.score_beta)

    cp = {"bias": jnp.zeros(3)}
    sp = {"gain": jnp.asarray(1.0)}

    # sync through timing.fence, not block_until_ready: reliable on CPU
    # too, and this script is the template for the real multi-chip run
    # where block_until_ready RETURNS EARLY on the axon backend
    # (CLAUDE.md measurement-integrity note)
    from dsac_tpu.utils.timing import fence

    def run(n_hyp_shards, reps=3):
        mesh = make_mesh(1, n_hyp_shards)
        serve = sharded_serve_step(mesh, oracle_coord_apply,
                                   soft_score_apply, cam, cfg)
        out = serve(cp, sp, keys, maps)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = serve(cp, sp, keys, maps)
            fence(out)
        dt = (time.perf_counter() - t0) / reps
        R, t, _scores, ent, _chosen = out
        rot_e, t_e = pose_errors(Pose(R, t), gt)
        return dt, np.asarray(rot_e), np.asarray(t_e), np.asarray(ent)

    dt8, rot8, t8, ent8 = run(8)
    assert np.all(rot8 < 5.0) and np.all(t8 < 50.0), (rot8, t8)
    dt1, rot1, t1, _ = run(1)
    assert np.all(rot1 < 5.0) and np.all(t1 < 50.0), (rot1, t1)

    rec = {
        "metric": "sharded_serve_large_h",
        "H": H,
        "frames": B,
        "mesh": {"data": 1, "hyp": 8},
        "backend": "cpu_farm_8dev",
        "correct_frames": int(np.sum((rot8 < 5.0) & (t8 < 50.0))),
        "max_rot_deg": float(rot8.max()),
        "max_trans_mm": float(t8.max()),
        "entropy_bits": [float(e) for e in ent8],
        "wall_s_per_batch_hyp8": round(dt8, 3),
        "wall_s_per_batch_hyp1": round(dt1, 3),
        "farm_speedup_8shards": round(dt1 / dt8, 2),
        "note": "correctness exact; timing is farm-relative only (8 "
                "virtual devices share the host cores)",
    }
    out = pathlib.Path(__file__).resolve().parents[1] / "results" / \
        "sharded_large_h.json"
    out.write_text(json.dumps(rec, indent=1) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
