"""Multi-PROCESS distributed dryrun: 2 processes x 4 CPU devices.

The single-process CPU farm (`__graft_entry__.dryrun_multichip`) virtualises
8 devices inside one process — it validates collective layouts but can
never see cross-process bugs: global-array assembly from process-local
shards, device ordering across hosts, multiprocess orbax checkpoint
coordination, process-local data feeding.  This script is the genuinely
multi-process twin (SURVEY.md §2.3 "frame/data parallelism across hosts"
— the 'data' mesh axis spans the two processes, exactly how it would
span hosts over DCN).

Run:  python scripts/dryrun_multiprocess.py           (launcher)
      python scripts/dryrun_multiprocess.py --proc I --coord HOST:PORT
                                                       (one worker)

Gates (reduced shapes — full-scale shapes are covered by the
single-process dryrun; what is under test here is the process boundary):
  1. sharded e2e TRAIN step on a (data=2, hyp=4) mesh with process-local
     frame feeding (each process renders and feeds ONLY its own frames
     via jax.make_array_from_process_local_data) — finite loss, params
     updated, loss identical on both processes;
  2. EXACT equivalence oracle: the cross-process sharded expected loss
     equals the collective-free same-draw emulation
     (parallel/sharded.py:emulated_expected_loss) at two operating
     points — biased coordinates (large loss) and unbiased (small);
  3. sharded SERVE: each process reads back its addressable output
     shards, poses localize against GT;
  4. FUSED sharded serve (SoA P3P sampler + Pallas IRLS, interpreted on
     CPU) — same check;
  5. multiprocess orbax: save the replicated params from all processes,
     restore them on the same mesh, trees bit-equal.

Worker 0 writes results/multiprocess_dryrun.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import pathlib
import re
import socket
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
N_PROCS = 2
DEVS_PER_PROC = 4


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------

def worker(proc: int, coord: str) -> dict:
    # force an isolated 4-device CPU backend BEFORE any jax device use;
    # strip any inherited device-count flag (e.g. from the test harness)
    flags = os.environ.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={DEVS_PER_PROC}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=N_PROCS, process_id=proc)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dsac_tpu.config import DataConfig, DSACConfig, PoseConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.geometry.loss import pose_errors
    from dsac_tpu.geometry.pose import Pose
    from dsac_tpu.models import DenseCoordNet, ScoreNet
    from dsac_tpu.models.coord_net import gather_dense_coords
    from dsac_tpu.ops import soft_inlier_scores
    from dsac_tpu.parallel import (make_mesh, sharded_e2e_step,
                                   sharded_expected_loss,
                                   sharded_serve_step)
    from dsac_tpu.parallel.sharded import (banded_dense_coords,
                                           emulated_expected_loss)
    from dsac_tpu.utils import checkpoint as ckpt

    assert jax.process_count() == N_PROCS
    assert jax.local_device_count() == DEVS_PER_PROC
    assert jax.device_count() == N_PROCS * DEVS_PER_PROC
    n_data, n_hyp = 2, 4
    mesh = make_mesh(n_data, n_hyp)
    # the 'data' axis must span the process boundary (the DCN analogue) —
    # otherwise the gates degenerate to per-process runs
    procs_on_data = {d.process_index for d in mesh.devices[:, 0]}
    assert procs_on_data == {0, 1}, procs_on_data

    W, H = 320, 240
    cfg = DSACConfig(
        data=DataConfig(image_width=W, image_height=H, focal_length=260.0),
        pose=PoseConfig(num_hypotheses=64))
    scene = SyntheticScene(width=W, height=H, focal=260.0)
    cam = scene.camera
    report: dict = {"metric": "multiprocess_dryrun", "procs": N_PROCS,
                    "devices": jax.device_count(),
                    "mesh": {"data": n_data, "hyp": n_hyp}}

    # ---- process-local frame feeding ------------------------------------
    # frames are data-sharded: rows owned by this process are rendered
    # HERE and only here; the global arrays are assembled from the
    # process-local shards (this is the cross-host data-loading pattern)
    B = n_data
    my_rows = [i for i in range(B)
               if mesh.devices[i % n_data, 0].process_index == proc]
    frames, Rs, ts = [], [], []
    for i in my_rows:
        pose, rgb, _depth, _coords = scene.frame(jax.random.PRNGKey(i))
        frames.append(np.asarray(rgb))
        Rs.append(np.asarray(pose.R))
        ts.append(np.asarray(pose.t))
    keys_all = jax.random.split(jax.random.PRNGKey(0), B)
    data_sh = NamedSharding(mesh, P("data"))

    def feed(local_np):
        return jax.make_array_from_process_local_data(
            data_sh, np.ascontiguousarray(local_np))

    images = feed(np.stack(frames))
    gt_R = feed(np.stack(Rs))
    gt_t = feed(np.stack(ts))
    keys = feed(np.asarray(keys_all)[my_rows])

    # ---- gate 1: cross-process sharded training step --------------------
    coord_net = DenseCoordNet(width=16)
    score_net = ScoreNet(width_mult=0.5)

    def coord_apply(params, image, pix):
        apply_full = lambda img: coord_net.apply(params, img[None])[0]
        cmap = banded_dense_coords(apply_full, image, n_shards=n_hyp,
                                   margin=24)
        return gather_dense_coords(cmap, pix, stride=8)

    score_apply = lambda params, dm: score_net.apply(params, dm)

    cp = coord_net.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, H, W, 3), jnp.float32))
    sp = score_net.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))
    c_opt = optax.sgd(1e-5, momentum=0.9)
    s_opt = optax.sgd(1e-7, momentum=0.9)
    step = sharded_e2e_step(mesh, coord_apply, score_apply, cam, cfg,
                            c_opt, s_opt, coord_collective=True,
                            refine_mode="implicit_jnp")
    t0 = time.time()
    out = step(cp, sp, c_opt.init(cp), s_opt.init(sp), keys, images,
               gt_R, gt_t)
    jax.block_until_ready(out)
    loss = float(out[4])  # replicated -> readable on every process
    assert loss == loss and loss < 1e6, loss
    delta = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(jnp.sum(jnp.abs(ab[0] - ab[1]))),
        jax.tree.map(lambda a, b: (a, b), out[0], cp), 0.0)
    assert delta > 0.0, "sharded step did not update params"
    report["train_step"] = {"loss": loss, "param_delta": delta,
                            "seconds": round(time.time() - t0, 1)}
    print(f"[proc {proc}] gate 1 train step: loss={loss:.3f} OK",
          flush=True)

    # ---- gate 2: exact cross-process equivalence oracle ------------------
    # deterministic renders: BOTH processes can rebuild all GT maps for
    # the emulation; the sharded program still gets only local shards
    maps_all, gtR_all, gtt_all = [], [], []
    for i in range(B):
        pose, _rgb, _depth, coords = scene.frame(jax.random.PRNGKey(i))
        maps_all.append(np.asarray(coords))
        gtR_all.append(np.asarray(pose.R))
        gtt_all.append(np.asarray(pose.t))
    maps = feed(np.stack(maps_all)[my_rows])

    def oracle_coord_apply(params, gt_map, pix):
        c = gt_map[pix[:, 1], pix[:, 0]]
        return (c + params["bias"]) / 1000.0

    def soft_score_apply(params, dm):
        return params["gain"] * soft_inlier_scores(
            dm.reshape(dm.shape[0], -1), cfg.pose.inlier_threshold_2d,
            cfg.pose.score_beta)

    sharded_fn = jax.jit(jax.shard_map(
        functools.partial(sharded_expected_loss,
                          coord_apply=oracle_coord_apply,
                          score_apply=soft_score_apply, cam=cam, cfg=cfg,
                          n_hyp_shards=n_hyp),
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False))

    gt_all = Pose(jnp.asarray(np.stack(gtR_all)),
                  jnp.asarray(np.stack(gtt_all)))
    report["oracle"] = []
    for bias, lo, hi in [(np.asarray([120.0, -90.0, 60.0]), 5.0, 1e6),
                         (np.zeros(3), 0.0, 5.0)]:
        cpo = {"bias": jnp.asarray(bias, jnp.float32)}
        spo = {"gain": jnp.asarray(1.0)}
        l_sh = float(sharded_fn(cpo, spo, keys, maps,
                                Pose(gt_R, gt_t))[0])
        # collective-free single-device emulation over ALL frames
        l_em = float(np.mean([
            float(emulated_expected_loss(
                keys_all[i], jnp.asarray(maps_all[i]),
                lambda img, pix: oracle_coord_apply(cpo, img, pix),
                lambda dm: soft_score_apply(spo, dm), cam, cfg, n_hyp,
                Pose(gt_all.R[i], gt_all.t[i]))[0])
            for i in range(B)]))
        assert lo < l_sh < hi and lo < l_em < hi, (l_sh, l_em, lo, hi)
        np.testing.assert_allclose(l_sh, l_em, rtol=1e-4, err_msg=(
            f"cross-process sharded {l_sh} != same-draw emulation {l_em}"))
        report["oracle"].append({"bias": bias.tolist(), "sharded": l_sh,
                                 "emulated": l_em})
        print(f"[proc {proc}] gate 2 oracle bias={bias.tolist()}: "
              f"{l_sh:.4f} == {l_em:.4f} OK", flush=True)

    # ---- gates 3+4: sharded serve, plain and fused ------------------------
    serve_cfg = dataclasses.replace(
        cfg, pose=dataclasses.replace(cfg.pose, random_draw=False))
    for gate, kw in ((3, dict()),
                     (4, dict(fused_sampling=True, refine_mode="fused"))):
        serve = sharded_serve_step(mesh, oracle_coord_apply,
                                   soft_score_apply, cam, serve_cfg, **kw)
        R, t, _scores, _ent, _chosen = serve(
            {"bias": jnp.zeros(3)}, {"gain": jnp.asarray(1.0)}, keys, maps)
        # outputs are data-sharded: each process checks ITS shards
        local_R = np.concatenate([np.asarray(s.data)
                                  for s in R.addressable_shards])
        local_t = np.concatenate([np.asarray(s.data)
                                  for s in t.addressable_shards])
        gt_local = Pose(jnp.asarray(np.stack(gtR_all)[my_rows]),
                        jnp.asarray(np.stack(gtt_all)[my_rows]))
        # hyp-axis members hold replicas of the same frame rows: dedupe
        reps = len(local_R) // len(my_rows)
        local_R, local_t = local_R[::reps], local_t[::reps]
        rot_e, t_e = pose_errors(Pose(jnp.asarray(local_R),
                                      jnp.asarray(local_t)), gt_local)
        rot_e, t_e = np.asarray(rot_e), np.asarray(t_e)
        assert np.all(rot_e < 5.0) and np.all(t_e < 50.0), (rot_e, t_e)
        report[f"serve_gate{gate}"] = {
            "max_rot_deg": float(rot_e.max()),
            "max_trans_mm": float(t_e.max())}
        print(f"[proc {proc}] gate {gate} serve"
              f"{' (fused)' if kw else ''}: max err {rot_e.max():.3f} deg"
              f" / {t_e.max():.2f} mm OK", flush=True)

    # ---- gate 5: multiprocess orbax save/restore on the mesh -------------
    ckdir = REPO / "runs" / "mp_dryrun_ckpt"
    # the state deliberately carries a HOST-LOCAL scalar (what every CLI
    # writes as its step counter): checkpoint.save must globalize it —
    # orbax refuses host-local jax.Arrays in a multi-process run
    state = {"params": out[0], "step": jnp.asarray(7, jnp.int32)}
    ckpt.save(ckdir, "mp_state", state, step=7)
    restored = ckpt.restore(ckdir, "mp_state", template=state)
    same = jax.tree_util.tree_all(jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), state, restored))
    assert same, "multiprocess orbax round-trip mismatch"
    report["orbax_roundtrip"] = "bit-equal"
    print(f"[proc {proc}] gate 5 multiprocess orbax round-trip OK",
          flush=True)

    report["ok"] = True
    if proc == 0:
        outp = REPO / "results" / "multiprocess_dryrun.json"
        outp.write_text(json.dumps(report, indent=1) + "\n")
        print(json.dumps({k: report[k] for k in ("metric", "ok", "procs",
                                                 "devices")}), flush=True)
    return report


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------

def launch() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    procs = [subprocess.Popen(
        [sys.executable, "-u", __file__, "--proc", str(i),
         "--coord", coord], env=env) for i in range(N_PROCS)]
    rc = 0
    deadline = time.time() + 900
    try:
        for p in procs:
            rc |= p.wait(timeout=max(5.0, deadline - time.time()))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()  # exact child PIDs only
        print("multiprocess dryrun TIMED OUT", file=sys.stderr)
        return 2
    return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--proc", type=int, default=None)
    ap.add_argument("--coord", type=str, default=None)
    a = ap.parse_args()
    if a.proc is None:
        sys.exit(launch())
    worker(a.proc, a.coord)


if __name__ == "__main__":
    main()
