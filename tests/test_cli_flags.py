"""Flags/config parsing, checkpointing, logging, and CLI smoke tests."""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsac_tpu import flags
from dsac_tpu.utils import checkpoint as ckpt
from dsac_tpu.utils.logging import TestLog, TrainingLog
from dsac_tpu.utils.timing import StopWatch, time_jitted


class TestFlags:
    def test_reference_config_line_format(self, tmp_path):
        # the exact 7-Scenes default.config contents (SURVEY.md §2.1)
        cfgfile = tmp_path / "default.config"
        cfgfile.write_text(
            "rI 256\nrRI 8\nrB 100\nrSS 0.01\nrT2D 10\nrT3D 100\n"
            "rdraw 1\nfl 525\nsfl 585\niw 640\nih 480\nrd 1\n")
        values = flags.parse_config_file(cfgfile)
        cfg, strings = flags.build_config(values)
        assert cfg.pose.num_hypotheses == 256
        assert cfg.pose.refinement_steps == 8
        assert cfg.pose.inlier_threshold_2d == 10.0
        assert cfg.pose.random_draw is True
        assert cfg.data.focal_length == 525.0
        assert cfg.data.secondary_focal_length == 585.0
        assert cfg.data.raw_data is True

    def test_cli_overrides_config(self, tmp_path, monkeypatch):
        (tmp_path / "default.config").write_text("rI 256\nfl 525\n")
        monkeypatch.chdir(tmp_path)
        cfg, strings = flags.load(["-rI", "64", "-rdraw", "0"])
        assert cfg.pose.num_hypotheses == 64
        assert cfg.pose.random_draw is False
        assert cfg.data.focal_length == 525.0

    def test_string_flags_passthrough(self):
        cfg, strings = flags.build_config({"omodel": "foo.net", "rI": "8"})
        assert strings["omodel"] == "foo.net"
        assert cfg.pose.num_hypotheses == 8


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "step": jnp.asarray(7)}
        ckpt.save(tmp_path, ckpt.OBJ_INIT, state, step=7)
        template = {"params": {"w": jnp.zeros((2, 3))},
                    "step": jnp.asarray(0)}
        out = ckpt.restore(tmp_path, ckpt.OBJ_INIT, template)
        np.testing.assert_array_equal(np.array(out["params"]["w"]),
                                      np.arange(6.0).reshape(2, 3))
        assert int(out["step"]) == 7
        assert ckpt.latest_step(tmp_path, ckpt.OBJ_INIT) == 7

    def test_multiple_steps_latest_wins(self, tmp_path):
        for s in [1, 2, 3]:
            ckpt.save(tmp_path, ckpt.SCORE_INIT,
                      {"v": jnp.asarray(float(s))}, step=s)
        out = ckpt.restore(tmp_path, ckpt.SCORE_INIT,
                           {"v": jnp.asarray(0.0)})
        assert float(out["v"]) == 3.0


class TestLogging:
    def test_training_log(self, tmp_path):
        log = TrainingLog(tmp_path / "loss.txt")
        log.append(0, 1.5)
        log.append(1, 1.25, {"entropy": 3.0})
        log.close()
        lines = (tmp_path / "loss.txt").read_text().splitlines()
        assert lines[0].split()[0] == "0"
        assert len(lines[1].split()) == 3

    def test_test_log(self, tmp_path):
        log = TestLog(tmp_path, "demo")
        # reference 11-column layout (test_ransac.cpp:221-233)
        log.frame(1.0, 3.0, 2.0, 20.0, 0.5,
                  [0.1, 0.2, 0.3, 1.0, 2.0, 3.0])
        log.summary({"accuracy_5cm5deg": 0.9, "median_rot_err_deg": 1.2,
                     "median_trans_err_cm": 2.5})
        log.close()
        cols = (tmp_path / "ransac_pose_errors_demo.txt").read_text().split()
        assert len(cols) == 11
        assert [float(c) for c in cols[:5]] == [1.0, 3.0, 2.0, 20.0, 0.5]
        s = (tmp_path / "ransac_summary_demo.txt").read_text().split()
        assert float(s[0]) == 0.9

    def test_pose_export_roundtrip(self, tmp_path):
        # the exported 6-vector must agree with write_pose_file +
        # parse_pose_file (the reference's own back-conversion chain,
        # test_ransac.cpp:170-219)
        import numpy as np
        from dsac_tpu.data.seven_scenes import (parse_pose_file,
                                                pose_to_7scenes_vec6,
                                                write_pose_file)
        from dsac_tpu.geometry.rotation import so3_exp

        rng = np.random.default_rng(3)
        R = np.asarray(so3_exp(jnp.asarray(rng.normal(size=3) * 0.7,
                                           jnp.float32)))
        t_mm = rng.normal(size=3) * 2000.0
        offset = np.asarray([1.5, -2.0, 0.25])

        vec6 = pose_to_7scenes_vec6(R, t_mm, offset)
        path = tmp_path / "frame-000000.pose.txt"
        write_pose_file(path, R, t_mm, offset)
        R2, t2_m = parse_pose_file(path, offset)
        # parse(write(pose)) is the identity on the internal pose
        np.testing.assert_allclose(R2, R, atol=1e-5)
        np.testing.assert_allclose(t2_m * 1000.0, t_mm, atol=1e-3)
        # and the vec6 translation equals the file's camera position
        mat = np.loadtxt(path)
        np.testing.assert_allclose(vec6[3:], mat[:3, 3], atol=1e-5)


class TestTiming:
    def test_stopwatch(self):
        sw = StopWatch()
        ms = sw.stop()
        assert 0 <= ms < 1000

    def test_time_jitted(self):
        f = jax.jit(lambda x: x * 2)
        t = time_jitted(f, jnp.ones(8), iters=3, warmup=1)
        assert t > 0

    def test_fence_pytrees(self):
        # fence() is the mandatory sync for all measurements (the axon
        # remote-TPU plugin returns early from block_until_ready); it
        # must accept arbitrary pytrees incl. int leaves, empty arrays,
        # scalars and non-array leaves without dispatch errors
        from dsac_tpu.utils.timing import fence

        fence(jnp.ones((3, 4)))
        fence((jnp.arange(5), {"a": jnp.float32(1.0),
                               "b": jnp.zeros((0, 2)),
                               "c": jnp.array(True)}))
        fence([])  # no leaves
        fence((None, 3.5))  # non-array leaves


@pytest.mark.slow
class TestCliSmoke:
    """End-to-end CLI smoke runs on tiny synthetic workloads."""

    ENV = None

    @classmethod
    def _env(cls):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["DSAC_TPU_FORCE_CPU"] = "1"
        env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
        return env

    def _run(self, module, extra, tmp_path):
        cmd = [sys.executable, "-c",
               "import jax; jax.config.update('jax_platforms','cpu');"
               f"import runpy; import sys; sys.argv=['x'] + {extra!r};"
               f"runpy.run_module('{module}', run_name='__main__')"]
        res = subprocess.run(cmd, env=self._env(), capture_output=True,
                             text=True, timeout=500, cwd=str(tmp_path))
        assert res.returncode == 0, res.stderr[-3000:]
        return res

    def test_train_obj_dense_smoke(self, tmp_path):
        self._run("dsac_tpu.cli.train_obj",
                  ["--synthetic", "2", "--rounds", "3", "--width-mult",
                   "0.125", "--out", str(tmp_path / "out"),
                   "--validate-every", "2", "--validate-frames", "1"],
                  tmp_path)
        assert ckpt.latest_step(tmp_path / "out", ckpt.OBJ_INIT) is not None
        # rT3D validation file: `<update> <valLoss> <valInliers>`
        # (train_obj.cpp:329)
        val = (tmp_path / "out" / "obj_validation_loss.txt").read_text()
        row = val.splitlines()[0].split()
        assert len(row) == 3
        assert 0.0 <= float(row[2]) <= 1.0

    def test_train_obj_dense_s2d_smoke(self, tmp_path):
        """The s2d-stem arch must take the DENSE pretrain/validation path
        (a '== \"dense\"' comparison once routed it into the patch code)."""
        self._run("dsac_tpu.cli.train_obj",
                  ["--synthetic", "2", "--rounds", "3", "--width-mult",
                   "0.125", "--arch", "dense_s2d",
                   "--out", str(tmp_path / "out"),
                   "--validate-every", "2", "--validate-frames", "1"],
                  tmp_path)
        assert ckpt.latest_step(tmp_path / "out", ckpt.OBJ_INIT) is not None

    def test_test_ransac_soft_inlier_smoke(self, tmp_path):
        res = self._run("dsac_tpu.cli.test_ransac",
                        ["--synthetic", "2", "--rounds", "2", "--model",
                         "none", "--width-mult", "0.125", "--out",
                         str(tmp_path / "out"), "-rI", "16"], tmp_path)
        assert "accuracy@5cm5deg" in res.stdout
        files = list((tmp_path / "out").glob("ransac_summary_*.txt"))
        assert len(files) == 1
        # per-frame error file carries the reference's 11 columns incl.
        # the estimated pose (test_ransac.cpp:221-233)
        err = list((tmp_path / "out").glob("ransac_pose_errors_*.txt"))[0]
        assert len(err.read_text().splitlines()[0].split()) == 11

    def test_export_synthetic_dataset_roundtrip(self, tmp_path):
        """Exporter writes a full 7-Scenes-layout scene; the dataset class
        and a CLI driven through --data read it back consistently."""
        import numpy as np

        from dsac_tpu import flags as flagmod
        from dsac_tpu.data.seven_scenes import SevenScenesDataset
        from dsac_tpu.data.synthetic import SyntheticScene

        scene_dir = tmp_path / "scene"
        self._run("dsac_tpu.cli.export_synthetic",
                  ["--out", str(scene_dir), "--train-frames", "2",
                   "--test-frames", "1", "--train-seed", "3",
                   "--test-seed", "99"], tmp_path)
        for sub in ("rgb_noseg", "depth_noseg", "poses"):
            assert len(list((scene_dir / "training" / "synth" / sub)
                            .iterdir())) == 2
            assert len(list((scene_dir / "test" / "synth" / sub)
                            .iterdir())) == 1

        # config round-trip: rd 0 (depth exported registered), f=525
        cfg, _ = flagmod.load(["-c", str(scene_dir / "default.config")])
        assert cfg.data.raw_data is False
        assert cfg.data.focal_length == 525.0

        # pose + GT coords round-trip against the renderer
        ds = SevenScenesDataset(scene_dir / "training" / "synth",
                                config=cfg.data)
        assert np.allclose(ds.translation, [1.5, 0.7, 2.1])
        import jax as _jax
        sc = SyntheticScene()
        pose, rgb, depth, coords = sc.frame(_jax.random.PRNGKey(3 * 100003))
        R, t = ds.get_pose(0)
        assert np.allclose(R, np.asarray(pose.R), atol=1e-5)
        assert np.allclose(t, np.asarray(pose.t), atol=0.5)  # mm
        obj = ds.get_obj(0)
        gt = np.asarray(coords)
        valid = (np.asarray(depth) > 0) & (np.abs(obj).sum(-1) > 0)
        err = np.linalg.norm(obj - gt, axis=-1)[valid]
        assert np.median(err) < 5.0  # mm (u16 depth quantisation)

        # CLI smoke through the --data disk path
        self._run("dsac_tpu.cli.train_obj",
                  ["--data", str(scene_dir / "training" / "synth"),
                   "-c", str(scene_dir / "default.config"),
                   "--rounds", "2", "--width-mult", "0.125",
                   "--out", str(tmp_path / "out")], tmp_path)
        assert ckpt.latest_step(tmp_path / "out", ckpt.OBJ_INIT) is not None

    def test_train_score_smoke(self, tmp_path):
        # fused round path: one dispatch per round, loss finite,
        # score_model_init written
        self._run("dsac_tpu.cli.train_score",
                  ["--synthetic", "2", "--rounds", "3", "--width-mult",
                   "0.125", "--out", str(tmp_path / "out")], tmp_path)
        assert ckpt.latest_step(tmp_path / "out",
                                ckpt.SCORE_INIT) is not None
        loss = (tmp_path / "out" / "score_training_loss.txt").read_text()
        assert len(loss.splitlines()) == 3
        assert all(np.isfinite(float(l.split()[1]))
                   for l in loss.splitlines())

    def test_reference_model_flags_honoured(self, tmp_path):
        """-omodel names the coordinate model file to load (trailing .net
        stripped -> checkpoint name, properties.cpp:69-70); -oscript
        warns instead of silently no-opping."""
        self._run("dsac_tpu.cli.train_obj",
                  ["--synthetic", "1", "--rounds", "2", "--width-mult",
                   "0.125", "--out", str(tmp_path / "out")], tmp_path)
        res = self._run("dsac_tpu.cli.test_ransac",
                        ["--synthetic", "1", "--rounds", "1", "--model",
                         "none", "--width-mult", "0.125", "--out",
                         str(tmp_path / "out"), "-rI", "16",
                         "-omodel", "obj_model_init.net",
                         "-oscript", "train_obj.lua"], tmp_path)
        assert "Loaded obj_model_init" in res.stdout
        assert "WARNING: -oscript" in res.stdout

    def test_serve_cli_smoke(self, tmp_path):
        res = self._run("dsac_tpu.cli.serve",
                        ["--synthetic", "2", "--model", "none",
                         "--width-mult", "0.125", "--batch", "2",
                         "--queue", "2", "--reps", "1", "-rI", "16",
                         "--attempts", "4",  # sampling lever (BASELINE.md)
                         "--export-poses", str(tmp_path / "poses")],
                        tmp_path)
        line = [l for l in res.stdout.splitlines()
                if l.startswith("{")][-1]
        import json as _json
        rec = _json.loads(line)
        assert rec["metric"] == "serve_relocalizations_per_s"
        assert rec["value"] > 0
        assert len(list((tmp_path / "poses").glob("*.pose.txt"))) == 2

    def test_model_best_fallback_chain(self, tmp_path):
        # --model best must prefer *_best, fall back to the endtoend and
        # then init snapshots (load_eval_params); pin the chain with real
        # tiny checkpoints
        import types

        import jax
        import jax.numpy as jnp

        from dsac_tpu.cli import common as c
        from dsac_tpu.config import DSACConfig
        from dsac_tpu.models import DenseCoordNet, ScoreNet
        from dsac_tpu.utils import checkpoint as ckpt

        cfg = DSACConfig()
        net = DenseCoordNet(width=8)
        snet = ScoreNet(width_mult=0.125)
        img = jnp.zeros((1, 64, 96, 3), jnp.float32)
        sample = types.SimpleNamespace(rgb=img[0])
        args = types.SimpleNamespace(arch="dense", model="best",
                                     out=str(tmp_path), width_mult=0.125)

        def params_with_marker(v):
            p = net.init(jax.random.PRNGKey(0), img)
            return jax.tree.map(lambda x: x * 0 + v, p)

        marker = lambda p: float(
            jax.tree_util.tree_leaves(p)[0].ravel()[0])

        ckpt.save(tmp_path, ckpt.OBJ_INIT, {"params": params_with_marker(1.0)})
        coord_params, src, _, _ = c.load_eval_params(
            args, cfg, net, snet, sample)
        assert src == ckpt.OBJ_INIT and marker(coord_params) == 1.0

        ckpt.save(tmp_path, ckpt.OBJ_E2E, {"params": params_with_marker(2.0)})
        coord_params, src, _, _ = c.load_eval_params(
            args, cfg, net, snet, sample)
        assert src == ckpt.OBJ_E2E and marker(coord_params) == 2.0

        ckpt.save(tmp_path, ckpt.OBJ_E2E + "_best",
                  {"params": params_with_marker(3.0)})
        coord_params, src, _, _ = c.load_eval_params(
            args, cfg, net, snet, sample)
        assert src == ckpt.OBJ_E2E + "_best" and marker(coord_params) == 3.0

    def test_dense_ctx_mesh_guard(self):
        # dense_ctx's ~530 px RF breaks the banded-FCN halo assumption;
        # the mesh path must refuse with a clear error, not mis-shard
        import types

        import pytest as _pytest

        from dsac_tpu.cli import common as c
        with _pytest.raises(SystemExit, match="dense_ctx"):
            c.mesh_coord_apply(types.SimpleNamespace(arch="dense_ctx"),
                               None, None, 4)

    def _run_mesh(self, module, extra, tmp_path):
        """CLI run on the 8-device CPU farm (for --mesh programs)."""
        env = self._env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        cmd = [sys.executable, "-c",
               "import jax; jax.config.update('jax_platforms','cpu');"
               f"import runpy; import sys; sys.argv=['x'] + {extra!r};"
               f"runpy.run_module('{module}', run_name='__main__')"]
        res = subprocess.run(cmd, env=env, capture_output=True,
                             text=True, timeout=500, cwd=str(tmp_path))
        assert res.returncode == 0, res.stderr[-3000:]
        return res

    def test_serve_cli_mesh_smoke(self, tmp_path):
        # the multi-chip serving PROGRAM: --mesh DxH routes through
        # sharded_serve_step (frames over 'data', hypothesis pool +
        # dense-FCN rows over 'hyp'); serving a RESTORED snapshot
        # exercises the committed-array re-placement (orbax restores
        # pin arrays to one device, which shard_map would reject)
        self._run("dsac_tpu.cli.train_obj",
                  ["--synthetic", "1", "--rounds", "2", "--width-mult",
                   "0.125", "--out", str(tmp_path / "out")], tmp_path)
        res = self._run_mesh("dsac_tpu.cli.serve",
                             ["--synthetic", "2", "--model", "init",
                              "--width-mult", "0.125", "--batch", "2",
                              "--queue", "2", "--reps", "1", "-rI", "16",
                              "--out", str(tmp_path / "out"),
                              "--mesh", "2x4"], tmp_path)
        line = [l for l in res.stdout.splitlines()
                if l.startswith("{")][-1]
        import json as _json
        rec = _json.loads(line)
        assert rec["metric"] == "serve_relocalizations_per_s"
        assert rec["value"] > 0
        assert rec["mesh"] == "2x4"

    def test_train_ransac_cli_mesh_smoke(self, tmp_path):
        # the multi-chip training PROGRAM: --mesh DxH routes through
        # sharded_e2e_step; snapshots restore-compatible with the
        # single-chip programs
        self._run_mesh("dsac_tpu.cli.train_ransac",
                       ["--synthetic", "2", "--rounds", "4",
                        "--width-mult", "0.125", "-rI", "16",
                        "--mesh", "2x4",
                        "--out", str(tmp_path / "out")], tmp_path)
        assert ckpt.latest_step(tmp_path / "out", ckpt.OBJ_E2E) is not None
        loss = (tmp_path / "out" /
                "ransac_training_loss_e2e.txt").read_text()
        assert len(loss.splitlines()) == 2  # 4 rounds / 2 frames-per-step
        # resume counts ROUNDS (not mesh steps): a re-run with a larger
        # budget restarts exactly at round 4
        res = self._run_mesh("dsac_tpu.cli.train_ransac",
                             ["--synthetic", "2", "--rounds", "8",
                              "--width-mult", "0.125", "-rI", "16",
                              "--mesh", "2x4",
                              "--out", str(tmp_path / "out")], tmp_path)
        assert "Resumed end-to-end training at round 4" in res.stdout
