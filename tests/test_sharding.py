"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates the scaling design the reference never had (SURVEY.md §2.3):
hypothesis-pool + patch sharding over 'hyp', frames over 'data', with
collective softmax and gradient reduction.  Correctness oracle: the
sharded expected loss must match the single-device pipeline when run
with an equivalent configuration.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dsac_tpu.config import DSACConfig, PoseConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.geometry import Pose
from dsac_tpu.ops import soft_inlier_scores
from dsac_tpu.parallel import (make_mesh, sharded_e2e_step,
                               sharded_expected_loss)

SCENE = SyntheticScene()
CAM = SCENE.camera


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh(2, 4)
        assert mesh.shape == {"data": 2, "hyp": 4}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(4, 4)


class TestShardedPipeline:
    def _build(self, n_data, n_hyp, n_frames, H=32):
        mesh = make_mesh(n_data, n_hyp)
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=H))

        images, gt, oracle_maps = [], [], []
        for i in range(n_frames):
            pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(i))
            images.append(rgb)
            gt.append(pose)
            oracle_maps.append(coords_gt)
        images = jnp.stack(images)
        gt = Pose(jnp.stack([p.R for p in gt]), jnp.stack([p.t for p in gt]))

        rng = np.random.default_rng(0)
        noise = jnp.asarray(rng.normal(size=(480, 640, 3)) * 5, jnp.float32)
        maps = jnp.stack(oracle_maps) + noise  # (B, H, W, 3) noisy oracle

        # Trainable global bias on top of the oracle; the image argument of
        # coord_apply carries the oracle map itself (the "image" the coord
        # net sees), so the closure stays frame-agnostic under vmap.
        def coord_apply(params, oracle_map, pix):
            c = oracle_map[pix[:, 1], pix[:, 0]]
            return (c + params["bias"]) / 1000.0

        def score_apply(params, dm):
            return params["gain"] * soft_inlier_scores(
                dm.reshape(dm.shape[0], -1), 10.0, 10.0)

        cp = {"bias": jnp.asarray([120.0, -90.0, 60.0])}
        sp = {"gain": jnp.asarray(1.0)}
        return mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp

    def test_sharded_loss_matches_single_device(self):
        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(1, 8, 1, H=64)
        keys = jax.random.split(jax.random.PRNGKey(5), 1)

        from jax.sharding import PartitionSpec as P
        loss_fn = jax.jit(jax.shard_map(
            functools.partial(sharded_expected_loss,
                              coord_apply=coord_apply,
                              score_apply=score_apply, cam=CAM, cfg=cfg,
                              n_hyp_shards=8),
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        loss, aux = loss_fn(cp, sp, keys, maps, gt)
        assert np.isfinite(float(loss))
        # A 120mm+ bias puts the loss far above the correct regime...
        assert 5.0 < float(loss) < 1e6
        # ... and with zero bias it should drop into the centimetre regime.
        cp0 = {"bias": jnp.zeros(3)}
        loss0, aux0 = loss_fn(cp0, sp, keys, maps, gt)
        assert float(loss0) < 5.0
        assert float(aux0["winner_loss"]) < 3.0

    def test_sharded_loss_equals_emulated_exactly(self):
        # the EXACT oracle: the collective-free emulation reproduces the
        # sharded program's draws (same fold_in(k_hyp, shard) pattern),
        # so the two must agree numerically, not just statistically —
        # any all_gather/psum layout bug shows as a difference
        from dsac_tpu.parallel.sharded import emulated_expected_loss

        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=32)
        keys = jax.random.split(jax.random.PRNGKey(5), 2)

        from jax.sharding import PartitionSpec as P
        loss_fn = jax.jit(jax.shard_map(
            functools.partial(sharded_expected_loss,
                              coord_apply=coord_apply,
                              score_apply=score_apply, cam=CAM, cfg=cfg,
                              n_hyp_shards=4),
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        loss, aux = loss_fn(cp, sp, keys, maps, gt)

        emu = []
        for i in range(2):
            e, _ = emulated_expected_loss(
                keys[i], maps[i],
                lambda img, pix: coord_apply(cp, img, pix),
                lambda dm: score_apply(sp, dm), CAM, cfg, 4,
                Pose(gt.R[i], gt.t[i]))
            emu.append(float(e))
        np.testing.assert_allclose(float(loss), np.mean(emu), rtol=1e-5)

    def test_data_and_hyp_axes_together(self):
        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=32)
        keys = jax.random.split(jax.random.PRNGKey(6), 2)

        from jax.sharding import PartitionSpec as P
        loss_fn = jax.jit(jax.shard_map(
            functools.partial(sharded_expected_loss,
                              coord_apply=coord_apply,
                              score_apply=score_apply, cam=CAM, cfg=cfg,
                              n_hyp_shards=4),
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P()),
            check_vma=False,
        ))
        loss, aux = loss_fn(cp, sp, keys, maps, gt)
        assert np.isfinite(float(loss))

    @pytest.mark.parametrize("n_shards", [2, 4, 8])
    def test_banded_dense_coords_match_full(self, n_shards):
        # spatial FCN sharding (ppermute halo exchange) must reproduce the
        # unsharded coordinate map at real frame size (480 rows), incl.
        # the non-divisible 8-shard case (480/8 = 60 rows/band -> padded)
        import functools
        from jax.sharding import PartitionSpec as P
        from dsac_tpu.models import DenseCoordNet
        from dsac_tpu.parallel.sharded import banded_dense_coords

        net = DenseCoordNet(width=16)
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(0))
        params = net.init(jax.random.PRNGKey(1), jnp.asarray(rgb)[None])

        # oracle: the FCN on the frame zero-padded to the sharded height
        # (a no-op pad except for 8 shards: 480 -> 512)
        stride, margin = 8, 32
        band_out = -(-(480 // stride) // n_shards)
        Hp = n_shards * band_out * stride
        img_p = jnp.pad(jnp.asarray(rgb), ((0, Hp - 480), (0, 0), (0, 0)))
        full = net.apply(params, img_p[None])[0][:480 // stride]

        mesh = make_mesh(1, n_shards)
        apply_full = lambda img: net.apply(params, img[None])[0]
        fn = jax.jit(jax.shard_map(
            functools.partial(banded_dense_coords, apply_full,
                              n_shards=n_shards, margin=margin),
            mesh=mesh, in_specs=(P(),), out_specs=P(),
            check_vma=False,
        ))
        banded = fn(jnp.asarray(rgb))
        assert banded.shape == full.shape
        np.testing.assert_allclose(np.array(banded), np.array(full),
                                   atol=2e-2, rtol=1e-3)

    @pytest.mark.parametrize("verify_topk", [0, 4])
    def test_sharded_serve_localizes(self, verify_topk):
        # the serving twin: hypothesis-sharded front end, all_gathered
        # pose pool, winner-only (or top-K verified) refinement; must
        # recover each frame's pose from the noisy oracle within 5cm/5deg
        from dsac_tpu.geometry.loss import pose_errors
        from dsac_tpu.parallel import sharded_serve_step

        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=32)
        cp = {"bias": jnp.zeros(3)}  # unbiased oracle
        serve = sharded_serve_step(mesh, coord_apply, score_apply, CAM,
                                   cfg, verify_topk=verify_topk)
        keys = jax.random.split(jax.random.PRNGKey(7), 2)
        R, t, scores, ent, chosen = serve(cp, sp, keys, maps)
        assert R.shape == (2, 3, 3) and t.shape == (2, 3)
        assert scores.shape == (2, cfg.pose.num_hypotheses)
        rot_err, t_err = pose_errors(Pose(R, t), gt)
        assert np.all(np.asarray(rot_err) < 5.0), np.asarray(rot_err)
        assert np.all(np.asarray(t_err) < 50.0), np.asarray(t_err)
        # deterministic: same keys -> same served poses
        R2, t2, *_ = serve(cp, sp, keys, maps)
        np.testing.assert_array_equal(np.asarray(R), np.asarray(R2))

    def test_sharded_serve_fused_kernels_localize(self):
        # the TPU production serve configuration — fused SoA P3P sampling
        # + single-launch Pallas IRLS refinement — exercised through the
        # sharded path (kernels run interpreted on the CPU farm); must
        # localize like the jnp path does
        from dsac_tpu.geometry.loss import pose_errors
        from dsac_tpu.parallel import sharded_serve_step

        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=32)
        cp = {"bias": jnp.zeros(3)}
        serve = sharded_serve_step(mesh, coord_apply, score_apply, CAM,
                                   cfg, verify_topk=4,
                                   fused_sampling=True,
                                   refine_mode="fused")
        keys = jax.random.split(jax.random.PRNGKey(7), 2)
        R, t, scores, ent, chosen = serve(cp, sp, keys, maps)
        rot_err, t_err = pose_errors(Pose(R, t), gt)
        assert np.all(np.asarray(rot_err) < 5.0), np.asarray(rot_err)
        assert np.all(np.asarray(t_err) < 50.0), np.asarray(t_err)

    def test_sharded_serve_large_h_fused_scoring(self):
        # the config-4 very-large-H regime (4k hypotheses, the scaled
        # analogue of core/cnn.h:1135-1141) through the hyp-sharded serve
        # path with fused reprojection+soft-inlier scoring: neither the
        # (H, N) error surface nor the (H, G, G) diff-map stack ever
        # materialises, per shard or gathered
        from dsac_tpu.geometry.loss import pose_errors
        from dsac_tpu.parallel import sharded_serve_step

        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=4096)
        cp = {"bias": jnp.zeros(3)}
        serve = sharded_serve_step(mesh, coord_apply, score_apply, CAM,
                                   cfg, scoring="fused_soft",
                                   fused_sampling=False, refine_mode=False)
        keys = jax.random.split(jax.random.PRNGKey(7), 2)
        R, t, scores, ent, chosen = serve(cp, sp, keys, maps)
        assert scores.shape == (2, 4096)
        rot_err, t_err = pose_errors(Pose(R, t), gt)
        assert np.all(np.asarray(rot_err) < 5.0), np.asarray(rot_err)
        assert np.all(np.asarray(t_err) < 50.0), np.asarray(t_err)

    def test_sharded_training_step_implicit_gradients(self):
        # the fast multi-chip training mode: fixed-point forward under
        # stop_gradient + one differentiable GN step (implicit-function
        # theorem), jnp twin on the CPU farm; must still learn the bias
        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=32)
        c_opt = optax.adam(15.0)
        s_opt = optax.sgd(1e-7, momentum=0.9)
        step = sharded_e2e_step(mesh, coord_apply, score_apply, CAM, cfg,
                                c_opt, s_opt, refine_mode="implicit_jnp")
        c_state = c_opt.init(cp)
        s_state = s_opt.init(sp)
        losses = []
        for i in range(10):
            keys = jax.random.split(jax.random.PRNGKey(100 + i), 2)
            cp, sp, c_state, s_state, loss, aux = step(
                cp, sp, c_state, s_state, keys, maps, gt.R, gt.t)
            losses.append(float(loss))
        assert np.all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0] * 0.7, losses
        assert float(jnp.linalg.norm(cp["bias"])) < 100.0

    def test_sharded_softam_training_step_improves(self):
        # the soft-argmax objective over the mesh: pool average via psum
        # over 'hyp', single refined pose, maxLoss objective; the coord
        # bias must still be learnable through the averaged pose
        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=32)
        c_opt = optax.adam(15.0)
        s_opt = optax.sgd(1e-7, momentum=0.9)
        step = sharded_e2e_step(mesh, coord_apply, score_apply, CAM, cfg,
                                c_opt, s_opt, softam=True,
                                refine_mode="implicit_jnp")
        c_state = c_opt.init(cp)
        s_state = s_opt.init(sp)
        losses = []
        for i in range(10):
            keys = jax.random.split(jax.random.PRNGKey(300 + i), 2)
            cp, sp, c_state, s_state, loss, aux = step(
                cp, sp, c_state, s_state, keys, maps, gt.R, gt.t)
            losses.append(float(loss))
        assert np.all(np.isfinite(losses)), losses
        assert losses[-1] < losses[0] * 0.7, losses

    def test_sharded_training_step_improves(self):
        mesh, cfg, maps, gt, coord_apply, score_apply, cp, sp = \
            self._build(2, 4, 2, H=32)
        c_opt = optax.adam(15.0)
        s_opt = optax.sgd(1e-7, momentum=0.9)
        step = sharded_e2e_step(mesh, coord_apply, score_apply, CAM, cfg,
                                c_opt, s_opt)
        c_state = c_opt.init(cp)
        s_state = s_opt.init(sp)
        losses = []
        for i in range(10):
            keys = jax.random.split(jax.random.PRNGKey(100 + i), 2)
            cp, sp, c_state, s_state, loss, aux = step(
                cp, sp, c_state, s_state, keys, maps, gt.R, gt.t)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses
        assert float(jnp.linalg.norm(cp["bias"])) < 100.0
