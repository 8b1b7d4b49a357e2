"""Data-parallel pre-training over the mesh (parallel/pretrain.py).

Oracles mirror tests/test_sharding.py: every sharded program is pinned
against a collective-free twin — exact schedule, exact draws — so a
collective/layout bug is a numeric difference, not a statistical blur.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import DataConfig, DSACConfig, PoseConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.models import DenseCoordNet, ScoreNet
from dsac_tpu.parallel import make_mesh
from dsac_tpu.parallel.pretrain import (emulated_dense_pretrain_many,
                                        shard_pool,
                                        sharded_dense_pretrain_many,
                                        sharded_patch_pretrain_many,
                                        sharded_score_pretrain_round)
from dsac_tpu.pipeline.train import (coord_pretrain_optimizer,
                                     patch_coord_pretrain_many,
                                     score_pretrain_optimizer,
                                     score_pretrain_round)

W, H = 160, 120
SCENE = SyntheticScene(width=W, height=H, focal=130.0)
CFG = DSACConfig(data=DataConfig(image_width=W, image_height=H,
                                 focal_length=130.0),
                 pose=PoseConfig(num_hypotheses=16))


def _pool(n):
    rgbs, objs, Rs, ts = [], [], [], []
    for i in range(n):
        pose, rgb, _d, coords = SCENE.frame(jax.random.PRNGKey(40 + i))
        rgbs.append(np.asarray(rgb))
        objs.append(np.asarray(coords))
        Rs.append(np.asarray(pose.R))
        ts.append(np.asarray(pose.t))
    return (np.stack(rgbs), np.stack(objs), np.stack(Rs), np.stack(ts))


def _assert_params_close(p_a, p_b, atol=2e-4, max_flip_frac=0.02):
    """Param oracle robust to Adam's sign-flip noise.

    Adam's per-element update is ~±lr regardless of |grad|; float
    reduction-order noise on near-zero grads flips isolated signs, so a
    handful of elements legitimately differ by up to 2*lr*steps.  A
    collective LAYOUT bug corrupts the gradient everywhere, so the
    discriminative check is the FRACTION of disagreeing elements.
    """
    leaves_a = jax.tree.leaves(p_a)
    leaves_b = jax.tree.leaves(p_b)
    n_tot = n_bad = 0
    for a, b in zip(leaves_a, leaves_b):
        d = np.abs(np.asarray(a) - np.asarray(b))
        n_tot += d.size
        n_bad += int((d > atol).sum())
    assert n_bad / n_tot <= max_flip_frac, (n_bad, n_tot)


class TestDensePretrain:
    def test_sharded_equals_emulated(self):
        mesh = make_mesh(2, 4)
        n_dev = 8
        net = DenseCoordNet(width=8)
        opt = coord_pretrain_optimizer()
        rgbs, objs, _, _ = _pool(8)
        gts = objs[:, 4::8, 4::8] / 1000.0
        masks = (np.abs(gts).sum(-1) > 0).astype(np.float32)

        params = net.init(jax.random.PRNGKey(0), jnp.asarray(rgbs[:1]))
        ost = opt.init(params)
        key = jax.random.PRNGKey(7)

        apply_fn = lambda p, x: net.apply(p, x)
        sh_fn = sharded_dense_pretrain_many(mesh, apply_fn, opt,
                                            n_updates=3, batch=2)
        im_s, gt_s, mk_s = shard_pool(mesh, rgbs, gts, masks)
        p_sh, _, l_sh = sh_fn(params, ost, key, im_s, gt_s, mk_s)

        em_fn = emulated_dense_pretrain_many(n_dev, apply_fn, opt,
                                             n_updates=3, batch=2)
        p_em, _, l_em = em_fn(params, ost, key, jnp.asarray(rgbs),
                              jnp.asarray(gts), jnp.asarray(masks))
        # tolerances: conv kernels pick batch-size-dependent GEMM shapes
        # (B=2/device vs B=16 emulated), so the float path differs at
        # ~2e-4 rel; a collective LAYOUT bug shows as O(1) error
        np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_em),
                                   rtol=5e-4)
        _assert_params_close(p_sh, p_em)

    def test_pool_padding_repeats_frames(self):
        mesh = make_mesh(2, 4)
        rgbs = np.arange(5 * 2 * 2 * 3, dtype=np.float32).reshape(
            5, 2, 2, 3)
        (staged,) = shard_pool(mesh, rgbs)
        assert staged.shape[0] == 8
        np.testing.assert_array_equal(np.asarray(staged)[5:],
                                      rgbs[:3])


class TestPatchPretrain:
    def test_sharded_equals_single_device_global_batch(self):
        """pmean of per-device means == single-device mean over the
        concatenated global batch (same schedule, same draws)."""
        mesh = make_mesh(2, 4)
        n_dev, K, b_local = 8, 3, 2
        from dsac_tpu.models import PatchCoordNet
        net = PatchCoordNet(width_mult=0.25, dense_mult=0.25)
        opt = coord_pretrain_optimizer()
        P = 42
        rgbs, objs, _, _ = _pool(8)

        rng = np.random.default_rng(3)
        fi = rng.integers(8, size=(n_dev, K, b_local)).astype(np.int32)
        half = P // 2
        pxy = np.stack([
            rng.integers(half, W - half, size=(n_dev, K, b_local)),
            rng.integers(half, H - half, size=(n_dev, K, b_local)),
        ], axis=-1).astype(np.int32)

        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, P, P, 3)))
        ost = opt.init(params)
        apply_fn = lambda p, x: net.apply(p, x)

        sh_fn = sharded_patch_pretrain_many(mesh, apply_fn, opt,
                                            patch_size=P)
        im_s, obj_s = shard_pool(mesh, rgbs, objs)
        from jax.sharding import NamedSharding, PartitionSpec
        pool_sh = NamedSharding(mesh, PartitionSpec(("data", "hyp")))
        # per-device frame ids are LOCAL to the 1-frame shard each device
        # holds (pool of 8 over 8 devices -> F_local=1, local id 0)
        fi_local = np.zeros_like(fi)
        p_sh, _, l_sh = sh_fn(params, ost, im_s, obj_s,
                              jax.device_put(fi_local, pool_sh),
                              jax.device_put(pxy, pool_sh))

        # single-device: global batch = concat over devices, global frame
        # id of device d's local 0 = d (shard order)
        fi_g = np.broadcast_to(np.arange(n_dev, dtype=np.int32)[:, None,
                                                                None],
                               fi.shape)
        fi_1 = np.transpose(fi_g, (1, 0, 2)).reshape(K, n_dev * b_local)
        px_1 = np.transpose(pxy, (1, 0, 2, 3)).reshape(K, n_dev * b_local,
                                                       2)
        p_1, _, l_1 = jax.jit(lambda p, o, im, ob, f, x:
                              patch_coord_pretrain_many(
                                  p, o, im, ob, f, x, apply_fn, opt, P))(
            params, ost, jnp.asarray(rgbs), jnp.asarray(objs),
            jnp.asarray(fi_1), jnp.asarray(px_1))
        np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_1),
                                   rtol=5e-4)
        _assert_params_close(p_sh, p_1)


class TestScorePretrain:
    def test_sharded_round_equals_single_device(self):
        mesh = make_mesh(2, 4)
        n_dev = 8
        net = ScoreNet(width_mult=0.5)
        opt = score_pretrain_optimizer()
        cam = SCENE.camera
        rgbs, objs, Rs, ts = _pool(8)
        grid = CFG.net.subsample_size
        n_hyps, batch = 4, 8

        sp = net.init(jax.random.PRNGKey(2), jnp.zeros((1, grid, grid)))
        ost = opt.init(sp)

        # oracle coordinate net: reads GT map (the "image" carries it)
        def coord_apply(params, img, pix):
            return img[pix[:, 1], pix[:, 0]] / 1000.0

        score_apply = lambda p, d: net.apply(p, d)

        n_f = 8  # one frame slot per device
        rng = np.random.default_rng(11)
        fidx_local = rng.integers(1, size=n_f).astype(np.int32)  # F_l=1
        keys = np.asarray(jax.random.split(jax.random.PRNGKey(5), n_f))
        perm = rng.permutation(n_f * n_hyps).astype(np.int32)

        sh_round = sharded_score_pretrain_round(
            mesh, coord_apply, score_apply, cam, CFG, n_hyps, batch, opt)
        from jax.sharding import NamedSharding, PartitionSpec
        pool_sh = NamedSharding(mesh, PartitionSpec(("data", "hyp")))
        im_s, R_s, t_s = shard_pool(mesh, objs, Rs, ts)  # maps as images
        sp_sh, _, l_sh = sh_round(
            sp, ost, jax.device_put(fidx_local, pool_sh),
            jax.device_put(keys, pool_sh), jnp.asarray(perm),
            im_s, R_s, t_s, {})

        # single-device with the device-linear global schedule
        fidx_g = (np.arange(n_dev) * 1 + fidx_local).astype(np.int32)
        sp_1, _, l_1 = jax.jit(lambda *a: score_pretrain_round(
            *a, coord_apply=coord_apply, score_apply=score_apply, cam=cam,
            cfg=CFG, n_hyps=n_hyps, batch=batch, optimizer=opt))(
            sp, ost, jnp.asarray(fidx_g), jnp.asarray(keys),
            jnp.asarray(perm), jnp.asarray(objs), jnp.asarray(Rs),
            jnp.asarray(ts), {})
        np.testing.assert_allclose(np.asarray(l_sh), np.asarray(l_1),
                                   rtol=2e-5, atol=1e-5)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5), sp_sh, sp_1)


class TestCLIMesh:
    """End-to-end CLI smoke on the 8-device farm (tiny budgets)."""

    def test_train_obj_dense_mesh(self, tmp_path):
        from dsac_tpu.cli import train_obj
        train_obj.main([
            "--synthetic", "8", "--out", str(tmp_path), "--mesh", "2x4",
            "--width-mult", "0.25", "--updates", "20",
            "--steps-per-call", "10", "--dense-batch", "1",
            "--snapshot-every", "20"])
        from dsac_tpu.utils import checkpoint as ckpt
        assert ckpt.latest_step(tmp_path, ckpt.OBJ_INIT) == 20

    def test_train_score_mesh(self, tmp_path):
        from dsac_tpu.cli import train_score
        train_score.main([
            "--synthetic", "8", "--out", str(tmp_path), "--mesh", "2x4",
            "--width-mult", "0.25", "--training-rounds", "2",
            "--frames-per-round", "80", "--hyps-per-frame", "4",
            "--batch", "16"])
        from dsac_tpu.utils import checkpoint as ckpt
        assert ckpt.latest_step(tmp_path, ckpt.SCORE_INIT) is not None

    def test_test_ransac_mesh(self, tmp_path):
        from dsac_tpu.cli import test_ransac
        stats = test_ransac.main([
            "--synthetic", "4", "--out", str(tmp_path), "--mesh", "2x4",
            "--width-mult", "0.25", "--model", "none",
            "-rI", "16", "-rdraw", "0"])
        assert 0.0 <= stats["accuracy_5cm5deg"] <= 1.0
        files = list(tmp_path.glob("ransac_pose_errors_*.txt"))
        assert files, "mesh eval must write the reference error file"
        rows = files[0].read_text().strip().splitlines()
        assert len(rows) == 4 and len(rows[0].split()) == 11
