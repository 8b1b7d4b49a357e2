"""Training-path tests: pre-training losses fall, e2e gradients improve the
expected pose loss, gradient clamp semantics hold."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsac_tpu.config import DSACConfig, PoseConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.geometry import Pose, max_loss
from dsac_tpu.models import PatchCoordNet, ScoreNet
from dsac_tpu.models.coord_net import extract_patches
from dsac_tpu.ops import soft_inlier_scores, stratified_sample
from dsac_tpu.pipeline.train import (
    TrainState, clamp_grad, coord_l1_loss, coord_pretrain_optimizer,
    coord_pretrain_step, e2e_expected_loss, e2e_step, make_e2e_state,
    make_score_batch, random_pose_perturbation, score_pretrain_optimizer,
    score_pretrain_step,
)

SCENE = SyntheticScene()
CAM = SCENE.camera


class TestClampGrad:
    def test_identity_forward(self):
        x = jnp.asarray([1.0, -2.0, 3.0])
        np.testing.assert_array_equal(np.array(clamp_grad(x, 0.1)),
                                      np.array(x))

    def test_gradient_clamped(self):
        g = jax.grad(lambda x: jnp.sum(clamp_grad(x, 0.1) * 5.0))(
            jnp.asarray([1.0, 2.0]))
        np.testing.assert_allclose(np.array(g), [0.1, 0.1])


class TestPerturbation:
    def test_statistics(self):
        keys = jax.random.split(jax.random.PRNGKey(0), 256)
        perts = jax.vmap(lambda k: random_pose_perturbation(k, 10.0, 100.0))(
            keys)
        ident = Pose(jnp.broadcast_to(jnp.eye(3), (256, 3, 3)),
                     jnp.zeros((256, 3)))
        losses = jax.vmap(max_loss)(perts, ident)
        # rot sigma 10deg, trans sigma 100mm -> typical loss around 10-20
        assert 3.0 < float(jnp.median(losses)) < 40.0


class TestCoordPretrain:
    def test_loss_decreases(self, rng):
        net = PatchCoordNet(width_mult=0.125, dense_mult=0.03125)
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(0))
        s = stratified_sample(jax.random.PRNGKey(1), 640, 480, 16, 42)
        pix = s.reshape(-1, 2)
        patches = extract_patches(rgb, pix, 42)
        labels = coords_gt[pix[:, 1], pix[:, 0]] / 1000.0  # metres

        params = net.init(jax.random.PRNGKey(2), patches[:1])
        opt = coord_pretrain_optimizer()
        opt_state = opt.init(params)
        apply_fn = lambda p, x: net.apply(p, x)

        step = jax.jit(functools.partial(coord_pretrain_step,
                                         apply_fn=apply_fn, optimizer=opt))
        losses = []
        for i in range(20):
            params, opt_state, loss = step(params, opt_state, patches,
                                           labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9, losses


class TestScorePretrain:
    def test_batch_labels_and_loss_decreases(self):
        cfg = DSACConfig()
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(3))
        s = stratified_sample(jax.random.PRNGKey(4), 640, 480, 40, 42)
        pix = s.reshape(-1, 2).astype(jnp.float32)
        coords = coords_gt[s.reshape(-1, 2)[:, 1], s.reshape(-1, 2)[:, 0]]

        dm, labels = make_score_batch(jax.random.PRNGKey(5), pose, coords,
                                      pix, CAM, cfg)
        assert dm.shape == (16, 40, 40)
        # small perturbations (even indices) must beat large ones on average
        lab = np.array(labels)
        assert lab[::2].mean() > lab[1::2].mean()
        assert (lab <= 0).all()

        net = ScoreNet(width_mult=0.25)
        params = net.init(jax.random.PRNGKey(6), dm)
        # labels are O(-100); the reference's 1e-4 Adam needs thousands of
        # steps to close that gap — use a hot lr to verify learning quickly
        opt = score_pretrain_optimizer(lr=2e-3)
        opt_state = opt.init(params)
        step = jax.jit(functools.partial(
            score_pretrain_step, apply_fn=lambda p, d: net.apply(p, d),
            optimizer=opt))
        losses = []
        for i in range(60):
            params, opt_state, loss = step(params, opt_state, dm, labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.9, losses


class TestE2E:
    """End-to-end machinery on a cheap learnable coord model: oracle coords
    plus a trainable bias — e2e SGD must shrink the bias (pose loss falls).
    """

    def _setup(self):
        pose, rgb, depth, coords_gt = SCENE.frame(jax.random.PRNGKey(7))
        rng = np.random.default_rng(0)
        noise = jnp.asarray(rng.normal(size=(1600, 3)) * 5, jnp.float32)

        def coord_apply(params, image, pix):
            c = coords_gt[pix[:, 1], pix[:, 0]] + noise
            return (c + params["bias"]) / 1000.0

        def score_apply(params, dm):
            return params["gain"] * soft_inlier_scores(
                dm.reshape(dm.shape[0], -1), 10.0, 10.0)

        coord_params = {"bias": jnp.asarray([150.0, -120.0, 100.0])}
        score_params = {"gain": jnp.asarray(1.0)}
        cfg = DSACConfig(pose=PoseConfig(num_hypotheses=16))
        return pose, rgb, coord_apply, score_apply, coord_params, \
            score_params, cfg

    def test_objective_and_grads_finite(self):
        (pose, rgb, coord_apply, score_apply, cp, sp, cfg) = self._setup()
        (obj, aux), (gc, gs) = jax.value_and_grad(
            e2e_expected_loss, argnums=(0, 1), has_aux=True)(
            cp, sp, jax.random.PRNGKey(0), rgb, pose, coord_apply,
            score_apply, CAM, cfg)
        assert np.isfinite(float(obj))
        assert np.all(np.isfinite(np.array(gc["bias"])))
        assert np.isfinite(float(gs["gain"]))
        # with a 150mm+ coordinate bias the pose is off -> loss well above 5
        assert float(obj) > 5.0

    def test_e2e_training_reduces_loss(self):
        (pose, rgb, coord_apply, score_apply, cp, sp, cfg) = self._setup()
        state = make_e2e_state(cp, sp)

        # Adam takes ~fixed-size (lr mm) steps on the toy bias regardless of
        # gradient scale — robust way to see improvement in few steps
        import optax
        opt = optax.adam(15.0)
        opt_state = opt.init(cp)
        grad_fn = jax.jit(functools.partial(
            jax.grad(e2e_expected_loss, argnums=0, has_aux=True),
            coord_apply=coord_apply, score_apply=score_apply, cam=CAM,
            cfg=cfg))
        loss_fn = jax.jit(functools.partial(
            e2e_expected_loss, coord_apply=coord_apply,
            score_apply=score_apply, cam=CAM, cfg=cfg))

        key = jax.random.PRNGKey(1)
        l0, _ = loss_fn(cp, sp, key, rgb, pose)
        for i in range(15):
            g, aux = grad_fn(cp, sp, jax.random.PRNGKey(i), rgb, pose)
            updates, opt_state = opt.update(g, opt_state, cp)
            cp = optax.apply_updates(cp, updates)
        l1, _ = loss_fn(cp, sp, key, rgb, pose)
        assert float(l1) < float(l0) * 0.8, (float(l0), float(l1))
        # bias should have shrunk
        assert float(jnp.linalg.norm(cp["bias"])) < \
            float(jnp.linalg.norm(jnp.asarray([150.0, -120.0, 100.0])))

    def test_e2e_step_runs_and_updates(self):
        (pose, rgb, coord_apply, score_apply, cp, sp, cfg) = self._setup()
        state = make_e2e_state(cp, sp)
        new_state, loss, aux = e2e_step(state, jax.random.PRNGKey(0), rgb,
                                        pose, coord_apply, score_apply,
                                        CAM, cfg)
        assert int(new_state.step) == 1
        assert np.isfinite(float(loss))
        # The reference e2e lr (1e-5) times a small gradient is below f32
        # resolution on a 150.0 bias, so check the SGD momentum buffer
        # (which accumulates the raw gradient) rather than the params.
        mom = jax.tree_util.tree_leaves(new_state.coord_opt)
        assert any(np.any(np.abs(np.array(m)) > 0) for m in mom
                   if hasattr(m, "shape"))

    def test_score_anchor_targets_score_params_only(self):
        # --score-anchor semantics: the supervised anchor term must (a)
        # add a positive L1 to the objective, (b) change the SCORE-param
        # gradient (that is its whole job), and (c) leave the coord-param
        # gradient bit-identical (it reaches scores only through
        # stop_gradient(dmaps) — pipeline/train.py:e2e_expected_loss)
        (pose, rgb, coord_apply, score_apply, cp, sp, cfg) = self._setup()
        key = jax.random.PRNGKey(5)
        vg = jax.value_and_grad(e2e_expected_loss, argnums=(0, 1),
                                has_aux=True)
        (obj0, aux0), (gc0, gs0) = vg(cp, sp, key, rgb, pose, coord_apply,
                                      score_apply, CAM, cfg)
        w = 0.25
        (obj1, aux1), (gc1, gs1) = vg(cp, sp, key, rgb, pose, coord_apply,
                                      score_apply, CAM, cfg,
                                      score_anchor=w)
        anchor = float(aux1["score_anchor_l1"])
        assert anchor > 0.0
        assert float(aux0["score_anchor_l1"]) == 0.0
        np.testing.assert_allclose(float(obj1), float(obj0) + w * anchor,
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.array(gc0["bias"]),
                                      np.array(gc1["bias"]))
        assert float(gs0["gain"]) != float(gs1["gain"])

    def test_softam_objective(self):
        (pose, rgb, coord_apply, score_apply, cp, sp, cfg) = self._setup()
        (obj, aux), gc = jax.value_and_grad(
            e2e_expected_loss, argnums=0, has_aux=True)(
            cp, sp, jax.random.PRNGKey(0), rgb, pose, coord_apply,
            score_apply, CAM, cfg, softam=True)
        assert np.isfinite(float(obj))
        assert np.all(np.isfinite(np.array(gc["bias"])))

    def test_softam_implicit_gradients_live_and_learn(self):
        # The fast softam training mode: fixed-point forward +
        # implicit-function gradient WITH init-injection.  Pure implicit
        # gradients would sever the score CNN's only gradient path (it
        # reaches the loss through the averaged initial pose,
        # cnn_softam.h:738-923); the injected one-step GN Jacobian must
        # keep it alive, and the coordinate path must still learn.
        import functools
        import optax
        (pose, rgb, coord_apply, score_apply, cp, sp, cfg) = self._setup()
        grad_fn = jax.jit(functools.partial(
            jax.grad(e2e_expected_loss, argnums=(0, 1), has_aux=True),
            coord_apply=coord_apply, score_apply=score_apply, cam=CAM,
            cfg=cfg, softam=True, refine_mode="implicit_jnp"))
        loss_fn = jax.jit(functools.partial(
            e2e_expected_loss, coord_apply=coord_apply,
            score_apply=score_apply, cam=CAM, cfg=cfg, softam=True,
            refine_mode="implicit_jnp"))

        (gc, gs), _ = grad_fn(cp, sp, jax.random.PRNGKey(0), rgb, pose)
        assert np.all(np.isfinite(np.array(gc["bias"])))
        assert np.isfinite(float(gs["gain"]))
        assert float(jnp.abs(gs["gain"])) > 0.0  # score path alive

        opt = optax.adam(15.0)
        opt_state = opt.init(cp)
        key = jax.random.PRNGKey(1)
        l0, _ = loss_fn(cp, sp, key, rgb, pose)
        for i in range(15):
            (g, _), _ = grad_fn(cp, sp, jax.random.PRNGKey(i), rgb, pose)
            updates, opt_state = opt.update(g, opt_state, cp)
            cp = optax.apply_updates(cp, updates)
        l1, _ = loss_fn(cp, sp, key, rgb, pose)
        assert float(l1) < float(l0) * 0.8, (float(l0), float(l1))

    def test_softam_fused_fd_init_mode(self):
        # refine_mode="implicit": fused Pallas forward + FD init-pose
        # custom VJP (ops/gn_pallas.py:make_init_sensitivity_refiner,
        # interpreted here).  The score path must stay alive through the
        # kernel's backward, and the coordinate gradient must align with
        # the implicit_jnp twin's (same implicit-function step).
        import functools
        (pose, rgb, coord_apply, score_apply, cp, sp, cfg) = self._setup()

        def grads(mode):
            return jax.grad(e2e_expected_loss, argnums=(0, 1),
                            has_aux=True)(
                cp, sp, jax.random.PRNGKey(3), rgb, pose,
                coord_apply, score_apply, CAM, cfg, True,
                refine_mode=mode)

        (gc_f, gs_f), _ = grads("implicit")
        (gc_j, gs_j), _ = grads("implicit_jnp")
        assert np.all(np.isfinite(np.array(gc_f["bias"])))
        assert np.isfinite(float(gs_f["gain"]))
        assert float(jnp.abs(gs_f["gain"])) > 0.0  # score path alive
        a = np.asarray(gc_f["bias"], np.float64)
        b = np.asarray(gc_j["bias"], np.float64)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)
                             + 1e-30))
        assert cos > 0.9, (cos, a, b)
