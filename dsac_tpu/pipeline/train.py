"""Training: coordinate pre-training, score pre-training, end-to-end DSAC.

Replaces the three training programs and their Lua optimizer halves:

  * coord pre-training  — train_obj.cpp:292-332 + train_obj.lua:223-269:
    L1 (mean Euclidean distance, MyL1Criterion.lua:7-20) on GT coords in
    metres, Adam 1e-4 halved every 50k updates, batch 64.
  * score pre-training  — train_score.cpp:166-234 + train_score.lua:162-207:
    diff maps of GT poses perturbed at two noise levels (2deg/2mm vs
    10deg/100mm), labels -temperature * maxLoss (temperature 10), Adam,
    L1 on the scalar score.
  * end-to-end DSAC     — train_ransac.cpp:134-409: expected pose loss
    E_{h~softmax(s)}[maxLoss(refine(h))].  The reference assembles the
    gradient by hand in two paths (pose path Σ s_h dLoss·dRefine_h +
    REINFORCE score path dSMScore); jax.grad of the SAME scalar objective
    produces both terms.  Coord-CNN output gradients are clamped to ±0.1
    like the Lua side (train_obj.lua:20,172) via a custom_vjp identity.
    Coord net: SGD 1e-5 momentum 0.9; score net: SGD 1e-7 momentum 0.9
    (train_obj.lua:18-19, train_score.lua:18-19).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dsac_tpu.config import Camera, DSACConfig
from dsac_tpu.geometry.loss import max_loss
from dsac_tpu.geometry.pose import Pose, compose, pose_from_vec6
from dsac_tpu.ops.diffmap import diffmaps
from dsac_tpu.pipeline.forward import process_frame, process_frame_softam


# ---------------------------------------------------------------------------
# gradient clamp at the CNN output boundary (train_obj.lua:172)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def clamp_grad(x: jnp.ndarray, limit: float) -> jnp.ndarray:
    return x


def _clamp_grad_fwd(x, limit):
    return x, limit


def _clamp_grad_bwd(limit, g):
    return jnp.clip(g, -limit, limit), None


clamp_grad.defvjp(_clamp_grad_fwd, _clamp_grad_bwd)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

def coord_l1_loss(pred_m: jnp.ndarray, gt_m: jnp.ndarray,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean Euclidean distance in metres (MyL1Criterion.lua:7-20)."""
    d = jnp.sqrt(jnp.sum((pred_m - gt_m) ** 2, axis=-1) + 1e-12)
    if mask is None:
        return jnp.mean(d)
    return jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def score_l1_loss(pred: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """AbsCriterion on scalar scores (train_score.lua:41)."""
    return jnp.mean(jnp.abs(pred - label))


# ---------------------------------------------------------------------------
# optimizers (schedules per the Lua scripts)
# ---------------------------------------------------------------------------

def coord_pretrain_optimizer(lr: float = 1e-4,
                             halve_every: int = 50_000) -> optax.GradientTransformation:
    """Adam with step-halving (train_obj.lua:12-13, 263-266)."""
    sched = lambda step: lr * (0.5 ** (step // halve_every))
    return optax.adam(sched)


def score_pretrain_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(lr)


def e2e_optimizers(coord_lr: float = 1e-5, score_lr: float = 1e-7,
                   clip_norm: float = 10.0
                   ) -> tuple[optax.GradientTransformation,
                              optax.GradientTransformation]:
    """(coord, score) SGD+momentum (train_obj.lua:18-19, train_score.lua:18-19).

    On top of the reference's per-element clamp at the CNN boundary we add
    global-norm clipping: the REINFORCE-style score-path gradient has
    occasional large spikes that, with momentum, can walk the coordinate
    net out of the (narrow) regime where minimal sets stay self-consistent.
    """
    def chain(lr):
        return optax.chain(optax.clip_by_global_norm(clip_norm),
                           optax.sgd(lr, momentum=0.9))

    return chain(coord_lr), chain(score_lr)


class TrainState(NamedTuple):
    """Joint end-to-end training state (both nets + optimizer states)."""

    coord_params: Any
    score_params: Any
    coord_opt: Any
    score_opt: Any
    step: jnp.ndarray


def make_e2e_state(coord_params, score_params) -> TrainState:
    c_opt, s_opt = e2e_optimizers()
    return TrainState(coord_params, score_params,
                      c_opt.init(coord_params), s_opt.init(score_params),
                      jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# pre-training steps
# ---------------------------------------------------------------------------

def coord_pretrain_step(params, opt_state, batch_patches, batch_coords_m,
                        apply_fn: Callable,
                        optimizer: optax.GradientTransformation):
    """One Adam step on patch batch -> (params, opt_state, loss)."""

    def loss_fn(p):
        pred = apply_fn(p, batch_patches)
        return coord_l1_loss(pred, batch_coords_m)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def dense_coord_pretrain_step(params, opt_state, images, coord_maps_m, masks,
                              apply_fn: Callable,
                              optimizer: optax.GradientTransformation):
    """Dense-FCN variant: full images -> stride-8 coord maps, masked L1."""

    def loss_fn(p):
        pred = apply_fn(p, images)  # (B, H/8, W/8, 3) metres
        return coord_l1_loss(pred, coord_maps_m, masks)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def dense_coord_pretrain_many(params, opt_state, key, images, coord_maps_m,
                              masks, apply_fn: Callable,
                              optimizer: optax.GradientTransformation,
                              n_updates: int, batch: int = 1):
    """Run n_updates SGD/Adam updates fully on-device via lax.scan.

    images/coord_maps_m/masks hold the ENTIRE staged frame pool
    (F, ...); each update draws `batch` random frames.  One host dispatch
    per call — essential when per-dispatch latency (remote-TPU tunnels)
    would otherwise dominate step time.
    """
    F = images.shape[0]

    def body(carry, k):
        params, opt_state = carry
        idx = jax.random.randint(k, (batch,), 0, F)

        def loss_fn(p):
            pred = apply_fn(p, images[idx])
            return coord_l1_loss(pred, coord_maps_m[idx], masks[idx])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    keys = jax.random.split(key, n_updates)
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state),
                                               keys)
    return params, opt_state, losses


def patch_coord_pretrain_many(params, opt_state, images: jnp.ndarray,
                              obj_maps_mm: jnp.ndarray,
                              frame_idx: jnp.ndarray, pix_xy: jnp.ndarray,
                              apply_fn: Callable,
                              optimizer: optax.GradientTransformation,
                              patch_size: int):
    """K on-device patch-batch updates fused into one dispatch.

    The reference-parity patch arch (42x42 patches, train_obj.cpp:47-102)
    previously assembled batches host-side per round — unusable at the
    reference's 300k-update budget over a high-latency dispatch tunnel.
    Here the whole frame pool is staged on device and the host supplies
    only the (frame, pixel) schedule:

      images:      (F, H, W, 3) staged RGB pool
      obj_maps_mm: (F, H, W, 3) GT scene coordinates (mm)
      frame_idx:   (K, B) int32 — frame per patch per update
      pix_xy:      (K, B, 2) int32 — (x, y) patch centres, chosen VALID
                   (on-object, border-respecting) by the host scheduler

    Patch extraction is one fused 4-D dynamic slice per patch (no
    full-frame gather); labels gather from the coordinate maps in the
    same pass.  Returns (params, opt_state, losses (K,)).
    """
    P = patch_size
    half = P // 2
    Wimg = images.shape[2]
    Himg = images.shape[1]

    def body(carry, xs):
        params, opt_state = carry
        fi, pxy = xs  # (B,), (B, 2)

        def one(f, c):
            x0 = jnp.clip(c[0] - half, 0, Wimg - P)
            y0 = jnp.clip(c[1] - half, 0, Himg - P)
            return jax.lax.dynamic_slice(images, (f, y0, x0, 0),
                                         (1, P, P, images.shape[3]))[0]

        patches = jax.vmap(one)(fi, pxy)  # (B, P, P, 3)
        labels = obj_maps_mm[fi, pxy[:, 1], pxy[:, 0]] / 1000.0  # metres

        def loss_fn(p):
            return coord_l1_loss(apply_fn(p, patches), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state),
                                               (frame_idx, pix_xy))
    return params, opt_state, losses


def random_pose_perturbation(key: jax.Array, sigma_rot_deg: float,
                             sigma_trans_mm: float) -> Pose:
    """getRandHyp (train_score.cpp:48-72): uniform random axis, gaussian
    angle (deg) and gaussian per-axis translation (mm)."""
    ka, kg, kt = jax.random.split(key, 3)
    axis = jax.random.uniform(ka, (3,))
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-9)
    angle = jax.random.normal(kg, ()) * sigma_rot_deg * jnp.pi / 180.0
    trans = jax.random.normal(kt, (3,)) * sigma_trans_mm
    return pose_from_vec6(jnp.concatenate([axis * angle, trans]))


def make_score_batch(key: jax.Array, gt_pose: Pose, coords: jnp.ndarray,
                     pix: jnp.ndarray, cam: Camera, cfg: DSACConfig,
                     n_hyps: int = 16, temperature: float = 10.0):
    """Score-CNN pre-training samples for one frame.

    Mirrors train_score.cpp:166-234: half the hypotheses perturb the GT
    pose within the "good" band (sigma 2deg/2mm), half in the "bad" band
    (sigma 10deg/100mm); diff maps are rendered against the *predicted*
    coordinates; label = -temperature * maxLoss(perturbed, gt)
    (train_score.cpp:229, temperature train_score.cpp:139).
    """
    keys = jax.random.split(key, n_hyps)
    sig_rot = jnp.where(jnp.arange(n_hyps) % 2 == 0, 2.0, 10.0)
    sig_t = jnp.where(jnp.arange(n_hyps) % 2 == 0, 2.0, 100.0)
    perts = jax.vmap(random_pose_perturbation)(keys, sig_rot, sig_t)
    hyps = jax.vmap(lambda d: compose(gt_pose, d))(perts)

    dm = diffmaps(hyps, coords, pix, cam, cfg.pose.max_reprojection_error)
    grid = cfg.net.subsample_size
    labels = -temperature * jax.vmap(lambda h: max_loss(h, gt_pose))(hyps)
    return dm.reshape(n_hyps, grid, grid), labels


def score_pretrain_round(score_params, opt_state, frame_idx: jnp.ndarray,
                         keys: jax.Array, perm: jnp.ndarray,
                         images: jnp.ndarray, gt_R: jnp.ndarray,
                         gt_t: jnp.ndarray, coord_params,
                         coord_apply: Callable, score_apply: Callable,
                         cam: Camera, cfg: DSACConfig, n_hyps: int,
                         batch: int,
                         optimizer: optax.GradientTransformation):
    """One full train_score round fused into ONE device dispatch.

    The reference's round (train_score.cpp:271-373) subsamples F frames,
    predicts coordinates, renders two-band perturbation diff maps and
    takes minibatch Adam steps — a host loop costing ~30 blocking
    dispatches per round over a remote-TPU tunnel.  Here the frame pool
    lives on device and the host supplies only the round schedule:
    frame_idx (F,), per-frame keys (F,), and a shuffle perm (F*n_hyps,).

    Returns (score_params, opt_state, losses (n_batches,)).
    """
    from dsac_tpu.ops.sampling import stratified_sample

    grid = cfg.net.subsample_size

    def per_frame(fi, k):
        k1, k2 = jax.random.split(k)
        sampling = stratified_sample(k1, cfg.data.image_width,
                                     cfg.data.image_height, grid,
                                     cfg.net.rgb_patch_size)
        pix = sampling.reshape(-1, 2)
        coords = coord_apply(coord_params, images[fi], pix) * 1000.0
        return make_score_batch(k2, Pose(gt_R[fi], gt_t[fi]), coords,
                                pix.astype(jnp.float32), cam, cfg, n_hyps)

    dms, labs = jax.vmap(per_frame)(frame_idx, keys)
    dms = dms.reshape(-1, grid, grid)[perm]
    labs = labs.reshape(-1)[perm]
    nb = dms.shape[0] // batch
    dms = dms[:nb * batch].reshape(nb, batch, grid, grid)
    labs = labs[:nb * batch].reshape(nb, batch)

    def body(carry, xs):
        sp, os_ = carry
        d, l = xs
        sp, os_, loss = score_pretrain_step(sp, os_, d, l, score_apply,
                                            optimizer)
        return (sp, os_), loss

    (score_params, opt_state), losses = jax.lax.scan(
        body, (score_params, opt_state), (dms, labs))
    return score_params, opt_state, losses


def score_pretrain_step(params, opt_state, dmaps, labels,
                        apply_fn: Callable,
                        optimizer: optax.GradientTransformation):
    def loss_fn(p):
        pred = apply_fn(p, dmaps)
        return score_l1_loss(pred, labels)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


# ---------------------------------------------------------------------------
# end-to-end DSAC step
# ---------------------------------------------------------------------------

def e2e_expected_loss(coord_params, score_params, key: jax.Array,
                      image: jnp.ndarray, gt_pose: Pose,
                      coord_apply: Callable, score_apply: Callable,
                      cam: Camera, cfg: DSACConfig,
                      softam: bool = False,
                      grad_clamp: float = 0.1,
                      refine_mode=False,
                      score_anchor: float = 0.0):
    """The scalar objective whose jax.grad IS the reference's two-path
    backward (train_ransac.cpp:303-401).

    coord_apply(params, image, pix) -> (N, 3) metres.
    score_apply(params, dmaps) -> (H,) scores.
    Returns (objective, aux) where the objective is E[loss] for DSAC or
    maxLoss(refined average) for SoftAM (cnn_softam.h:1163).

    score_anchor > 0 adds a supervised anchor on the score CNN:
    W * mean_valid |score_h - (-10 * min(maxLoss(raw hyp_h), 40))| over
    the pool — the pretrain label convention (train_score.cpp:229,
    labels -10*max(rotErr, tErr/10) with GT available at train time)
    re-applied to the hypotheses the e2e round actually scored, through
    stop_gradient(dmaps) so it reaches ONLY the score parameters.  This
    counters the diagnosed e2e failure on decoy archetypes (BASELINE.md
    repeat/clutter rows): the REINFORCE term alone lets the score CNN
    drift onto decoy-consistent preferences / entropy collapse, while
    the anchor keeps its outputs pinned to true pose quality.  The 40
    clamp keeps wrong-mode targets (maxLoss can hit the 1e7 cap) inside
    the label range the pretrain distribution actually covered.
    """

    def coord_fn(img, pix):
        pred = coord_apply(coord_params, img, pix)
        return clamp_grad(pred, grad_clamp)

    def score_fn(dm):
        return score_apply(score_params, dm)

    if softam:
        res = process_frame_softam(key, image, coord_fn, score_fn, cam, cfg,
                                   refine_mode=refine_mode)
        objective = max_loss(res.final, gt_pose)
        losses = max_loss(res.refined, gt_pose)
    else:
        res = process_frame(key, image, coord_fn, score_fn, cam, cfg,
                            refine_all=True, fused_refine=refine_mode)
        losses = max_loss(res.refined, gt_pose)
        # Hypotheses with probability below 1e-4 are skipped by the
        # reference's pose path for variance control (train_ransac.cpp:319);
        # stop_gradient on their losses reproduces that exactly while
        # keeping the score-path (REINFORCE) term intact.
        skip = res.probs < 1e-4
        losses_pose_path = jnp.where(skip, jax.lax.stop_gradient(losses),
                                     losses)
        objective = jnp.sum(res.probs * losses_pose_path)

    anchor = jnp.asarray(0.0)
    if score_anchor > 0.0 and not softam:
        raw_losses = max_loss(res.hyps, gt_pose)  # pre-refinement poses
        target = -10.0 * jnp.minimum(raw_losses, 40.0)
        anchor_scores = score_fn(jax.lax.stop_gradient(res.dmaps))
        valid = res.hyp_valid.astype(anchor_scores.dtype)
        anchor = (jnp.sum(valid * jnp.abs(anchor_scores
                                          - jax.lax.stop_gradient(target)))
                  / jnp.maximum(jnp.sum(valid), 1.0))
        objective = objective + score_anchor * anchor

    aux = {
        "expected_loss": jnp.sum(res.probs * jax.lax.stop_gradient(losses)),
        "entropy": res.entropy,
        "winner_loss": max_loss(res.final, gt_pose),
        "valid_hyps": jnp.sum(res.hyp_valid),
        "score_anchor_l1": jax.lax.stop_gradient(anchor),
    }
    return objective, aux


def e2e_step(state: TrainState, key: jax.Array, image: jnp.ndarray,
             gt_pose: Pose, coord_apply: Callable, score_apply: Callable,
             cam: Camera, cfg: DSACConfig, softam: bool = False,
             refine_mode=False, score_anchor: float = 0.0):
    """One joint SGD update of both networks (one frame per round, like
    train_ransac.cpp:241).  refine_mode="implicit" uses the fused-forward
    implicit-gradient refinement (fast-training mode, TPU only)."""
    c_opt, s_opt = e2e_optimizers()

    grad_fn = jax.value_and_grad(e2e_expected_loss, argnums=(0, 1),
                                 has_aux=True)
    (loss, aux), (g_coord, g_score) = grad_fn(
        state.coord_params, state.score_params, key, image, gt_pose,
        coord_apply, score_apply, cam, cfg, softam,
        refine_mode=refine_mode, score_anchor=score_anchor)

    cu, c_state = c_opt.update(g_coord, state.coord_opt, state.coord_params)
    su, s_state = s_opt.update(g_score, state.score_opt, state.score_params)
    new_state = TrainState(
        optax.apply_updates(state.coord_params, cu),
        optax.apply_updates(state.score_params, su),
        c_state, s_state, state.step + 1)

    # gradient statistics, the reference logs these every round
    # (train_ransac.cpp:384-395): max / norm / finite flag
    leaves = jax.tree_util.tree_leaves(g_coord)
    flat = jnp.concatenate([jnp.ravel(l) for l in leaves])
    aux = dict(aux)
    aux["grad_max"] = jnp.max(jnp.abs(flat))
    aux["grad_norm"] = jnp.linalg.norm(flat)
    aux["grad_finite"] = jnp.all(jnp.isfinite(flat))
    return new_state, loss, aux


def e2e_step_many(state: TrainState, keys: jax.Array,
                  frame_idx: jnp.ndarray, images: jnp.ndarray,
                  gt_R: jnp.ndarray, gt_t: jnp.ndarray,
                  coord_apply: Callable, score_apply: Callable,
                  cam: Camera, cfg: DSACConfig, softam: bool = False,
                  refine_mode=False, score_anchor: float = 0.0):
    """K end-to-end rounds fused into ONE device dispatch via lax.scan.

    The reference trains 5000 rounds x 1 frame (train_ransac.cpp:50,
    :241); a per-round host loop pays a frame upload + a blocking sync
    per round, which over a remote-TPU tunnel costs 10-30x the actual
    step.  Here the whole frame pool lives on device (images (F,H,W,3),
    gt_R (F,3,3), gt_t (F,3)) and the host supplies only the round
    schedule: keys (K,) and frame_idx (K,) int32.

    Returns (state, losses (K,), aux dict of (K,) arrays).
    """

    def body(carry, xs):
        k, i = xs
        st, loss, aux = e2e_step(
            carry, k, images[i], Pose(gt_R[i], gt_t[i]), coord_apply,
            score_apply, cam, cfg, softam, refine_mode=refine_mode,
            score_anchor=score_anchor)
        return st, (loss, aux)

    state, (losses, auxes) = jax.lax.scan(body, state, (keys, frame_idx))
    return state, losses, auxes
