"""Data-parallel PRE-training over the device mesh.

The reference's pre-training programs (train_obj.cpp, train_score.cpp)
are single-GPU loops; this module is their scaling story, completing the
six-program mesh coverage (serve/train_ransac gained --mesh in round 3).
Pre-training has no hypothesis pool, so BOTH mesh axes act as one flat
data-parallel axis: the staged frame pool is sharded across all devices
(HBM capacity scales with the mesh), every device draws from its local
shard, and gradients pmean over ('data', 'hyp').

Semantics vs the single-device loops: each update's effective batch is
`batch` PER DEVICE (global batch = batch x n_devices, the standard DP
scaling), and frame draws are stratified by shard instead of uniform
over the pool.  Both are documented, deliberate scaling choices; the
collective correctness is pinned by emulated twins (tests) exactly like
parallel/sharded.py's oracle.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dsac_tpu.config import Camera, DSACConfig
from dsac_tpu.geometry.pose import Pose
from dsac_tpu.parallel.mesh import DATA_AXIS, HYP_AXIS

BOTH = (DATA_AXIS, HYP_AXIS)


def shard_pool(mesh: Mesh, *arrays):
    """Stage a frame pool sharded over ALL mesh devices along dim 0.

    Pads by repeating leading frames so the pool size divides the device
    count (repetition keeps every frame reachable; zero-padding would
    train on black frames).  Returns device arrays in the given order.
    """
    n = mesh.devices.size
    sh = NamedSharding(mesh, P(BOTH))
    F = int(arrays[0].shape[0])
    Fp = -(-F // n) * n
    out = []
    for a in arrays:
        a = np.asarray(a)
        if Fp != F:
            # cycle the pool as often as needed (F may be < Fp - F)
            reps = -(-Fp // F)
            a = np.concatenate([a] * reps)[:Fp]
        out.append(jax.device_put(a, sh))
    return tuple(out)


def _device_linear_index():
    """This device's flat index in (data major, hyp minor) order — the
    same order shard_pool lays the pool out in."""
    n_hyp = jax.lax.axis_size(HYP_AXIS)
    return jax.lax.axis_index(DATA_AXIS) * n_hyp + jax.lax.axis_index(
        HYP_AXIS)


def sharded_dense_pretrain_many(mesh: Mesh, apply_fn: Callable,
                                optimizer: optax.GradientTransformation,
                                n_updates: int, batch: int):
    """Mesh twin of pipeline.train.dense_coord_pretrain_many.

    Returns step(params, opt_state, key, images, maps, masks) ->
    (params, opt_state, losses (n_updates,)); pool arrays must be staged
    with shard_pool.  Per update, every device draws `batch` frames from
    its local pool shard (fold_in(key, device) — deterministic and
    process-count independent) and gradients pmean over the whole mesh.
    """
    from dsac_tpu.pipeline.train import coord_l1_loss

    def per_device(params, opt_state, key, images, maps, masks):
        F = images.shape[0]  # local pool shard size
        me = _device_linear_index()

        def body(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(jax.random.fold_in(k, me), (batch,),
                                     0, F)

            def loss_fn(p):
                pred = apply_fn(p, images[idx])
                return coord_l1_loss(pred, maps[idx], masks[idx])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, BOTH), grads)
            loss = jax.lax.pmean(loss, BOTH)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_updates)
        (params, opt_state), losses = jax.lax.scan(body,
                                                   (params, opt_state),
                                                   keys)
        return params, opt_state, losses

    rep = P()
    pool = P(BOTH)
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, pool, pool, pool),
        out_specs=(rep, rep, rep), check_vma=False))


def emulated_dense_pretrain_many(n_devices: int, apply_fn: Callable,
                                 optimizer: optax.GradientTransformation,
                                 n_updates: int, batch: int):
    """Collective-free single-device twin of sharded_dense_pretrain_many
    (same per-device draws, pmean -> mean): the exact-equality oracle."""
    from dsac_tpu.pipeline.train import coord_l1_loss

    def step(params, opt_state, key, images, maps, masks):
        F = images.shape[0] // n_devices
        sh = lambda a: a.reshape(n_devices, F, *a.shape[1:])
        im, mp, mk = sh(images), sh(maps), sh(masks)

        def body(carry, k):
            params, opt_state = carry

            def dev_loss(p, d):
                idx = jax.random.randint(jax.random.fold_in(k, d),
                                         (batch,), 0, F)
                return coord_l1_loss(apply_fn(p, im[d, idx]),
                                     mp[d, idx], mk[d, idx])

            def loss_fn(p):
                return jnp.mean(jax.vmap(
                    functools.partial(dev_loss, p))(
                        jnp.arange(n_devices)))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_updates)
        (params, opt_state), losses = jax.lax.scan(body,
                                                   (params, opt_state),
                                                   keys)
        return params, opt_state, losses

    return jax.jit(step)


def sharded_patch_pretrain_many(mesh: Mesh, apply_fn: Callable,
                                optimizer: optax.GradientTransformation,
                                patch_size: int):
    """Mesh twin of pipeline.train.patch_coord_pretrain_many.

    The host supplies PER-DEVICE schedules with pool-LOCAL frame indices:
    frame_idx (n_dev, K, B_local) and pix_xy (n_dev, K, B_local, 2),
    sharded over the mesh on dim 0 alongside the shard_pool'ed
    images/obj maps.  Each device extracts its B_local patches per
    update; gradients pmean (global batch = B_local x n_devices).
    """

    from dsac_tpu.pipeline.train import coord_l1_loss

    Ppatch = patch_size
    half = Ppatch // 2

    def per_device(params, opt_state, images, obj_maps, frame_idx, pix_xy):
        Wimg, Himg = images.shape[2], images.shape[1]
        fi_k = frame_idx[0]  # (K, B_local): dim 0 is the device shard
        px_k = pix_xy[0]

        def body(carry, xs):
            params, opt_state = carry
            fi, pxy = xs

            def one(f, c):
                x0 = jnp.clip(c[0] - half, 0, Wimg - Ppatch)
                y0 = jnp.clip(c[1] - half, 0, Himg - Ppatch)
                return jax.lax.dynamic_slice(
                    images, (f, y0, x0, 0),
                    (1, Ppatch, Ppatch, images.shape[3]))[0]

            patches = jax.vmap(one)(fi, pxy)
            labels = obj_maps[fi, pxy[:, 1], pxy[:, 0]] / 1000.0

            def loss_fn(p):
                return coord_l1_loss(apply_fn(p, patches), labels)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.tree.map(lambda g: jax.lax.pmean(g, BOTH), grads)
            loss = jax.lax.pmean(loss, BOTH)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(body,
                                                   (params, opt_state),
                                                   (fi_k, px_k))
        return params, opt_state, losses

    rep = P()
    pool = P(BOTH)
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, pool, pool, pool, pool),
        out_specs=(rep, rep, rep), check_vma=False))


def sharded_score_pretrain_round(mesh: Mesh, coord_apply: Callable,
                                 score_apply: Callable, cam: Camera,
                                 cfg: DSACConfig, n_hyps: int, batch: int,
                                 optimizer: optax.GradientTransformation):
    """Mesh twin of pipeline.train.score_pretrain_round.

    The heavy half of a round — coordinate-CNN inference + two-band
    perturbation diff-map rendering per frame (train_score.cpp:166-234)
    — is sharded: each device renders the diff maps for its slice of the
    round's frames (pool-LOCAL indices, sharded alongside the pool).
    The (F*n_hyps) sample set is then all_gathered (40x40 maps — tiny)
    and the minibatch Adam scan runs replicated, so the OPTIMIZER
    schedule is bit-comparable to the single-device round: same number
    of steps, same batch size, same shuffle.

    step(score_params, opt_state, frame_idx, keys, perm, images, gt_R,
    gt_t, coord_params) -> (score_params, opt_state, losses).
    frame_idx/keys: (F_round,) sharded over the mesh (pool-local ids);
    perm: (F_round * n_hyps,) replicated shuffle.
    """
    from dsac_tpu.ops.sampling import stratified_sample
    from dsac_tpu.pipeline.train import make_score_batch, score_pretrain_step

    grid = cfg.net.subsample_size

    def per_device(score_params, opt_state, frame_idx, keys, perm, images,
                   gt_R, gt_t, coord_params):
        def per_frame(fi, k):
            k1, k2 = jax.random.split(k)
            sampling = stratified_sample(k1, cfg.data.image_width,
                                         cfg.data.image_height, grid,
                                         cfg.net.rgb_patch_size)
            pix = sampling.reshape(-1, 2)
            coords = coord_apply(coord_params, images[fi], pix) * 1000.0
            return make_score_batch(k2, Pose(gt_R[fi], gt_t[fi]), coords,
                                    pix.astype(jnp.float32), cam, cfg,
                                    n_hyps)

        dms_l, labs_l = jax.vmap(per_frame)(frame_idx, keys)
        # gather the full round's samples (device-linear order matches
        # shard_pool / host schedule order)
        dms = jax.lax.all_gather(dms_l, BOTH, tiled=True)
        labs = jax.lax.all_gather(labs_l, BOTH, tiled=True)

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

    rep = P()
    pool = P(BOTH)
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, pool, pool, rep, pool, pool, pool, rep),
        out_specs=(rep, rep, rep), check_vma=False))


def sharded_eval_step(mesh: Mesh, coord_apply: Callable,
                      score_apply: Callable, cam: Camera, cfg: DSACConfig,
                      coord_collective: bool = False, refine_mode="auto",
                      softam: bool = False):
    """Mesh EVALUATION step for test_ransac --mesh.

    Frames shard over 'data', the hypothesis pool over 'hyp'; the full
    local pool is refined (the reference's test-time behaviour,
    test_ransac.cpp:104-240) so the expected loss / entropy the error
    files report keep their single-chip semantics.  Winner selection is
    argmax (the -rdraw 0 evaluation convention).

    step(coord_params, score_params, keys, images, gt_R, gt_t) ->
    (expected (B,), entropy (B,), winner_loss (B,), R (B,3,3), t (B,3)).
    """
    from dsac_tpu.parallel.sharded import (_auto_serve_modes,
                                           sharded_process_frame)

    n_hyp = mesh.shape[HYP_AXIS]
    _, refine_mode = _auto_serve_modes(None, refine_mode)

    def per_device(coord_params, score_params, keys, images, gt_R, gt_t):
        def one(key, image, R, t):
            expected, aux = sharded_process_frame(
                key, image,
                lambda img, pix: coord_apply(coord_params, img, pix),
                lambda dm: score_apply(score_params, dm), cam, cfg, n_hyp,
                Pose(R, t), coord_collective=coord_collective,
                refine_mode=refine_mode, softam=softam)
            return (expected, aux["entropy"], aux["winner_loss"],
                    aux["final_pose"].R, aux["final_pose"].t)

        return jax.vmap(one)(keys, images, gt_R, gt_t)

    rep = P()
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS),) * 5, check_vma=False))
