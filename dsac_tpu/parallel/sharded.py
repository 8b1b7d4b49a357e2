"""Sharded (SPMD) DSAC: hypothesis-pool + frame partitioning via shard_map.

Per-device program layout for one frame on the 'hyp' axis (size Y):

  patches   : each device runs the coordinate CNN on N/Y of the sampled
              pixels, then all_gathers the full (N, 3) coordinate block —
              the CNN FLOPs split Y-ways (no redundant compute);
  hypotheses: each device samples/scores/refines H/Y hypotheses against
              the full coordinate block;
  softmax   : score logits all_gather over 'hyp' -> global distribution
              (the collective form of core/cnn.h:1147);
  E[loss]   : per-shard sum psum'd over 'hyp'
              (the collective form of train_ransac.cpp:355-363);
  winner    : owner-shard selection via masked psum.

The 'data' axis is plain data parallelism over frames; gradients psum
over both axes.  jax.grad composes with shard_map, so the training step
is just grad-of-the-sharded-loss — collective transposes (all_gather <->
psum_scatter) are inserted by JAX.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dsac_tpu.config import Camera, DSACConfig
from dsac_tpu.geometry.loss import max_loss
from dsac_tpu.geometry.pose import Pose, pose_from_vec6, pose_to_vec6
from dsac_tpu.ops.diffmap import diffmaps
from dsac_tpu.ops.sampling import sample_minimal_sets, stratified_sample
from dsac_tpu.ops.select import shannon_entropy
from dsac_tpu.parallel.mesh import DATA_AXIS, HYP_AXIS
from dsac_tpu.pipeline.forward import make_refiners


def _auto_serve_modes(fused_sampling, refine_mode):
    """Resolve 'auto'/None serve-path kernel modes by backend.

    On TPU the sharded paths default to the SAME fast kernels as the
    single-chip serve (fused SoA P3P sampling + single-launch IRLS
    refinement) so multi-chip deployment is never a per-chip regression;
    elsewhere they default to the jnp paths (the CPU farm runs Pallas
    only interpreted, which tests use explicitly).
    """
    on_tpu = jax.default_backend() == "tpu"
    if fused_sampling is None:
        fused_sampling = on_tpu
    if refine_mode in (None, "auto"):
        refine_mode = "fused" if on_tpu else False
    return fused_sampling, refine_mode


def _auto_train_mode(refine_mode):
    """'auto' training refine mode: implicit-function gradients over the
    fused Pallas forward on TPU, unrolled autodiff elsewhere."""
    if refine_mode in (None, "auto"):
        return "implicit" if jax.default_backend() == "tpu" else False
    return refine_mode


def _local_slice(x: jnp.ndarray, axis_name: str, n_shards: int,
                 axis: int = 0) -> jnp.ndarray:
    """This device's equal slice of x along `axis`."""
    idx = jax.lax.axis_index(axis_name)
    size = x.shape[axis] // n_shards
    return jax.lax.dynamic_slice_in_dim(x, idx * size, size, axis=axis)


def banded_dense_coords(apply_full: Callable, image: jnp.ndarray,
                        n_shards: int, margin: int = 32, stride: int = 8,
                        axis_name: str = HYP_AXIS) -> jnp.ndarray:
    """Spatially-sharded dense-FCN coordinate map via ppermute halo
    exchange over the `axis_name` mesh axis.

    Each shard owns a horizontal band of the frame's rows.  Neighbouring
    shards exchange 2*margin-row halos over ICI (`ppermute` up/down), each
    shard runs the FCN on [halo | band | halo], crops its stride-aligned
    output rows, and the full (H/stride, W/stride, 3) map is all_gathered.
    Per-shard FCN compute is ~(1/n + 2*margin/H) of a full replicated
    pass, and only O(margin) rows ride the interconnect per neighbour.

    Non-divisible heights are handled by zero-padding the frame to
    n_shards * ceil-band rows (the semantic oracle is `apply_full` of the
    zero-padded frame, cropped — identical to the unpadded frame away
    from the bottom margin); edge shards shift their window inward
    (mirroring the reference-era band clamp) so the convolutions only
    ever see frame rows plus that explicit padding.

    `apply_full` maps (H', W, 3) -> (H'/stride, W/stride, 3) and must be
    shift-equivariant at `stride` granularity with an effective
    receptive-field half-width <= margin (DenseCoordNet: 22 px < 32).
    """
    Himg = image.shape[0]
    assert Himg % stride == 0 and margin % stride == 0
    out_rows = Himg // stride
    band_out = -(-out_rows // n_shards)  # ceil: output rows per shard
    b_in = band_out * stride  # input band rows per shard
    Hp = n_shards * b_in  # padded frame height
    assert 2 * margin <= b_in, (
        f"margin {margin} too large for band {b_in} "
        f"({n_shards} shards x {Himg} rows)")

    i = jax.lax.axis_index(axis_name)
    img_p = jnp.pad(image, ((0, Hp - Himg),) + ((0, 0),) * (image.ndim - 1))
    my = jax.lax.dynamic_slice_in_dim(img_p, i * b_in, b_in, axis=0)

    # halo exchange: shard i sends its bottom 2m rows down / top 2m rows
    # up; edge shards receive zeros (ppermute's out-of-range fill), which
    # their clamped windows never read.
    m2 = 2 * margin
    up_halo = jax.lax.ppermute(  # rows [i*b_in - 2m, i*b_in) from i-1
        my[-m2:], axis_name,
        [(j, j + 1) for j in range(n_shards - 1)])
    down_halo = jax.lax.ppermute(  # rows [(i+1)*b_in, ..+2m) from i+1
        my[:m2], axis_name,
        [(j, j - 1) for j in range(1, n_shards)])
    strip = jnp.concatenate([up_halo, my, down_halo], axis=0)

    # stride-aligned window of b_in + 2*margin rows, clamped inside the
    # padded frame (so edge windows slide inward instead of reading the
    # zero-filled halo slots)
    ext = b_in + 2 * margin
    start_g = jnp.clip(i * b_in - margin, 0, Hp - ext)  # global row
    start_l = start_g - (i * b_in - m2)  # strip-local row
    window = jax.lax.dynamic_slice_in_dim(strip, start_l, ext, axis=0)

    cmap_ext = apply_full(window)  # (ext/stride, W/stride, 3)
    off = i * band_out - start_g // stride
    cmap_band = jax.lax.dynamic_slice_in_dim(cmap_ext, off, band_out,
                                             axis=0)
    full = jax.lax.all_gather(cmap_band, axis_name, tiled=True)
    return full[:out_rows]


def sharded_process_frame(key: jax.Array, image: jnp.ndarray,
                          coord_fn: Callable, score_fn: Callable,
                          cam: Camera, cfg: DSACConfig, n_hyp_shards: int,
                          gt_pose: Pose, coord_collective: bool = False,
                          refine_mode=False, softam: bool = False):
    """Per-device body (inside shard_map) for ONE frame.

    Returns (expected_loss, aux) where expected_loss is the full-pool
    expectation (identical on every 'hyp' member after the psum).
    `key` must be identical across the 'hyp' axis for the frame-level
    randomness (sampling grid) and is folded with the axis index for the
    per-shard hypothesis draws.

    coord_collective=False: coord_fn(image, pix_local) is evaluated on a
    1/n slice of the sample pixels and all_gathered (patch-CNN sharding).
    coord_collective=True: coord_fn(image, pix) performs its own
    collectives (e.g. banded_dense_coords) and returns ALL N coordinates
    replicated — the right mode for the dense FCN.

    refine_mode selects the per-shard refinement/gradient realisation
    (pipeline.forward.make_refiners): False/"unroll" autodiffs the IRLS
    scan; "implicit" runs the fused Pallas forward with implicit-function
    gradients (the fast multi-chip TRAINING mode — same semantics as the
    single-chip e2e_step's); "implicit_jnp" is its CPU-testable twin.

    softam=True switches to the soft-argmax objective
    (cnn_softam.h:960-1180): the softmax weights AVERAGE the pool's
    (rodrigues, t) 6-vectors — a psum over 'hyp' — and only the averaged
    pose is refined (replicated per shard), maxLoss of the result being
    the objective.  The local pool is never refined, so softam shards
    only the front end (CNN + sampling + scoring).
    """
    pcfg = cfg.pose
    H_local = pcfg.num_hypotheses // n_hyp_shards
    grid = cfg.net.subsample_size
    shard = jax.lax.axis_index(HYP_AXIS)

    k_samp, k_hyp = jax.random.split(key)

    # --- coordinate CNN, sharded over 'hyp' ---
    sampling = stratified_sample(k_samp, cfg.data.image_width,
                                 cfg.data.image_height, grid,
                                 cfg.net.rgb_patch_size)
    pix = sampling.reshape(-1, 2)
    if coord_collective:
        coords = coord_fn(image, pix) * 1000.0  # (N, 3) mm, replicated
    else:
        pix_local = _local_slice(pix, HYP_AXIS, n_hyp_shards)
        coords_local = coord_fn(image, pix_local) * 1000.0  # mm
        coords = jax.lax.all_gather(coords_local, HYP_AXIS,
                                    tiled=True)  # (N, 3)
    pixf = pix.astype(jnp.float32)

    # --- per-shard hypothesis pool ---
    import dataclasses
    local_cfg = dataclasses.replace(pcfg, num_hypotheses=H_local)
    k_local = jax.random.fold_in(k_hyp, shard)
    sets = sample_minimal_sets(k_local, coords, pixf, cam, local_cfg)
    dm = diffmaps(sets.poses, coords, pixf, cam,
                  pcfg.max_reprojection_error)
    scores_local = score_fn(dm.reshape(H_local, grid, grid))
    scores_local = jnp.where(sets.valid, scores_local, -1e9)

    # --- global softmax over the full pool (collective core/cnn.h:1147) ---
    scores = jax.lax.all_gather(scores_local, HYP_AXIS, tiled=True)  # (H,)
    probs = jax.nn.softmax(scores)
    probs_local = _local_slice(probs, HYP_AXIS, n_hyp_shards)

    if softam:
        # softmax-weighted pool average via psum (cnn_softam.h:1082-1094)
        vecs_local = pose_to_vec6(sets.poses)  # (H_local, 6)
        avg_vec = jax.lax.psum(
            jnp.sum(probs_local[:, None] * vecs_local, axis=0), HYP_AXIS)
        avg = pose_from_vec6(avg_vec)
        _, refine_one = make_refiners(coords, pixf, cam, pcfg,
                                      refine_mode, inject_init=True)
        final, _n_in = refine_one(avg)
        objective = max_loss(final, gt_pose)
        aux = {
            "entropy": shannon_entropy(probs),
            "winner_loss": objective,
            "valid_hyps": jax.lax.psum(jnp.sum(sets.valid), HYP_AXIS),
            "final_pose": final,
        }
        return objective, aux

    # --- refinement of the local shard (core/cnn.h:1168-1230, the
    # OpenMP axis being scaled; kernel/gradient mode per make_refiners) ---
    refine_batch, _ = make_refiners(coords, pixf, cam, pcfg, refine_mode)
    refined_local, n_in = refine_batch(sets.poses)

    losses_local = max_loss(refined_local, gt_pose)  # (H_local,)
    skip = probs_local < 1e-4  # variance control (train_ransac.cpp:319)
    losses_pose_path = jnp.where(skip, jax.lax.stop_gradient(losses_local),
                                 losses_local)
    expected = jax.lax.psum(jnp.sum(probs_local * losses_pose_path),
                            HYP_AXIS)

    # --- winner (argmax) via owner-shard masked psum ---
    winner = jnp.argmax(scores)
    owner = winner // H_local
    local_idx = winner - owner * H_local
    is_owner = (owner == shard).astype(jnp.float32)
    win_R = jax.lax.psum(refined_local.R[local_idx] * is_owner, HYP_AXIS)
    win_t = jax.lax.psum(refined_local.t[local_idx] * is_owner, HYP_AXIS)

    aux = {
        "entropy": shannon_entropy(probs),
        "winner_loss": max_loss(Pose(win_R, win_t), gt_pose),
        "valid_hyps": jax.lax.psum(jnp.sum(sets.valid), HYP_AXIS),
        "final_pose": Pose(win_R, win_t),
    }
    return expected, aux


def emulated_expected_loss(key: jax.Array, image: jnp.ndarray,
                           coord_fn: Callable, score_fn: Callable,
                           cam: Camera, cfg: DSACConfig,
                           n_hyp_shards: int, gt_pose: Pose,
                           refine_mode=False):
    """Collective-free single-device twin of sharded_process_frame.

    Reproduces the EXACT draws of the hyp-sharded program — same
    key split, same per-shard fold_in(k_hyp, shard), same local pool
    sizes — with every collective replaced by its dense equivalent
    (all_gather -> reshape over an explicit shard axis, psum -> sum).
    The multichip dryrun compares the shard_map program against this
    function as an EQUALITY (not a statistical range): any collective
    layout/transpose bug shows up as a numeric difference.

    coord_fn here is the replicated form (full pixel set in, all coords
    out) — the pointwise-oracle analogue of both coord modes.
    """
    import dataclasses

    pcfg = cfg.pose
    H_local = pcfg.num_hypotheses // n_hyp_shards
    grid = cfg.net.subsample_size
    k_samp, k_hyp = jax.random.split(key)

    sampling = stratified_sample(k_samp, cfg.data.image_width,
                                 cfg.data.image_height, grid,
                                 cfg.net.rgb_patch_size)
    pix = sampling.reshape(-1, 2)
    coords = coord_fn(image, pix) * 1000.0
    pixf = pix.astype(jnp.float32)
    local_cfg = dataclasses.replace(pcfg, num_hypotheses=H_local)

    def shard_body(s):
        k_local = jax.random.fold_in(k_hyp, s)
        sets = sample_minimal_sets(k_local, coords, pixf, cam, local_cfg)
        dm = diffmaps(sets.poses, coords, pixf, cam,
                      pcfg.max_reprojection_error)
        scores_local = score_fn(dm.reshape(H_local, grid, grid))
        return (jnp.where(sets.valid, scores_local, -1e9),
                sets.poses.R, sets.poses.t, sets.valid)

    scores_l, R_l, t_l, valid_l = jax.vmap(shard_body)(
        jnp.arange(n_hyp_shards))
    scores = scores_l.reshape(-1)  # == all_gather(tiled) shard order
    probs = jax.nn.softmax(scores)
    pool = Pose(R_l.reshape(-1, 3, 3), t_l.reshape(-1, 3))

    refine_batch, _ = make_refiners(coords, pixf, cam, pcfg, refine_mode)
    refined, n_in = refine_batch(pool)
    losses = max_loss(refined, gt_pose)
    skip = probs < 1e-4
    losses_pose_path = jnp.where(skip, jax.lax.stop_gradient(losses),
                                 losses)
    expected = jnp.sum(probs * losses_pose_path)

    winner = jnp.argmax(scores)
    aux = {
        "entropy": shannon_entropy(probs),
        "winner_loss": max_loss(_take(refined, winner), gt_pose),
        "valid_hyps": jnp.sum(valid_l),
    }
    return expected, aux


def _take(p: Pose, idx) -> Pose:
    return Pose(p.R[idx], p.t[idx])


def sharded_serve_frame(key: jax.Array, image: jnp.ndarray,
                        coord_fn: Callable, score_fn: Callable,
                        cam: Camera, cfg: DSACConfig, n_hyp_shards: int,
                        coord_collective: bool = False,
                        verify_topk: int = 0,
                        fused_sampling: bool = False,
                        refine_mode=False,
                        scoring: str = "cnn",
                        softam: bool = False):
    """Per-device body (inside shard_map) for serving ONE frame.

    The serve twin of sharded_process_frame: no ground truth, winner-only
    refinement (or top-K verified selection, cf.
    pipeline.forward.process_frame(verify_topk=K)).  Front end is
    hypothesis-sharded exactly like training; the minimal-pose pool is
    then all_gathered (H x 12 floats — trivial on ICI) so every shard
    refines the same winner/top-K candidates in lockstep.  That trades a
    K-pose redundant refine per shard for zero owner-masking collectives;
    with SPMD lockstep the wall time is identical and the code is
    branch-free.

    fused_sampling/refine_mode select the same fast serve kernels as the
    single-chip path (ops/p3p_pallas.py SoA sampler; make_refiners
    "fused" = single-launch Pallas IRLS) — the per-chip speed must not
    regress when the pool is sharded.

    scoring="fused_soft" is the very-large-H regime (the scaled analogue
    of core/cnn.h:1135-1141) sharded over 'hyp': each shard scores its
    H/Y hypotheses with the fused reprojection+soft-inlier kernel, so
    neither the (H, N) error surface nor the (H, G, G) diff-map stack
    ever materialises; score_fn is unused.

    Returns (final_pose, scores, probs, entropy, chosen).
    """
    from dsac_tpu.ops.select import draw_hypothesis, softmax_scores

    pcfg = cfg.pose
    H_local = pcfg.num_hypotheses // n_hyp_shards
    grid = cfg.net.subsample_size
    shard = jax.lax.axis_index(HYP_AXIS)
    k_samp, k_hyp, k_draw = jax.random.split(key, 3)

    sampling = stratified_sample(k_samp, cfg.data.image_width,
                                 cfg.data.image_height, grid,
                                 cfg.net.rgb_patch_size)
    pix = sampling.reshape(-1, 2)
    if coord_collective:
        coords = coord_fn(image, pix) * 1000.0  # (N, 3) mm, replicated
    else:
        pix_local = _local_slice(pix, HYP_AXIS, n_hyp_shards)
        coords_local = coord_fn(image, pix_local) * 1000.0
        coords = jax.lax.all_gather(coords_local, HYP_AXIS, tiled=True)
    pixf = pix.astype(jnp.float32)

    import dataclasses
    local_cfg = dataclasses.replace(pcfg, num_hypotheses=H_local)
    k_local = jax.random.fold_in(k_hyp, shard)
    sets = sample_minimal_sets(k_local, coords, pixf, cam, local_cfg,
                               fused=fused_sampling)
    if scoring == "fused_soft":
        from dsac_tpu.ops.diffmap_pallas import soft_inlier_scores_pallas
        cam_vec = jnp.stack([cam.focal, cam.cx, cam.cy])
        scores_local = soft_inlier_scores_pallas(
            sets.poses.R, sets.poses.t, coords, pixf, cam_vec,
            threshold=pcfg.inlier_threshold_2d, beta=pcfg.score_beta,
            max_error=pcfg.max_reprojection_error,
            interpret=jax.default_backend() != "tpu")
    elif scoring == "cnn":
        dm = diffmaps(sets.poses, coords, pixf, cam,
                      pcfg.max_reprojection_error)
        scores_local = score_fn(dm.reshape(H_local, grid, grid))
    else:
        raise ValueError(f"unknown scoring mode {scoring!r}")
    scores_local = jnp.where(sets.valid, scores_local, -1e9)

    # global pool: scores + minimal poses (H x (9+3) floats)
    scores = jax.lax.all_gather(scores_local, HYP_AXIS, tiled=True)
    pool = Pose(jax.lax.all_gather(sets.poses.R, HYP_AXIS, tiled=True),
                jax.lax.all_gather(sets.poses.t, HYP_AXIS, tiled=True))
    probs = softmax_scores(scores)
    ent = shannon_entropy(probs)
    # k_draw is identical across the 'hyp' axis -> same draw on every shard
    chosen = draw_hypothesis(k_draw, scores, pcfg.random_draw)

    if softam:
        # soft-argmax serving: softmax-weighted pool average via psum
        # (cnn_softam.h:1082-1094), averaged pose refined replicated —
        # the serve twin of sharded_process_frame(softam=True)
        probs_local = _local_slice(probs, HYP_AXIS, n_hyp_shards)
        vecs_local = pose_to_vec6(sets.poses)  # (H_local, 6)
        avg_vec = jax.lax.psum(
            jnp.sum(probs_local[:, None] * vecs_local, axis=0), HYP_AXIS)
        avg = pose_from_vec6(avg_vec)
        _, refine_one = make_refiners(coords, pixf, cam, pcfg,
                                      refine_mode)
        final, _n_in = refine_one(avg)
        return final, scores, probs, ent, jnp.argmax(scores)

    refine_batchk, _ = make_refiners(coords, pixf, cam, pcfg, refine_mode)

    if verify_topk > 1:
        k = min(int(verify_topk), pcfg.num_hypotheses)
        top_scores, top = jax.lax.top_k(scores, k)
        cand = Pose(pool.R[top], pool.t[top])
        refined_k, n_k = refine_batchk(cand)
        n_k = jnp.where(top_scores > -1e8, n_k, -1.0)
        best = jnp.argmax(n_k)
        final = Pose(refined_k.R[best], refined_k.t[best])
        chosen = top[best]
    else:
        cand = Pose(pool.R[chosen][None], pool.t[chosen][None])
        refined1, _ = refine_batchk(cand)
        final = Pose(refined1.R[0], refined1.t[0])
    return final, scores, probs, ent, chosen


def sharded_serve_step(mesh: Mesh, coord_apply: Callable,
                       score_apply: Callable, cam: Camera, cfg: DSACConfig,
                       coord_collective: bool = False,
                       verify_topk: int = 0,
                       fused_sampling: bool | None = None,
                       refine_mode="auto",
                       scoring: str = "cnn",
                       softam: bool = False):
    """Build the jitted multi-device serving step (inference twin of
    sharded_e2e_step).

    Returns serve(coord_params, score_params, keys, images) ->
    (final_R (B,3,3), final_t (B,3), scores (B,H), entropy (B,),
    chosen (B,)) with images/keys sharded over 'data' and the hypothesis
    pool sharded over 'hyp'.  Parameters are replicated.

    fused_sampling/refine_mode default to the backend's fast kernels
    ("auto": fused SoA P3P + single-launch Pallas IRLS on TPU, jnp
    elsewhere) so per-chip serve speed matches the single-chip program.
    """
    n_hyp = mesh.shape[HYP_AXIS]
    fused_sampling, refine_mode = _auto_serve_modes(fused_sampling,
                                                    refine_mode)

    def per_device(coord_params, score_params, keys, images):
        def one(key, image):
            final, scores, probs, ent, chosen = sharded_serve_frame(
                key, image,
                lambda img, pix: coord_apply(coord_params, img, pix),
                lambda dm: score_apply(score_params, dm), cam, cfg, n_hyp,
                coord_collective=coord_collective,
                verify_topk=verify_topk,
                fused_sampling=fused_sampling,
                refine_mode=refine_mode,
                scoring=scoring, softam=softam)
            return final.R, final.t, scores, ent, chosen

        return jax.vmap(one)(keys, images)

    rep = P()
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS),) * 5,
        check_vma=False,
    ))


def sharded_expected_loss(coord_params, score_params, keys: jax.Array,
                          images: jnp.ndarray, gt_poses: Pose,
                          coord_apply: Callable, score_apply: Callable,
                          cam: Camera, cfg: DSACConfig, n_hyp_shards: int,
                          coord_collective: bool = False,
                          refine_mode=False, softam: bool = False):
    """Mean expected loss over this device's local frame batch.

    Per-device body: vmaps sharded_process_frame over the local frames and
    averages over the GLOBAL batch (psum over 'data').
    """

    def coord_fn_factory(img):
        return lambda _img, pix: coord_apply(coord_params, img, pix)

    def one_frame(key, image, gt_R, gt_t):
        return sharded_process_frame(
            key, image, coord_fn_factory(image),
            lambda dm: score_apply(score_params, dm), cam, cfg,
            n_hyp_shards, Pose(gt_R, gt_t),
            coord_collective=coord_collective,
            refine_mode=refine_mode, softam=softam)

    losses, aux = jax.vmap(one_frame)(keys, images, gt_poses.R, gt_poses.t)
    local_mean = jnp.mean(losses)
    n_data = jax.lax.psum(1.0, DATA_AXIS)
    global_mean = jax.lax.psum(local_mean, DATA_AXIS) / n_data
    return global_mean, jax.tree.map(jnp.mean, {
        k: v for k, v in aux.items() if k != "final_pose"})


def sharded_e2e_step(mesh: Mesh, coord_apply: Callable,
                     score_apply: Callable, cam: Camera, cfg: DSACConfig,
                     coord_opt, score_opt, coord_collective: bool = False,
                     refine_mode="auto", softam: bool = False):
    """Build the jitted multi-device end-to-end training step.

    Returns step(state_tuple, keys, images, gt_R, gt_t) where
    state_tuple = (coord_params, score_params, coord_opt_state,
    score_opt_state); images are (B, H, W, 3) sharded over 'data'; keys
    are per-frame (B, 2) uint32.  Parameters are replicated; gradient
    psums over both axes are inserted by shard_map's grad transpose plus
    an explicit psum for the replicated-parameter sum.

    refine_mode "auto" = implicit-function gradients over the fused
    Pallas forward on TPU (the fast single-chip training mode carried to
    the mesh), unrolled autodiff elsewhere; any make_refiners mode is
    accepted ("implicit_jnp" is the CPU-farm gradient twin).
    """
    n_hyp = mesh.shape[HYP_AXIS]
    refine_mode = _auto_train_mode(refine_mode)

    def per_device(coord_params, score_params, c_opt_state, s_opt_state,
                   keys, images, gt_R, gt_t):
        def loss_fn(cp, sp):
            return sharded_expected_loss(cp, sp, keys, images,
                                         Pose(gt_R, gt_t), coord_apply,
                                         score_apply, cam, cfg, n_hyp,
                                         coord_collective=coord_collective,
                                         refine_mode=refine_mode,
                                         softam=softam)

        (loss, aux), (g_c, g_s) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(coord_params,
                                                   score_params)
        # params are replicated; sum gradient contributions of all shards
        g_c = jax.tree.map(lambda g: jax.lax.psum(g, (DATA_AXIS, HYP_AXIS)),
                           g_c)
        g_s = jax.tree.map(lambda g: jax.lax.psum(g, (DATA_AXIS, HYP_AXIS)),
                           g_s)
        cu, c_state = coord_opt.update(g_c, c_opt_state, coord_params)
        su, s_state = score_opt.update(g_s, s_opt_state, score_params)
        import optax
        new_cp = optax.apply_updates(coord_params, cu)
        new_sp = optax.apply_updates(score_params, su)
        return new_cp, new_sp, c_state, s_state, loss, aux

    rep = P()  # replicated
    step = jax.jit(jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, rep,
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(rep, rep, rep, rep, rep, rep),
        check_vma=False,
    ))
    return step
