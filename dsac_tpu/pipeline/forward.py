"""DSAC forward passes (the processImage equivalents).

The reference's forward (core/cnn.h:1028-1257) interleaves five stages with
three process boundaries; here it is one traced JAX program:

  stratified subsample -> coordinate CNN -> minimal-set P3P sampling ->
  dense diff-map scoring -> softmax/draw -> soft-inlier GN refinement.

Two selection variants, like the reference:
  * process_frame        — DSAC: score CNN + probabilistic winner draw
                           (core/cnn.h)
  * process_frame_softam — soft-argmax: softmax-weighted average of the
                           hypothesis pool is refined
                           (core/cnn_softam.h:1082-1154)

The coordinate and score networks enter as closures (`coord_fn`,
`score_fn`) so the same pipeline serves patch nets, the dense FCN, the
soft-inlier scoring head, or frozen models — and jax.grad through the
closures gives end-to-end training.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from dsac_tpu.config import Camera, DSACConfig
from dsac_tpu.geometry.gn import refine_pose
from dsac_tpu.geometry.pose import Pose, pose_from_vec6, pose_to_vec6
from dsac_tpu.ops.diffmap import diffmaps
from dsac_tpu.ops.sampling import sample_minimal_sets, stratified_sample
from dsac_tpu.ops.select import (draw_hypothesis, shannon_entropy,
                                 softmax_scores)

CoordFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
ScoreFn = Callable[[jnp.ndarray], jnp.ndarray]

# hypothesis-chunk size for the differentiable implicit refine step in
# refine-all training (see make_refiners); 1024 keeps the Jacobian
# live set ~9 G at N=1600 — fits v5e HBM with the rest of the graph
_IMPLICIT_STEP_CHUNK = 1024


class FrameResult(NamedTuple):
    """Everything the training/eval paths need from one frame."""

    sampling: jnp.ndarray  # (G, G, 2) sampled pixel locations (x, y)
    coords: jnp.ndarray  # (N, 3) predicted scene coordinates, mm
    hyps: Pose  # (H,) unrefined P3P hypotheses
    hyp_valid: jnp.ndarray  # (H,) bool
    minimal_indices: jnp.ndarray  # (H, 4) indices into the N samples
    dmaps: jnp.ndarray  # (H, G, G) reprojection-error images
    scores: jnp.ndarray  # (H,) raw CNN / soft-inlier scores
    probs: jnp.ndarray  # (H,) softmax distribution
    entropy: jnp.ndarray  # () Shannon entropy (bits)
    chosen: jnp.ndarray  # () winning hypothesis index
    refined: Pose  # (H,) refined hypotheses ('serve': only winner valid)
    inlier_counts: jnp.ndarray  # (H,) final soft inlier counts
    final: Pose  # () the selected refined pose
    refined_mask: jnp.ndarray  # (H,) bool — True where `refined` really
    # was refined (refine_all: all; verify_topk: the K candidates;
    # winner-only serve: just `chosen`; softam: none — only `final` is)


def verified_selection(res: FrameResult) -> FrameResult:
    """Re-select the winner by post-refinement consensus.

    The reference draws the winner from the score softmax BEFORE
    refinement (core/cnn.h:1149) — a single overconfident score-CNN
    output on an out-of-distribution frame can pick a bad hypothesis even
    when the pool contains excellent ones.  This optional eval-time mode
    re-selects by the classic RANSAC criterion instead: the refined
    hypothesis with the largest final soft-inlier count (the counts are
    already computed by refinement; requires refine_all).  Training
    semantics are untouched — this is selection only, downstream of the
    softmax whose distribution the DSAC objective differentiates.
    """
    counts = jnp.where(res.hyp_valid, res.inlier_counts, -1.0)
    chosen = jnp.argmax(counts)
    return res._replace(chosen=chosen,
                        final=_take_pose(res.refined, chosen))


def _front_end(key: jax.Array, image: jnp.ndarray, coord_fn: CoordFn,
               cam: Camera, cfg: DSACConfig, with_diffmaps: bool = True,
               fused_sampling: bool = False):
    """Shared front: sampling -> coords (mm) -> hypotheses -> diffmaps.

    with_diffmaps=False skips materialising the (H, G, G) error surface —
    the very-large-H scoring path fuses it into the score reduction
    instead (ops/diffmap_pallas.py) so it never touches HBM.
    fused_sampling solves the H x T minimal sets with the SoA Pallas P3P
    kernel (forward-only: serve/eval).
    """
    k_samp, k_hyp = jax.random.split(key)
    grid = cfg.net.subsample_size
    sampling = stratified_sample(k_samp, cfg.data.image_width,
                                 cfg.data.image_height, grid,
                                 cfg.net.rgb_patch_size)
    pix = sampling.reshape(-1, 2)
    coords = coord_fn(image, pix) * 1000.0  # metres -> mm (core/cnn.h:330)
    sets = sample_minimal_sets(k_hyp, coords, pix.astype(jnp.float32), cam,
                               cfg.pose, fused=fused_sampling)
    if not with_diffmaps:
        return sampling, pix, coords, sets, jnp.zeros((0, grid, grid))
    dm = diffmaps(sets.poses, coords, pix.astype(jnp.float32), cam,
                  cfg.pose.max_reprojection_error)
    return sampling, pix, coords, sets, dm.reshape(-1, grid, grid)


def _take_pose(p: Pose, idx: jnp.ndarray) -> Pose:
    return Pose(p.R[idx], p.t[idx])


def make_refiners(coords: jnp.ndarray, pixf: jnp.ndarray, cam: Camera,
                  p, mode, inject_init: bool = False):
    """(refine_batch, refine_one) closures for a refinement `mode`.

    mode selects how the reference's refinement loop + dRefine gradient
    (core/cnn.h:1168-1230, :866-990) are realised:

      False / "unroll"  — jnp IRLS, gradients by autodiff through the
                          unrolled scan (exact but slow backward;
                          training-reference path).
      True / "fused"    — fused Pallas IRLS kernel (ops/gn_pallas.py).
                          ~50x faster, NO gradient: serve/eval only.
      "implicit"        — fused Pallas forward to the IRLS fixed point
                          (under stop_gradient) + ONE differentiable GN
                          step there: forward at fused speed, gradients
                          by the implicit-function theorem.  The fast
                          TRAINING mode (TPU).
      "implicit_jnp"    — same gradient semantics with a jnp forward
                          (no Pallas): CPU-testable twin of "implicit",
                          and still much faster than "unroll" because
                          the fixed-point iteration is never
                          differentiated through.
      "hard"            — reference-faithful hard-threshold refinement
                          with the rB=100 inlier cap and <50 abort
                          (geometry/gn.py:refine_pose_hard).  Eval-only
                          ablation mode (core/cnn.h:1186-1204).

    inject_init (implicit modes only) adds the INITIAL pose's truncated-
    iteration sensitivity — d(refined)/d(init) with the coordinates
    frozen — as a zero-valued straight-through term on top of the
    implicit-function coordinate gradient.  SoftAM needs this: its
    score-CNN gradient flows ONLY through the averaged initial pose
    (cnn_softam.h:738-923's dRefineHyp), and the exact implicit
    derivative w.r.t. the init is zero (a converged fixed point forgets
    its initialisation).  On "implicit" the sensitivity is the fused
    kernel's FD custom VJP (one extra Pallas launch,
    ops/gn_pallas.py:make_init_sensitivity_refiner); on "implicit_jnp"
    it is autodiff through the truncated jnp unroll (CPU twin).
    """
    from dsac_tpu.geometry.gn import implicit_refine_step, refine_pose_hard

    total_steps = p.refinement_steps * p.gn_inner_steps

    def jnp_refine(pool, c=None):
        # batched (leading pose axis broadcasts against shared coords)
        return refine_pose(
            pool, coords if c is None else c, pixf, cam,
            steps=p.refinement_steps, inner_iters=p.gn_inner_steps,
            threshold=p.inlier_threshold_2d, beta=p.inlier_beta,
            min_inliers=p.min_inliers, damping=p.gn_damping,
            max_error=p.max_reprojection_error)

    def fused_refine_fp(pool, c=None):
        from dsac_tpu.ops.gn_pallas import refine_pose_fused
        # one GN solve per IRLS step -> use inner*outer steps to reach
        # the same fixed point as the jnp nest; off-TPU the kernel runs
        # interpreted so "fused"/"implicit" stay CPU-farm-testable
        return refine_pose_fused(
            pool, coords if c is None else c, pixf, cam,
            steps=total_steps,
            threshold=p.inlier_threshold_2d, beta=p.inlier_beta,
            min_inliers=p.min_inliers, damping=p.gn_damping,
            max_error=p.max_reprojection_error,
            interpret=jax.default_backend() != "tpu")

    def implicit_batch(pool, fixed_point_fn, fd_init: bool = False):
        # Sever every gradient path INTO the fixed-point solver (the
        # Pallas kernel has no JVP/VJP on its own; the jnp twin would
        # waste compute): gradients flow ONLY through the single GN step
        # below.  stop_gradient must wrap the solver's INPUTS — a
        # stop on the outputs alone would still trace the kernel's
        # (nonexistent) JVP rule under jax.grad.
        pool0 = jax.tree.map(jax.lax.stop_gradient, pool)
        refined, n_in = fixed_point_fn(pool0, jax.lax.stop_gradient(coords))

        def one_chunk(chunk):
            obj_c = jnp.broadcast_to(coords,
                                     (chunk.t.shape[0], *coords.shape))
            return implicit_refine_step(
                chunk, obj_c, pixf, cam,
                threshold=p.inlier_threshold_2d, beta=p.inlier_beta,
                damping=p.gn_damping, max_error=p.max_reprojection_error)

        # Very-large-H refine-all training: the differentiable GN step
        # materialises (H, N, 2, 6)-class Jacobian tensors — at H=4096
        # the un-chunked graph needs ~36 G of HBM (measured; v5e has
        # 15.75 G).  lax.map over remat'ed hypothesis chunks bounds the
        # live set to one chunk's intermediates at a scan's cost, which
        # the fixed-point forward (the fused kernel) never pays.  A
        # non-multiple H runs the floor-multiple through the map and the
        # remainder directly (never the whole pool unchunked — that
        # would silently re-expose the OOM for H like 1536 or 5000).
        Hn = pool.t.shape[0]
        ch = _IMPLICIT_STEP_CHUNK
        if Hn > ch:
            body, rem = Hn - Hn % ch, Hn % ch
            rs = jax.tree.map(
                lambda x: x[:body].reshape(body // ch, ch, *x.shape[1:]),
                refined)
            stepped = jax.lax.map(jax.checkpoint(one_chunk), rs)
            stepped = jax.tree.map(
                lambda x: x.reshape(body, *x.shape[2:]), stepped)
            if rem:
                tail = one_chunk(jax.tree.map(lambda x: x[body:], refined))
                stepped = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b]), stepped, tail)
        else:
            stepped = one_chunk(refined)
        if inject_init:
            # init-pose path (dRefineHyp): a truncated-iteration
            # sensitivity term whose VALUE is zero (the forward stays
            # the fixed point) but whose gradient carries d(refined)/
            # d(init) with coords frozen
            if fd_init:
                # kernel-speed variant: custom-VJP fused refiner whose
                # backward is the reference's central-difference 6x6
                # dRefineHyp (cnn_softam.h:738-836) — all 12 probes one
                # extra Pallas launch (ops/gn_pallas.py)
                from dsac_tpu.ops.gn_pallas import \
                    make_init_sensitivity_refiner
                fd = make_init_sensitivity_refiner(
                    cam, steps=total_steps,
                    threshold=p.inlier_threshold_2d, beta=p.inlier_beta,
                    min_inliers=p.min_inliers, damping=p.gn_damping,
                    max_error=p.max_reprojection_error,
                    interpret=jax.default_backend() != "tpu")
                sR, st_ = fd(pool.R, pool.t, coords, pixf)
            else:
                # jnp twin: autodiff through the truncated unroll
                short, _ = jnp_refine(pool, jax.lax.stop_gradient(coords))
                sR, st_ = short.R, short.t
            stepped = Pose(
                stepped.R + sR - jax.lax.stop_gradient(sR),
                stepped.t + st_ - jax.lax.stop_gradient(st_))
        # dead hypotheses (aborted refinement) keep the frozen pose and
        # a zero pose-path gradient, like the reference's NaN/inlier
        # aborts zeroing dRefine (core/cnn.h:1203, :1214)
        ok = (n_in >= p.min_inliers)[..., None]
        out = Pose(jnp.where(ok[..., None], stepped.R, refined.R),
                   jnp.where(ok, stepped.t, refined.t))
        return out, n_in

    def hard_refine(pool, c=None):
        return refine_pose_hard(
            pool, coords if c is None else c, pixf, cam,
            steps=p.refinement_steps, inner_iters=p.gn_inner_steps,
            threshold=p.inlier_threshold_2d,
            inlier_cap=p.inlier_count_cap, min_inliers=p.min_inliers,
            damping=p.gn_damping, max_error=p.max_reprojection_error)

    if mode in (True, "fused"):
        refine_batch = fused_refine_fp
    elif mode == "hard":
        refine_batch = jax.vmap(hard_refine)
    elif mode == "implicit":
        refine_batch = lambda pool: implicit_batch(pool, fused_refine_fp,
                                                   fd_init=True)
    elif mode == "implicit_jnp":
        refine_batch = lambda pool: implicit_batch(pool, jnp_refine)
    elif mode in (False, "unroll"):
        refine_batch = jax.vmap(jnp_refine)
    else:
        raise ValueError(f"unknown refine mode {mode!r}")

    refine_one = lambda pose0: jax.tree.map(
        lambda x: x[0],
        refine_batch(jax.tree.map(lambda x: x[None], pose0)))
    return refine_batch, refine_one


def process_frame(key: jax.Array, image: jnp.ndarray, coord_fn: CoordFn,
                  score_fn: ScoreFn, cam: Camera, cfg: DSACConfig,
                  refine_all: bool = True,
                  fused_refine: bool = False,
                  scoring: str = "cnn",
                  fused_sampling: bool = False,
                  verify_topk: int = 0) -> FrameResult:
    """DSAC forward pass for one frame (core/cnn.h:1028-1257).

    refine_all=True refines the whole pool (training needs every loss for
    the expectation, core/cnn.h:1154); False refines only the drawn winner
    (the low-latency serve path).  verify_topk=K (with refine_all=False)
    refines the K best-scored hypotheses instead and serves the one with
    the largest final soft-inlier consensus — robust to score-CNN
    misdraws on out-of-distribution frames at ~one extra fused-refine
    tile of cost.

    fused_refine selects the refinement/gradient mode — see
    make_refiners: False/"unroll" (autodiff through the scan),
    True/"fused" (Pallas, serve only), "implicit" (Pallas forward +
    implicit-function gradient — the fast TPU training mode),
    "implicit_jnp" (same gradients, no Pallas).

    scoring="cnn" feeds the (H, G, G) diff-maps to `score_fn` (the score
    CNN or the jnp soft-inlier head).  scoring="fused_soft" is the
    very-large-H regime (4k-16k hypotheses, the scaled analogue of
    core/cnn.h:1135-1141): the Pallas kernel fuses reprojection + clamp +
    soft-inlier reduction so the (H, N) surface never materialises in
    HBM; `score_fn` is unused and FrameResult.dmaps is a (0, G, G)
    placeholder.
    """
    k_front, k_draw = jax.random.split(key)
    sampling, pix, coords, sets, dm = _front_end(
        k_front, image, coord_fn, cam, cfg,
        with_diffmaps=(scoring == "cnn"), fused_sampling=fused_sampling)
    pixf = pix.astype(jnp.float32)

    if scoring == "fused_soft":
        from dsac_tpu.ops.diffmap_pallas import soft_inlier_scores_pallas
        cam_vec = jnp.stack([cam.focal, cam.cx, cam.cy])
        scores = soft_inlier_scores_pallas(
            sets.poses.R, sets.poses.t, coords, pixf, cam_vec,
            threshold=cfg.pose.inlier_threshold_2d,
            beta=cfg.pose.score_beta,
            max_error=cfg.pose.max_reprojection_error,
            interpret=jax.default_backend() != "tpu")
    elif scoring == "cnn":
        scores = score_fn(dm)
    else:
        raise ValueError(f"unknown scoring mode {scoring!r}")
    # Invalid hypotheses (no self-consistent minimal set) are buried, the
    # analogue of the reference's zero-pose fallback scoring terribly.
    scores = jnp.where(sets.valid, scores, -1e9)
    probs = softmax_scores(scores)
    ent = shannon_entropy(probs)
    chosen = draw_hypothesis(k_draw, scores, cfg.pose.random_draw)

    p = cfg.pose
    refine_batch, refine_one = make_refiners(coords, pixf, cam, p,
                                             fused_refine)

    if refine_all:
        refined, n_in = refine_batch(sets.poses)
        final = _take_pose(refined, chosen)
        refined_mask = jnp.ones(scores.shape, bool)
    elif verify_topk > 1:
        # Verified serving: refine the top-K scored hypotheses and serve
        # the one with the largest final soft-inlier consensus.  A single
        # overconfident score-CNN output on an out-of-distribution frame
        # cannot mis-serve the frame (cf. verified_selection, which needs
        # refine_all); costs one K-pose fused refine instead of one.
        k = min(int(verify_topk), scores.shape[0])
        top_scores, top = jax.lax.top_k(scores, k)
        pool_k = _take_pose(sets.poses, top)
        refined_k, n_k = refine_batch(pool_k)
        # bury candidates that were invalid to begin with
        n_k = jnp.where(top_scores > -1e8, n_k, -1.0)
        best = jnp.argmax(n_k)
        final = _take_pose(refined_k, best)
        chosen = top[best]
        refined = Pose(sets.poses.R.at[top].set(refined_k.R),
                       sets.poses.t.at[top].set(refined_k.t))
        n_in = jnp.zeros(scores.shape).at[top].set(jnp.maximum(n_k, 0.0))
        refined_mask = jnp.zeros(scores.shape, bool).at[top].set(True)
    else:
        final, n_chosen = refine_one(_take_pose(sets.poses, chosen))
        # Serve path: only the winner is refined.  Write it back into the
        # pool so FrameResult.refined is self-consistent at `chosen` (a
        # caller evaluating the served result gets the actually-served
        # pose); the other slots remain the unrefined hypotheses.
        refined = Pose(sets.poses.R.at[chosen].set(final.R),
                       sets.poses.t.at[chosen].set(final.t))
        n_in = jnp.zeros(scores.shape).at[chosen].set(n_chosen)
        refined_mask = jnp.zeros(scores.shape, bool).at[chosen].set(True)

    return FrameResult(sampling, coords, sets.poses, sets.valid,
                       sets.indices, dm, scores, probs, ent, chosen,
                       refined, n_in, final, refined_mask)


def process_frames_batched(keys: jax.Array, images: jnp.ndarray,
                           coord_fn: CoordFn, score_fn: ScoreFn,
                           cam: Camera, cfg: DSACConfig,
                           refine_all: bool = False,
                           fused_refine: bool = False,
                           scoring: str = "cnn",
                           fused_sampling: bool = False,
                           verify_topk: int = 0,
                           softam: bool = False) -> FrameResult:
    """Batched serve path: vmap of process_frame over a frame batch.

    The production serving shape — batching frames keeps the coordinate
    CNN's matmuls large on the MXU and amortises dispatch latency.
    keys: (B,) key array; images: (B, H, W, 3).
    softam=True serves the soft-argmax variant with the same fast
    kernels (fused sampling/scoring; refinement mode "fused" when
    fused_refine).
    """
    if softam:
        return jax.vmap(
            lambda k, img: process_frame_softam(
                k, img, coord_fn, score_fn, cam, cfg,
                refine_mode=("fused" if fused_refine else False),
                fused_sampling=fused_sampling, scoring=scoring)
        )(keys, images)
    return jax.vmap(
        lambda k, img: process_frame(k, img, coord_fn, score_fn, cam, cfg,
                                     refine_all=refine_all,
                                     fused_refine=fused_refine,
                                     scoring=scoring,
                                     fused_sampling=fused_sampling,
                                     verify_topk=verify_topk)
    )(keys, images)


def process_frame_softam(key: jax.Array, image: jnp.ndarray,
                         coord_fn: CoordFn, score_fn: ScoreFn, cam: Camera,
                         cfg: DSACConfig,
                         refine_mode=False,
                         fused_sampling: bool = False,
                         scoring: str = "cnn") -> FrameResult:
    """Soft-argmax forward pass (core/cnn_softam.h:960-1180).

    The softmax weights average the hypothesis pool directly — a linear
    combination of (rodrigues, t) 6-vectors (core/cnn_softam.h:1082-1094)
    — and only the averaged pose is refined (…:1099-1154).

    refine_mode selects the refinement realisation (make_refiners):
    "fused" is the fast eval path; "implicit"/"implicit_jnp" are the fast
    TRAINING modes, with init-injection so the score CNN's gradient path
    through the averaged pose (dRefineHyp, cnn_softam.h:738-923) stays
    alive.

    fused_sampling / scoring="fused_soft" are the SAME fast serve kernels
    as process_frame's (SoA P3P sampler; fused reprojection+soft-inlier
    scoring, no (H, G, G) surface in HBM) — softam serving is not a
    per-frame speed regression vs DSAC serving.
    """
    k_front, _ = jax.random.split(key)
    sampling, pix, coords, sets, dm = _front_end(
        k_front, image, coord_fn, cam, cfg,
        with_diffmaps=(scoring == "cnn"), fused_sampling=fused_sampling)
    pixf = pix.astype(jnp.float32)

    if scoring == "fused_soft":
        from dsac_tpu.ops.diffmap_pallas import soft_inlier_scores_pallas
        cam_vec = jnp.stack([cam.focal, cam.cx, cam.cy])
        scores = soft_inlier_scores_pallas(
            sets.poses.R, sets.poses.t, coords, pixf, cam_vec,
            threshold=cfg.pose.inlier_threshold_2d,
            beta=cfg.pose.score_beta,
            max_error=cfg.pose.max_reprojection_error,
            interpret=jax.default_backend() != "tpu")
    else:
        scores = score_fn(dm)
    scores = jnp.where(sets.valid, scores, -1e9)
    probs = softmax_scores(scores)
    ent = shannon_entropy(probs)

    vecs = pose_to_vec6(sets.poses)  # (H, 6)
    avg = pose_from_vec6(jnp.sum(probs[:, None] * vecs, axis=0))

    p = cfg.pose
    _, refine_one = make_refiners(coords, pixf, cam, p, refine_mode,
                                  inject_init=True)
    final, n_in = refine_one(avg)

    chosen = jnp.argmax(probs)
    return FrameResult(sampling, coords, sets.poses, sets.valid,
                       sets.indices, dm, scores, probs, ent, chosen,
                       sets.poses, jnp.broadcast_to(n_in, scores.shape),
                       final, jnp.zeros(scores.shape, bool))
