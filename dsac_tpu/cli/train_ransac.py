"""End-to-end DSAC training (the reference's train_ransac program).

Mirrors train_ransac.cpp:134-409: 5000 rounds, one random training frame
per round, objective E_{h~softmax(s)}[maxLoss(refine(h))]; both CNNs are
updated jointly (SGD 1e-5 / 1e-7 with momentum 0.9, gradient clamp 0.1).
The reference's hand-built two-path gradient is jax.grad here.  Snapshots
full train state (obj/score *_endtoend).  `--softam` switches to the
soft-argmax objective (train_ransac_softam.cpp).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.pipeline.train import e2e_step, make_e2e_state
from dsac_tpu.utils import checkpoint as ckpt
from dsac_tpu.utils.logging import TrainingLog, blue, green
from dsac_tpu.cli import common


def main(argv=None, softam: bool = False):
    p = common.make_parser(__doc__)
    p.add_argument("--training-rounds", type=int, default=5000,
                   help="reference: 5000 (train_ransac.cpp:50)")
    p.add_argument("--softam", action="store_true", default=softam)
    p.add_argument("--snapshot-every", type=int, default=250)
    # the reference gates a held-out eval loop behind the DOVALIDATION
    # compile flag (train_ransac.cpp:30, :136-233); here it's runtime
    p.add_argument("--validate-every", type=int, default=0,
                   help="run a held-out validation pass every N rounds")
    p.add_argument("--validate-frames", type=int, default=8)
    p.add_argument("--stage-frames", type=int, default=512,
                   help="max frames staged on device for the fused/mesh "
                        "paths (bounds HBM/tunnel cost on big splits)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="fuse this many training rounds into one device "
                        "dispatch (lax.scan over a prestaged frame pool; "
                        "amortises remote-TPU dispatch latency)")
    p.add_argument("--score-head", choices=["cnn", "soft"], default="cnn",
                   help="'soft' trains with the parameter-free "
                        "soft-inlier scoring head instead of the score "
                        "CNN: the expected-loss gradient flows only to "
                        "the coordinate net. Motivated by the hard "
                        "archetypes, where e2e training degrades the "
                        "score CNN (entropy collapse on mode-poisoned "
                        "pools — BASELINE.md repeat/clutter rows) while "
                        "soft-inlier selection measures MORE accurate")
    p.add_argument("--score-temp", type=float, default=1.0,
                   help="divide soft-head scores by this temperature in "
                        "the TRAINING softmax (soft-inlier counts span "
                        "O(100): untempered they are one-hot and the "
                        "expected-loss objective degenerates to "
                        "winner-take-all — BASELINE.md negative result). "
                        "Selection at eval/serve is argmax and therefore "
                        "temperature-invariant")
    p.add_argument("--score-anchor", type=float, default=0.0,
                   help="weight of a supervised anchor on the score CNN "
                        "during e2e: L1 between its scores and the "
                        "pretrain labels -10*min(maxLoss(raw hyp), 40) "
                        "recomputed on each round's own pool "
                        "(train_score.cpp:229 convention, GT poses are "
                        "available at training time). Counters the "
                        "decoy-archetype failure where the REINFORCE "
                        "term alone drifts the score CNN onto decoy-"
                        "consistent preferences (BASELINE.md repeat/"
                        "clutter rows). 0 = off (reference-faithful); "
                        "ignored with --score-head soft and --mesh")
    p.add_argument("--refine-mode",
                   choices=["auto", "unroll", "implicit", "implicit_jnp"],
                   default="auto",
                   help="refinement gradient mode (pipeline/forward.py:"
                        "make_refiners): 'implicit' = fused Pallas forward"
                        " + implicit-function gradient (fast, TPU); "
                        "'unroll' = autodiff through the IRLS scan; "
                        "'auto' picks implicit on TPU, unroll elsewhere")
    args, cfg, strings = common.parse_with_flags(p, argv)
    if args.rounds is not None:
        args.training_rounds = args.rounds

    source = common.frame_source(args, cfg)
    coord_net, score_net, coord_apply, score_apply = common.build_models(
        args, cfg)
    rng = np.random.default_rng(args.seed)
    cam = cfg.data.camera()
    grid = cfg.net.subsample_size

    sample = source.get(0)
    try:
        coord_params = ckpt.restore(args.out, ckpt.OBJ_INIT)["params"]
        print(blue("Loaded obj_model_init."))
    except Exception:
        print(blue("No obj_model_init; initialising coordinate net."))
        if args.arch != "patch":
            coord_params = coord_net.init(jax.random.PRNGKey(1),
                                          jnp.asarray(sample.rgb)[None])
        else:
            coord_params = coord_net.init(
                jax.random.PRNGKey(1),
                jnp.zeros((1, cfg.net.rgb_patch_size,
                           cfg.net.rgb_patch_size, 3)))
    if args.score_head == "soft":
        # parameter-free head: empty score pytree, zero score gradients
        soft_fn = common.soft_inlier_score_fn(cfg)
        temp = args.score_temp
        score_apply = lambda params, dm: soft_fn(dm) / temp
        score_params = {}
        print(blue("Scoring head: soft-inlier (parameter-free; only the "
                   "coordinate net trains)."))
    else:
        try:
            score_params = ckpt.restore(args.out, ckpt.SCORE_INIT)["params"]
            print(blue("Loaded score_model_init."))
        except Exception:
            print(blue("No score_model_init; initialising score net."))
            score_params = score_net.init(jax.random.PRNGKey(2),
                                          jnp.zeros((1, grid, grid)))

    refine_mode = args.refine_mode
    if refine_mode == "auto":
        refine_mode = ("implicit"
                       if jax.devices()[0].platform == "tpu" else "unroll")
    refine_mode = False if refine_mode == "unroll" else refine_mode
    print(blue(f"Refinement gradient mode: {refine_mode or 'unroll'}"))

    state = make_e2e_state(coord_params, score_params)

    # --- resume an interrupted e2e run: params + optimizer states + step
    # AND the data-stream RNG, so the frame schedule continues instead of
    # replaying (the reference's torch.save keeps weights only) ---
    obj_name = ckpt.OBJ_SOFTAM if args.softam else ckpt.OBJ_E2E
    score_name = ckpt.SCORE_SOFTAM if args.softam else ckpt.SCORE_E2E
    rng_sidecar = Path(args.out) / f"rng_state_{obj_name}.json"
    start_round = 0
    try:
        snap_c = ckpt.restore(args.out, obj_name,
                              {"params": state.coord_params,
                               "opt_state": state.coord_opt, "step": 0})
        if args.score_head == "soft":
            snap_s = {"params": state.score_params,
                      "opt_state": state.score_opt}
        else:
            snap_s = ckpt.restore(args.out, score_name,
                                  {"params": state.score_params,
                                   "opt_state": state.score_opt,
                                   "step": 0})
        state = state._replace(
            coord_params=snap_c["params"], coord_opt=snap_c["opt_state"],
            score_params=snap_s["params"], score_opt=snap_s["opt_state"],
            step=jnp.asarray(int(snap_c["step"]), jnp.int32))
        start_round = int(snap_c["step"])
        if rng_sidecar.exists():
            saved = json.loads(rng_sidecar.read_text())
            if saved.get("round") == start_round:
                rng.bit_generator.state = saved["state"]
        print(blue(f"Resumed end-to-end training at round {start_round}."))
    except FileNotFoundError:
        pass

    anchor = args.score_anchor if args.score_head == "cnn" else 0.0
    if args.score_anchor > 0 and args.score_head != "cnn":
        print(blue("--score-anchor ignored: the soft head has no score "
                   "parameters to anchor."))
    if args.score_anchor > 0 and args.softam:
        raise SystemExit("--score-anchor is not implemented for the "
                         "softam objective (e2e_expected_loss gates it "
                         "on the DSAC path); drop --softam or "
                         "--score-anchor")
    if args.score_anchor > 0 and args.mesh:
        raise SystemExit("--score-anchor is not plumbed through the mesh "
                         "path yet; drop --mesh or --score-anchor")

    step_fn = jax.jit(functools.partial(
        e2e_step, coord_apply=coord_apply, score_apply=score_apply,
        cam=cam, cfg=cfg, softam=args.softam, refine_mode=refine_mode,
        score_anchor=anchor))

    tag = "softam" if args.softam else "e2e"
    log = TrainingLog(f"{args.out}/ransac_training_loss_{tag}.txt")
    val_log = TrainingLog(f"{args.out}/ransac_validation_{tag}.txt")

    val_fn = None
    if args.validate_every > 0:
        from dsac_tpu.pipeline import evaluate_frame, process_frame
        # same SCENE as training (archetypes!), disjoint viewpoint seed
        val_source = (common.SyntheticSource(args.validate_frames, seed=777,
                                             scene=getattr(source, "scene",
                                                           None))
                      if not args.data else source)

        # params enter as ARGUMENTS (not closure constants) so the jit
        # compiles once for the whole run — a fresh closure per
        # validation would recompile the full pipeline every time (and
        # inline the params into the HLO, CLAUDE.md broken-pipe note)
        @jax.jit
        def _val_run(coord_params, score_params, key, image):
            return process_frame(
                key, image,
                coord_fn=lambda img, pix: coord_apply(coord_params, img,
                                                      pix),
                score_fn=lambda dm: score_apply(score_params, dm),
                cam=cam, cfg=cfg)

        def validate(state):
            correct, exp_losses = [], []
            for i in range(args.validate_frames):
                f = val_source.get(i)
                res = _val_run(state.coord_params, state.score_params,
                               jax.random.PRNGKey(7000 + i),
                               jnp.asarray(f.rgb))
                ev = evaluate_frame(res, f.pose)
                correct.append(bool(ev.correct))
                exp_losses.append(float(ev.expected_loss))
            return float(np.mean(correct)), float(np.mean(exp_losses))

        val_fn = validate

    # validation-based model selection: e2e on the hard archetypes often
    # improves for a few hundred rounds and then degrades (BASELINE.md
    # repeat rows — valid-pool collapse); the *_best snapshots keep the
    # peak-validation model so `test_ransac --model best` serves it.
    # The reference has no equivalent (it saves blindly every 1000).
    # The tracker is persisted in the RNG sidecar: the documented
    # operating mode is watchdog-kill + orbax resume, and a reset
    # tracker would let the first post-resume validation clobber the
    # real *_best snapshot.
    best = {"acc": -1.0, "exp": float("inf")}
    if rng_sidecar.exists():
        try:
            best.update(json.loads(rng_sidecar.read_text()).get("best",
                                                                {}))
        except Exception:
            pass

    def maybe_validate_snapshot(rnd, state, block: int = 1):
        # `block` = rounds consumed since the last call (steps-per-call /
        # mesh data-parallel paths advance several rounds at once);
        # boundary-CROSSING tests rather than exact-hit tests, so no
        # cadence is skipped when the block size doesn't divide it
        crossed = lambda every: (rnd + 1) // every > (rnd + 1 - block) // every
        if val_fn is not None and crossed(args.validate_every):
            acc, exp = val_fn(state)
            val_log.append(rnd, exp, {"accuracy": acc})
            print(blue(f"validation @ round {rnd}: accuracy "
                       f"{acc * 100:.1f}%, E[loss] {exp:.2f}"))
            if (acc, -exp) > (best["acc"], -best["exp"]):
                best.update(acc=acc, exp=exp)
                # score first, obj last: a watchdog kill between the
                # two saves then leaves an OLD obj_best + new
                # score_best — --model best keys its selection on the
                # obj snapshot, so the stale pair is the previous best
                # rather than a never-validated mixture
                if args.score_head != "soft":
                    ckpt.save(args.out, score_name + "_best",
                              {"params": state.score_params,
                               "opt_state": state.score_opt,
                               "step": int(state.step)}, step=rnd + 1,
                              keep=1)
                ckpt.save(args.out, obj_name + "_best",
                          {"params": state.coord_params,
                           "opt_state": state.coord_opt,
                           "step": int(state.step)}, step=rnd + 1, keep=1)
                rng_sidecar.write_text(json.dumps(
                    {"round": rnd + 1, "state": rng.bit_generator.state,
                     "best": best}))
                print(blue(f"  new best validation model saved "
                           f"({obj_name}_best @ round {rnd})"))
        if crossed(args.snapshot_every) \
                or rnd >= args.training_rounds - 1:
            ckpt.save(args.out, obj_name,
                      {"params": state.coord_params,
                       "opt_state": state.coord_opt,
                       "step": int(state.step)}, step=rnd + 1)
            if args.score_head != "soft":  # nothing to snapshot
                ckpt.save(args.out, score_name,
                          {"params": state.score_params,
                           "opt_state": state.score_opt,
                           "step": int(state.step)}, step=rnd + 1)
            rng_sidecar.write_text(json.dumps(
                {"round": rnd + 1, "state": rng.bit_generator.state,
                 "best": best}))

    print(blue(f"End-to-end training ({tag}) for "
               f"{args.training_rounds} rounds."))

    if args.mesh:
        # --- multi-chip SPMD training (--mesh DxH): frames data-parallel
        # over 'data', the hypothesis pool (and, for dense archs, the
        # FCN rows via halo exchange) sharded over 'hyp'.  One mesh step
        # trains n_data frames jointly — the data-parallel generalisation
        # of the reference's one-frame round (train_ransac.cpp:241). ---
        from dsac_tpu.parallel import sharded_e2e_step
        from dsac_tpu.parallel.mesh import DATA_AXIS, HYP_AXIS
        from dsac_tpu.pipeline.train import e2e_optimizers

        mesh = common.parse_mesh(args.mesh)
        n_data, n_hyp = mesh.shape[DATA_AXIS], mesh.shape[HYP_AXIS]
        if cfg.pose.num_hypotheses % n_hyp:
            raise SystemExit(f"-rI {cfg.pose.num_hypotheses} not divisible"
                             f" by hyp axis {n_hyp}")
        capply, coord_collective = common.mesh_coord_apply(
            args, coord_net, coord_apply, n_hyp)
        c_opt, s_opt = e2e_optimizers()
        step = sharded_e2e_step(mesh, capply, score_apply, cam, cfg,
                                c_opt, s_opt,
                                coord_collective=coord_collective,
                                refine_mode=refine_mode,
                                softam=args.softam)
        images, gt_R, gt_t = common.stage_frame_pool(source, rng,
                                                     args.stage_frames)
        pool = images.shape[0]
        # orbax-restored params are COMMITTED to a single device; re-place
        # them replicated over the mesh or shard_map rejects the inputs
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        state = jax.tree.map(
            lambda x: jax.device_put(x, rep)
            if isinstance(x, jax.Array) else x, state)
        print(blue(f"Mesh {dict(mesh.shape)}: {n_data} frames/step, "
                   f"H {cfg.pose.num_hypotheses} over {n_hyp} shards."))
        rnd = start_round
        while rnd < args.training_rounds:
            idx = jnp.asarray(rng.integers(pool, size=n_data), jnp.int32)
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(2 ** 31))), n_data)
            cp, sp, c_state, s_state, loss, aux = step(
                state.coord_params, state.score_params, state.coord_opt,
                state.score_opt, keys, images[idx], gt_R[idx], gt_t[idx])
            # step counts ROUNDS (frames consumed), like the single-chip
            # paths, so resume and snapshots stay interchangeable
            state = state._replace(
                coord_params=cp, score_params=sp, coord_opt=c_state,
                score_opt=s_state, step=state.step + n_data)
            log.append(rnd, float(loss), {
                "entropy": float(aux["entropy"]),
                "valid": float(aux["valid_hyps"])})
            rnd += n_data
            if (rnd // n_data) % 10 == 0:
                print(f"round {rnd - 1}: E[loss] {float(loss):.3f} "
                      f"entropy {float(aux['entropy']):.2f} "
                      f"valid {int(aux['valid_hyps'])}")
            maybe_validate_snapshot(rnd - 1, state, block=n_data)
        print(green("End-to-end training complete."))
        return state

    spc = max(1, args.steps_per_call)
    if spc > 1:
        # fused mode: stage the whole frame pool on device once, then
        # dispatch lax.scan blocks of `spc` rounds (pipeline/train.py:
        # e2e_step_many).  Snapshot/validation cadence is quantised to
        # the block boundary.
        from dsac_tpu.pipeline.train import e2e_step_many
        images, gt_R, gt_t = common.stage_frame_pool(source, rng,
                                                     args.stage_frames)
        many_fn = jax.jit(functools.partial(
            e2e_step_many, coord_apply=coord_apply,
            score_apply=score_apply, cam=cam, cfg=cfg, softam=args.softam,
            refine_mode=refine_mode, score_anchor=anchor))
        rnd = start_round
        while rnd < args.training_rounds:
            k = min(spc, args.training_rounds - rnd)
            idx = jnp.asarray(rng.integers(images.shape[0], size=k),
                              jnp.int32)
            keys = jax.random.split(
                jax.random.PRNGKey(int(rng.integers(2 ** 31))), k)
            state, losses, aux = many_fn(state, keys, idx, images,
                                         gt_R, gt_t)
            losses = np.asarray(losses)
            exp = np.asarray(aux["expected_loss"])
            ent = np.asarray(aux["entropy"])
            val = np.asarray(aux["valid_hyps"])
            anc = np.asarray(aux.get("score_anchor_l1", np.zeros(k)))
            for j in range(k):
                log.append(rnd + j, float(losses[j]), {
                    "expected": float(exp[j]),
                    "entropy": float(ent[j]),
                    "valid": float(val[j]),
                    **({"anchor": float(anc[j])} if anchor > 0 else {})})
            rnd += k
            print(f"round {rnd - 1}: E[loss] {float(losses[-1]):.3f} "
                  f"entropy {float(ent[-1]):.2f} valid {int(val[-1])}")
            maybe_validate_snapshot(rnd - 1, state, block=k)
        print(green("End-to-end training complete."))
        return state

    for rnd in range(start_round, args.training_rounds):
        f = source.get(int(rng.integers(len(source))))
        key = jax.random.PRNGKey(int(rng.integers(2 ** 31)))
        state, loss, aux = step_fn(state, key, jnp.asarray(f.rgb), f.pose)
        log.append(rnd, float(loss), {
            "expected": float(aux["expected_loss"]),
            "entropy": float(aux["entropy"]),
            "valid": float(aux["valid_hyps"])})
        if rnd % 10 == 0:
            print(f"round {rnd}: E[loss] {float(loss):.3f} "
                  f"entropy {float(aux['entropy']):.2f} "
                  f"valid {int(aux['valid_hyps'])}")
        maybe_validate_snapshot(rnd, state)
    print(green("End-to-end training complete."))
    return state


if __name__ == "__main__":
    main()
