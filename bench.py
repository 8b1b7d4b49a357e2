"""Headline benchmark: relocalizations/s/chip on the test_ransac path.

BASELINE.json config 1: single-frame relocalization with a scene-coordinate
CNN + 256-hypothesis DSAC inference (score CNN scoring, winner refinement).
The flagship DenseCoordNet runs the full 640x480 frame; hypothesis
sampling / dense scoring / GN refinement run exactly as in serving.

Realism: the bench stages queue*batch DISTINCT novel-viewpoint frames
(exactly like cli/serve.py) and loads the end-to-end-trained weights from
runs/ when present (committed artifacts/*.npz otherwise), reporting
accuracy@5cm5deg of every served pose alongside throughput (the
reference's own acceptance metric, core/cnn.h:1249-1256).  Throughput is
measured with the frame queue staged on device and the serve batches
dispatched through one fused lax.scan (the dispatch-latency tunnel is
crossed once per `--queue` batches, not once per batch).

Baseline: the reference publishes no throughput numbers (BASELINE.md).
`python bench.py --measure-cpu-baseline` measures THIS pipeline's best
CPU-backend throughput on the local host (the reference era's hardware
class, generously scored: identical program, XLA:CPU, all cores) and
caches it with its configuration in BASELINE_CPU.json; `vs_baseline`
divides by that measured number when present, else by the 2.0 reloc/s
literature estimate.

MFU: FLOPs are taken from XLA's cost analysis of the compiled serve
executable and divided by wall time x the chip's bf16 peak
(197 TFLOP/s for TPU v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import argparse
import json
import time
from pathlib import Path

BASELINE_RELOC_PER_S_GUESS = 2.0  # literature estimate, see docstring
TPU_V5E_BF16_PEAK = 197e12
CPU_BASELINE_FILE = Path(__file__).parent / "BASELINE_CPU.json"

# weight sources per arch (s2d stem weights are not interchangeable with
# the plain stem, models/coord_net.py)
RUN_DIRS = {"dense": "synth_gen_fast", "dense_s2d": "synth_s2d"}
ART_SUFFIX = {"dense": "", "dense_s2d": "_s2d"}


def parse_args(argv=None):
    ap = argparse.ArgumentParser(
        description="dsac_tpu headline serve benchmark")
    ap.add_argument("--queue", type=int, default=8,
                    help="batches fused into one lax.scan dispatch")
    ap.add_argument("--batch", type=int, default=8,
                    help="frames per vmapped serve batch")
    ap.add_argument("--verify-topk", type=int, default=4,
                    help="refine the K best-scored hypotheses and serve "
                         "the max-consensus one (0 = winner only). The "
                         "default is 4: measured on TPU it costs <1% "
                         "throughput (the K-pose fused refine rides the "
                         "same tile) and lifts 64-frame accuracy "
                         "0.95 -> 1.0 by absorbing score-CNN misdraws")
    ap.add_argument("--arch", choices=["dense", "dense_s2d"],
                    default="dense")
    ap.add_argument("--attempts", type=int, default=16,
                    help="P3P candidate minimal-set attempt depth per "
                         "hypothesis (PoseConfig.sample_attempts; the "
                         "reference retries until valid, "
                         "core/cnn.h:1079-1129). With two-phase sampling "
                         "(the default) the FULL 16-attempt depth costs "
                         "~the same as 4 fixed attempts (702.0 vs 707.4 "
                         "reloc/s, accuracy 1.0, identical medians — "
                         "BASELINE.md round 4), so the conservative "
                         "reference depth is the default again")
    ap.add_argument("--fused-scoring",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="score with the fused reprojection+soft-inlier "
                         "kernel instead of the trained score CNN (as "
                         "cli/serve.py --fused-scoring; the (H, N) error "
                         "surface never materialises in HBM). DEFAULT ON "
                         "since round 4: on the hard 'noisy' archetype "
                         "the soft-inlier head MEASURES more accurate "
                         "than the trained score CNN (0.969 vs 0.813 at "
                         "+16% throughput, BASELINE.md decision matrix) "
                         "— the reference-parity score-CNN path remains "
                         "the default on cli/test_ransac and one flag "
                         "away here (--no-fused-scoring)")
    ap.add_argument("--medians", action="store_true",
                    help="add median rot/trans errors to the JSON line")
    ap.add_argument("--measure-cpu-baseline", action="store_true",
                    help="measure the XLA:CPU baseline at this config and "
                         "cache it in BASELINE_CPU.json")
    ap.add_argument("--two-phase", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="resample-only-failures sampling (one attempt "
                         "per lane + budgeted re-solve of failures; see "
                         "cli/serve.py --two-phase-sampling). DEFAULT ON "
                         "for the headline bench: full 16-attempt "
                         "robustness at the 4-attempt price; "
                         "--no-two-phase restores fixed-depth sampling")
    ap.add_argument("--latency", action="store_true",
                    help="measure serve LATENCY instead of throughput: "
                         "fenced single-dispatch p50/p99 over batch "
                         "{1,4,8,16} (queue=1), plus the bare dispatch "
                         "floor of the link, so on-chip latency is "
                         "separable from tunnel latency; writes "
                         "results/serve_latency.json")
    return ap.parse_args(argv)


def build(on_tpu: bool, batch: int, verify_topk: int, queue: int,
          arch: str, attempts: int = 16, fused_scoring: bool = False,
          two_phase: bool = False):
    import jax
    import jax.numpy as jnp

    from dsac_tpu.config import DSACConfig, PoseConfig
    from dsac_tpu.data.synthetic import SyntheticScene
    from dsac_tpu.models import DenseCoordNet, ScoreNet
    from dsac_tpu.models.coord_net import gather_dense_coords
    from dsac_tpu.pipeline.forward import process_frames_batched
    from dsac_tpu.utils import checkpoint as ckpt

    scene = SyntheticScene()
    cam = scene.camera
    cfg = DSACConfig(pose=PoseConfig(num_hypotheses=256, random_draw=False,
                                     sample_attempts=attempts))

    coord_net = DenseCoordNet(s2d=(arch == "dense_s2d"))
    score_net = ScoreNet()

    B, Q = batch, queue
    frames, gt_R, gt_t = [], [], []
    for i in range(Q * B):
        # distinct novel viewpoints, disjoint from the 512-view training
        # keys — the bench serves exactly what cli/serve.py stages
        pose, rgb, depth, coords_gt = scene.frame(jax.random.PRNGKey(9000 + i))
        frames.append(rgb)
        gt_R.append(pose.R)
        gt_t.append(pose.t)
    images = jnp.stack(frames).reshape(Q, B, *frames[0].shape)
    gt_R = jnp.stack(gt_R).reshape(Q, B, 3, 3)
    gt_t = jnp.stack(gt_t).reshape(Q, B, 3)

    coord_params = coord_net.init(jax.random.PRNGKey(1), images[0][:1])
    score_params = score_net.init(jax.random.PRNGKey(2),
                                  jnp.zeros((1, 40, 40)))
    trained = False
    try:
        from dsac_tpu.pipeline.train import make_e2e_state

        st = make_e2e_state(coord_params, score_params)
        run_dir = Path(__file__).parent / "runs" / RUN_DIRS[arch]
        snap_c = ckpt.restore(run_dir, ckpt.OBJ_E2E,
                              {"params": coord_params,
                               "opt_state": st.coord_opt, "step": 0})
        snap_s = ckpt.restore(run_dir, ckpt.SCORE_E2E,
                              {"params": score_params,
                               "opt_state": st.score_opt, "step": 0})
        coord_params, score_params = snap_c["params"], snap_s["params"]
        trained = True
    except Exception:
        # no live run dir: fall back to the committed weight artifacts
        # (scripts/export_weights.py writes them after a training run)
        try:
            from dsac_tpu.utils.params_io import load_params_npz

            art = Path(__file__).parent / "artifacts"
            sfx = ART_SUFFIX[arch]
            coord_params = load_params_npz(art / f"coord_e2e{sfx}.npz",
                                           coord_params)
            score_params = load_params_npz(art / f"score_e2e{sfx}.npz",
                                           score_params)
            trained = True
        except Exception:
            pass  # random-init weights; throughput is weight-independent

    def coord_apply(image, pix):
        cmap = coord_net.apply(coord_params, image[None])[0]
        return gather_dense_coords(cmap, pix, stride=8)

    if fused_scoring and not on_tpu:
        # same soft-inlier head, jnp lowering: on CPU the fused Pallas
        # scoring kernel would run in interpret mode (an emulator, not a
        # baseline); the jnp head computes identical scores
        # (tests/test_ops_pipeline.py::test_large_h_fused_scoring)
        from dsac_tpu.ops import soft_inlier_scores

        def score_apply(dm):
            return soft_inlier_scores(dm.reshape(dm.shape[0], -1),
                                      cfg.pose.inlier_threshold_2d,
                                      cfg.pose.score_beta)
    else:
        def score_apply(dm):
            return score_net.apply(score_params, dm)

    def serve_batch(keys, imgs):
        res = process_frames_batched(keys, imgs, coord_apply, score_apply,
                                     cam, cfg, refine_all=False,
                                     fused_refine=on_tpu,
                                     fused_sampling=("two_phase" if two_phase
                                                     else on_tpu),
                                     scoring=("fused_soft"
                                              if fused_scoring and on_tpu
                                              else "cnn"),
                                     verify_topk=verify_topk)
        return res.final.R, res.final.t

    return serve_batch, images, (gt_R, gt_t), trained


def measure(on_tpu: bool, queue: int = 8, batch: int = 8,
            verify_topk: int = 0, arch: str = "dense", attempts: int = 16,
            fused_scoring: bool = False, two_phase: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsac_tpu.geometry.loss import pose_errors
    from dsac_tpu.geometry.pose import Pose

    serve_batch, images, (gt_R, gt_t), trained = build(
        on_tpu, batch, verify_topk, queue, arch, attempts, fused_scoring,
        two_phase)
    B = batch

    # one fused dispatch serves `queue` batches: scan over the staged
    # frame queue so the per-dispatch tunnel latency (~25 ms here)
    # amortises across queue*B frames
    @jax.jit
    def serve_many(key, q_images):
        def body(_, xs):
            k, imgs = xs
            return None, serve_batch(jax.random.split(k, B), imgs)

        _, (R, t) = jax.lax.scan(body, None, (jax.random.split(key, queue),
                                              q_images))
        return R, t

    lowered = serve_many.lower(jax.random.PRNGKey(0), images)
    compiled = lowered.compile()
    try:
        flops_per_call = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops_per_call = float("nan")

    from dsac_tpu.utils.timing import fence

    out = compiled(jax.random.PRNGKey(0), images)  # warmup
    fence(out)  # NOT block_until_ready: unreliable on the axon tunnel

    # 16 reps amortize the fence's device->host round-trip (~25 ms over
    # the tunnel) to <1% of the measurement window
    n = 16 if on_tpu else 1
    t0 = time.perf_counter()
    for i in range(n):
        out = compiled(jax.random.PRNGKey(i), images)
    fence(out)
    dt = time.perf_counter() - t0

    reloc_per_s = n * queue * B / dt
    mfu = flops_per_call * n / dt / TPU_V5E_BF16_PEAK if on_tpu else None

    # accuracy of ALL queue*batch served poses (5 cm / 5 deg,
    # core/cnn.h:1249-1256)
    R, t = jax.tree.map(np.asarray, out)
    rot_err, t_err = pose_errors(
        Pose(jnp.asarray(R.reshape(-1, 3, 3)),
             jnp.asarray(t.reshape(-1, 3))),
        Pose(gt_R.reshape(-1, 3, 3), gt_t.reshape(-1, 3)))
    rot_err, t_err = np.asarray(rot_err), np.asarray(t_err)
    correct = (rot_err < 5.0) & (t_err < 50.0)
    return {
        "reloc_per_s": reloc_per_s,
        "mfu": mfu,
        "accuracy_5cm5deg": float(np.mean(correct)),
        "median_rot_deg": float(np.median(rot_err)),
        "median_trans_mm": float(np.median(t_err)),
        "trained_weights": trained,
        "queue": queue,
        "batch": B,
        "verify_topk": verify_topk,
        "arch": arch,
        "attempts": attempts,
    }


LATENCY_FILE = Path(__file__).parent / "results" / "serve_latency.json"


def _git_rev() -> str:
    import subprocess
    try:
        return subprocess.run(
            ["git", "-C", str(Path(__file__).parent), "rev-parse",
             "--short", "HEAD"], capture_output=True, text=True,
            timeout=10).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _code_changed_since(rev: str | None) -> bool:
    """True when the serve CODE (not results/ evidence or weights)
    differs from `rev` — the only change class that stales a committed
    latency measurement."""
    if not rev or rev == "unknown":
        return True
    import subprocess
    try:
        repo = str(Path(__file__).parent)
        # committed changes since the stamp AND uncommitted working-tree
        # edits both stale the evidence
        for span in ([rev, "HEAD"], ["HEAD"]):
            r = subprocess.run(
                ["git", "-C", repo, "diff", "--quiet", *span, "--",
                 "dsac_tpu", "bench.py"],
                capture_output=True, timeout=10)
            if r.returncode != 0:
                return True
        return False
    except Exception:
        return True


def measure_latency(on_tpu: bool, verify_topk: int, arch: str,
                    attempts: int, fused_scoring: bool,
                    two_phase: bool = False,
                    batches=(1, 4, 8, 16), reps: int = 40):
    """Per-dispatch serve latency, fenced (time-to-pose-on-host).

    Every sample is an independent dispatch synced through fence() — the
    number a relocalization CLIENT sees.  The bare link floor (a fenced
    trivial op) is measured alongside so the on-chip component is
    separable: over the axon tunnel the floor is ~2 RTTs (~25 ms each,
    dispatch + readback) and would vanish on a local chip.
    """
    import jax
    import numpy as np

    from dsac_tpu.utils.timing import fence

    # bare link floor: dispatch + fence of a trivial jitted op
    tiny = jax.jit(lambda x: x + 1.0)
    z = jax.device_put(np.float32(0))
    fence(tiny(z))
    floor = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(tiny(z))
        floor.append((time.perf_counter() - t0) * 1000.0)
    floor_p50 = float(np.percentile(floor, 50))

    curve = []
    for B in batches:
        serve_batch, images, _gt, _tr = build(
            on_tpu, B, verify_topk, 1, arch, attempts, fused_scoring,
            two_phase)
        serve = jax.jit(lambda k, imgs: serve_batch(
            jax.random.split(k, B), imgs))
        imgs = images[0]
        fence(serve(jax.random.PRNGKey(0), imgs))  # compile+warm
        lats = []
        for i in range(reps):
            t0 = time.perf_counter()
            fence(serve(jax.random.PRNGKey(i), imgs))
            lats.append((time.perf_counter() - t0) * 1000.0)
        p50 = float(np.percentile(lats, 50))
        p99 = float(np.percentile(lats, 99))
        curve.append({
            "batch": B,
            "p50_ms": round(p50, 2),
            "p99_ms": round(p99, 2),
            "p50_on_chip_ms": round(max(p50 - floor_p50, 0.0), 2),
            "throughput_frames_per_s": round(B / (p50 / 1000.0), 1),
        })
    return {"metric": "serve_latency_ms",
            "value": curve[0]["p50_ms"],
            "unit": "ms p50, batch=1 queue=1, fenced (pose on host)",
            "p99_ms": curve[0]["p99_ms"],
            "dispatch_floor_p50_ms": round(floor_p50, 2),
            "on_chip_p50_ms": curve[0]["p50_on_chip_ms"],
            "curve": curve,
            "verify_topk": verify_topk, "attempts": attempts,
            "arch": arch,
            "scoring": "fused_soft" if fused_scoring else "cnn",
            "sampling": "two_phase" if two_phase else "fixed",
            "backend": "tpu" if on_tpu else "cpu"}


def main():
    args = parse_args()
    # the ALGORITHMIC config both sides must share for vs_baseline to be
    # apples-to-apples (VERDICT r4 #4): pool size / attempt depth /
    # verification / scoring head.  Kernel lowerings (two-phase Pallas
    # sampling, fused scoring) are implementation, not algorithm: the CPU
    # baseline runs the jnp twins of the same program at the same depth —
    # interpret-mode Pallas is an emulator, not a baseline.
    config = {"queue": 1 if args.measure_cpu_baseline else args.queue,
              "batch": args.batch, "verify_topk": args.verify_topk,
              "arch": args.arch, "attempts": args.attempts,
              "scoring": ("soft_inlier" if args.fused_scoring
                          else "score_cnn")}

    if args.measure_cpu_baseline:
        import jax

        jax.config.update("jax_platforms", "cpu")
        mcfg = dict(config)
        mcfg.pop("scoring")
        r = measure(on_tpu=False, fused_scoring=args.fused_scoring,
                    two_phase=False, **mcfg)
        CPU_BASELINE_FILE.write_text(json.dumps({
            "reloc_per_s": round(r["reloc_per_s"], 3),
            "config": config,
            "lowering": "jnp twins of the TPU kernels (fixed-depth "
                        "sampling at the same attempt count, jnp "
                        "soft-inlier head)",
            "note": "identical serve algorithm on XLA:CPU, all host "
                    "cores; generous stand-in for the CPU(OpenMP)+1-GPU "
                    "reference",
        }, indent=1))
        print(CPU_BASELINE_FILE.read_text())
        return

    import jax

    on_tpu = jax.default_backend() == "tpu"

    if args.latency:
        rec = measure_latency(on_tpu, args.verify_topk, args.arch,
                              args.attempts, args.fused_scoring,
                              args.two_phase)
        # stamp the evidence so the headline bench can label staleness
        # (a kernel/model change invalidates the number until re-run)
        rec["git_rev"] = _git_rev()
        rec["date"] = time.strftime("%Y-%m-%d")
        if on_tpu:  # evidence file (BASELINE.md latency table source)
            LATENCY_FILE.parent.mkdir(exist_ok=True)
            LATENCY_FILE.write_text(json.dumps(rec, indent=1) + "\n")
        print(json.dumps(rec))
        return

    baseline_note = None
    if CPU_BASELINE_FILE.exists():
        rec = json.loads(CPU_BASELINE_FILE.read_text())
        baseline = rec["reloc_per_s"]
        baseline_src = "measured_cpu"
        stored = dict(rec.get("config", {}))
        if stored:
            stored.setdefault("attempts", 16)  # pre-flag baselines
            stored.setdefault("scoring", "score_cnn")
        want = dict(config, queue=1)
        if stored and stored != want:
            baseline_note = (f"cpu baseline measured at {stored}, this "
                             f"run is {want}")
    else:
        baseline = BASELINE_RELOC_PER_S_GUESS
        baseline_src = "literature_estimate"

    r = measure(on_tpu=on_tpu, queue=args.queue, batch=args.batch,
                verify_topk=args.verify_topk, arch=args.arch,
                attempts=args.attempts, fused_scoring=args.fused_scoring,
                two_phase=args.two_phase)
    rec = {
        "metric": "relocalizations_per_s_per_chip",
        "value": round(r["reloc_per_s"], 2),
        "unit": (f"frames/s (256 hyps, 640x480, {args.arch}+"
                 f"{'soft-inlier' if args.fused_scoring else 'ScoreNet'}, "
                 f"{r['queue'] * r['batch']} distinct frames, queue "
                 f"{r['queue']} x batch {r['batch']}, "
                 f"verify_topk {r['verify_topk']})"),
        "vs_baseline": round(r["reloc_per_s"] / baseline, 2),
        "baseline_source": baseline_src,
        "mfu_bf16_peak": (round(r["mfu"], 4) if r["mfu"] is not None
                          else None),
        "accuracy_5cm5deg": r["accuracy_5cm5deg"],
        "verify_topk": r["verify_topk"],
        "attempts": r["attempts"],
        "trained_weights": r["trained_weights"],
    }
    if args.fused_scoring:
        rec["scoring"] = "fused_soft"
    if args.two_phase:
        rec["sampling"] = "two_phase"
    # single-frame latency from the committed --latency evidence (a live
    # re-measure would add a second full-pipeline compile to every driver
    # bench run; the evidence file is re-measured each round on the same
    # chip — see BASELINE.md latency table)
    if LATENCY_FILE.exists() and on_tpu:
        lat = json.loads(LATENCY_FILE.read_text())
        if (lat.get("verify_topk") == args.verify_topk
                and lat.get("attempts") == args.attempts
                and lat.get("arch") == args.arch
                and lat.get("scoring") == ("fused_soft" if
                                           args.fused_scoring else "cnn")
                and lat.get("sampling", "fixed") == ("two_phase" if
                                                     args.two_phase
                                                     else "fixed")):
            rec["p50_ms"] = lat["value"]
            src = (f"results/serve_latency.json@"
                   f"{lat.get('git_rev', 'unstamped')} "
                   f"{lat.get('date', '')}").strip()
            if _code_changed_since(lat.get("git_rev")):
                src += " (code changed since; rerun --latency)"
            rec["p50_source"] = src
    if args.medians:
        rec["median_rot_deg"] = round(r["median_rot_deg"], 4)
        rec["median_trans_mm"] = round(r["median_trans_mm"], 3)
    if baseline_note:
        rec["baseline_note"] = baseline_note
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
