"""On-TPU Pallas kernel check: compiled (Mosaic) vs interpreted vs jnp.

The CPU test suite exercises every Pallas kernel in interpreter mode
(tests/test_pallas_kernels.py — the axon CPU farm cannot compile
Mosaic).  This script is the real-hardware counterpart the verify drive
runs: each kernel is COMPILED for the TPU and compared

  1. against its own interpreter-mode execution on the same inputs
     (tight tolerance — catches Mosaic lowering regressions), and
  2. against the jnp/XLA reference implementation (the pipeline-level
     agreement the serve path relies on).

Prints one OK line per kernel and a final JSON summary; non-zero exit on
any failure.

Usage: PYTHONPATH=/root/repo python scripts/tpu_kernel_check.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import Camera
from dsac_tpu.geometry import Pose, so3_exp
from dsac_tpu.geometry.gn import refine_pose
from dsac_tpu.geometry.p3p import solve_pnp_minimal
from dsac_tpu.geometry.projection import project
from dsac_tpu.ops.diffmap import diffmaps, soft_inlier_scores
from dsac_tpu.ops.diffmap_pallas import (diffmaps_pallas,
                                         soft_inlier_scores_pallas)
from dsac_tpu.ops.gn_pallas import refine_pose_fused
from dsac_tpu.ops.p3p_pallas import p3p_solve_pallas

CAM = Camera.make(525.0, 640, 480)
CAM_VEC = jnp.asarray([CAM.focal, CAM.cx, CAM.cy], jnp.float32)


def _pose_problem(rng, H=256, N=1600):
    Rs = so3_exp(jnp.asarray(rng.normal(size=(H, 3)) * 0.5, jnp.float32))
    ts = jnp.asarray(rng.normal(size=(H, 3)) * 300, jnp.float32)
    ts = ts.at[:, 2].add(-2500.0)
    coords = jnp.asarray(
        np.stack([rng.uniform(-1000, 1000, N), rng.uniform(-800, 800, N),
                  rng.uniform(-500, 500, N)], -1), jnp.float32)
    pix = jnp.asarray(
        np.stack([rng.uniform(0, 640, N), rng.uniform(0, 480, N)], -1),
        jnp.float32)
    return Pose(Rs, ts), coords, pix


def _p3p_problem(rng, N=4096, noise=4.0):
    """Minimal sets whose pixels are true projections (+noise) of the
    points under a GT pose — the regime the sampler feeds the kernel."""
    objs, imgs = [], []
    for i in range(N):
        w = rng.normal(size=3) * 0.4
        R = np.asarray(so3_exp(jnp.asarray(w, jnp.float32)))
        t = np.asarray([rng.uniform(-200, 200), rng.uniform(-200, 200),
                        -rng.uniform(2000, 3500)], np.float32)
        obj = np.stack([rng.uniform(-1000, 1000, 4),
                        rng.uniform(-800, 800, 4),
                        rng.uniform(-500, 500, 4)], -1).astype(np.float32)
        img = np.array(project(Pose(jnp.asarray(R), jnp.asarray(t)),
                               jnp.asarray(obj), CAM))
        img += rng.normal(size=img.shape) * noise
        objs.append(obj)
        imgs.append(img.astype(np.float32))
    return jnp.asarray(np.stack(objs)), jnp.asarray(np.stack(imgs))


def check(name, ok, detail):
    status = "OK" if ok else "FAIL"
    print(f"[{status}] {name}: {detail}")
    return ok


def main():
    assert jax.default_backend() == "tpu", (
        f"this check needs the real TPU (got {jax.default_backend()})")
    rng = np.random.default_rng(1305)
    results = {}

    # ---- diffmaps: (H, N) clamped reprojection errors ----
    hyps, coords, pix = _pose_problem(rng)
    dm_c = np.asarray(jax.jit(diffmaps_pallas)(
        hyps.R, hyps.t, coords, pix, CAM_VEC))
    dm_i = np.asarray(diffmaps_pallas(hyps.R, hyps.t, coords, pix,
                                      CAM_VEC, interpret=True))
    dm_j = np.asarray(diffmaps(hyps, coords, pix, CAM, 100.0))
    d_int = float(np.abs(dm_c - dm_i).max())
    d_jnp = float(np.abs(dm_c - dm_j).max())
    results["diffmaps"] = {"max_abs_vs_interpret": d_int,
                           "max_abs_vs_jnp": d_jnp}
    ok = check("diffmaps_pallas", d_int < 1e-2 and d_jnp < 1e-2,
               f"compiled vs interpret {d_int:.2e}, vs jnp {d_jnp:.2e} px")

    # ---- fused soft-inlier scores ----
    sc_c = np.asarray(jax.jit(soft_inlier_scores_pallas)(
        hyps.R, hyps.t, coords, pix, CAM_VEC))
    sc_i = np.asarray(soft_inlier_scores_pallas(
        hyps.R, hyps.t, coords, pix, CAM_VEC, interpret=True))
    sc_j = np.asarray(soft_inlier_scores(jnp.asarray(dm_j), 10.0, 10.0))
    s_int = float(np.abs(sc_c - sc_i).max())
    s_jnp = float(np.abs(sc_c - sc_j).max())
    results["soft_scores"] = {"max_abs_vs_interpret": s_int,
                              "max_abs_vs_jnp": s_jnp}
    ok &= check("soft_inlier_scores_pallas", s_int < 1e-2 and s_jnp < 1e-2,
                f"compiled vs interpret {s_int:.2e}, vs jnp {s_jnp:.2e}")

    # ---- SoA P3P ----
    obj, img = _p3p_problem(rng)
    pp_c, v_c, w_c = jax.jit(p3p_solve_pallas)(obj, img, CAM_VEC)
    pp_i, v_i, w_i = p3p_solve_pallas(obj, img, CAM_VEC, interpret=True)
    v_c, v_i = np.asarray(v_c), np.asarray(v_i)
    agree = float((v_c == v_i).mean())
    both = v_c & v_i
    dR = np.abs(np.asarray(pp_c.R) - np.asarray(pp_i.R)
                ).reshape(len(obj), -1).max(1)
    p_pose = float(np.median(dR[both])) if both.any() else 0.0
    # jnp solver agreement (same consistency decisions the sampler makes)
    jp, jv = jax.jit(jax.vmap(
        lambda o, p: solve_pnp_minimal(o, p, CAM, polish_iters=0)))(obj,
                                                                    img)
    rp = project(jp, obj, CAM)
    jworst = np.asarray(jnp.max(jnp.linalg.norm(rp - img, axis=-1),
                                axis=-1))
    pc = v_c & (np.asarray(w_c) < 10.0)
    jc = np.asarray(jv) & (jworst < 10.0)
    dec_agree = float((pc == jc).mean())
    results["p3p"] = {"valid_agree_vs_interpret": agree,
                      "median_dR_vs_interpret": p_pose,
                      "decision_agree_vs_jnp": dec_agree}
    # Decision agreement is the serve-level contract: round-2 A/B showed
    # bit-identical miss sets at 98.8% attempt-level agreement, so ≥0.98
    # is the regression gate (a Mosaic change dropping below it must turn
    # the round red, not ship silently — VERDICT r3 weak #4).
    ok &= check("p3p_solve_pallas",
                agree > 0.99 and p_pose < 1e-3 and dec_agree >= 0.98,
                f"valid agree {agree:.4f}, median dR {p_pose:.2e}, "
                f"jnp decisions {dec_agree:.3f}")

    # ---- single-launch fused IRLS refinement ----
    # start from perturbed-GT pools on a realistic problem
    pool = Pose(hyps.R[:256], hyps.t[:256])
    ref_c, n_c = jax.jit(lambda p: refine_pose_fused(
        p, coords, pix, CAM, steps=16))(pool)
    ref_i, n_i = refine_pose_fused(pool, coords, pix, CAM, steps=16,
                                   interpret=True)
    rt_int = float(np.abs(np.asarray(ref_c.t) - np.asarray(ref_i.t)).max())
    rn_int = float(np.abs(np.asarray(n_c) - np.asarray(n_i)).max())
    # jnp fixed point (same total step count)
    ref_j, n_j = jax.jit(jax.vmap(lambda p0: refine_pose(
        p0, coords, pix, CAM, steps=8, inner_iters=2)))(pool)
    rt_jnp = float(np.median(
        np.linalg.norm(np.asarray(ref_c.t) - np.asarray(ref_j.t), axis=-1)))
    results["refine_fused"] = {"max_t_vs_interpret_mm": rt_int,
                               "max_ninl_vs_interpret": rn_int,
                               "median_t_vs_jnp_mm": rt_jnp}
    ok &= check("refine_pose_fused",
                rt_int < 0.1 and rn_int < 1.0 and rt_jnp < 5.0,
                f"compiled vs interpret {rt_int:.2e} mm (n_inl "
                f"{rn_int:.2e}), median vs jnp fixed point {rt_jnp:.3f} mm")

    summary = {"metric": "tpu_kernel_check", "ok": bool(ok),
               **{k: {kk: round(vv, 6) for kk, vv in v.items()}
                  for k, v in results.items()}}
    print(json.dumps(summary))
    # Record the evidence file every run (results/ is the committed
    # evidence chain; the verify drive re-runs this each round).
    out = pathlib.Path(__file__).resolve().parents[1] / "results"
    out.mkdir(exist_ok=True)
    (out / "tpu_kernel_check.json").write_text(json.dumps(summary,
                                                          indent=1) + "\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
