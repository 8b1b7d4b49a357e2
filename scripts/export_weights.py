"""Export trained orbax snapshots as compact committed weight artifacts.

Writes artifacts/coord_e2e<sfx>.npz + artifacts/score_e2e<sfx>.npz (f16,
~12 MB total) from a training run directory, so bench.py and demos can
serve trained models on a fresh checkout (runs/ is ephemeral and
gitignored).  The suffix distinguishes variants: '' = dense DSAC
flagship, '_s2d' = space-to-depth stem, '_patch' = reference-parity
patch arch, '_softam' = soft-argmax training.

Usage: python scripts/export_weights.py [run_dir] [out_dir]
           [--arch dense|dense_s2d|dense_ctx|patch] [--softam]
           [--model endtoend|best] [--coord-only] [--suffix SFX]
"""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", nargs="?", default="runs/synth_gen_fast")
    ap.add_argument("out_dir", nargs="?", default="artifacts")
    ap.add_argument("--arch", choices=["dense", "dense_s2d", "dense_ctx",
                                       "patch"], default="dense")
    ap.add_argument("--softam", action="store_true")
    ap.add_argument("--model", choices=["endtoend", "best"],
                    default="endtoend",
                    help="'best' exports the validation-selected *_best "
                         "snapshots (train_ransac --validate-every)")
    ap.add_argument("--coord-only", action="store_true",
                    help="no score-CNN snapshot to export (soft-head "
                         "training runs)")
    ap.add_argument("--suffix", default=None,
                    help="artifact name suffix (default: derived from "
                         "--arch/--softam)")
    args = ap.parse_args()
    run_dir, out_dir = Path(args.run_dir), Path(args.out_dir)
    sfx = args.suffix
    if sfx is None:
        sfx = ("_softam" if args.softam else
               "_s2d" if args.arch == "dense_s2d" else
               "_patch" if args.arch == "patch" else "")

    from dsac_tpu.models import DenseCoordNet, PatchCoordNet, ScoreNet
    from dsac_tpu.utils import checkpoint as ckpt
    from dsac_tpu.utils.params_io import load_params_npz, save_params_npz

    if args.arch == "patch":
        coord_net = PatchCoordNet()
        cp = coord_net.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 42, 42, 3)))
    else:
        coord_net = DenseCoordNet(s2d=(args.arch == "dense_s2d"),
                                  context=(args.arch == "dense_ctx"))
        cp = coord_net.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 480, 640, 3)))
    score_net = ScoreNet()
    sp = score_net.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))

    obj = ckpt.OBJ_SOFTAM if args.softam else ckpt.OBJ_E2E
    score = ckpt.SCORE_SOFTAM if args.softam else ckpt.SCORE_E2E
    if args.model == "best":
        obj, score = obj + "_best", score + "_best"
    snap_c = ckpt.restore(run_dir, obj)
    # untyped restore returns the raw pytree; pull params out
    save_params_npz(out_dir / f"coord_e2e{sfx}.npz", snap_c["params"])
    if not args.coord_only:
        snap_s = ckpt.restore(run_dir, score)
        save_params_npz(out_dir / f"score_e2e{sfx}.npz", snap_s["params"])
    print(f"Exported {obj} weights (step {snap_c['step']}) from {run_dir} "
          f"to {out_dir}/*{sfx}.npz")

    # round-trip check against the typed templates
    import numpy as np
    rc = load_params_npz(out_dir / f"coord_e2e{sfx}.npz", cp)
    err = max(float(np.max(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32))))
              for a, b in zip(jax.tree.leaves(rc),
                              jax.tree.leaves(snap_c["params"])))
    print(f"round-trip max |err| = {err:.2e} (f16 quantisation)")


if __name__ == "__main__":
    main()
