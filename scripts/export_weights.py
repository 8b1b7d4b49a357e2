"""Export trained orbax snapshots as compact committed weight artifacts.

Writes artifacts/coord_e2e.npz + artifacts/score_e2e.npz (f16, ~12 MB
total) from a training run directory, so bench.py and demos can serve
the trained flagship model on a fresh checkout (runs/ is ephemeral and
gitignored).

Usage: python scripts/export_weights.py [runs/synth_gen_fast] [artifacts]
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_platforms", "cpu")
    run_dir = Path(sys.argv[1] if len(sys.argv) > 1 else
                   "runs/synth_gen_fast")
    out_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "artifacts")

    from dsac_tpu.models import DenseCoordNet, ScoreNet
    from dsac_tpu.utils import checkpoint as ckpt
    from dsac_tpu.utils.params_io import save_params_npz

    coord_net, score_net = DenseCoordNet(), ScoreNet()
    cp = coord_net.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 480, 640, 3)))
    sp = score_net.init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))

    snap_c = ckpt.restore(run_dir, ckpt.OBJ_E2E)
    snap_s = ckpt.restore(run_dir, ckpt.SCORE_E2E)
    # untyped restore returns the raw pytree; pull params out
    save_params_npz(out_dir / "coord_e2e.npz", snap_c["params"])
    save_params_npz(out_dir / "score_e2e.npz", snap_s["params"])
    print(f"Exported e2e weights (step {snap_c['step']}) from {run_dir} "
          f"to {out_dir}/")

    # round-trip check against the typed templates
    from dsac_tpu.utils.params_io import load_params_npz
    import numpy as np
    rc = load_params_npz(out_dir / "coord_e2e.npz", cp)
    err = max(float(np.max(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32))))
              for a, b in zip(jax.tree.leaves(rc),
                              jax.tree.leaves(snap_c["params"])))
    print(f"round-trip max |err| = {err:.2e} (f16 quantisation)")


if __name__ == "__main__":
    main()
