"""Flat npz import/export for model parameter pytrees.

Orbax snapshots (utils/checkpoint.py) are the live training format; this
module is for compact, dependency-free weight ARTIFACTS — e.g. the
trained flagship weights committed to the repo so bench.py serves a real
model even on a fresh checkout (the runs/ directory is ephemeral).
Weights are stored f16 (the models compute in bf16, so half-precision
storage is lossless in effect) under path-joined keys.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np

_SEP = "|"


def save_params_npz(path: str | Path, params, dtype=np.float16) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        key = _SEP.join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        arr = np.asarray(leaf)
        out[key] = arr.astype(dtype) if arr.dtype == np.float32 else arr
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **out)


def load_params_npz(path: str | Path, template):
    """Restore into `template`'s structure/dtypes (typed, ordered)."""
    z = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in flat:
        key = _SEP.join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        arr = z[key]
        leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
