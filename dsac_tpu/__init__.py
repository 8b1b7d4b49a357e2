"""dsac_tpu — a TPU-native differentiable camera-localization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DSAC
("Differentiable RANSAC for Camera Localization", cvlab-dresden/DSAC):
scene-coordinate regression CNNs feed batched minimal-PnP hypothesis
generation, dense reprojection-error scoring, probabilistic hypothesis
selection, and differentiable Gauss-Newton pose refinement — end-to-end
trainable under jit/vmap and shardable over device meshes.

Layer map (mirrors SURVEY.md §1 of the reference, rebuilt TPU-first):

  config        — dataclass pytrees (replaces GlobalProperties singleton)
  geometry/     — pose math, P3P, Gauss-Newton PnP, Kabsch, losses
                  (replaces core/Hypothesis.*, core/maxloss.h and the
                  geometry half of core/cnn.h; all gradients by autodiff)
  ops/          — sampling, dense scoring, selection kernels
  models/       — Flax scene-coordinate + score CNNs (replaces core/lua/*)
  pipeline/     — the differentiable RANSAC forward/training/eval passes
                  (replaces processImage and the train_*/test_* programs)
  data/         — 7-Scenes-layout loader + synthetic scenes
  parallel/     — device-mesh sharding: hypothesis/frame partitioning,
                  collective softmax/gradient reduction (new capability;
                  the reference is single-process OpenMP)
  utils/        — rng threading, timing, checkpointing, logging
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry kernels are chains of tiny (3x3, 6x6) f32 matmuls whose error
# compounds into pose error — demand true-f32 matmul accumulation globally.
# The CNNs opt back into fast bf16 MXU passes explicitly (models/ pass
# dtype=bfloat16 and precision=DEFAULT per layer), so this costs nothing
# on the hot path.
_jax.config.update("jax_default_matmul_precision", "highest")

# Remote-TPU compiles cost minutes for the larger pipeline graphs and are
# not cached across processes by default.  A persistent compilation cache
# helps a lot on stable backends — but experimental PJRT plugins (like
# this machine's remote-TPU tunnel) can crash the worker when reloading
# serialized executables, so it is strictly opt-in:
#   export DSAC_TPU_COMPILE_CACHE=/path/to/cache
import os as _os

# This machine's sitecustomize force-registers the remote-TPU "axon"
# platform and IGNORES JAX_PLATFORMS from the environment; tests and the
# multi-chip dryrun need a reliable escape hatch to the (possibly
# device-farmed) CPU backend.
if _os.environ.get("DSAC_TPU_FORCE_CPU"):
    _jax.config.update("jax_platforms", "cpu")

_cache_dir = _os.environ.get("DSAC_TPU_COMPILE_CACHE")
if _cache_dir:
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

from dsac_tpu import config as config
