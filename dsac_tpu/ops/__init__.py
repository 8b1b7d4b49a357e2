"""Pipeline ops: stratified sampling, hypothesis generation, dense scoring,
hypothesis selection.

These replace the per-frame machinery of core/cnn.h: stochasticSubSample,
the OpenMP hypothesis-sampling loop, getDiffMap, softMax/entropy/draw —
rebuilt as batched, jit/vmap-friendly kernels with jax.random key
threading in place of the per-thread mt19937 RNG (core/thread_rand.*).
"""

from dsac_tpu.ops.sampling import (
    stratified_sample, sample_minimal_sets, sample_hypotheses,
)
from dsac_tpu.ops.diffmap import diffmaps, soft_inlier_scores
from dsac_tpu.ops.select import softmax_scores, shannon_entropy, draw_hypothesis
