"""Device-mesh parallelism for the DSAC pipeline.

The reference is a single-process, single-GPU program whose only
parallelism is OpenMP loops over hypotheses/pixels/patches
(SURVEY.md §2.3).  This package is the scaling story it never had:

  * mesh axes ('data', 'hyp'): frames are data-parallel; within a frame,
    the hypothesis pool AND the coordinate-CNN patch axis shard over
    'hyp' (the same way sequence parallelism reuses the TP axis);
  * the global softmax over hypothesis scores becomes an all_gather of
    per-shard score logits (the collective form of core/cnn.h:1147);
  * the expected-loss reduction and parameter gradients become psums
    (the collective form of the serial sums at train_ransac.cpp:355-379).

Everything is shard_map-based SPMD: the same program runs per device,
with explicit collectives riding ICI.
"""

from dsac_tpu.parallel.mesh import make_mesh
from dsac_tpu.parallel.sharded import (
    sharded_e2e_step, sharded_expected_loss, sharded_process_frame,
    sharded_serve_frame, sharded_serve_step,
)
