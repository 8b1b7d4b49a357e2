"""The differentiable-RANSAC pipeline: forward passes, training, eval.

Replaces the reference's L4+L5: processImage (core/cnn.h:1028-1257 and
core/cnn_softam.h:960-1180) plus the six entry programs' inner loops.
All backward passes are jax.grad of the forward — the reference's
hand-assembled two-path gradient (train_ransac.cpp:303-401) is exactly
the autodiff of the expected-loss objective.
"""

from dsac_tpu.pipeline.forward import (
    FrameResult, process_frame, process_frame_softam, verified_selection,
)
from dsac_tpu.pipeline.evaluate import evaluate_frame, summarize
