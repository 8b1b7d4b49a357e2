"""Pallas kernel correctness vs the XLA reference implementation.

Runs in interpreter mode on CPU (the compiled path is exercised on real
TPU by bench/verify drives — the axon CPU farm cannot compile Mosaic).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import Camera
from dsac_tpu.geometry import Pose, so3_exp
from dsac_tpu.ops.diffmap import diffmaps, soft_inlier_scores
from dsac_tpu.ops.diffmap_pallas import (diffmaps_pallas,
                                         soft_inlier_scores_pallas)

CAM = Camera.make(525.0, 640, 480)


def _random_problem(rng, H=100, N=700):
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


def cam_vec():
    return jnp.asarray([float(CAM.focal), float(CAM.cx), float(CAM.cy)],
                       jnp.float32)


class TestDiffmapPallas:
    def test_matches_xla_reference(self, rng):
        hyps, coords, pix = _random_problem(rng)
        ref = diffmaps(hyps, coords, pix, CAM)
        out = diffmaps_pallas(hyps.R, hyps.t, coords, pix, cam_vec(),
                              interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-4, atol=1e-2)

    def test_nonaligned_shapes(self, rng):
        hyps, coords, pix = _random_problem(rng, H=37, N=130)
        ref = diffmaps(hyps, coords, pix, CAM)
        out = diffmaps_pallas(hyps.R, hyps.t, coords, pix, cam_vec(),
                              interpret=True)
        assert out.shape == ref.shape == (37, 130)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-4, atol=1e-2)


class TestScoresPallas:
    def test_matches_xla_reference(self, rng):
        hyps, coords, pix = _random_problem(rng, H=64, N=1600)
        dm = diffmaps(hyps, coords, pix, CAM)
        ref = soft_inlier_scores(dm, 10.0, 10.0)
        out = soft_inlier_scores_pallas(hyps.R, hyps.t, coords, pix,
                                        cam_vec(), interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-3, atol=0.05)

    def test_padding_not_counted(self, rng):
        # N not a multiple of the tile: padded lanes must not contribute
        hyps, coords, pix = _random_problem(rng, H=8, N=100)
        dm = diffmaps(hyps, coords, pix, CAM)
        ref = soft_inlier_scores(dm, 10.0, 10.0)
        out = soft_inlier_scores_pallas(hyps.R, hyps.t, coords, pix,
                                        cam_vec(), interpret=True)
        np.testing.assert_allclose(np.array(out), np.array(ref),
                                   rtol=1e-3, atol=0.05)
