"""Resample-only-failures sampling (ops/sampling.py two-phase path).

Pallas kernels run interpreted on CPU; the compiled path is covered by
scripts/tpu_kernel_check.py + the serve benches on real hardware.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.config import PoseConfig
from dsac_tpu.data.synthetic import SyntheticScene
from dsac_tpu.geometry.loss import pose_errors
from dsac_tpu.ops.sampling import (sample_minimal_sets,
                                   sample_minimal_sets_two_phase)

SCENE = SyntheticScene(width=160, height=120, focal=130.0)


def _frame_points(n=200, seed=0):
    pose, _rgb, _depth, coords = SCENE.frame(jax.random.PRNGKey(7))
    rng = np.random.default_rng(seed)
    xs = rng.integers(4, 156, size=n)
    ys = rng.integers(4, 116, size=n)
    pix = jnp.asarray(np.stack([xs, ys], -1), jnp.float32)
    c = jnp.asarray(np.asarray(coords)[ys, xs])
    return pose, c, pix


class TestTwoPhase:
    CFG = PoseConfig(num_hypotheses=64, sample_attempts=8)

    def test_good_coords_localize_with_few_solves(self):
        """With clean coordinates, phase 1 validates (almost) every lane
        and the selected poses localize like the fixed-T pool."""
        gt, coords, pix = _frame_points()
        cam = SCENE.camera
        key = jax.random.PRNGKey(3)
        sets = sample_minimal_sets_two_phase(key, coords, pix, cam,
                                             self.CFG)
        assert float(jnp.mean(sets.valid.astype(jnp.float32))) > 0.9
        rot_e, t_e = pose_errors(sets.poses, gt)
        rot_e = np.asarray(rot_e)[np.asarray(sets.valid)]
        t_e = np.asarray(t_e)[np.asarray(sets.valid)]
        # minimal-set poses from exact coords: essentially exact
        assert np.median(rot_e) < 1.0
        assert np.median(t_e) < 20.0

    def test_garbage_coords_degrade_gracefully(self):
        """Random coordinates fail nearly every phase-1 lane: the budget
        rescues ~K of them, the rest stay flagged invalid (the pool
        degrades, it does not corrupt).  No in-graph fixed-T fallback —
        lax.cond under the serve vmap would batch the kernel's SMEM
        camera operand (see the two-phase docstring)."""
        _gt, coords, pix = _frame_points()
        cam = SCENE.camera
        rng = np.random.default_rng(5)
        garbage = jnp.asarray(rng.uniform(-4000, 4000,
                                          size=coords.shape).astype(
                                              np.float32))
        key = jax.random.PRNGKey(9)
        two = sample_minimal_sets_two_phase(key, garbage, pix, cam,
                                            self.CFG)
        fixed = sample_minimal_sets(key, garbage, pix, cam, self.CFG,
                                    fused=True)
        n_two = int(jnp.sum(two.valid))
        n_fixed = int(jnp.sum(fixed.valid))
        # every surviving lane is genuinely self-consistent, and invalid
        # lanes are FLAGGED (downstream scoring buries them)
        assert n_two <= n_fixed + 8
        assert two.valid.shape == (64,)
        assert np.isfinite(np.asarray(two.poses.R)).all()
        assert np.isfinite(np.asarray(two.poses.t)).all()

    def test_vmapped_over_frames(self):
        """The serve shape: two-phase under vmap (the exact structure
        that broke the lax.cond formulation on the Mosaic backend)."""
        gt, coords, pix = _frame_points()
        cam = SCENE.camera
        batched = jax.vmap(
            lambda k: sample_minimal_sets_two_phase(k, coords, pix, cam,
                                                    self.CFG))
        sets = batched(jax.random.split(jax.random.PRNGKey(2), 3))
        assert sets.poses.R.shape == (3, 64, 3, 3)
        assert float(jnp.mean(sets.valid.astype(jnp.float32))) > 0.9

    def test_attempts_one_delegates(self):
        gt, coords, pix = _frame_points()
        cfg1 = dataclasses.replace(self.CFG, sample_attempts=1)
        sets = sample_minimal_sets_two_phase(jax.random.PRNGKey(1), coords,
                                             pix, SCENE.camera, cfg1)
        assert sets.poses.R.shape == (64, 3, 3)

    def test_string_routing_through_sample_minimal_sets(self):
        gt, coords, pix = _frame_points()
        key = jax.random.PRNGKey(11)
        a = sample_minimal_sets(key, coords, pix, SCENE.camera, self.CFG,
                                fused="two_phase")
        b = sample_minimal_sets_two_phase(key, coords, pix, SCENE.camera,
                                          self.CFG)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        np.testing.assert_allclose(np.asarray(a.poses.t),
                                   np.asarray(b.poses.t), atol=1e-6)

    def test_budget_rescues_failures(self):
        """Mid regime: corrupt ~6% of the LANES' first draws by planting
        a small cluster of broken coordinates — phase 2 must rescue the
        affected lanes (validity close to the fixed-T pool's)."""
        gt, coords, pix = _frame_points()
        cam = SCENE.camera
        # corrupt a handful of points: lanes whose first attempt touches
        # one go invalid in phase 1 with ~1-(1-k/N)^4 probability
        bad = np.zeros(coords.shape[0], bool)
        bad[:6] = True
        coords_bad = jnp.where(jnp.asarray(bad)[:, None],
                               jnp.asarray([1e5, -1e5, 1e5]), coords)
        key = jax.random.PRNGKey(21)
        two = sample_minimal_sets_two_phase(key, coords_bad, pix, cam,
                                            self.CFG)
        frac_valid = float(jnp.mean(two.valid.astype(jnp.float32)))
        assert frac_valid > 0.85, frac_valid
        rot_e, t_e = pose_errors(two.poses, gt)
        med_rot = np.median(np.asarray(rot_e)[np.asarray(two.valid)])
        assert med_rot < 1.0
