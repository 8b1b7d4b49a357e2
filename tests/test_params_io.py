"""Round-trip tests for the flat npz weight-artifact format.

artifacts/*.npz are the committed trained weights that bench.py serves on
a fresh checkout (runs/ is ephemeral); the format must restore exactly
into a typed template pytree, modulo f16 storage quantisation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.utils.params_io import load_params_npz, save_params_npz


def test_roundtrip_preserves_structure_and_values(tmp_path):
    params = {
        "conv": {"kernel": jnp.linspace(-1.0, 1.0, 24).reshape(2, 3, 4),
                 "bias": jnp.zeros(4)},
        "head": {"w": jnp.full((3, 3), 0.125), "step": jnp.asarray(7)},
    }
    path = tmp_path / "w.npz"
    save_params_npz(path, params)
    back = load_params_npz(path, jax.tree.map(jnp.zeros_like, params))

    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(params)):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        # f16 storage: exact for these values
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-3)


def test_committed_artifacts_load_into_flagship_nets():
    from pathlib import Path

    from dsac_tpu.models import DenseCoordNet, ScoreNet

    art = Path(__file__).parent.parent / "artifacts"
    if not (art / "coord_e2e.npz").exists():
        import pytest

        pytest.skip("no committed weight artifacts")
    cp = DenseCoordNet().init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 480, 640, 3)))
    sp = ScoreNet().init(jax.random.PRNGKey(2), jnp.zeros((1, 40, 40)))
    cp2 = load_params_npz(art / "coord_e2e.npz", cp)
    sp2 = load_params_npz(art / "score_e2e.npz", sp)
    for t in (cp2, sp2):
        for leaf in jax.tree.leaves(t):
            assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
    # trained weights differ from init
    d = sum(float(np.abs(np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)).sum())
            for a, b in zip(jax.tree.leaves(cp2), jax.tree.leaves(cp)))
    assert d > 1.0
