"""Model shape/containment tests (architectures per core/lua/*.lua)."""

import jax
import jax.numpy as jnp
import numpy as np

from dsac_tpu.models import DenseCoordNet, PatchCoordNet, ScoreNet
from dsac_tpu.models.coord_net import extract_patches, gather_dense_coords


class TestPatchCoordNet:
    def test_output_shape(self):
        net = PatchCoordNet()
        x = jnp.zeros((4, 42, 42, 3))
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (4, 3)
        assert y.dtype == jnp.float32

    def test_param_structure_matches_reference(self):
        # 10 convs + 3 dense layers (train_obj.lua:56-89)
        net = PatchCoordNet()
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 42, 42, 3)))
        layers = params["params"]
        convs = [k for k in layers if k.startswith("Conv")]
        denses = [k for k in layers if k.startswith("Dense")]
        assert len(convs) == 10
        assert len(denses) == 3
        # final FC 4096 -> 3
        assert layers[denses[-1]]["kernel"].shape == (4096, 3)


class TestScoreNet:
    def test_output_shape(self):
        net = ScoreNet()
        d = jnp.zeros((8, 40, 40))
        params = net.init(jax.random.PRNGKey(0), d)
        s = net.apply(params, d)
        assert s.shape == (8,)

    def test_param_structure(self):
        net = ScoreNet()
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 40, 40)))
        layers = params["params"]
        assert len([k for k in layers if k.startswith("Conv")]) == 10
        assert len([k for k in layers if k.startswith("Dense")]) == 3


class TestDenseCoordNet:
    def test_output_stride8(self):
        net = DenseCoordNet()
        x = jnp.zeros((1, 480, 640, 3))
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (1, 60, 80, 3)

    def test_s2d_stem_output_stride8(self):
        """The space-to-depth stem keeps the stride-8 output contract and
        is permutation-exact: shifting the input by 2 px maps to a clean
        1-px shift of the blocked input (no information loss)."""
        net = DenseCoordNet(width=8, s2d=True)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 255, (1, 64, 96, 3)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (1, 8, 12, 3)
        # param structure differs from the full-res stem (not swappable)
        p0 = DenseCoordNet(width=8).init(jax.random.PRNGKey(0), x)
        k = jax.tree_util.tree_structure
        assert len(jax.tree.leaves(p0)) != len(jax.tree.leaves(params)) or \
            any(a.shape != b.shape for a, b in
                zip(jax.tree.leaves(p0), jax.tree.leaves(params)))

    def test_context_stack_widens_receptive_field(self):
        """dense_ctx: the dilated stack must carry information across
        several hundred pixels (the `repeat` disambiguation requirement)
        where the plain net's ~50 px RF cannot."""
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 255, (1, 240, 480, 3)), jnp.float32)
        # perturb the input ~216 px right of the probed output position
        x2 = x.at[0, 112:128, 276:292, :].set(0.0)
        probe = (15, 8)  # /8 map position of full-res (124, 68)

        for ctx, expect_far in [(False, False), (True, True)]:
            net = DenseCoordNet(width=8, context=ctx)
            params = net.init(jax.random.PRNGKey(0), x)
            y1 = net.apply(params, x)[0, probe[0], probe[1]]
            y2 = net.apply(params, x2)[0, probe[0], probe[1]]
            moved = float(jnp.abs(y1 - y2).max()) > 1e-7
            assert moved == expect_far, (ctx, float(jnp.abs(y1 - y2).max()))

    def test_gather_bilinear(self):
        # a linear coordinate field must be reproduced exactly by the
        # bilinear gather at any pixel
        gh, gw, s = 60, 80, 8
        ii, jj = jnp.meshgrid(jnp.arange(gh, dtype=jnp.float32),
                              jnp.arange(gw, dtype=jnp.float32),
                              indexing="ij")
        cmap = jnp.stack([jj, ii, jj + ii], axis=-1)
        pix = jnp.asarray([[100, 200], [321, 47], [600, 400]])
        out = gather_dense_coords(cmap, pix, stride=s)
        fx = pix[:, 0] / s - 0.5
        fy = pix[:, 1] / s - 0.5
        np.testing.assert_allclose(out[:, 0], fx, atol=1e-4)
        np.testing.assert_allclose(out[:, 1], fy, atol=1e-4)


class TestExtractPatches:
    def test_patch_contents(self):
        img = jnp.arange(480 * 640 * 3, dtype=jnp.float32
                         ).reshape(480, 640, 3)
        centers = jnp.asarray([[100, 50], [321, 200]])
        p = extract_patches(img, centers, 42)
        assert p.shape == (2, 42, 42, 3)
        np.testing.assert_array_equal(
            np.array(p[0]), np.array(img[50 - 21:50 + 21, 100 - 21:100 + 21]))
