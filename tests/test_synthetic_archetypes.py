"""Hard-benchmark scene archetypes (data/synthetic.py knobs).

The archetype knobs must (a) leave the default room bit-identical to the
rounds-1-3 benchmark, and (b) actually produce the degradation they
claim — repeated texture, flattened texture, sensor noise consistent
with the ray geometry, decoy-textured occluders in front of the walls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsac_tpu.data.synthetic import ARCHETYPES, SyntheticScene, make_scene

SMALL = dict(width=80, height=60, focal=70.0)


def small(name, **kw):
    return make_scene(name, **SMALL, **kw)


def test_registry_names():
    assert set(ARCHETYPES) == {"room", "repeat", "bare", "noisy",
                               "clutter", "hard"}
    with pytest.raises(ValueError):
        make_scene("nope")


def test_default_room_unchanged():
    """make_scene('room') renders bit-identically to SyntheticScene():
    the rounds-1-3 headline numbers stay comparable."""
    key = jax.random.PRNGKey(7)
    a = small("room")
    b = SyntheticScene(**SMALL)
    pa, ra, da, ca = a.frame(key)
    pb, rb, db, cb = b.frame(key)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    np.testing.assert_array_equal(np.asarray(pa.R), np.asarray(pb.R))


def test_frames_deterministic_per_key():
    for name in ARCHETYPES:
        sc = small(name)
        k = jax.random.PRNGKey(3)
        _, r1, d1, c1 = sc.frame(k)
        _, r2, d2, c2 = sc.frame(k)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_repeat_texture_periodicity():
    """Fine texture repeats with the period; the global component is weak
    (the whole point: appearance pins the coordinate only mod L)."""
    sc = make_scene("repeat")
    L = sc.texture_period_mm
    pts = jax.random.uniform(jax.random.PRNGKey(0), (512, 3),
                             minval=300.0, maxval=2500.0)
    t0 = sc.texture(pts)
    t1 = sc.texture(pts + jnp.asarray([L, 0.0, 0.0]))
    # shifted-by-one-period textures are near-identical (only the weak
    # coarse component moves), while same-magnitude NON-period shifts
    # decorrelate heavily
    d_period = float(jnp.mean(jnp.abs(t1 - t0)))
    t2 = sc.texture(pts + jnp.asarray([0.61 * L, 0.0, 0.0]))
    d_other = float(jnp.mean(jnp.abs(t2 - t0)))
    assert d_period < 0.25 * d_other
    assert d_period < 8.0  # out of 255


def test_bare_flattens_surface():
    sc = make_scene("bare")
    pts = jax.random.uniform(jax.random.PRNGKey(1), (4096, 3),
                             minval=0.0, maxval=3000.0)
    tex = np.asarray(sc.texture(pts))
    # flattened pixels sit at mid-gray (mix*keep -> 0 -> 127.5)
    gray = np.all(np.abs(tex - 127.5) < 4.0, axis=-1)
    frac = gray.mean()
    assert 0.45 < frac < 0.9, frac  # ~sparsity=0.7 with soft edges
    # and the rest keeps usable contrast
    assert tex[~gray].std() > 10.0


def test_noisy_depth_noise_is_along_ray():
    """Label noise must be Kinect-like: coords re-derived from the noisy
    depth, i.e. points stay ON the pixel ray (core/dataset.h:226-255)."""
    sc = small("noisy")
    key = jax.random.PRNGKey(11)
    pose, rgb, depth, coords = sc.frame(key)
    # a clean render of the same pose for comparison
    rgb0, depth0, coords0 = sc.render(pose)
    dd = np.asarray(depth - depth0)
    assert 0.5 * sc.label_noise_mm < dd.std() < 2.0 * sc.label_noise_mm
    # coords consistent with the noisy depth along the same ray:
    # ||coords - coords0|| == |depth - depth0| * ||ray||, ray_z=-1 ⇒ ≥ |dd|
    dist = np.linalg.norm(np.asarray(coords - coords0), axis=-1)
    ray_norm = dist / np.maximum(np.abs(dd), 1e-9)
    assert np.all(ray_norm > 0.99) and np.all(ray_norm < 2.5)
    # rgb noise present and bounded
    dr = np.asarray(rgb - rgb0)
    assert 0.3 * sc.noise_std < dr.std() < 2.0 * sc.noise_std
    assert float(jnp.max(rgb)) <= 255.0 and float(jnp.min(rgb)) >= 0.0


def test_clutter_occludes_and_decoys():
    sc = small("clutter", n_occluders=8)
    hit_any = False
    for s in range(6):
        key = jax.random.PRNGKey(100 + s)
        pose, rgb, depth, coords = sc.frame(key)
        rgb0, depth0, coords0 = sc.render(pose)
        d, d0 = np.asarray(depth), np.asarray(depth0)
        occ = d < d0 - 1.0
        assert np.all(d <= d0 + 1e-3)  # occluders only ever come CLOSER
        if 0.01 < occ.mean() < 0.9:
            hit_any = True
            # occluded pixels: GT coords follow the OCCLUDER surface
            # (depth-consistent), but the texture there is a decoy — it
            # does NOT match the room texture at those coordinates
            tex_at_coords = np.asarray(sc.texture(coords))
            mismatch = np.abs(np.asarray(rgb) - tex_at_coords).mean(-1)
            assert mismatch[occ].mean() > 5.0 * mismatch[~occ].mean()
    assert hit_any, "no frame had >1% occluded pixels"


def test_source_and_cache_integration(tmp_path, monkeypatch):
    """SyntheticSource renders archetype frames with per-frame effects."""
    monkeypatch.setenv("DSAC_TPU_FRAME_CACHE", str(tmp_path / "fc"))
    from dsac_tpu.cli.common import SyntheticSource
    src = SyntheticSource(2, seed=5, scene=small("clutter"))
    f0, f1 = src.get(0), src.get(1)
    assert f0.rgb.shape == (60, 80, 3)
    assert not np.array_equal(f0.rgb, f1.rgb)
    # cache round-trip is exact
    src2 = SyntheticSource(2, seed=5, scene=small("clutter"))
    np.testing.assert_array_equal(src2.get(0).rgb, f0.rgb)
    # distinct archetypes get distinct cache keys
    src3 = SyntheticSource(2, seed=5, scene=small("noisy"))
    assert not np.array_equal(src3.get(0).rgb, f0.rgb)
