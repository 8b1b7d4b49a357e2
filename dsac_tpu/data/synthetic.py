"""Procedural indoor scene with exact ground truth.

No counterpart in the reference (which ships only the 7-Scenes linking
scripts); this generator fills the same role the real dataset does for
the pipeline — RGB frames whose appearance is a deterministic, learnable
function of the underlying scene coordinate, plus exact depth and pose —
so the full train/eval stack runs hermetically (tests, benchmarks, CI).

Geometry: the camera stands inside an axis-aligned box "room"; every pixel
ray is intersected with the walls in closed form (no meshes, fully
vectorised, jit-able).  Texture: a few fixed random sinusoid mixtures of
the 3D surface point — smooth, locally discriminative, and invertible
enough for a scene-coordinate CNN to learn.

Conventions match the rest of the framework: the internal frame of the
reference (y up, z = -depth, mm; core/dataset.cpp:37-56), poses map
scene -> eye.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dsac_tpu.config import Camera
from dsac_tpu.geometry.pose import Pose, invert
from dsac_tpu.geometry.rotation import so3_exp


@dataclasses.dataclass(frozen=True)
class SyntheticScene:
    """A reproducible procedural room.

    The archetype knobs (all off by default — the default scene renders
    bit-identically to rounds 1-3) attack the pipeline the way the hard
    7-Scenes sequences do:

    - ``texture_period_mm`` — the dominant texture component repeats with
      this period (*stairs*: repeated structure << room size, so local
      appearance determines the coordinate only up to integer period
      shifts → multimodal hypothesis pools).  A weak long-wavelength
      unique component (weight ``1 - texture_repeat_weight``) preserves
      the global cues real repeated structure still has.
    - ``texture_sparsity`` — approximately this fraction of the surface
      is flattened to featureless gray (texture-poor walls).
    - ``noise_std`` / ``label_noise_mm`` — per-frame RGB sensor noise and
      Kinect-like GT coordinate label noise (the reference's GT coords
      come from noisy depth, core/dataset.h:226-255).
    - ``n_occluders`` — per-frame floating distractor boxes whose texture
      is the ROOM texture evaluated at a decoy anchor: locally they look
      like a valid view of some *other* part of the scene, so a
      scene-coordinate net predicts coherent-but-wrong coordinates there
      (the analogue of dynamic clutter in real captures).
    """

    seed: int = 1305
    width: int = 640
    height: int = 480
    focal: float = 525.0
    room_mm: tuple[float, float, float] = (4000.0, 3000.0, 4000.0)
    n_waves: int = 12
    # hard-benchmark archetype knobs (defaults = the original room)
    texture_period_mm: float = 0.0
    texture_repeat_weight: float = 0.92
    texture_sparsity: float = 0.0
    noise_std: float = 0.0
    label_noise_mm: float = 0.0
    n_occluders: int = 0
    occluder_half_mm: tuple[float, float] = (150.0, 450.0)

    @property
    def camera(self) -> Camera:
        return Camera.make(self.focal, self.width, self.height)

    @property
    def _needs_frame_key(self) -> bool:
        return (self.noise_std > 0 or self.label_noise_mm > 0
                or self.n_occluders > 0)

    def _texture_params(self):
        k = jax.random.PRNGKey(self.seed)
        k1, k2, k3 = jax.random.split(k, 3)
        # wavelengths 150..1200 mm: coarse structure + fine detail
        freqs = 2.0 * jnp.pi / jax.random.uniform(
            k1, (self.n_waves, 3), minval=150.0, maxval=1200.0)
        dirs = jax.random.normal(k2, (self.n_waves, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        phases = jax.random.uniform(k3, (self.n_waves, 3), maxval=2 * jnp.pi)
        return freqs, dirs, phases

    def _wave_params(self, seed_offset: int, n: int, wl_min: float,
                     wl_max: float):
        """An independent sinusoid-mixture parameter set."""
        k = jax.random.PRNGKey(self.seed + seed_offset)
        k1, k2, k3 = jax.random.split(k, 3)
        freqs = 2.0 * jnp.pi / jax.random.uniform(
            k1, (n, 3), minval=wl_min, maxval=wl_max)
        dirs = jax.random.normal(k2, (n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        phases = jax.random.uniform(k3, (n, 3), maxval=2 * jnp.pi)
        return freqs, dirs, phases

    @staticmethod
    def _mix(points_mm, params) -> jnp.ndarray:
        """Sinusoid mixture (..., 3) in [-1, 1] (the round-1 texture core)."""
        freqs, dirs, phases = params
        proj = jnp.einsum("...i,mi->...m", points_mm, dirs)  # (..., M)
        arg = (proj[..., :, None] * freqs[..., 0][:, None]
               + phases)  # (..., M, 3)
        return jnp.mean(jnp.sin(arg), axis=-2)  # (..., 3)

    def texture(self, points_mm: jnp.ndarray) -> jnp.ndarray:
        """Scene points (..., 3) -> RGB in [0, 255] (..., 3)."""
        if self.texture_period_mm > 0:
            # repeated structure: the fine texture sees only p mod L;
            # a weak long-wavelength component keeps faint global cues
            L = self.texture_period_mm
            wrapped = points_mm - L * jnp.floor(points_mm / L)
            rep = self._mix(wrapped, self._texture_params())
            coarse = self._mix(points_mm,
                               self._wave_params(7, 4, 2500.0, 8000.0))
            w = self.texture_repeat_weight
            mix = w * rep + (1.0 - w) * coarse
        else:
            mix = self._mix(points_mm, self._texture_params())
        if self.texture_sparsity > 0:
            # flatten ~sparsity of the surface to featureless gray: a
            # smooth low-frequency field thresholded at its ~sparsity
            # quantile (the field is ≈ N(0, sigma^2), sigma = sqrt(1/(2M))
            # per channel for M averaged unit sinusoids; 3-channel mean
            # shrinks it by sqrt(3))
            from statistics import NormalDist
            n_mask = 4
            field = jnp.mean(self._mix(
                points_mm, self._wave_params(13, n_mask, 500.0, 1800.0)),
                axis=-1)
            sigma = (1.0 / (2.0 * n_mask)) ** 0.5 / (3.0 ** 0.5)
            thresh = NormalDist().inv_cdf(min(self.texture_sparsity,
                                              0.999)) * sigma
            keep = jax.nn.sigmoid((field - thresh) / 0.02)
            mix = mix * keep[..., None]
        return (mix * 0.5 + 0.5) * 255.0

    def random_pose(self, key: jax.Array) -> Pose:
        """A random camera pose standing inside the room, looking inward.

        Returns the scene->eye pose (mm), like Hypothesis(info).
        """
        kp, ky, kt, kr = jax.random.split(key, 4)
        w, h, d = self.room_mm
        margin = 0.25
        pos = jax.random.uniform(kp, (3,),
                                 minval=jnp.asarray([w * margin, h * 0.3,
                                                     d * margin]),
                                 maxval=jnp.asarray([w * (1 - margin),
                                                     h * 0.7,
                                                     d * (1 - margin)]))
        yaw = jax.random.uniform(ky, (), minval=0.0, maxval=2 * jnp.pi)
        pitch = jax.random.uniform(kt, (), minval=-0.35, maxval=0.35)
        roll = jax.random.uniform(kr, (), minval=-0.2, maxval=0.2)
        # camera-to-scene rotation: yaw about y (up), then pitch, then roll
        Rc = (so3_exp(jnp.asarray([0.0, 1.0, 0.0]) * yaw)
              @ so3_exp(jnp.asarray([1.0, 0.0, 0.0]) * pitch)
              @ so3_exp(jnp.asarray([0.0, 0.0, 1.0]) * roll))
        cam_pose = Pose(Rc, pos)  # eye -> scene (camera pose)
        return invert(cam_pose)  # scene -> eye

    def render(self, pose: Pose, key: jax.Array | None = None
               ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Render (rgb, depth_mm, coords_mm) for a scene->eye pose.

        rgb: (H, W, 3) float32 in [0, 255]; depth: (H, W) mm;
        coords: (H, W, 3) ground-truth scene coordinates, mm (the analogue
        of Dataset::getObj, core/dataset.h:226-255).

        ``key`` drives the per-frame effects (noise, occluders); when it
        is None those knobs are skipped and the render is deterministic in
        the pose alone.  Kinect fidelity of the noise model: RGB is sharp,
        DEPTH is noisy, and the GT coords are derived from the noisy depth
        (points re-projected along the ray at the perturbed range), exactly
        how the reference builds getObj from the depth map
        (core/dataset.h:226-255).
        """
        cam = self.camera
        inv = invert(pose)  # eye -> scene
        origin = inv.t  # camera centre in scene frame

        u = jnp.arange(self.width, dtype=jnp.float32) + 0.5
        v = jnp.arange(self.height, dtype=jnp.float32) + 0.5
        uu, vv = jnp.meshgrid(u, v)  # (H, W)
        # bearing in eye frame (see geometry/p3p.py:pixel_bearings)
        bx = (uu - cam.cx) / cam.focal
        by = -(vv - cam.cy) / cam.focal
        bz = -jnp.ones_like(bx)
        d_eye = jnp.stack([bx, by, bz], axis=-1)  # (H, W, 3)
        d_scene = jnp.einsum("ij,hwj->hwi", inv.R, d_eye)

        # first-exit intersection with the box [0,w]x[0,h]x[0,d]
        bounds = jnp.asarray(self.room_mm)
        d_safe = jnp.where(jnp.abs(d_scene) < 1e-9, 1e-9, d_scene)
        t_hi = (bounds - origin) / d_safe
        t_lo = (0.0 - origin) / d_safe
        t_axis = jnp.where(d_scene > 0, t_hi, t_lo)  # (H, W, 3)
        t = jnp.min(t_axis, axis=-1)  # (H, W)

        k_occ = k_rgb = k_dep = None
        if key is not None and self._needs_frame_key:
            k_occ, k_rgb, k_dep = jax.random.split(key, 3)

        points = origin + t[..., None] * d_scene  # (H, W, 3) scene coords
        tex_points = points  # where the TEXTURE is sampled (decoys differ)

        if self.n_occluders > 0 and k_occ is not None:
            t, tex_points = self._apply_occluders(k_occ, origin, d_scene,
                                                  d_safe, t, bounds)
            points = origin + t[..., None] * d_scene

        rgb = self.texture(tex_points)
        if self.noise_std > 0 and k_rgb is not None:
            rgb = jnp.clip(rgb + self.noise_std
                           * jax.random.normal(k_rgb, rgb.shape),
                           0.0, 255.0)

        # depth is range along -z_eye; with d_eye_z = -1, that's exactly t
        depth = t
        if self.label_noise_mm > 0 and k_dep is not None:
            depth = t + self.label_noise_mm * jax.random.normal(k_dep,
                                                                t.shape)
            points = origin + depth[..., None] * d_scene

        return rgb, depth, points

    def _apply_occluders(self, key, origin, d_scene, d_safe, t_wall,
                         bounds):
        """Per-frame floating decoy boxes; returns (t, texture_points).

        Each occluder is an axis-aligned box at a random interior
        position; pixels that hit one take its (nearer) depth, and their
        texture is the room texture evaluated at a random decoy anchor
        plus the local offset — a coherent patch of "somewhere else".
        """
        kc, kh, ka = jax.random.split(key, 3)
        n = self.n_occluders
        lo, hi = self.occluder_half_mm
        centers = jax.random.uniform(kc, (n, 3), minval=bounds * 0.2,
                                     maxval=bounds * 0.8)
        halfs = jax.random.uniform(kh, (n, 3), minval=lo, maxval=hi)
        anchors = jax.random.uniform(ka, (n, 3), minval=bounds * 0.1,
                                     maxval=bounds * 0.9)

        # slab test, vectorised over occluders: (N, H, W, 3)
        inv_d = 1.0 / d_safe
        lo_c = (centers - halfs)[:, None, None, :]
        hi_c = (centers + halfs)[:, None, None, :]
        t1 = (lo_c - origin) * inv_d
        t2 = (hi_c - origin) * inv_d
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (N, H, W)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        # boxes spawned on top of the camera would occlude the whole
        # frame (unsolvable, not hard); disable those
        near = jnp.linalg.norm(centers - origin, axis=-1) < 800.0  # (N,)
        hit = (tmax > tmin) & (tmin > 1.0) & ~near[:, None, None]
        t_occ = jnp.where(hit, tmin, jnp.inf)
        nearest = jnp.argmin(t_occ, axis=0)  # (H, W)
        t_near = jnp.min(t_occ, axis=0)
        occluded = t_near < t_wall

        t = jnp.where(occluded, t_near, t_wall)
        points = origin + t[..., None] * d_scene
        decoy = (points - centers[nearest] + anchors[nearest])
        tex_points = jnp.where(occluded[..., None], decoy, points)
        return t, tex_points

    def frame(self, key: jax.Array):
        """Convenience: (pose, rgb, depth, coords) for a random pose.

        Jitted per scene instance — eager rendering dispatches hundreds of
        small ops, which is pathological over a remote-TPU tunnel.
        """
        fn = _jitted_frame_cache.get(self)
        if fn is None:
            def _frame(key):
                if self._needs_frame_key:
                    kpose, keff = jax.random.split(key)
                else:
                    # default scene: bit-identical to rounds 1-3 (and to
                    # every cached frame keyed by (seed, index))
                    kpose, keff = key, None
                pose = self.random_pose(kpose)
                rgb, depth, coords = self.render(pose, keff)
                return pose, rgb, depth, coords

            fn = jax.jit(_frame)
            _jitted_frame_cache[self] = fn
        return fn(key)


# ---------------------------------------------------------------------------
# Named benchmark archetypes.
#
# The default "room" benchmark saturated (every headline row 100%); these
# archetypes attack the pipeline the way the hard 7-Scenes sequences do
# (reference README.md: per-scene evaluation, with *stairs* the classic
# failure case).  Values were calibrated so the flagship is stressed but
# the scenes stay learnable (see BASELINE.md per-scene table).
# ---------------------------------------------------------------------------

ARCHETYPES: dict[str, dict] = {
    # the original benchmark room (rounds 1-3 headline numbers)
    "room": {},
    # *stairs*: repeated structure — fine texture repeats every 500 mm,
    # only a faint long-wavelength component disambiguates globally
    "repeat": dict(texture_period_mm=500.0, texture_repeat_weight=0.92),
    # texture-poor: ~70% of the surface flattened to featureless gray
    "bare": dict(texture_sparsity=0.7),
    # sensor degradation: RGB noise + Kinect-like depth/label noise
    "noisy": dict(noise_std=12.0, label_noise_mm=30.0),
    # dynamic clutter: decoy-textured floating boxes (coherent patches
    # of "somewhere else" + depth labels that fight the texture)
    "clutter": dict(n_occluders=5),
    # everything at once (stress configuration, not a headline scene)
    "hard": dict(texture_period_mm=500.0, texture_sparsity=0.4,
                 noise_std=8.0, label_noise_mm=20.0, n_occluders=3),
}


def make_scene(name: str = "room", **overrides) -> SyntheticScene:
    """Named benchmark archetype -> SyntheticScene (see ARCHETYPES)."""
    if name not in ARCHETYPES:
        raise ValueError(f"unknown scene archetype {name!r}; "
                         f"choose from {sorted(ARCHETYPES)}")
    return SyntheticScene(**{**ARCHETYPES[name], **overrides})


# keyed by the frozen-dataclass scene (hashable); grows only with distinct
# scene geometries
_jitted_frame_cache: dict = {}
