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
    """A reproducible procedural room."""

    seed: int = 1305
    width: int = 640
    height: int = 480
    focal: float = 525.0
    room_mm: tuple[float, float, float] = (4000.0, 3000.0, 4000.0)
    n_waves: int = 12

    @property
    def camera(self) -> Camera:
        return Camera.make(self.focal, self.width, self.height)

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

    def texture(self, points_mm: jnp.ndarray) -> jnp.ndarray:
        """Scene points (..., 3) -> RGB in [0, 255] (..., 3)."""
        freqs, dirs, phases = self._texture_params()
        # per-wave scalar field d_m . p, then per-channel sinusoids
        proj = jnp.einsum("...i,mi->...m", points_mm, dirs)  # (..., M)
        arg = (proj[..., :, None] * freqs[..., 0][:, None]
               + phases)  # (..., M, 3)
        mix = jnp.mean(jnp.sin(arg), axis=-2)  # (..., 3) in [-1, 1]
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

    def render(self, pose: Pose) -> tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
        """Render (rgb, depth_mm, coords_mm) for a scene->eye pose.

        rgb: (H, W, 3) float32 in [0, 255]; depth: (H, W) mm;
        coords: (H, W, 3) ground-truth scene coordinates, mm (the analogue
        of Dataset::getObj, core/dataset.h:226-255).
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

        points = origin + t[..., None] * d_scene  # (H, W, 3) scene coords
        # depth is range along -z_eye; with d_eye_z = -1, that's exactly t
        depth = t

        rgb = self.texture(points)
        return rgb, depth, points

    def frame(self, key: jax.Array):
        """Convenience: (pose, rgb, depth, coords) for a random pose.

        Jitted per scene instance — eager rendering dispatches hundreds of
        small ops, which is pathological over a remote-TPU tunnel.
        """
        fn = _jitted_frame_cache.get(self)
        if fn is None:
            def _frame(key):
                pose = self.random_pose(key)
                rgb, depth, coords = self.render(pose)
                return pose, rgb, depth, coords

            fn = jax.jit(_frame)
            _jitted_frame_cache[self] = fn
        return fn(key)


# keyed by the frozen-dataclass scene (hashable); grows only with distinct
# scene geometries
_jitted_frame_cache: dict = {}
