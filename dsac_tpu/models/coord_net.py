"""Scene-coordinate regression CNNs.

Two interchangeable architectures:

* :class:`PatchCoordNet` — parity with the reference's patch net
  (core/lua/train_obj.lua:49-102): 42x42x3 mean-127-normalised patch ->
  10 convs (64..512, stride-2 downsampling to 2x2) -> FC 2048-4096-4096-3,
  predicting one scene coordinate (metres) per patch.

* :class:`DenseCoordNet` — the TPU-first flagship: a fully-convolutional
  stride-8 backbone over the whole image predicting a coordinate map in
  one pass.  The reference evaluates the patch net on 1600 overlapping
  patches per frame (core/cnn.h:276-336) — ~25x redundant conv compute;
  the dense net shares it, which is where most of the single-chip speedup
  comes from.  Predictions at the stratified sample points are gathered
  bilinearly from the stride-8 map.

Both run in bfloat16 on the MXU (params stay f32); outputs are metres,
converted to mm by the pipeline exactly like the reference's x1000
(core/cnn.h:330).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# The CNNs opt back into fast bf16-friendly MXU passes (the package
# globally defaults matmuls to f32-accurate for the geometry kernels).
_PREC = jax.lax.Precision.DEFAULT


class PatchCoordNet(nn.Module):
    """VGG-style patch net, reference-parity (core/lua/train_obj.lua:49-102).

    width_mult/dense_mult scale channel/FC widths (1.0 = reference sizes:
    convs 64..512, FCs 4096); tests use small multipliers.
    """

    dtype: Any = jnp.bfloat16
    width_mult: float = 1.0
    dense_mult: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 42, 42, 3) raw RGB in [0, 255] -> (B, 3) coords (metres)."""
        x = (x - 127.0) / 1.0  # mean-127 normalisation (train_obj.lua:23)
        x = x.astype(self.dtype)
        w = lambda f: max(8, int(f * self.width_mult))
        fc = max(16, int(4096 * self.dense_mult))
        conv = lambda f, s, p: nn.Conv(w(f), (3, 3), strides=(s, s),
                                       padding=p, dtype=self.dtype,
                                       precision=_PREC)
        x = nn.relu(conv(64, 1, "VALID")(x))   # 42 -> 40
        x = nn.relu(conv(64, 2, [(1, 1), (1, 1)])(x))   # -> 20
        x = nn.relu(conv(128, 1, [(1, 1), (1, 1)])(x))
        x = nn.relu(conv(128, 2, [(1, 1), (1, 1)])(x))  # -> 10
        x = nn.relu(conv(256, 1, [(1, 1), (1, 1)])(x))
        x = nn.relu(conv(256, 1, [(1, 1), (1, 1)])(x))
        x = nn.relu(conv(256, 2, [(1, 1), (1, 1)])(x))  # -> 5
        x = nn.relu(conv(512, 1, [(1, 1), (1, 1)])(x))
        x = nn.relu(conv(512, 1, [(1, 1), (1, 1)])(x))
        x = nn.relu(conv(512, 2, "VALID")(x))  # -> 2
        x = x.reshape(x.shape[0], -1)  # (B, 2*2*512*mult)
        x = nn.relu(nn.Dense(fc, dtype=self.dtype, precision=_PREC)(x))
        x = nn.relu(nn.Dense(fc, dtype=self.dtype, precision=_PREC)(x))
        x = nn.Dense(3, dtype=jnp.float32, precision=_PREC)(x)
        return x.astype(jnp.float32)


class DenseCoordNet(nn.Module):
    """Fully-convolutional stride-8 coordinate regressor (TPU flagship).

    Receptive field ~50 px (comparable to the reference's 42 px patches);
    output: (H/8, W/8, 3) scene coordinates in metres.
    """

    dtype: Any = jnp.bfloat16
    width: int = 64
    s2d: bool = False
    context: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, H, W, 3) raw RGB in [0, 255] -> (B, H/8, W/8, 3) metres.

        s2d=True replaces the full-resolution stem with a space-to-depth
        2x rearrangement: the first conv then sees 12 input channels at
        half resolution instead of 3 at full — the 3-channel conv is the
        classic MXU-utilisation sink (C_in pads to the 128-wide
        contraction).  Same downsampling factor and receptive-field
        class, ~18% faster end-to-end on v5e; weights are NOT
        interchangeable with the s2d=False stem.
        """
        x = (x - 127.0) / 1.0
        x = x.astype(self.dtype)
        c = self.width
        conv = lambda f, k, s: nn.Conv(f, (k, k), strides=(s, s),
                                       padding="SAME", dtype=self.dtype,
                                       precision=_PREC)
        if self.s2d:
            B, H, W, C = x.shape
            x = x.reshape(B, H // 2, 2, W // 2, 2, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2,
                                                      4 * C)
            x = nn.relu(conv(c, 3, 1)(x))        # at /2 (stem folded)
        else:
            x = nn.relu(conv(c, 3, 1)(x))
            x = nn.relu(conv(c, 3, 2)(x))        # /2
        x = nn.relu(conv(c * 2, 3, 1)(x))
        x = nn.relu(conv(c * 2, 3, 2)(x))    # /4
        x = nn.relu(conv(c * 4, 3, 1)(x))
        x = nn.relu(conv(c * 4, 3, 2)(x))    # /8
        x = nn.relu(conv(c * 8, 3, 1)(x))
        if self.context:
            # Long-range context (arch "dense_ctx"): residual dilated
            # 3x3 stack at /8 grows the receptive field ~50 -> ~530 px
            # full-res.  Motivation: the `repeat` archetype's texture
            # period projects to ~105 px at working depth — a 50 px RF
            # regresses coordinates only mod the period (held-out L1
            # 0.34 m = the period error, BASELINE.md).  Disambiguation
            # needs landmarks several periods away in view.  Not
            # supported by the banded mesh FCN path (halo margin
            # assumes the 50 px RF class).
            for d in (2, 4, 8, 16):
                y = nn.Conv(c * 8, (3, 3), kernel_dilation=(d, d),
                            padding="SAME", dtype=self.dtype,
                            precision=_PREC)(x)
                x = x + nn.relu(y)
        x = nn.relu(conv(c * 8, 1, 1)(x))
        x = nn.relu(conv(c * 8, 1, 1)(x))
        x = nn.Conv(3, (1, 1), dtype=jnp.float32, precision=_PREC)(x)
        return x.astype(jnp.float32)


def extract_patches(image: jnp.ndarray, centers: jnp.ndarray,
                    patch_size: int) -> jnp.ndarray:
    """Gather square patches around integer pixel centers.

    image: (H, W, 3); centers: (N, 2) as (x, y).  Returns (N, P, P, 3).
    Replaces the per-pixel copy loops of getCoordImg (core/cnn.h:288-319);
    centers are assumed in-bounds (the stratified sampler respects the
    patch border, like the reference's stride offsets, core/cnn.h:353-361).
    """
    half = patch_size // 2

    def one(c):
        x0 = jnp.clip(c[0] - half, 0, image.shape[1] - patch_size)
        y0 = jnp.clip(c[1] - half, 0, image.shape[0] - patch_size)
        return jax.lax.dynamic_slice(
            image, (y0, x0, 0), (patch_size, patch_size, image.shape[2]))

    return jax.vmap(one)(centers)


def gather_dense_coords(coord_map: jnp.ndarray, pix: jnp.ndarray,
                        stride: int = 8) -> jnp.ndarray:
    """Bilinear lookup of a stride-s coordinate map at pixel locations.

    coord_map: (H/s, W/s, 3) metres; pix: (N, 2) full-res (x, y) pixels.
    """
    gh, gw = coord_map.shape[:2]
    # centre of output cell (i, j) corresponds to pixel (j + 0.5) * s etc.
    fx = jnp.clip(pix[:, 0].astype(jnp.float32) / stride - 0.5, 0, gw - 1)
    fy = jnp.clip(pix[:, 1].astype(jnp.float32) / stride - 0.5, 0, gh - 1)
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, gw - 1)
    y1 = jnp.minimum(y0 + 1, gh - 1)
    wx = (fx - x0)[:, None]
    wy = (fy - y0)[:, None]
    c00 = coord_map[y0, x0]
    c01 = coord_map[y0, x1]
    c10 = coord_map[y1, x0]
    c11 = coord_map[y1, x1]
    return ((1 - wy) * ((1 - wx) * c00 + wx * c01)
            + wy * ((1 - wx) * c10 + wx * c11))
