"""Hypothesis-score CNN.

Parity with the reference score net (core/lua/train_score.lua:46-100):
input is a 40x40x1 reprojection-error image (mean-45-normalised,
train_score.lua:24), 10 convs (32..512 channels, stride-2 down to 1x1),
FC 512-1024-1024-1 producing a scalar score per hypothesis.  The whole
hypothesis pool is one batch on the MXU — the reference marshals the maps
through Lua tables one element at a time (core/lua_calls.h:284-300).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_PREC = jax.lax.Precision.DEFAULT


class ScoreNet(nn.Module):
    dtype: Any = jnp.bfloat16
    width_mult: float = 1.0  # 1.0 = reference sizes (convs 32..512, FC 1024)

    @nn.compact
    def __call__(self, d: jnp.ndarray) -> jnp.ndarray:
        """d: (B, 40, 40) or (B, 40, 40, 1) diff maps -> (B,) scores."""
        if d.ndim == 3:
            d = d[..., None]
        x = (d - 45.0) / 1.0  # mean normalisation (train_score.lua:24)
        x = x.astype(self.dtype)
        w = lambda f: max(8, int(f * self.width_mult))
        conv = lambda f, s, p: nn.Conv(w(f), (3, 3), strides=(s, s),
                                       padding=p, dtype=self.dtype,
                                       precision=_PREC)
        pad1 = [(1, 1), (1, 1)]
        x = nn.relu(conv(32, 1, pad1)(x))    # 40
        x = nn.relu(conv(32, 2, pad1)(x))    # -> 20
        x = nn.relu(conv(64, 1, pad1)(x))
        x = nn.relu(conv(64, 2, pad1)(x))    # -> 10
        x = nn.relu(conv(128, 1, pad1)(x))
        x = nn.relu(conv(128, 2, pad1)(x))   # -> 5
        x = nn.relu(conv(256, 1, pad1)(x))
        x = nn.relu(conv(256, 2, "VALID")(x))  # -> 2
        x = nn.relu(conv(512, 1, pad1)(x))   # 2
        x = nn.relu(conv(512, 2, pad1)(x))   # -> 1
        x = x.reshape(x.shape[0], -1)  # (B, 512*mult)
        fc = max(16, int(1024 * self.width_mult))
        x = nn.relu(nn.Dense(fc, dtype=self.dtype, precision=_PREC)(x))
        x = nn.relu(nn.Dense(fc, dtype=self.dtype, precision=_PREC)(x))
        x = nn.Dense(1, dtype=jnp.float32, precision=_PREC)(x)
        return x[..., 0].astype(jnp.float32)
