"""Hypothesis selection: softmax distribution, entropy, and the draw.

Replaces softMax (core/cnn.h:598-618), entropy (core/cnn.h:84-92) and
draw (core/cnn.h:102-127).  The DSAC behaviour (randomDraw=1) samples the
winning hypothesis from the softmax; the RANSAC behaviour takes the
argmax.  jax.random.categorical replaces the cumulative-map draw.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_scores(scores: jnp.ndarray) -> jnp.ndarray:
    """Max-subtracted softmax over the hypothesis axis (last)."""
    return jax.nn.softmax(scores, axis=-1)


def shannon_entropy(probs: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy in bits (the reference uses log2, core/cnn.h:89)."""
    p = jnp.maximum(probs, 1e-12)
    return -jnp.sum(probs * jnp.log2(p), axis=-1)


def draw_hypothesis(key: jax.Array, scores: jnp.ndarray,
                    random_draw: bool) -> jnp.ndarray:
    """Winning hypothesis index: categorical sample (DSAC) or argmax (RANSAC).

    `random_draw` is static (config), matching the rdraw flag
    (core/properties.cpp:44, core/cnn.h:123-126).
    """
    if random_draw:
        return jax.random.categorical(key, scores, axis=-1)
    return jnp.argmax(scores, axis=-1)
