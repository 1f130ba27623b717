"""Fragment shading (reference fragment shader, main.cpp:369-381).

A single directional light l = normalize(0, 1, -1); intensity
0.001 + max(0, dot(n, l)); grayscale color sqrt(intensity) (gamma). Pure
jnp — runs per-vertex for Gouraud-style outputs or per-pixel after
rasterization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_LIGHT = np.array([0.0, 1.0, -1.0], np.float32)
_LIGHT = _LIGHT / np.sqrt((_LIGHT * _LIGHT).sum())


def lambert(normal: jnp.ndarray) -> jnp.ndarray:
    """normal: (..., 3), assumed normalized. Returns (...,) grayscale."""
    n = normal / jnp.sqrt(jnp.sum(normal * normal, axis=-1, keepdims=True))
    light = np.float32(0.001) + jnp.maximum(
        0.0, jnp.sum(n * jnp.asarray(_LIGHT), axis=-1))
    return jnp.sqrt(light)
