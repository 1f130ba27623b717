"""Terrain height generators (the reference's heightmap functors).

``RidgedTerrain`` is the production generator (reference main.cpp:823-833):

    octaves = 6 + 12 * depth / max_depth     (C integer division)
    p *= 0.00001
    height = PerlinRidged(p, lacunarity=2.0, gain=0.55f, octaves) * 8848.0f

``ConstantZeroTerrain`` is the smooth-sphere test generator
(main.cpp:836-841). Both expose an f64 spec path and a double-float TPU path.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from planet_tpu.nums import df as dfm
from planet_tpu.ops import perlin

_F32 = jnp.float32


def octave_count(depth: int, max_depth: int) -> int:
    """6 + 12*depth/max_depth with C integer division (main.cpp:827)."""
    return 6 + (12 * int(depth)) // int(max_depth)


@dataclasses.dataclass(frozen=True)
class RidgedTerrain:
    lacunarity: float = 2.0
    gain: float = float(np.float32(0.55))
    coord_scale: float = 0.00001
    amplitude: float = 8848.0

    def height_f64(self, p, depth: int, max_depth: int):
        """p: (..., 3) float64 world position. Returns f32 heights."""
        p = jnp.asarray(p, jnp.float64) * np.float64(self.coord_scale)
        octaves = octave_count(depth, max_depth)
        h = perlin.ridged_f64(
            p[..., 0], p[..., 1], p[..., 2],
            lacunarity=self.lacunarity, gain=np.float32(self.gain),
            octaves=octaves)
        return h * np.float32(self.amplitude)

    def height_df(self, px: dfm.DF, py: dfm.DF, pz: dfm.DF,
                  depth: int, max_depth: int):
        scale = dfm.from_f64(np.float64(self.coord_scale))
        px = dfm.mul(px, scale)
        py = dfm.mul(py, scale)
        pz = dfm.mul(pz, scale)
        octaves = octave_count(depth, max_depth)
        h = perlin.ridged_df(px, py, pz, lacunarity=self.lacunarity,
                             gain=np.float32(self.gain), octaves=octaves)
        return h * np.float32(self.amplitude)


@dataclasses.dataclass(frozen=True)
class ConstantZeroTerrain:
    def height_f64(self, p, depth: int, max_depth: int):
        p = jnp.asarray(p)
        return jnp.zeros(p.shape[:-1], _F32)

    def height_df(self, px, py, pz, depth: int, max_depth: int):
        return jnp.zeros(jnp.shape(px.hi), _F32)
