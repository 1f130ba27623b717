"""Heightmap tile rasterization (reference GenerateHeightMap, main.cpp:123-151).

A tile is a dim x dim grid of heights over a quad, sampled by planar bilinear
interpolation of the quad's 4 corners (points are NOT re-projected onto the
sphere) with a 1-texel overscan border: u = (x-1)/(dim-3), so x in
{0, dim-1} land outside [0,1]. The border exists so tile-edge normals can be
computed without neighbor tiles — the reference's locally-generated halo
(SURVEY.md section 5).

The f64 path is the spec; the double-float path is what runs on TPU. Both
share the corner layout: corners[0], corners[1] span the u axis, corners[2],
corners[3] the second row, interpolated as

    a = p0 + (p1 - p0) * u
    b = p2 + (p3 - p2) * u
    p = a + (b - a) * v
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from planet_tpu.nums import df as dfm

_F32 = jnp.float32


def tile_uv(dim: int):
    """The overscan sampling coordinates (x-1)/(dim-3) for one axis, f64."""
    return (np.arange(dim, dtype=np.float64) - 1.0) * (1.0 / (dim - 3))


def tile_points_f64(corners, dim: int):
    """corners: (4, 3) f64 quad corners -> (dim, dim, 3) f64 sample points."""
    corners = jnp.asarray(corners, jnp.float64)
    div = np.float64(1.0) / np.float64(dim - 3)
    x = jnp.arange(dim, dtype=jnp.float64)
    u = (x - 1.0) * div           # (dim,)
    v = u                          # same axis formula
    p0, p1, p2, p3 = corners[0], corners[1], corners[2], corners[3]
    v0 = p1 - p0
    v1 = p3 - p2
    a = p0[None, :] + v0[None, :] * u[:, None]        # (dim, 3) along x
    b = p2[None, :] + v1[None, :] * u[:, None]
    v2 = b - a
    # rows: index [y, x]
    p = a[None, :, :] + v2[None, :, :] * v[:, None, None]
    return p


def tile_points_df(corners_hi, corners_lo, dim: int):
    """Double-float tile sample points.

    corners_hi/lo: (4, 3) f32 pairs (exact split of the f64 corners).
    Returns three DF arrays of shape (dim, dim) — x, y, z components.
    """
    c = dfm.DF(jnp.asarray(corners_hi, _F32), jnp.asarray(corners_lo, _F32))
    div = dfm.from_f64(np.float64(1.0) / np.float64(dim - 3))
    xs = jnp.arange(dim, dtype=_F32) - np.float32(1.0)   # exact small ints
    u = dfm.mul(dfm.DF(xs, jnp.zeros_like(xs)), div)      # (dim,) DF

    out = []
    for k in range(3):
        p0 = dfm.DF(c.hi[0, k], c.lo[0, k])
        p1 = dfm.DF(c.hi[1, k], c.lo[1, k])
        p2 = dfm.DF(c.hi[2, k], c.lo[2, k])
        p3 = dfm.DF(c.hi[3, k], c.lo[3, k])
        v0 = dfm.sub(p1, p0)
        v1 = dfm.sub(p3, p2)
        # broadcast corner scalars over the (dim,) u vector
        a = dfm.add(_bcast(p0, u.shape), dfm.mul(_bcast(v0, u.shape), u))
        b = dfm.add(_bcast(p2, u.shape), dfm.mul(_bcast(v1, u.shape), u))
        v2 = dfm.sub(b, a)                                # (dim,) along x
        a2 = dfm.DF(a.hi[None, :], a.lo[None, :])
        v22 = dfm.DF(v2.hi[None, :], v2.lo[None, :])
        vv = dfm.DF(u.hi[:, None], u.lo[:, None])         # v down rows
        p = dfm.add(a2, dfm.mul(v22, vv))                 # (dim, dim) [y, x]
        out.append(p)
    return out[0], out[1], out[2]


def _bcast(x: dfm.DF, shape):
    return dfm.DF(jnp.broadcast_to(x.hi, shape), jnp.broadcast_to(x.lo, shape))


def generate_tile_f64(corners, dim: int, terrain, depth: int, max_depth: int):
    """Spec path: one (dim, dim) f32 tile from f64 corners."""
    p = tile_points_f64(corners, dim)
    return terrain.height_f64(p, depth, max_depth)


def generate_tile_df(corners_hi, corners_lo, dim: int, terrain,
                     depth: int, max_depth: int):
    """TPU path: one (dim, dim) f32 tile from double-float corners."""
    px, py, pz = tile_points_df(corners_hi, corners_lo, dim)
    return terrain.height_df(px, py, pz, depth, max_depth)


def generate_tiles_df(corners_hi, corners_lo, dim: int, terrain,
                      depth: int, max_depth: int):
    """Batched tiles at a shared depth: corners (N, 4, 3) -> (N, dim, dim)."""
    fn = lambda ch, cl: generate_tile_df(ch, cl, dim, terrain, depth, max_depth)
    return jax.vmap(fn)(jnp.asarray(corners_hi, _F32), jnp.asarray(corners_lo, _F32))
