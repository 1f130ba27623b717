"""Static cube-sphere heightfield models (BASELINE configs 1, 2, 5).

Unlike the quadtree engine (engine.planet), these evaluate a whole
fixed-resolution heightfield in one jitted program: per-texel sphere
position -> multi-octave noise height -> central-difference normal ->
Lambert shade. This is the throughput-oriented "model family": flat patch
(config 1), full 6-face cube-sphere (config 2), and the row-sharded
multi-chip variant with halo exchange (parallel.sharded, config 5).

Reference anchors: terrain chain main.cpp:823-832, normal generation
main.cpp:338-346, shade main.cpp:369-381.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from planet_tpu.nums import df as dfm
from planet_tpu.ops import perlin
from planet_tpu.ops.kernels import perlin_pallas
from planet_tpu.raster import shade as shade_mod

_F32 = jnp.float32


class FieldOutput(NamedTuple):
    heights: jnp.ndarray   # (..., H, W)
    normal: jnp.ndarray    # (..., H, W, 3) tangent-space normal
    shade: jnp.ndarray     # (..., H, W)


def heights_df(px, py, pz, *, kind="ridged", octaves=6, lacunarity=2.0,
               gain=0.55, coord_scale=0.00001, amplitude=8848.0,
               use_pallas=True, interpret=None):
    """Noise heights at double-float world positions (any shape)."""
    scale = dfm.from_f64(np.float64(coord_scale))
    px = dfm.mul(px, scale)
    py = dfm.mul(py, scale)
    pz = dfm.mul(pz, scale)
    if use_pallas:
        h = perlin_pallas.noise_df(
            kind, px.hi, px.lo, py.hi, py.lo, pz.hi, pz.lo,
            lacunarity=lacunarity, gain=np.float32(gain), octaves=octaves,
            interpret=interpret)
    else:
        fn = perlin.fbm_df if kind == "fbm" else perlin.ridged_df
        h = fn(px, py, pz, lacunarity=lacunarity, gain=np.float32(gain),
               octaves=octaves)
    return h * np.float32(amplitude)


def normals_from_heights(h_pad: jnp.ndarray, xyscale) -> jnp.ndarray:
    """Central-difference tangent-space normals (reference compute_normal,
    main.cpp:338-346): h_pad is the height grid with a 1-texel halo ring
    (overscanned or exchanged); output is for the interior (H, W) region.

    xyscale: world-space texel spacing (scalar or broadcastable)."""
    x0 = h_pad[..., 1:-1, :-2]
    x1 = h_pad[..., 1:-1, 2:]
    y0 = h_pad[..., :-2, 1:-1]
    y1 = h_pad[..., 2:, 1:-1]
    n = jnp.stack([x0 - x1,
                   jnp.broadcast_to(jnp.asarray(2.0 * xyscale, _F32), x0.shape),
                   y0 - y1], axis=-1)
    return n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True))


def frame_cube(n: int, radius: float, *, kind="ridged", octaves=6,
               lacunarity=2.0, gain=0.55, coord_scale=0.00001,
               amplitude=8848.0, use_pallas=True, interpret=None,
               block_rows=None):
    """The full-cube frame step (BASELINE config 2): heights + Lambert shade
    for all six n x n faces, (6, n, n) each.

    use_pallas=True runs the one-kernel fused path
    (ops.kernels.field_pallas: in-kernel iota coordinates, noise, halo
    recompute, normals, shade — nothing but the two outputs touches HBM).
    use_pallas=False composes the same frame from the XLA pieces
    (face_grid_points_df -> heights_df -> edge-padded central-difference
    normals -> lambert), the spec the fused kernel is tested against."""
    from planet_tpu.ops.kernels import field_pallas

    xyscale = (np.pi / 2) * float(radius) / n
    if use_pallas:
        kw = {} if block_rows is None else {"block_rows": block_rows}
        return field_pallas.field_cube(
            n, radius, kind=kind, octaves=octaves, lacunarity=lacunarity,
            gain=gain, coord_scale=coord_scale, amplitude=amplitude,
            xyscale=xyscale, interpret=interpret, **kw)
    from planet_tpu.parallel import facemesh

    px, py, pz = facemesh.face_grid_points_df(n, radius)
    h = heights_df(px, py, pz, kind=kind, octaves=octaves,
                   lacunarity=lacunarity, gain=gain,
                   coord_scale=coord_scale, amplitude=amplitude,
                   use_pallas=False)
    h_rows = jnp.concatenate([h[:, :1], h, h[:, -1:]], axis=1)
    h_pad = jnp.concatenate([h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]],
                            axis=2)
    normal = normals_from_heights(h_pad, xyscale)
    return h, shade_mod.lambert(normal)


def field_from_padded_points(px, py, pz, xyscale, **noise_kw) -> FieldOutput:
    """Points include a 1-texel halo ring; heights are computed for the full
    padded grid locally (the reference's overscan strategy) and outputs
    cover the interior."""
    h_pad = heights_df(px, py, pz, **noise_kw)
    normal = normals_from_heights(h_pad, xyscale)
    return FieldOutput(heights=h_pad[..., 1:-1, 1:-1], normal=normal,
                       shade=shade_mod.lambert(normal))


def flat_patch_points(n: int, extent: float = 256.0, z: float = 0.0,
                      overscan: int = 1):
    """Config 1: an n x n flat patch in the z-plane, texel centers, with
    halo ring. Returns DF point components of shape (n+2o, n+2o)."""
    o = int(overscan)
    idx = (np.arange(-o, n + o, dtype=np.float64) + 0.5) / n * extent
    u, v = np.meshgrid(idx, idx, indexing="xy")
    px = dfm.from_f64(u)
    py = dfm.from_f64(np.full_like(u, z))
    pz = dfm.from_f64(v)
    return px, py, pz, float(extent / n)
