"""Batched patch tessellation — the TPU-native vertex program.

Replaces the reference's embedded GLSL vertex shader (main.cpp:286-367): for
every leaf quad, every patch grid vertex is
  1. interpolated along the sphere between the quad's 4 corner (p, n) pairs
     (great-circle slerp of normals + circular-arc positions, with a linear
     fallback when the corner normals are nearly parallel),
  2. displaced by a height sampled bilinearly from the quad's 32x32 tile
     (GL_LINEAR + CLAMP_TO_EDGE semantics, render.cpp:429-433), skirt
     vertices pulled down by skirt_size,
  3. given a normal from central differences of 4 height taps rotated by the
     local tangent frame (TBN),
  4. projected to clip space (camera-relative positions; the f64->f32
     narrowing already happened host-side, main.cpp:666-672).

Instead of 1020-vertex draw calls per quad, everything is one fused array
program over (Q, 32, 32) — Q quads, dense grid (see tess.mesh) — that XLA
fuses and tiles onto the VPU. All math is float32, matching the GPU shader.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planet_tpu.tess import mesh

_F32 = jnp.float32


class PatchVertices(NamedTuple):
    """Outputs of the vertex program, each (Q, G, G, ...)."""

    clip: jnp.ndarray      # (Q, G, G, 4) clip-space positions
    world: jnp.ndarray     # (Q, G, G, 3) camera-relative world positions
    normal: jnp.ndarray    # (Q, G, G, 3) shading normals (world space)
    height: jnp.ndarray    # (Q, G, G) sampled height (minus skirt drop)
    snormal: jnp.ndarray   # (Q, G, G, 3) interpolated sphere normal (culling)


def _norm(v, axis=-1, keepdims=True):
    return v / jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims))


def _lerp(a, b, t):
    return a + (b - a) * t


def interpolate(p0, n0, p1, n1, t):
    """Spherical interpolation of a (position, normal) pair along the great
    circle between two corners, with the reference's linear fallback when
    1 - dot(n0, n1) < 0.001 (main.cpp:310-332).

    p0/n0/p1/n1: (..., 3); t: (..., 1). Returns (p, n).
    """
    d = jnp.sum(n0 * n1, axis=-1, keepdims=True)

    # Linear fallback path.
    n_lin = _norm(_lerp(n0, n1, t))
    p_lin = _lerp(p0, p1, t)

    # Slerp path. Guard the degenerate inputs so the unselected lane stays
    # finite (jnp.where evaluates both branches).
    d_safe = jnp.clip(d, -1.0, 1.0 - 1e-6)
    theta2 = jnp.arccos(d_safe)
    k = 1.0 - t
    n_slerp = _norm(jnp.sin(k * theta2) * n0 + jnp.sin(t * theta2) * n1)
    theta = theta2 * 0.5
    gamma = theta - theta2 * t
    tan_theta = jnp.tan(theta)
    x = 1.0 - jnp.tan(gamma) / tan_theta
    y = 1.0 / jnp.sin(theta) - 1.0 / (jnp.cos(gamma) * tan_theta)
    half = (p1 - p0) * 0.5
    hlen = jnp.sqrt(jnp.sum(half * half, axis=-1, keepdims=True))
    p_slerp = p0 + x * half + y * n_slerp * hlen

    use_lin = (1.0 - d) < 0.001
    return (jnp.where(use_lin, p_lin, p_slerp),
            jnp.where(use_lin, n_lin, n_slerp))


def sample_bilinear(tile, u, v):
    """GL_LINEAR + CLAMP_TO_EDGE texture sampling of one (H, W) f32 tile.

    u, v: arrays of normalized texture coordinates. Texel centers sit at
    (i + 0.5) / W, matching glTexImage2D+GL_LINEAR (render.cpp:415-435).
    """
    h, w = tile.shape
    su = u * np.float32(w) - np.float32(0.5)
    sv = v * np.float32(h) - np.float32(0.5)
    x0 = jnp.floor(su)
    y0 = jnp.floor(sv)
    fx = su - x0
    fy = sv - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    t00 = tile[y0i, x0i]
    t10 = tile[y0i, x1i]
    t01 = tile[y1i, x0i]
    t11 = tile[y1i, x1i]
    return _lerp(_lerp(t00, t10, fx), _lerp(t01, t11, fx), fy)


@functools.lru_cache()
def blend_matrices(dim: int = 32, n: int = mesh.PATCH_VERTS):
    """Static bilinear sampling as blend matrices.

    The engine only ever samples tiles at THREE rect variants per axis
    (GetHeightMapForQuad, main.cpp:197-237): the full-tile rect
    [1.5/dim, (dim-1.5)/dim] and the two parent-crop half rects. For the
    full rect the patch grid hits texel CENTERS exactly (su = 1 + (n-1)u =
    the grid index — the reference's overscan parameterization is built for
    it), and for crops the fractional weights depend only on the grid index.
    So sampling is a constant sparse linear map per (variant, tap):
    matrices W[v, t, out, in] with <=2 nonzeros per row, applied with
    batched matmuls — no dynamic gathers (XLA's general gather measured
    ~27 ns/element on v5e; these matmuls are ~1000x faster).

    Returns (3, 3, dim, dim) f32: [variant 0=full,1=crop-lo,2=crop-hi;
    tap 0=-pixel,1=center,2=+pixel]."""
    params = [
        (1.5, dim - 1.5, 1.0),
        (1.5, dim / 2 - 0.5, (dim / 2 - 1) / (n - 1)),
        (dim / 2 + 0.5, dim - 1.5, (dim / 2 - 1) / (n - 1)),
    ]
    g = n + 2
    w = np.zeros((3, 3, g, dim), np.float32)
    for v, (lo, hi, pix_texels) in enumerate(params):
        for ti, t in enumerate((-1.0, 0.0, 1.0)):
            for j in range(g):
                u = min(max(j - 1, 0), n - 1) / (n - 1)
                su = (lo + (hi - lo) * u) + t * pix_texels - 0.5
                x0 = int(np.floor(su))
                fx = su - x0
                xa = min(max(x0, 0), dim - 1)
                xb = min(max(x0 + 1, 0), dim - 1)
                w[v, ti, j, xa] += np.float32(1.0 - fx)
                w[v, ti, j, xb] += np.float32(fx)
    return w


def tessellate_blend(corners_rel, corner_normals, tiles, variant_x,
                     variant_y, skirt_size, view_proj,
                     grid: int = mesh.GRID):
    """tessellate() with blend-matrix tile sampling (see blend_matrices).

    variant_x/y: (Q,) int32 in {0, 1, 2} selecting the rect variant per
    axis (0 = full tile; 1/2 = parent-crop low/high half)."""
    q = corners_rel.shape[0]
    dim = tiles.shape[-1]
    w = jnp.asarray(blend_matrices(dim, grid - 2))     # (3, 3, G, dim)
    wx = jnp.take(w, variant_x, axis=0)                # (Q, 3, G, dim)
    wy = jnp.take(w, variant_y, axis=0)

    tiles = tiles.astype(_F32)

    def xblend(tap):
        # t1[q, y, ox] = sum_ix tiles[q, y, ix] * wx[q, tap, ox, ix]
        return jnp.einsum('qyi,qoi->qyo', tiles, wx[:, tap],
                          preferred_element_type=jnp.float32)

    def yblend(t1, tap):
        # out[q, oy, ox] = sum_iy wy[q, tap, oy, iy] * t1[q, iy, ox]
        return jnp.einsum('qai,qib->qab', wy[:, tap], t1,
                          preferred_element_type=jnp.float32)

    tc = xblend(1)
    hgt = yblend(tc, 1)
    y0 = yblend(tc, 0)
    y1 = yblend(tc, 2)
    x0 = yblend(xblend(0), 1)
    x1 = yblend(xblend(2), 1)

    return _assemble(corners_rel, corner_normals, hgt, x0, x1, y0, y1,
                     skirt_size, view_proj, q, grid)


def tessellate(corners_rel, corner_normals, tiles, rect_lo, rect_hi,
               pixel_size, skirt_size, view_proj, grid: int = mesh.GRID):
    """The full vertex program over a batch of quads.

    Args:
      corners_rel:    (Q, 4, 3) f32 camera-relative corner positions
                      (p0, p1 = first row; p2, p3 = second row).
      corner_normals: (Q, 4, 3) f32 unit sphere normals at the corners.
      tiles:          (Q, H, W) f32 heightmap tiles.
      rect_lo/hi:     (Q, 2) f32 tile-rect UV corners (texrect.corners[0/1]).
      pixel_size:     (Q, 2) f32 one-texel UV step for normal taps.
      skirt_size:     (Q,) f32 skirt drop distance.
      view_proj:      (4, 4) f32 combined Projection @ View (math row-major,
                      out = M @ v).
      grid:           dense grid side length (default 32).

    Returns PatchVertices with (Q, grid, grid, ...) arrays.
    """
    q = corners_rel.shape[0]
    u2d, v2d, _, _ = mesh.grid_uv_skirt(grid - 2)
    uu = jnp.asarray(u2d)[None, :, :, None]      # (1, G, G, 1)
    vv = jnp.asarray(v2d)[None, :, :, None]

    # Tile UV: mix(rect_lo, rect_hi, (u, v)) per quad.
    lo = rect_lo.astype(_F32)[:, None, None, :]
    hi = rect_hi.astype(_F32)[:, None, None, :]
    tex = lo + (hi - lo) * jnp.concatenate([uu, vv], axis=-1)
    tu, tv = tex[..., 0], tex[..., 1]

    ps = pixel_size.astype(_F32)[:, None, None, :]
    pu = jnp.broadcast_to(ps[..., 0], tu.shape)
    pvs = jnp.broadcast_to(ps[..., 1], tv.shape)

    def sample_all(tile, tu, tv, pu, pvs):
        hgt = sample_bilinear(tile, tu, tv)
        x0 = sample_bilinear(tile, tu - pu, tv)
        x1 = sample_bilinear(tile, tu + pu, tv)
        y0 = sample_bilinear(tile, tu, tv - pvs)
        y1 = sample_bilinear(tile, tu, tv + pvs)
        return hgt, x0, x1, y0, y1

    hgt, x0, x1, y0, y1 = jax.vmap(sample_all)(
        tiles.astype(_F32), tu, tv, pu, pvs)

    return _assemble(corners_rel, corner_normals, hgt, x0, x1, y0, y1,
                     skirt_size, view_proj, q, grid)


def _assemble(corners_rel, corner_normals, hgt, x0, x1, y0, y1, skirt_size,
              view_proj, q, grid):
    """Shared tail of the vertex program: corner interpolation, skirt drop,
    central-difference normals + TBN, clip transform (main.cpp:338-367)."""
    u2d, v2d, skirt2d, _ = mesh.grid_uv_skirt(grid - 2)
    uu = jnp.asarray(u2d)[None, :, :, None]
    vv = jnp.asarray(v2d)[None, :, :, None]
    sk = jnp.asarray(skirt2d)[None, :, :]

    c = corners_rel.astype(_F32)
    n = corner_normals.astype(_F32)

    def corner(i):
        return (c[:, i, None, None, :], n[:, i, None, None, :])

    (p0, n0), (p1, n1), (p2, n2), (p3, n3) = (corner(i) for i in range(4))

    pa, na = interpolate(p0, n0, p1, n1, uu)     # row 1 at u
    pb, nb = interpolate(p2, n2, p3, n3, uu)     # row 2 at u
    pv, nv = interpolate(pa, na, pb, nb, vv)     # blended at v

    height = hgt - skirt_size.astype(_F32)[:, None, None] * sk

    # Central-difference normal in tangent space (main.cpp:338-346):
    # xyscale = |q.p - p.p| / 29 varies per vertex with u.
    row_dir = pb - pa
    xyscale = jnp.sqrt(jnp.sum(row_dir * row_dir, axis=-1)) / np.float32(mesh.PATCH_QUADS)
    n_tan = _norm(jnp.stack([x0 - x1, 2.0 * xyscale, y0 - y1], axis=-1))

    # TBN: t = normalize(cross(n, row_dir)), bi = normalize(cross(t, n));
    # world normal = normalize(t*nx + n*ny + bi*nz) (main.cpp:361-365).
    t_vec = _norm(jnp.cross(nv, row_dir))
    bi = _norm(jnp.cross(t_vec, nv))
    normal = _norm(t_vec * n_tan[..., 0:1] + nv * n_tan[..., 1:2] + bi * n_tan[..., 2:3])

    world = pv + nv * height[..., None]
    w4 = jnp.concatenate([world, jnp.ones((q, grid, grid, 1), _F32)], axis=-1)
    clip = jnp.einsum('ij,qabj->qabi', view_proj.astype(_F32), w4)

    return PatchVertices(clip=clip, world=world, normal=normal,
                         height=height, snormal=nv)
