"""Depth-tested splat rasterizer.

The reference rasterizes ~1682 triangles per patch through the GPU ROPs
(render.cpp:455-491). TPUs have no rasterizer hardware, but the engine's LOD
policy (ProcessQuad split threshold, main.cpp:558-571) keeps patch cells at
~1 pixel on screen, so a depth-tested VERTEX SPLAT is a faithful raster for
this workload: every patch grid vertex becomes a fragment, depth-tested with
one `scatter-min` of packed (depth, shade) int32 keys — measured at ~HBM
speed on v5e — followed by a 3x3 min hole-fill for cells that project
slightly wider than a pixel. Exact edge/area coverage (the engine default)
lives in raster/coverage.py; this splat path remains as the cheap
approximate backend (config raster_mode="splat").

Depth packing: 21-bit quantized NDC depth in the high bits, 10-bit shade in
the low bits — min() picks the nearest fragment and its shade rides along.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32
_EMPTY = np.int32(2**31 - 1)
_DEPTH_BITS = 21
_SHADE_BITS = 10


def splat_frame(clip, shade, valid, width: int, height: int,
                background: float = 0.0, fill_rounds: int = 1):
    """clip: (..., 4) clip positions; shade: (...) grayscale; valid: (...)
    bool. Returns (H, W) f32 image and (H, W) f32 depth (NDC z, +inf where
    empty)."""
    w4 = clip[..., 3]
    ok = valid & (w4 > np.float32(1e-9))
    inv_w = jnp.where(ok, 1.0 / jnp.where(ok, w4, 1.0), 0.0)
    ndc_x = clip[..., 0] * inv_w
    ndc_y = clip[..., 1] * inv_w
    ndc_z = clip[..., 2] * inv_w

    px = jnp.floor((ndc_x * 0.5 + 0.5) * width).astype(_I32)
    py = jnp.floor((0.5 - ndc_y * 0.5) * height).astype(_I32)
    inb = ok & (px >= 0) & (px < width) & (py >= 0) & (py < height) \
        & (ndc_z >= -1.0) & (ndc_z <= 1.0)

    zq = jnp.clip(((ndc_z * 0.5 + 0.5) * (2**_DEPTH_BITS - 1)), 0,
                  2**_DEPTH_BITS - 1).astype(_I32)
    sq = jnp.clip(shade * (2**_SHADE_BITS - 1), 0,
                  2**_SHADE_BITS - 1).astype(_I32)
    packed = (zq << _SHADE_BITS) | sq

    n_pix = width * height
    idx = jnp.where(inb, py * width + px, n_pix)       # dump slot for culled
    # materialize indices/values before the scatter: fused into the scatter
    # loop they run at scalar speed (measured 17 ns/fragment on v5e)
    idx, packed = jax.lax.optimization_barrier(
        (idx.reshape(-1), packed.reshape(-1)))
    buf = jnp.full((n_pix + 1,), _EMPTY, _I32)
    buf = buf.at[idx].min(packed)
    img_packed = buf[:n_pix].reshape(height, width)

    for _ in range(fill_rounds):
        img_packed = _fill_holes(img_packed)

    empty = img_packed == _EMPTY
    shade_out = (img_packed & (2**_SHADE_BITS - 1)).astype(jnp.float32) \
        / np.float32(2**_SHADE_BITS - 1)
    image = jnp.where(empty, np.float32(background), shade_out)
    depth = jnp.where(
        empty, np.float32(np.inf),
        ((img_packed >> _SHADE_BITS).astype(jnp.float32)
         / np.float32(2**_DEPTH_BITS - 1)) * 2.0 - 1.0)
    return image, depth


def upsample_cells(clip, shade, valid, k: int, wireframe: bool = False):
    """Cell-level bilinear supersampling: every grid cell (triangle pair)
    contributes k*k interpolated fragments instead of just its corner
    vertices — the splat analogue of triangle interior coverage. clip
    (..., G, G, 4), shade (..., G, G), valid (..., G, G) -> flattened
    per-fragment arrays with (G-1)*k points per axis.

    wireframe=True keeps only cell-edge fragments (the reference's key-P
    GL_LINE polygon mode, main.cpp:980-985). NOTE: wireframe needs k > 1
    (at k = 1 this function is an identity passthrough and no edge
    selection happens) — the engine keeps raster_supersample >= 2 whenever
    wireframe is on."""
    if k <= 1:
        return clip, shade, valid

    def corners(arr):
        return (arr[..., :-1, :-1, :], arr[..., :-1, 1:, :],
                arr[..., 1:, :-1, :], arr[..., 1:, 1:, :])

    c00, c01, c10, c11 = corners(clip)
    s00, s01, s10, s11 = corners(shade[..., None])
    v = valid[..., :-1, :-1] & valid[..., :-1, 1:] \
        & valid[..., 1:, :-1] & valid[..., 1:, 1:]

    # wireframe keeps only cell-edge fragments (grid lines)
    offsets = [(i, j) for i in range(k) for j in range(k)
               if not wireframe or i == 0 or j == 0]

    outs_c, outs_s = [], []
    for i, j in offsets:
        # inclusive [0, 1] sampling: cell edges are covered from BOTH
        # neighboring cells/quads, closing sub-pixel seams at shared
        # boundaries (duplicated edge fragments are depth-tested away)
        fu = np.float32(j / (k - 1))
        fv = np.float32(i / (k - 1))
        w00 = (1 - fu) * (1 - fv)
        w01 = fu * (1 - fv)
        w10 = (1 - fu) * fv
        w11 = fu * fv
        outs_c.append(c00 * w00 + c01 * w01 + c10 * w10 + c11 * w11)
        outs_s.append(s00 * w00 + s01 * w01 + s10 * w10 + s11 * w11)
    clip_up = jnp.stack(outs_c, axis=-2)            # (..., G-1, G-1, F, 4)
    shade_up = jnp.stack(outs_s, axis=-2)[..., 0]   # (..., G-1, G-1, F)
    valid_up = jnp.broadcast_to(v[..., None], shade_up.shape)
    return clip_up, shade_up, valid_up


def _fill_holes(img_packed):
    """Fill empty pixels with the nearest-depth neighbor in a 3x3 window
    (sub-pixel gaps between splats)."""
    neigh = jax.lax.reduce_window(
        img_packed, _EMPTY, jax.lax.min,
        window_dimensions=(3, 3), window_strides=(1, 1), padding="SAME")
    return jnp.where(img_packed == _EMPTY, neigh, img_packed)
