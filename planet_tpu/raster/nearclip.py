"""Near-plane triangle clipping for the exact-coverage raster.

GL clips primitives against the near plane and draws the visible part
(the reference renders through the full GL pipeline, render.cpp:455-491,
with near=1.0 at main.cpp:1074); the exact raster previously whole-culled
any triangle with a vertex at w <= 1e-9, so near-surface flight lost whole
wedges of terrain at the screen edge. This module restores GL parity:

* With the engine's projection (geom/camera.perspective_lh: w' = z_view),
  the near plane is exactly the clip-space half-space f = z + w >= 0
  (f = 2*far/(far-near) * (z_view - near)), so Sutherland-Hodgman against
  f >= 0 yields vertices with w = z_view >= near — always projectable.
* A triangle is a STRADDLER iff all three vertices are valid, at least
  one has w <= coverage._W_MIN (projection would break), and at least one
  has f > 0 (something is visible). Triangles whose vertices all have
  w > _W_MIN keep the existing path bit-identically — their in-front-of-
  near fragments already reject at the z >= -1 fragment test, which is
  the same fragment set GL's geometric clip produces.
* Clipping one plane yields 3 or 4 vertices -> 1 or 2 triangles per
  straddler (winding preserved). Clip positions and normals interpolate
  linearly in clip space (t = f_a / (f_a - f_b)) — GL's clip-vertex rule.
* Clipped triangles are rasterized by the existing huge-triangle pass
  (bbox-bounded scan): they are rare (the band of cells crossing the
  z_view = near plane) and typically screen-filling.

The scalar oracle (native/oracle_main.cpp, near-surface frame golden)
mirrors every formula here op for op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from planet_tpu.raster import coverage as cov

_F32 = jnp.float32
_I32 = jnp.int32


def _tri3_t(a, q: int, g: int):
    """coverage._setup_t's cell/triangle rule on a (Q, G, G) per-vertex
    array: three (N,) vertex arrays in parity-major candidate order."""
    a = a.reshape(q, g * g)
    g00 = a
    g10 = jnp.roll(a, -g, axis=1)
    g01 = jnp.roll(a, -1, axis=1)
    g11 = jnp.roll(g10, -1, axis=1)

    def st(p0, p1):
        return jnp.concatenate([p0, p1], axis=0).reshape(-1)

    return st(g00, g01), st(g10, g10), st(g01, g11)


def _cell_ok_mask(q: int, g: int, cell_mask):
    cell_ok = np.zeros((g, g), bool)
    cell_ok[:g - 1, :g - 1] = True
    if cell_mask is not None:
        cm = np.asarray(cell_mask)
        full = np.zeros((2, g, g), bool)
        full[:, :g - 1, :g - 1] = cm
        full = full & cell_ok[None]
        return jnp.asarray(
            np.broadcast_to(full[:, None], (2, q, g, g)).reshape(-1))
    return jnp.asarray(
        np.broadcast_to(cell_ok[None, None], (2, q, g, g)).reshape(-1))


def straddle_from_verts(v3, wl3, f3, x3, y3, w3):
    """The per-vertex straddle predicate shared by straddle_mask_t and
    coverage._quad_live_t (one definition so compaction liveness and the
    clip pass can never silently diverge). Inputs are 3-tuples of
    same-shaped per-vertex arrays: valid, w <= _W_MIN, f = z + w > 0,
    clip x, clip y, clip w. See straddle_mask_t for the geometry."""
    v0, v1, v2 = v3
    wl0, wl1, wl2 = wl3
    f0, f1, f2 = f3
    x0, x1, x2 = x3
    y0, y1, y2 = y3
    w0, w1, w2 = w3
    det3 = (x0 * (y1 * w2 - y2 * w1)
            - y0 * (x1 * w2 - x2 * w1)
            + w0 * (x1 * y2 - x2 * y1))
    all_out = (((w0 - x0 < 0.0) & (w1 - x1 < 0.0) & (w2 - x2 < 0.0))
               | ((w0 + x0 < 0.0) & (w1 + x1 < 0.0) & (w2 + x2 < 0.0))
               | ((w0 - y0 < 0.0) & (w1 - y1 < 0.0) & (w2 - y2 < 0.0))
               | ((w0 + y0 < 0.0) & (w1 + y1 < 0.0) & (w2 + y2 < 0.0)))
    return ((v0 & v1 & v2) & (wl0 | wl1 | wl2) & (f0 | f1 | f2)
            & (det3 < 0.0) & ~all_out)


def straddle_mask_t(clip, valid, cell_mask=None):
    """(N,) bool straddler mask in coverage._setup_t's parity-major
    candidate order (N = 2*Q*G*G).

    A straddler: all three vertices valid, at least one at w <= _W_MIN
    (screen projection breaks), at least one with f = z + w > 0 (something
    beyond the near plane), FRONT-FACING by the homogeneous test
    det3(x, y, w) < 0 — the screen-winding sign is w-product-dependent and
    meaningless with mixed w signs, but det3's sign is invariant under
    near-plane clipping, and for all-w-positive triangles it equals the
    raster's orientation test (front iff area2 * FRONT_SIGN > 0; the
    y-down screen flip makes screen area2 proportional to
    -det3/(w0*w1*w2), so front = negative det3) — and not
    provably outside a lateral frustum plane: the visible region is the
    intersection of the linear half-spaces w±x >= 0, w±y >= 0 in clip
    space (valid for any w sign — GL's own clip volume), so a triangle
    whose three vertices all violate the SAME plane cannot intersect it.
    Without these filters a whole-planet LOD leaf set contributes ~1-2k
    back-facing/off-screen straddlers per frame (measured 2284/1216 in
    the 20 km oracle scene), all invisible; with them the mask keeps only
    the handful whose clipped parts can reach the screen, and the callers
    cond-gate the whole clip pass on the count."""
    q, g = clip.shape[0], clip.shape[1]
    w4 = clip[..., 3]
    f4 = clip[..., 2] + w4
    m = straddle_from_verts(_tri3_t(valid, q, g),
                            _tri3_t(w4 <= cov._W_MIN, q, g),
                            _tri3_t(f4 > 0.0, q, g),
                            _tri3_t(clip[..., 0], q, g),
                            _tri3_t(clip[..., 1], q, g),
                            _tri3_t(w4, q, g))
    return m & _cell_ok_mask(q, g, cell_mask)


def gather_tri_verts_t(clip, normal, idx):
    """Gather straddler triangle vertices from the patch grids.

    idx: (K,) candidate indices in _setup_t's parity-major order (the
    compaction's dump value >= N marks dead lanes). Returns
    (vc (K, 3, 4) clip positions, vn (K, 3, 3) normals, ok (K,) bool)."""
    q, g = clip.shape[0], clip.shape[1]
    ncell = q * g * g
    n = 2 * ncell
    ok = idx < n
    i = jnp.minimum(idx, n - 1)
    p = i // ncell
    rem = i % ncell
    qq = rem // (g * g)
    j = rem % (g * g)
    # straddlers never sit in the last grid row/column (cell_ok), so the
    # +g / +1 neighbor offsets stay in range; clamp only for dead lanes
    lim = g * g - 1
    a00 = j
    a10 = jnp.minimum(j + g, lim)
    a01 = jnp.minimum(j + 1, lim)
    a11 = jnp.minimum(j + g + 1, lim)
    v0 = jnp.where(p == 0, a00, a01)
    v1 = a10
    v2 = jnp.where(p == 0, a01, a11)
    flat_c = clip.reshape(q, g * g, 4)
    flat_n = normal.reshape(q, g * g, 3)
    vc = jnp.stack([flat_c[qq, v0], flat_c[qq, v1], flat_c[qq, v2]], axis=1)
    vn = jnp.stack([flat_n[qq, v0], flat_n[qq, v1], flat_n[qq, v2]], axis=1)
    return vc.astype(_F32), vn.astype(_F32), ok


def clip_expand(vc, vn, live):
    """Sutherland-Hodgman clip against f = z + w >= 0.

    vc (K, 3, 4), vn (K, 3, 3), live (K,) -> (cvc (2K, 3, 4),
    cvn (2K, 3, 3), clive (2K,)): triangle A in [:K], triangle B (the
    second fan triangle of a 4-gon, cnt == 2 only) in [K:]. Winding is
    preserved. Formulas are mirrored op for op by the scalar oracle."""
    k = vc.shape[0]
    f = vc[..., 2] + vc[..., 3]                       # (K, 3)
    inside = f > 0.0
    cnt = jnp.sum(inside.astype(_I32), axis=1)

    def first_true(m):
        return jnp.where(m[:, 0], 0, jnp.where(m[:, 1], 1, 2)).astype(_I32)

    # rotate so the distinguished vertex (the single inside one for
    # cnt==1, the single outside one for cnt==2) is v0
    rot = jnp.where(cnt == 1, first_true(inside), first_true(~inside))
    rows = jnp.arange(k)

    def at(a, i):
        return a[rows, i]

    i0, i1, i2 = rot, (rot + 1) % 3, (rot + 2) % 3
    c0, c1, c2 = at(vc, i0), at(vc, i1), at(vc, i2)
    n0, n1, n2 = at(vn, i0), at(vn, i1), at(vn, i2)
    f0, f1, f2 = at(f, i0), at(f, i1), at(f, i2)

    usable = live & ((cnt == 1) | (cnt == 2))
    # guard dead lanes against 0/0 (their outputs are masked by clive)
    t01 = jnp.where(usable, f0 / jnp.where(usable, f0 - f1, 1.0), 0.0)
    t20 = jnp.where(usable, f2 / jnp.where(usable, f2 - f0, 1.0), 0.0)
    i01c = c0 + (c1 - c0) * t01[:, None]
    i01n = n0 + (n1 - n0) * t01[:, None]
    i20c = c2 + (c0 - c2) * t20[:, None]
    i20n = n2 + (n0 - n2) * t20[:, None]

    one = (cnt == 1)[:, None]
    # A: cnt==1 -> (v0, I01, I20); cnt==2 -> (I01, v1, v2)
    a0c, a0n = jnp.where(one, c0, i01c), jnp.where(one, n0, i01n)
    a1c, a1n = jnp.where(one, i01c, c1), jnp.where(one, i01n, n1)
    a2c, a2n = jnp.where(one, i20c, c2), jnp.where(one, i20n, n2)
    # B: (I01, v2, I20) — second fan triangle, cnt==2 only
    cvc = jnp.concatenate([jnp.stack([a0c, a1c, a2c], axis=1),
                           jnp.stack([i01c, c2, i20c], axis=1)])
    cvn = jnp.concatenate([jnp.stack([a0n, a1n, a2n], axis=1),
                           jnp.stack([i01n, n2, i20n], axis=1)])
    clive = jnp.concatenate([usable, live & (cnt == 2)])
    return cvc, cvn, clive


def setup_tris(vc, vn, live, width: int, height: int,
               far_w=None) -> "cov._Tris":
    """Project clipped triangles with coverage._setup's exact op sequence
    (snap, winding, bbox) and return a coverage._Tris for the huge pass.
    far_w: view-space far distance — a clipped part can still cross the
    FAR plane; same vertex w > far_w straddle rule as coverage._setup."""
    w = vc[..., 3]                                   # (K, 3)
    okw = live[:, None] & (w > cov._W_MIN)
    inv_w = jnp.where(okw, 1.0 / jnp.where(okw, w, 1.0), 0.0)
    sx = (vc[..., 0] * inv_w * 0.5 + 0.5) * np.float32(width)
    sy = (0.5 - vc[..., 1] * inv_w * 0.5) * np.float32(height)
    sx = jnp.round(sx * cov.SNAP) * cov.INV_SNAP
    sy = jnp.round(sy * cov.SNAP) * cov.INV_SNAP
    z = vc[..., 2] * inv_w
    niw = vn * inv_w[..., None]

    tri_ok = live & okw.all(axis=1)
    area2 = ((sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0])
             - (sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0])) \
        * cov.FRONT_SIGN
    front = area2 > 0.0

    min_x = jnp.min(sx, axis=-1)
    max_x = jnp.max(sx, axis=-1)
    min_y = jnp.min(sy, axis=-1)
    max_y = jnp.max(sy, axis=-1)
    px0 = jnp.maximum(jnp.ceil(min_x - 0.5).astype(_I32), 0)
    py0 = jnp.maximum(jnp.ceil(min_y - 0.5).astype(_I32), 0)
    px1 = jnp.minimum(jnp.floor(max_x - 0.5).astype(_I32), width - 1)
    py1 = jnp.minimum(jnp.floor(max_y - 0.5).astype(_I32), height - 1)
    nonempty = (px0 <= px1) & (py0 <= py1)

    out_live = tri_ok & front & nonempty
    inv_area = jnp.where(out_live, 1.0 / jnp.where(out_live, area2, 1.0),
                         0.0)
    if far_w is not None:
        far = (w > np.float32(far_w)).any(axis=1)
        ilim = jnp.where(far, np.float32(1.0 / far_w), np.float32(-1.0))
    else:
        ilim = jnp.full_like(inv_area, np.float32(-1.0))
    return cov._Tris(x=sx, y=sy, z=z, iw=inv_w, niw=niw, inv_area=inv_area,
                     px0=px0, py0=py0, px1=px1, py1=py1, live=out_live,
                     ilim=ilim)


def records_from_tris(t: "cov._Tris"):
    """(K,) _Tris -> (K, 32) f32 records in the HUGE-class layout
    (coverage._setup_t rows: 0-8 edge consts, 9-11 z, 12-14 1/w, 15-23
    normal*1/w coefficients — inv_area folded — 24-27 clamped bbox,
    28 live, 29-31 top-left accept biases)."""
    ox = t.px0.astype(_F32) + np.float32(0.5)
    oy = t.py0.astype(_F32) + np.float32(0.5)

    def edge_consts(xa, ya, xb, yb):
        DX = (xb - xa) * cov.FRONT_SIGN
        DY = (yb - ya) * cov.FRONT_SIGN
        c = DX * (oy - ya) - DY * (ox - xa)
        topleft = (DY < 0.0) | ((DY == 0.0) & (DX > 0.0))
        bias = jnp.where(topleft, np.float32(-1 / 512), np.float32(1 / 512))
        return DX, DY, c, bias

    x, y = t.x, t.y
    dx0, dy0, c0, b0 = edge_consts(x[:, 1], y[:, 1], x[:, 2], y[:, 2])
    dx1, dy1, c1, b1 = edge_consts(x[:, 2], y[:, 2], x[:, 0], y[:, 0])
    dx2, dy2, c2, b2 = edge_consts(x[:, 0], y[:, 0], x[:, 1], y[:, 1])
    ia = t.inv_area
    rows = [dx0, dy0, c0, dx1, dy1, c1, dx2, dy2, c2,
            t.z[:, 0] * ia, t.z[:, 1] * ia, t.z[:, 2] * ia,
            t.iw[:, 0] * ia, t.iw[:, 1] * ia, t.iw[:, 2] * ia,
            t.niw[:, 0, 0] * ia, t.niw[:, 0, 1] * ia, t.niw[:, 0, 2] * ia,
            t.niw[:, 1, 0] * ia, t.niw[:, 1, 1] * ia, t.niw[:, 1, 2] * ia,
            t.niw[:, 2, 0] * ia, t.niw[:, 2, 1] * ia, t.niw[:, 2, 2] * ia,
            t.px0.astype(_F32), t.py0.astype(_F32),
            t.px1.astype(_F32), t.py1.astype(_F32),
            # live * far-floor (coverage._setup_t row 28: 0 dead, -1 live,
            # +1/far_w far-straddler — a clipped part can still cross FAR)
            t.live.astype(_F32) * t.ilim,
            b0, b1, b2]
    return jnp.stack([r.astype(_F32) for r in rows], axis=1)


def clipped_tris(clip, normal, idx, width: int, height: int,
                 far_w=None) -> "cov._Tris":
    """Straddler indices -> projected clipped-triangle _Tris (2K rows).

    The one-stop helper both raster backends share: gather vertices,
    Sutherland-Hodgman expand, project. idx (K,) in _setup_t's candidate
    order; dead lanes (idx >= N) come back live=False."""
    vc, vn, ok = gather_tri_verts_t(clip, normal, idx)
    cvc, cvn, clive = clip_expand(vc, vn, ok)
    return setup_tris(cvc, cvn, clive, width, height, far_w=far_w)
