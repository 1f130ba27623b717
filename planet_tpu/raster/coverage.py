"""Exact-coverage depth-tested triangle rasterizer (BASELINE config 4).

The reference draws each patch as one triangle strip through the GPU ROPs
(render.cpp:455-491; strip built at main.cpp:427-474) with LEQUAL depth,
CW-front-face culling (main.cpp:811-816) and a Lambert fragment shader over
the perspective-interpolated vertex normal (main.cpp:369-381). TPUs have no
raster hardware, so this module restates triangle rasterization as a
vector program shaped for the VPU:

* Triangles are enumerated from the dense patch grid BY SLICING (no index
  buffer, no gathers): every grid cell contributes the reference strip's
  two triangles (parity-normalized winding, tess/mesh.strip_to_triangles).
* Screen coordinates snap to a 1/16-subpixel fixed-point grid held in f32.
  Inside the small/mid size classes every edge-function product is an
  integer multiple of 1/256 below 2**24, so coverage decisions are EXACT
  f32 arithmetic — bit-stable across XLA, numpy, and the scalar C oracle.
* Coverage uses the top-left fill rule, derived for y-down screen space:
  a zero edge value is inside iff the (orientation-normalized) edge
  direction has dy < 0, or dy == 0 and dx > 0. Two triangles sharing an
  edge therefore partition its pixels exactly (no double-shade, no seam).
* Work is split into ROW JOBS binned by bbox width (ROW_LADDER): a live
  triangle with bbox height h emits h jobs, one per bbox pixel row; each
  job evaluates `win_w` candidate pixels of its row, in the narrowest
  ladder class with win_w >= bbox width. Candidate lanes therefore track
  true bbox area (the LOD workload is dominated by wide, short triangles
  at grazing angles). Triangles taller than MAX_BH rows or wider than the
  widest class are `huge`: compacted to `huge_cap` slots and rasterized
  by a sequential full-screen scan (skipped via lax.cond when empty).
  Caps overflowing is reported in the returned counters, never silent.
* The depth test is one scatter-min of packed (21-bit quantized NDC depth,
  10-bit shade) int32 keys per class — LEQUAL semantics with ties broken
  toward darker shade, deterministically.

Fragments interpolate 1/w and normal*(1/w) linearly in screen space —
exactly GL's perspective-correct varyings — then shade
sqrt(0.001 + max(0, n.l)) like the reference fragment program (the 1/w
divide cancels inside the normalize, see _fragments).

Documented parity deviations from the GL reference: none.

Near plane: triangles straddling it (some vertex at w <= 1e-9, some part
visible) are Sutherland-Hodgman clipped in clip space and the visible
parts drawn — GL's behavior (raster/nearclip.py; oracle-verified on a
near-surface camera golden). Fully-projectable triangles keep the
fragment-level z >= -1 near test, which produces GL's fragment set
without geometric clipping.

Far plane (round 5): triangles with a vertex beyond far REJECT their
beyond-far fragments; fully-inside triangles keep depth-clamp (GL never
clips them). Crucially both tests run in VIEW space, not NDC: with
far/near = 2e7 (main.cpp:1074-1075) the entire NDC z budget past ~1e6 m
sits within 1-2 f32 ulps of 1.0 — GL's own clip-space z_clip > w test is
sub-ulp there and degenerates to rounding noise (as does any z > 1
fragment test: it speckles whole-planet silhouettes). The clip w channel
IS z_view for this projection (geom/camera.perspective_lh), so:
* a triangle far-straddles iff some vertex has w > far (f32 resolution
  ~2 m at 2e7 — crisp), and
* its fragments reject where interpolated 1/w < 1/far (1/w interpolates
  affinely in screen space — GL's own perspective-correct varying — with
  ~2e-7 relative resolution at the boundary).
Far-straddlers are routed to the huge/bbox kernel (the only fragment
path that interpolates 1/w; they are rare — a planet-radius-scale camera
altitude is needed at far=2e7). Pass far_w=None (the default) to disable
far clipping entirely. Oracle-verified on a high-orbit golden where the
planet limb crosses far (farclip_*).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planet_tpu.raster.splat import _DEPTH_BITS, _EMPTY, _SHADE_BITS

_F32 = jnp.float32
_I32 = jnp.int32

SNAP = np.float32(16.0)        # subpixel grid: 1/16 px
INV_SNAP = np.float32(1.0 / 16.0)
# GL front face is CW in y-UP window coords (main.cpp:814). Worked
# example (round 5 — the round-1 derivation got the sign wrong and drew
# the planet's FAR side for four rounds, masked by the oracle mirroring
# the same sign and by the depth test): a camera-facing triangle
# A=(0,0) B=(0,1) C=(1,0) in y-up window coords has 2D cross
# (B-A)x(C-A) = -1 < 0 = CW = GL front. In our y-DOWN screen numbers
# those points are A=(0,0) B=(0,-1) C=(1,0) and the shoelace
# area2 = (x1-x0)(y2-y0) - (y1-y0)(x2-x0) = +1 — POSITIVE. So front
# triangles have positive area2 under this formula and the
# orientation-normalizer is +1. (Equivalently, in clip coords front is
# det3(x, y, w) < 0 — see nearclip.straddle_from_verts.)
FRONT_SIGN = np.float32(1.0)
_W_MIN = np.float32(1e-9)
_LIGHT = np.array([0.0, 1.0, -1.0]) / np.sqrt(2.0)


class RasterCounters(NamedTuple):
    n_tris: jnp.ndarray        # () i32 live (kept, front-facing) triangles
    n_per_class: jnp.ndarray   # (n_classes + 1,) i32 triangles per ladder
                               # class, huge last
    n_huge: jnp.ndarray        # () i32 needing the full-screen pass
    overflowed: jnp.ndarray    # () bool any class cap exceeded
    n_straddle: jnp.ndarray    # () i32 near-plane straddlers clipped


def _tri_corners(a, channel: bool):
    """(Q, G, G[, C]) -> three (Q, 2, G-1, G-1[, C]) triangle vertex arrays.

    Every grid cell carries the reference strip's two triangles
    (main.cpp:427-474, parity-normalized by tess/mesh.strip_to_triangles):
    cell (r, c) -> T0 = (g[r,c], g[r+1,c], g[r,c+1]) and
    T1 = (g[r,c+1], g[r+1,c], g[r+1,c+1]). Equality with
    mesh.grid_triangles() is asserted in tests/test_raster_exact.py.
    """
    if channel:
        g00 = a[:, :-1, :-1, :]
        g10 = a[:, 1:, :-1, :]
        g01 = a[:, :-1, 1:, :]
        g11 = a[:, 1:, 1:, :]
        ax = 1
    else:
        g00 = a[:, :-1, :-1]
        g10 = a[:, 1:, :-1]
        g01 = a[:, :-1, 1:]
        g11 = a[:, 1:, 1:]
        ax = 1
    v0 = jnp.stack([g00, g01], axis=ax)
    v1 = jnp.stack([g10, g10], axis=ax)
    v2 = jnp.stack([g01, g11], axis=ax)
    return v0, v1, v2


class _Tris(NamedTuple):
    """Per-triangle setup, all (N,) or (N, 3)."""

    x: jnp.ndarray        # (N, 3) snapped screen x per vertex
    y: jnp.ndarray        # (N, 3)
    z: jnp.ndarray        # (N, 3) NDC z
    iw: jnp.ndarray       # (N, 3) 1/w
    niw: jnp.ndarray      # (N, 3, 3) normal * (1/w)
    inv_area: jnp.ndarray  # (N,) 1 / area2 (orientation-normalized)
    px0: jnp.ndarray      # (N,) i32 bbox min pixel (clamped)
    py0: jnp.ndarray
    px1: jnp.ndarray      # (N,) i32 bbox max pixel (clamped)
    py1: jnp.ndarray
    live: jnp.ndarray     # (N,) bool
    ilim: jnp.ndarray     # (N,) f32 fragment 1/w floor: -1 = no far clip,
                          # +1/far for far-straddlers (iw < ilim rejects)


def _setup(clip, normal, valid, width: int, height: int,
           cell_mask=None, far_w=None) -> _Tris:
    """Project, snap, cull, and bbox the cell triangles of a batch of
    patches. clip (Q, G, G, 4), normal (Q, G, G, 3), valid (Q, G, G);
    cell_mask an optional static (2, G-1, G-1) bool of drawn triangles
    (tess/mesh.cell_triangle_mask — the strip skips skirt-corner cells).
    far_w: view-space far-plane distance (the reference's far=2e7,
    main.cpp:1075) — triangles with a vertex at w > far_w become
    far-straddlers (ilim = 1/far_w); None disables far clipping."""
    w4 = clip[..., 3]
    ok_w = valid & (w4 > _W_MIN)
    inv_w = jnp.where(ok_w, 1.0 / jnp.where(ok_w, w4, 1.0), 0.0)
    sx = (clip[..., 0] * inv_w * 0.5 + 0.5) * np.float32(width)
    sy = (0.5 - clip[..., 1] * inv_w * 0.5) * np.float32(height)
    # snap to the 1/16 subpixel grid (round-half-even everywhere)
    sx = jnp.round(sx * SNAP) * INV_SNAP
    sy = jnp.round(sy * SNAP) * INV_SNAP
    z = clip[..., 2] * inv_w
    niw = normal * inv_w[..., None]

    xs = jnp.stack(_tri_corners(sx, False), -1)    # (Q, 2, G-1, G-1, 3)
    ys = jnp.stack(_tri_corners(sy, False), -1)
    zs = jnp.stack(_tri_corners(z, False), -1)
    iws = jnp.stack(_tri_corners(inv_w, False), -1)
    niws = jnp.stack(_tri_corners(niw, True), -2)  # (Q, 2, G-1, G-1, 3v, 3c)
    oks = jnp.stack(_tri_corners(ok_w, False), -1)

    def flat(a, tail):
        return a.reshape((-1,) + tail)

    xs, ys, zs, iws = (flat(a, (3,)) for a in (xs, ys, zs, iws))
    niws = flat(niws, (3, 3))
    tri_ok = flat(oks, (3,)).all(axis=-1)
    if cell_mask is not None:
        q = clip.shape[0]
        tri_ok = tri_ok & jnp.broadcast_to(
            jnp.asarray(cell_mask)[None], (q,) + cell_mask.shape).reshape(-1)

    area2 = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
             - (ys[:, 1] - ys[:, 0]) * (xs[:, 2] - xs[:, 0])) * FRONT_SIGN
    front = area2 > 0.0                           # back faces + degenerates out

    min_x = jnp.min(xs, axis=-1)
    max_x = jnp.max(xs, axis=-1)
    min_y = jnp.min(ys, axis=-1)
    max_y = jnp.max(ys, axis=-1)
    # pixel centers px + 0.5 inside [min, max]
    px0 = jnp.ceil(min_x - 0.5).astype(_I32)
    px1 = jnp.floor(max_x - 0.5).astype(_I32)
    py0 = jnp.ceil(min_y - 0.5).astype(_I32)
    py1 = jnp.floor(max_y - 0.5).astype(_I32)
    px0c = jnp.maximum(px0, 0)
    py0c = jnp.maximum(py0, 0)
    px1c = jnp.minimum(px1, width - 1)
    py1c = jnp.minimum(py1, height - 1)
    nonempty = (px0c <= px1c) & (py0c <= py1c)

    live = tri_ok & front & nonempty
    inv_area = jnp.where(live, 1.0 / jnp.where(live, area2, 1.0), 0.0)
    if far_w is not None:
        ws = jnp.stack(_tri_corners(w4, False), -1).reshape(-1, 3)
        far = (ws > np.float32(far_w)).any(axis=-1)
        ilim = jnp.where(far, np.float32(1.0 / far_w), np.float32(-1.0))
    else:
        ilim = jnp.full_like(inv_area, np.float32(-1.0))
    return _Tris(x=xs, y=ys, z=zs, iw=iws, niw=niws, inv_area=inv_area,
                 px0=px0c, py0=py0c, px1=px1c, py1=py1c, live=live,
                 ilim=ilim)


def _fragments(t: _Tris, live, px, py, width: int, height: int,
               wireframe: bool = False, iw_test: bool = True):
    """Evaluate coverage + attributes at integer pixel candidates.

    t fields broadcast against px/py of shape t.x.shape[:-1] + (K,);
    returns (idx, packed) flattened, with rejects routed to the dump slot
    width*height. wireframe=True keeps only covered pixels within half a
    pixel (perpendicular distance) of a triangle edge — the glPolygonMode
    LINE analogue (key P, main.cpp:980-985) on the same exact-coverage,
    depth-tested, perspective-shaded fragments.

    iw_test=False skips the interpolated-1/w positivity test. Inside the
    EXACT coverage domain (bbox <= 128x128, 1/16-snapped coords) the test
    is provably vacuous: accepted pixels have every edge value e_i >= 0
    (biased compare on exact multiples of 1/256), each 1/w_i > _W_MIN > 0
    (tri_ok), f32 products/sums of non-negative terms never round
    negative, and not all three e_i can be 0 (degenerates are culled) —
    so iw > 0 always holds and the 6-op dot product is dead weight. The
    huge class (bbox wider than 128 px) evaluates edges OUTSIDE the exact
    domain where a rounded e_i may be slightly negative, so it keeps the
    spec's test (iw_test=True).
    """
    pcx = px.astype(_F32) + np.float32(0.5)
    pcy = py.astype(_F32) + np.float32(0.5)
    x = [t.x[..., i, None] for i in range(3)]
    y = [t.y[..., i, None] for i in range(3)]

    # Edge functions evaluated relative to the bbox-min pixel center: the
    # scalar part C carries the (possibly large, off-screen) vertex
    # offsets, the vector part sees only small in-window deltas. Inside
    # the exactness domain every term is an exact multiple of 1/256 below
    # 2^24 so e is the exact edge value; outside it, the op sequence is
    # reproduced verbatim by the Pallas engine so the two backends stay
    # bit-identical even where f32 rounds.
    fs = np.float32(FRONT_SIGN)
    ox = t.px0.astype(_F32)[..., None] + np.float32(0.5)
    oy = t.py0.astype(_F32)[..., None] + np.float32(0.5)
    rx = pcx - ox
    ry = pcy - oy

    def edge(xa, ya, xb, yb):
        DX = (xb - xa) * fs
        DY = (yb - ya) * fs
        c = DX * (oy - ya) - DY * (ox - xa)
        e = (DX * ry - DY * rx) + c
        # top-left rule as ONE compare: e is an exact multiple of 1/256
        # inside the exactness domain (1/16-snapped coords), so
        # (e > 0) | ((e == 0) & topleft)  ==  e > (topleft ? -1/512 : 1/512).
        # The Pallas engine reads the same +-1/512 bias precomputed in the
        # record (_setup_t row 29-31), keeping the two paths bit-identical
        # (outside the exact domain both evaluate the same biased compare).
        topleft = (DY < 0.0) | ((DY == 0.0) & (DX > 0.0))
        bias = jnp.where(topleft, np.float32(-1 / 512), np.float32(1 / 512))
        return e, e > bias, DX, DY

    e0, a0, dx0, dy0 = edge(x[1], y[1], x[2], y[2])   # opposite vertex 0
    e1, a1, dx1, dy1 = edge(x[2], y[2], x[0], y[0])
    e2, a2, dx2, dy2 = edge(x[0], y[0], x[1], y[1])
    inside = a0 & a1 & a2
    if wireframe:
        # a covered pixel is on the wire iff its perpendicular distance to
        # some edge is <= 0.5 px (GL 1-px line width): dist = e/|D| with e
        # the orientation-normalized edge value (>= 0 inside), so test
        # (2e)^2 <= |D|^2 — square-free of rsqrt, and the op sequence is
        # mirrored verbatim in the Pallas engine for bit-parity
        def on_edge(e, DX, DY):
            e2 = e + e
            return e2 * e2 <= DX * DX + DY * DY

        inside = inside & (on_edge(e0, dx0, dy0) | on_edge(e1, dx1, dy1)
                           | on_edge(e2, dx2, dy2))

    # Barycentric attributes with inv_area folded into per-triangle
    # coefficients (one scalar mul per attribute instead of three full
    # l0/l1/l2 products per fragment). The 1/w perspective divide cancels
    # between the interpolated normal and its own normalization, so the
    # shade n.l is computed from the UNNORMALIZED screen-interpolated
    # normal*(1/w) — mathematically identical to GL's divide-then-normalize
    # (main.cpp:361-365, 373-380), cheaper by three divisions per fragment.
    # NOTE: every expression here is kept in op-for-op lockstep with the
    # Pallas fragment engine (coverage_pallas._window_pass) — the two
    # engines are asserted bit-identical.
    ia = t.inv_area[..., None]
    cz = [t.z[..., i, None] * ia for i in range(3)]
    z = (e0 * cz[0] + e1 * cz[1]) + e2 * cz[2]
    n = [(e0 * (t.niw[..., 0, c, None] * ia)
          + e1 * (t.niw[..., 1, c, None] * ia))
         + e2 * (t.niw[..., 2, c, None] * ia) for c in range(3)]
    nlen = jnp.sqrt((n[0] * n[0] + n[1] * n[1]) + n[2] * n[2])
    assert _LIGHT[0] == 0.0          # x term dropped below
    ndotl = (n[1] * np.float32(_LIGHT[1])
             + n[2] * np.float32(_LIGHT[2])) / jnp.where(nlen > 0, nlen, 1.0)
    shade = jnp.sqrt(np.float32(0.001) + jnp.maximum(0.0, ndotl))

    in_vp = ((px >= 0) & (px < width) & (py >= 0) & (py < height)
             & (px <= t.px1[..., None]) & (py <= t.py1[..., None]))
    # depth-clamp semantics at the far plane for fully-inside triangles:
    # interpolated z can exceed 1 by f32 barycentric rounding (sub-ulp at
    # far/near = 2e7, see module docstring) — the quantizer clamps it;
    # only fragments in front of the near plane reject here. Far clipping
    # is the iw > ilim test below (far-straddlers always take an
    # iw_test=True path — raster_frame/raster_frame_pallas route them to
    # the huge class).
    ok = live[..., None] & inside & in_vp & (z >= -1.0)
    if iw_test:
        ciw = [t.iw[..., i, None] * ia for i in range(3)]
        iw = (e0 * ciw[0] + e1 * ciw[1]) + e2 * ciw[2]
        # iw > ilim is the view-space far clip: ilim = 1/far for
        # far-straddlers (iw < 1/far <=> w > far), -1 (vacuous) otherwise
        ok = ok & (iw > 0.0) & (iw > t.ilim[..., None])

    # depth clamps to 2^21 - 2 (not -1): the all-ones packed word is the
    # _EMPTY sentinel, and a far-plane-clamped fully-lit fragment must not
    # alias it (it would decode as background). Lower clamps are dropped:
    # accepted fragments have z >= -1 (so the scaled depth >= 0 exactly)
    # and shade >= sqrt(0.001) > 0; rejected lanes may go negative but are
    # masked to _EMPTY below (same values as the spec's full clip).
    zq = jnp.minimum((z * 0.5 + 0.5) * np.float32(2**_DEPTH_BITS - 1),
                     np.float32(2**_DEPTH_BITS - 2)).astype(_I32)
    sq = jnp.minimum(shade * np.float32(2**_SHADE_BITS - 1),
                     np.float32(2**_SHADE_BITS - 1)).astype(_I32)
    packed = (zq << _SHADE_BITS) | sq
    idx = jnp.where(ok, py * width + px, width * height)
    # CONTRACT: `packed` is only meaningful where idx < width*height.
    # Rejected lanes carry an out-of-range negative f32->i32 cast
    # (backend-defined bits, possibly INT_MIN — which would win any
    # min-merge); every consumer MUST mask by the dump index before
    # comparing (buf[:n_pix] slice here, idx < width*height in the
    # Pallas huge-triangle pass).
    return idx.reshape(-1), packed.reshape(-1)


def _compact_indices(mask, cap: int):
    """Indices of the first `cap` set lanes, padded with N (a dump row).
    Returns (idxs (cap,), count ()).

    Sort-based: masked-out lanes key to N, so ascending sort yields the
    set positions in original order followed by pad. On TPU one sort of
    984k i32 measures 1.7 ms where the cumsum+scatter formulation costs
    8.6 ms (XLA scatters lower to ~7 ns/element loops)."""
    n = mask.shape[0]
    keys = jnp.where(mask, jnp.arange(n, dtype=_I32), jnp.int32(n))
    idxs = jax.lax.sort(keys)[:cap]
    return idxs, jnp.sum(mask.astype(_I32))


# Packed triangle-record layout: one (N + 1, 32) f32 matrix so every
# compaction is a single row gather (TPU gathers of contiguous 32-wide rows
# are ~an order of magnitude cheaper than 25 independent scalar gathers).
# The extra last row is all-zero: gathering the pad index yields live=0.
_REC_COLS = 32


def _pack_tris(t: _Tris):
    n = t.live.shape[0]
    cols = [t.x, t.y, t.z, t.iw,                       # 12
            t.niw.reshape(n, 9),                       # 21
            t.inv_area[:, None],                       # 22
            t.px0[:, None].astype(_F32), t.py0[:, None].astype(_F32),
            t.px1[:, None].astype(_F32), t.py1[:, None].astype(_F32),  # 26
            t.live[:, None].astype(_F32),              # 27
            t.ilim[:, None]]                           # 28
    m = jnp.concatenate([c.astype(_F32) for c in cols], axis=1)
    m = jnp.pad(m, ((0, 1), (0, _REC_COLS - m.shape[1])))
    return m                                           # (n + 1, 32)


def _unpack_tris(m) -> _Tris:
    n = m.shape[0]
    return _Tris(
        x=m[:, 0:3], y=m[:, 3:6], z=m[:, 6:9], iw=m[:, 9:12],
        niw=m[:, 12:21].reshape(n, 3, 3), inv_area=m[:, 21],
        px0=m[:, 22].astype(_I32), py0=m[:, 23].astype(_I32),
        px1=m[:, 24].astype(_I32), py1=m[:, 25].astype(_I32),
        live=m[:, 26] > 0.5,
        ilim=m[:, 27])


def _gather_packed(m, idxs):
    """Row-gather of packed records; the pad index hits the zero row."""
    n = m.shape[0] - 1
    safe = jnp.minimum(idxs, n)
    return jnp.take(m, safe, axis=0)


def _pack_tris_t(t: _Tris):
    """Transposed twin of _pack_tris: (32, n + 1) with records as COLUMNS.

    TPU gathers along the lane axis run ~10x faster than row gathers of
    128-byte records (measured 0.03 vs 1.85 ms for a 38912-record class at
    the 1080p LOD workload), so the Pallas engine packs column-major and
    gathers with take(axis=1)."""
    n = t.live.shape[0]
    rows = [t.x.T, t.y.T, t.z.T, t.iw.T,               # 12
            t.niw.reshape(n, 9).T,                     # 21
            t.inv_area[None, :],                       # 22
            t.px0[None, :].astype(_F32), t.py0[None, :].astype(_F32),
            t.px1[None, :].astype(_F32), t.py1[None, :].astype(_F32),  # 26
            t.live[None, :].astype(_F32),              # 27
            t.ilim[None, :]]                           # 28
    m = jnp.concatenate([r.astype(_F32) for r in rows], axis=0)
    m = jnp.pad(m, ((0, _REC_COLS - m.shape[0]), (0, 1)))
    return m                                           # (32, n + 1)


def _setup_t(clip, normal, valid, width: int, height: int, cell_mask=None,
             far_w=None):
    """Fused SoA twin of _setup + _pack_tris_t for the Pallas engine.

    _setup materializes (N, 3) / (N, 3, 3) per-triangle arrays whose tiny
    minor dims force tiled relayout copies (measured ~4.7 ms of the 1080p
    frame); this variant keeps every field a flat (N,) lane-major array and
    emits the (32, N) record matrix directly. All arithmetic is the
    same op sequence as _setup + _fragments' per-triangle prologue, so
    fragment values stay bit-identical.

    Record rows (all f32): 0-8 edge constants (DX, DY, c) for the edges
    opposite vertices 0/1/2 (FRONT_SIGN and bbox-min folded); 9-11 z and
    12-14 1/w barycentric coefficients, inv_area folded; 15-23 normal*1/w
    coefficients (vertex-major x,y,z), inv_area folded; 24-27 clamped
    bbox (px0, py0, px1, py1); 28 live * far-floor (0 dead / -1 live /
    +1/far_w live far-straddler — see the row-28 comment below); 29-31
    per-edge top-left accept bias (+-1/512, see _fragments' one-compare
    fill rule).

    The candidate index space here is (parity, q, r, c) over the FULL
    G x G grid flattened to lane-major (Q, G*G) rows — cells in the last
    grid row/column are dead padding (masked in live), so N = 2*Q*G*G
    (~6% more rows than _setup's exact cell count, for arrays whose minor
    dim is a clean multiple of 128 throughout). Corner access is lane
    rotation (jnp.roll), not slicing; the cyclic wrap only touches dead
    cells. Candidate ORDER therefore differs from _setup — harmless, the
    framebuffer min-composite is order-independent.

    Returns (tm (32, N), live (N,), bw (N,), bh (N,))."""
    w4 = clip[..., 3]
    ok_w = valid & (w4 > _W_MIN)
    inv_w = jnp.where(ok_w, 1.0 / jnp.where(ok_w, w4, 1.0), 0.0)
    sx = (clip[..., 0] * inv_w * 0.5 + 0.5) * np.float32(width)
    sy = (0.5 - clip[..., 1] * inv_w * 0.5) * np.float32(height)
    sx = jnp.round(sx * SNAP) * INV_SNAP
    sy = jnp.round(sy * SNAP) * INV_SNAP
    z = clip[..., 2] * inv_w
    nxw = normal[..., 0] * inv_w
    nyw = normal[..., 1] * inv_w
    nzw = normal[..., 2] * inv_w

    q, g = w4.shape[0], w4.shape[1]

    def tri3(a):
        """(Q, G, G) -> three (N,) vertex arrays, N = 2*Q*G*G, parity-major
        candidate order (the _tri_corners cell/triangle rule)."""
        a = a.reshape(q, g * g)
        g00 = a
        g10 = jnp.roll(a, -g, axis=1)
        g01 = jnp.roll(a, -1, axis=1)
        g11 = jnp.roll(g10, -1, axis=1)

        def st(p0, p1):
            return jnp.concatenate([p0, p1], axis=0).reshape(-1)

        return st(g00, g01), st(g10, g10), st(g01, g11)

    x0, x1, x2 = tri3(sx)
    y0, y1, y2 = tri3(sy)
    z0, z1, z2 = tri3(z)
    w0, w1, w2 = tri3(inv_w)
    nx0, nx1, nx2 = tri3(nxw)
    ny0, ny1, ny2 = tri3(nyw)
    nz0, nz1, nz2 = tri3(nzw)
    o0, o1, o2 = tri3(ok_w)
    tri_ok = o0 & o1 & o2
    # cells in the last grid row/column are wrap padding, never real
    cell_ok = np.zeros((g, g), bool)
    cell_ok[:g - 1, :g - 1] = True
    if cell_mask is not None:
        # (2, G-1, G-1) static mask of drawn cell triangles, parity-major
        cm = np.asarray(cell_mask)
        full = np.zeros((2, g, g), bool)
        full[:, :g - 1, :g - 1] = cm
        full = full & cell_ok[None]
        tri_ok = tri_ok & jnp.asarray(
            np.broadcast_to(full[:, None], (2, q, g, g)).reshape(-1))
    else:
        tri_ok = tri_ok & jnp.asarray(
            np.broadcast_to(cell_ok[None, None], (2, q, g, g)).reshape(-1))

    area2 = ((x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)) * FRONT_SIGN
    front = area2 > 0.0

    min_x = jnp.minimum(jnp.minimum(x0, x1), x2)
    max_x = jnp.maximum(jnp.maximum(x0, x1), x2)
    min_y = jnp.minimum(jnp.minimum(y0, y1), y2)
    max_y = jnp.maximum(jnp.maximum(y0, y1), y2)
    px0 = jnp.ceil(min_x - 0.5).astype(_I32)
    px1 = jnp.floor(max_x - 0.5).astype(_I32)
    py0 = jnp.ceil(min_y - 0.5).astype(_I32)
    py1 = jnp.floor(max_y - 0.5).astype(_I32)
    px0c = jnp.maximum(px0, 0)
    py0c = jnp.maximum(py0, 0)
    px1c = jnp.minimum(px1, width - 1)
    py1c = jnp.minimum(py1, height - 1)
    nonempty = (px0c <= px1c) & (py0c <= py1c)

    live = tri_ok & front & nonempty
    inv_area = jnp.where(live, 1.0 / jnp.where(live, area2, 1.0), 0.0)

    # Per-triangle scalar invariants PRECOMPUTED here (lane-parallel)
    # instead of per record on the kernels' scalar unit: the bbox-min-
    # relative edge constants and the inv_area-folded attribute
    # coefficients are ~35 scalar ops per triangle, and the class kernels
    # are partly scalar-bound. Same op sequence as _fragments/_one_triangle
    # used inline, so fragment values stay bit-identical.
    ox = px0c.astype(_F32) + np.float32(0.5)
    oy = py0c.astype(_F32) + np.float32(0.5)

    def edge_consts(xa, ya, xb, yb):
        DX = (xb - xa) * FRONT_SIGN
        DY = (yb - ya) * FRONT_SIGN
        c = DX * (oy - ya) - DY * (ox - xa)
        topleft = (DY < 0.0) | ((DY == 0.0) & (DX > 0.0))
        # accept-bias for the one-compare top-left rule (see _fragments):
        # precomputed lane-parallel here; per record on the kernel's scalar
        # unit it would cost ~12 scalar ops
        bias = jnp.where(topleft, np.float32(-1 / 512), np.float32(1 / 512))
        return DX, DY, c, bias

    dx0, dy0, c0, b0 = edge_consts(x1, y1, x2, y2)     # opposite vertex 0
    dx1, dy1, c1, b1 = edge_consts(x2, y2, x0, y0)
    dx2, dy2, c2, b2 = edge_consts(x0, y0, x1, y1)

    # row 28 is the live flag AND the fragment 1/w floor in one value:
    # 0 = dead; -1 = live, no far clip; +1/far_w = live FAR-STRADDLER
    # (some vertex at w > far_w; view-space far test — see the module
    # docstring's precision analysis). Span kernels test < -0.5 for
    # liveness (far-straddlers never reach them: raster_frame_pallas
    # routes them to the huge class, the only path interpolating 1/w);
    # the huge kernel tests != 0 for liveness and iw > row28 for the far
    # clip (vacuous at -1). No extra record row needed.
    if far_w is not None:
        wv0, wv1, wv2 = tri3(w4)
        far_straddle = ((wv0 > _F32(far_w)) | (wv1 > _F32(far_w))
                        | (wv2 > _F32(far_w)))
        ilim = jnp.where(far_straddle, _F32(1.0 / far_w), _F32(-1.0))
    else:
        ilim = _F32(-1.0)
    rows = [dx0, dy0, c0, dx1, dy1, c1, dx2, dy2, c2,
            z0 * inv_area, z1 * inv_area, z2 * inv_area,
            w0 * inv_area, w1 * inv_area, w2 * inv_area,
            nx0 * inv_area, ny0 * inv_area, nz0 * inv_area,
            nx1 * inv_area, ny1 * inv_area, nz1 * inv_area,
            nx2 * inv_area, ny2 * inv_area, nz2 * inv_area,
            px0c.astype(_F32), py0c.astype(_F32),
            px1c.astype(_F32), py1c.astype(_F32),
            live.astype(_F32) * ilim,
            b0, b1, b2]
    rows += [jnp.zeros_like(dx0)] * (_REC_COLS - len(rows))
    # no pad column: _gather_packed_t masks out-of-range indices to zero
    # records instead (the old (·, N+1) pad column cost a 0.4 ms XLA pad
    # copy of the 33 MB record matrix every frame)
    tm = jnp.concatenate([r[None, :].astype(_F32) for r in rows], axis=0)
    # aligned 8-row block span: how many sublane-aligned framebuffer row
    # blocks the clamped bbox touches — the Pallas ladder bins by this
    # (window height exactly 8*span, no alignment padding rows)
    span = (py1c // 8) - (py0c // 8) + 1
    return tm, live, px1c - px0c + 1, py1c - py0c + 1, span


def _quad_live_t(clip, valid, width: int, height: int, cell_mask=None):
    """Per-quad liveness + exact live-triangle count, mirroring _setup_t.

    Returns (quad_live (Q,) bool, n_live () i32). quad_live[q] is True iff
    ANY of quad q's cell triangles is live under EXACTLY _setup_t's rules
    (same snapped coordinates, winding/area, bbox-nonempty, cell mask), so
    compacting quads by this mask before _setup_t drops only quads that
    contribute no fragments — the rasterized image is unchanged. ~25 ops
    per candidate lane, ~0.1 ms at the 1080p LOD workload; it buys an ~8x
    smaller candidate space for the sort/record/gather stages (the LOD
    leaf set covers the whole planet, but only ~10-25% of rendered quads
    face the camera inside the frustum)."""
    w4 = clip[..., 3]
    ok_w = valid & (w4 > _W_MIN)
    inv_w = jnp.where(ok_w, 1.0 / jnp.where(ok_w, w4, 1.0), 0.0)
    sx = (clip[..., 0] * inv_w * 0.5 + 0.5) * np.float32(width)
    sy = (0.5 - clip[..., 1] * inv_w * 0.5) * np.float32(height)
    sx = jnp.round(sx * SNAP) * INV_SNAP
    sy = jnp.round(sy * SNAP) * INV_SNAP

    q, g = w4.shape[0], w4.shape[1]

    def tri3(a):
        a = a.reshape(q, g * g)
        g00 = a
        g10 = jnp.roll(a, -g, axis=1)
        g01 = jnp.roll(a, -1, axis=1)
        g11 = jnp.roll(g10, -1, axis=1)
        return (jnp.stack([g00, g01]), jnp.stack([g10, g10]),
                jnp.stack([g01, g11]))                     # (2, Q, G*G)

    x0, x1, x2 = tri3(sx)
    y0, y1, y2 = tri3(sy)
    o0, o1, o2 = tri3(ok_w)
    tri_ok = o0 & o1 & o2
    cell_ok = np.zeros((g, g), bool)
    cell_ok[:g - 1, :g - 1] = True
    if cell_mask is not None:
        cm = np.asarray(cell_mask)
        full = np.zeros((2, g, g), bool)
        full[:, :g - 1, :g - 1] = cm
        full = full & cell_ok[None]
        cell_keep = jnp.asarray(full.reshape(2, 1, g * g))
    else:
        cell_keep = jnp.asarray(cell_ok.reshape(1, 1, g * g))
    tri_ok = tri_ok & cell_keep

    area2 = ((x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)) * FRONT_SIGN
    front = area2 > 0.0
    min_x = jnp.minimum(jnp.minimum(x0, x1), x2)
    max_x = jnp.maximum(jnp.maximum(x0, x1), x2)
    min_y = jnp.minimum(jnp.minimum(y0, y1), y2)
    max_y = jnp.maximum(jnp.maximum(y0, y1), y2)
    px0 = jnp.ceil(min_x - 0.5)
    px1 = jnp.floor(max_x - 0.5)
    py0 = jnp.ceil(min_y - 0.5)
    py1 = jnp.floor(max_y - 0.5)
    nonempty = ((jnp.maximum(px0, 0.0) <= jnp.minimum(px1, width - 1))
                & (jnp.maximum(py0, 0.0) <= jnp.minimum(py1, height - 1)))
    live = tri_ok & front & nonempty                       # (2, Q, G*G)
    # near-plane straddlers are NOT live (tri_ok fails on w <= _W_MIN) but
    # must survive quad compaction — the clip pass (raster/nearclip.py)
    # draws their visible parts. Same per-vertex rules as straddle_mask_t:
    # det3 front-face + lateral-frustum-outcode pre-filters.
    from planet_tpu.raster import nearclip
    f4 = clip[..., 2] + w4
    straddle = nearclip.straddle_from_verts(
        tri3(valid), tri3(w4 <= _W_MIN), tri3(f4 > 0.0),
        tri3(clip[..., 0]), tri3(clip[..., 1]), tri3(w4)) & cell_keep
    keep = (live | straddle).any(axis=(0, 2))
    return keep, jnp.sum(live.astype(_I32))


def _gather_packed_t(mt, idxs):
    """Column-gather of transposed records -> (32, len(idxs)), records
    still as COLUMNS (same values as _gather_packed; out-of-range indices
    — the compaction's dump value — yield all-zero records via a post-
    gather mask, replacing the old physical pad column).

    The result stays in the (32, K) lane-major layout end to end: the
    Pallas kernels read records as (32, TRI_BLOCK) column blocks, so no
    row-major (K, 32) relayout is ever forced. The relayout was the
    hidden cost of this stage — the gather itself is ~free (fused lane
    take), but materializing (K, 32){1,0} for a row-record kernel
    operand cost ~0.85 ms per 65k records at 1080p (tiny-minor-dim tiled
    copy). The barrier stops XLA from fusing the gather into every
    downstream consumer."""
    n = mt.shape[1]
    safe = jnp.minimum(idxs, n - 1)
    g = jnp.where((idxs < n)[None, :], jnp.take(mt, safe, axis=1),
                  jnp.float32(0.0))
    return jax.lax.optimization_barrier(g)


def _row_job_pass(tt_m, job_idx, max_bh: int, win_w: int,
                  width: int, height: int, wireframe: bool = False):
    """Evaluate one compacted row-job class: job j covers pixels
    (py0+row, px0 .. px0+win_w-1) of its triangle. job_idx indexes the
    (tri_cap * max_bh) flat job space; the pad index maps to a dead row."""
    tri = (job_idx // max_bh).astype(_I32)
    row = (job_idx % max_bh).astype(_I32)
    tj = _unpack_tris(_gather_packed(tt_m, tri))
    py = (tj.py0 + row)[:, None]
    px = tj.px0[:, None] + jnp.arange(win_w, dtype=_I32)[None, :]
    live = tj.live & (row < (tj.py1 - tj.py0 + 1))
    # row-job classes are bbox <= 128x64: inside the exact coverage domain,
    # so the interpolated-1/w test is provably vacuous (see _fragments)
    return _fragments(tj, live, px, jnp.broadcast_to(py, px.shape),
                      width, height, wireframe, iw_test=False)


def _huge_pass(buf, t: _Tris, width: int, height: int,
               wireframe: bool = False):
    """Sequential full-screen raster of the (rare) huge triangles: scan over
    the compacted slots, each an elementwise coverage test + packed min over
    the whole framebuffer."""
    cap = t.live.shape[0]
    py, px = jnp.mgrid[0:height, 0:width]
    px = px.astype(_I32).reshape(-1)
    py = py.astype(_I32).reshape(-1)

    def body(buf, ti):
        one = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, ti, 1, axis=0), t)
        idx, packed = _fragments(one, one.live, px[None, :], py[None, :],
                                 width, height, wireframe)
        packed = jnp.where(idx < width * height, packed, _EMPTY)
        return jnp.minimum(buf, packed), None

    buf, _ = jax.lax.scan(body, buf, jnp.arange(cap))
    return buf


# Row-job width ladder: (row width, job cap). A live triangle emits one JOB
# per pixel row of its bbox (so candidate lanes track true bbox area, not a
# square window — the LOD workload is dominated by wide, short triangles at
# grazing angles); each job lands in the narrowest width class covering its
# bbox width. Caps overflowing is reported (RasterCounters.overflowed),
# never silent. Defaults sized ~1.3x the measured 1080p device-step demand.
ROW_LADDER = ((4, 65536), (8, 131072), (16, 262144),
              (32, 393216), (64, 131072), (128, 32768))
TRI_CAP = 131072       # live-triangle compaction bound
MAX_BH = 64            # bbox rows handled by jobs; taller goes to huge


def decode_packed(img_packed, background: float = 0.0):
    """(H, W) packed int32 framebuffer -> (image, depth). The packed layout
    (21-bit quantized NDC depth, 10-bit shade; _EMPTY for background) is
    closed under elementwise/min composition, so multi-chip rendering
    composites shards with `lax.pmin` on the packed buffer and decodes
    once (parallel/sharded_lod.py)."""
    empty = img_packed == _EMPTY
    shade_out = (img_packed & (2**_SHADE_BITS - 1)).astype(_F32) \
        / np.float32(2**_SHADE_BITS - 1)
    image = jnp.where(empty, np.float32(background), shade_out)
    depth = jnp.where(
        empty, np.float32(np.inf),
        ((img_packed >> _SHADE_BITS).astype(_F32)
         / np.float32(2**_DEPTH_BITS - 1)) * 2.0 - 1.0)
    return image, depth


def raster_frame(clip, normal, valid, width: int, height: int, *,
                 ladder=ROW_LADDER, tri_cap: int = TRI_CAP,
                 max_bh: int = MAX_BH, huge_cap: int = 16,
                 background: float = 0.0, cell_mask=None,
                 decode: bool = True, wireframe: bool = False,
                 clip_cap: int = 512, clip_run_cap: int = 64,
                 far_w=None):
    """Rasterize a batch of tessellated patches with exact triangle coverage.

    Args:
      clip:   (Q, G, G, 4) f32 clip-space patch grid positions.
      normal: (Q, G, G, 3) f32 world-space shading normals (pre-Lambert).
      valid:  (Q, G, G) bool vertex validity (active patch x grid mask).

    Returns (image (H, W) f32, depth (H, W) f32 NDC z with +inf empties,
    RasterCounters); with decode=False, (packed (H, W) i32, RasterCounters).
    """
    t = _setup(clip, normal, valid, width, height, cell_mask, far_w=far_w)
    bw = t.px1 - t.px0 + 1
    bh = t.py1 - t.py0 + 1
    max_w = ladder[-1][0]

    # triangles small enough for row jobs; the rest take the full-screen
    # pass. Far-straddlers (ilim > 0) always take the full-screen pass:
    # it is the path that interpolates 1/w for the view-space far clip.
    eligible = t.live & (bh <= max_bh) & (bw <= max_w) & ~(t.ilim > 0.0)
    tm = _pack_tris(t)
    tri_idx, n_live = _compact_indices(eligible, tri_cap)
    tt_m = _gather_packed(tm, tri_idx)
    tt_m = jnp.pad(tt_m, ((0, 1), (0, 0)))       # job pad row
    tt = _unpack_tris(tt_m[:-1])
    tbw = tt.px1 - tt.px0 + 1
    tbh = tt.py1 - tt.py0 + 1

    # flat job space: (tri_cap, max_bh) -> job (i, r) live iff r < bh_i
    rows = jnp.arange(max_bh, dtype=_I32)[None, :]
    job_live = tt.live[:, None] & (rows < tbh[:, None])
    jbw = jnp.broadcast_to(tbw[:, None], job_live.shape)

    n_pix = width * height
    frags = []
    n_per_class = []
    overflowed = n_live > tri_cap

    prev = 0
    for win_w, cap in ladder:
        in_class = (job_live & (jbw > prev) & (jbw <= win_w)).reshape(-1)
        prev = win_w
        jidx, n_cls = _compact_indices(in_class, cap)
        frags.append(_row_job_pass(tt_m, jidx, max_bh, win_w, width, height,
                                   wireframe))
        n_per_class.append(n_cls)
        overflowed = overflowed | (n_cls > cap)

    # depth-test all emitted fragments (single dump slot at n_pix)
    idx = jnp.concatenate([f[0] for f in frags])
    packed = jnp.concatenate([f[1] for f in frags])
    idx, packed = jax.lax.optimization_barrier((idx, packed))
    buf = jnp.full((n_pix + 1,), _EMPTY, _I32)
    buf = buf.at[idx].min(packed)
    buf = buf[:n_pix]

    # huge: full-screen scan, skipped entirely when none exist
    need_huge = t.live & ~eligible
    hg_idx, n_huge = _compact_indices(need_huge, huge_cap)
    th = _unpack_tris(_gather_packed(tm, hg_idx))
    overflowed = overflowed | (n_huge > huge_cap)

    # near-plane straddlers (some vertex at w <= _W_MIN, some visible):
    # Sutherland-Hodgman clipped into 1-2 triangles each (GL parity,
    # raster/nearclip.py) and rasterized by the same full-screen pass.
    # The mask's det3 + frustum-outcode filters keep only straddlers whose
    # clipped parts can reach the screen, so the clip machinery (and its
    # full-screen slots) sits behind the cond with the huge pass.
    from planet_tpu.raster import nearclip
    smask = nearclip.straddle_mask_t(clip, valid, cell_mask)
    n_straddle = jnp.sum(smask.astype(_I32))
    overflowed = overflowed | (n_straddle > clip_cap)

    # huge and clipped passes gate on SEPARATE conds (each full-screen
    # slot costs the whole framebuffer): a frame with straddlers but no
    # huge triangles — or vice versa — only pays for the set it has.
    buf = jax.lax.cond(
        n_huge > 0,
        lambda b: _huge_pass(b, th, width, height, wireframe),
        lambda b: b, buf)

    def _clipped(b):
        s_idx, _ = _compact_indices(smask, clip_cap)
        tclip = nearclip.clipped_tris(clip, normal, s_idx, width, height,
                                      far_w=far_w)
        lidx, n_live_clip = _compact_indices(tclip.live, clip_run_cap)
        keep = lidx < tclip.live.shape[0]
        sel = jnp.minimum(lidx, tclip.live.shape[0] - 1)
        tliv = jax.tree.map(lambda a: jnp.take(a, sel, axis=0), tclip)
        tliv = tliv._replace(live=tliv.live & keep)
        return (_huge_pass(b, tliv, width, height, wireframe),
                n_live_clip.astype(_I32))

    buf, n_live_clip = jax.lax.cond(
        n_straddle > 0, _clipped, lambda b: (b, jnp.int32(0)), buf)
    overflowed = overflowed | (n_live_clip > clip_run_cap)

    img_packed = buf.reshape(height, width)
    counters = RasterCounters(
        n_tris=jnp.sum(t.live.astype(_I32)),
        n_per_class=jnp.stack(n_per_class + [n_huge]),
        n_huge=n_huge, overflowed=overflowed, n_straddle=n_straddle)
    if not decode:
        return img_packed, counters
    image, depth = decode_packed(img_packed, background)
    return image, depth, counters
