"""Pallas fragment engine for the exact-coverage rasterizer (TPU).

The XLA row-job formulation (raster/coverage.py) is scatter-bound on TPU:
XLA lowers both the per-class job compactions and the framebuffer
scatter-min to ~7-25 ns/element loops (measured 565 ms for the 1080p LOD
frame, tools/bench_raster_parts.py). This module replaces the fragment
path with a Pallas kernel that keeps the WHOLE framebuffer resident in
VMEM (1920x1080 int32 = 8.3 MB of ~16 MB) and turns the depth test into
dense vector min updates — no scatters anywhere:

* Triangles are binned by how many ALIGNED 8-row framebuffer blocks their
  bbox spans (1/2/3/4/8/16 blocks; width is uniform) and compacted once;
  each class launches one kernel whose window height is EXACTLY
  8*span — binning by raw bbox height instead costs every triangle up to
  8 alignment padding rows (measured ~23% extra window rows at 1080p).
* Each triangle evaluates coverage/depth/shade over an ALIGNED window:
  rows [py0c, py0c + 8*span), cols [px0a, px0a + 128) with px0a a
  multiple of 128 — lane alignment keeps the read-modify-write on the
  VMEM framebuffer on native vector tiles.
* The window min-merge IS the LEQUAL depth test: packed keys are the
  shared (21-bit quantized depth, 10-bit shade) layout of coverage.py, so
  results are interchangeable with (and tested against) the XLA path.

Coverage decisions reuse coverage._setup's snapped screen coordinates and
evaluate the identical f32 edge functions (Mosaic does not contract FMA,
matching the scalar spec). Bbox width is unbounded (the class kernel
fori-loops over the bbox's aligned 128-lane column blocks, so cost tracks
true width); triangles spanning more than 16 aligned row blocks take the
bbox-bounded huge-triangle kernel. Triangles beyond a class cap set the
overflow counter, never vanish silently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planet_tpu.raster import coverage as cov, nearclip
from planet_tpu.raster.splat import _DEPTH_BITS, _EMPTY, _SHADE_BITS

_F32 = jnp.float32
_I32 = jnp.int32

WIN_W = 128                      # one lane-aligned framebuffer block
MAX_BW = 128   # kept for measurement tools; the ladder itself is width-unbounded
SPAN_CLASSES = (1, 2, 3, 4, 8, 16)   # aligned 8-row block-span ladder
# per-class triangle caps: ~1.35x the measured static 1080p LOD demand
# (15067/22611/7696/2098/888/14 at 20 km altitude), rounded to TRI_BLOCK.
# Dead records (cap padding) cost one scalar flag read each, but the
# extra grid steps of oversized caps are NOT free (~0.4 ms for 2.5x caps
# at 1080p), so defaults fit the typical scene and heavier workloads pass
# their own sizes (engine raster_cfg; e.g. the moving orbit's horizon
# frames need (24576, 36864, 14336, 5120, 5120, 2048) + huge 1536 —
# tools/debug_overflow.py). Overflow is counted, never silent.
DEFAULT_CAPS = (20352, 30592, 10496, 2944, 1280, 128)
DEFAULT_HUGE_CAP = 64
TRI_BLOCK = 16                   # triangles per grid step
HUGE_BLOCK = 8                   # huge records per grid step
TR_BLOCK = 128                   # record columns per transpose-kernel step


def _raster_class_kernel(winh: int, width_pad: int, wireframe: bool,
                         flag_ref, rec_ref, fb_in_ref, fb_ref):
    """One grid step: TRI_BLOCK triangles' (winh, WIN_W) window updates,
    winh = 8 * the class's aligned block span (exactly the rows the bbox
    can touch — no alignment padding; a conditional spill-window variant
    was tried and measured SLOWER than folding alignment into the class).

    The framebuffer blocks use a constant index map, so both stay VMEM-
    resident across the whole grid; the OUTPUT block starts undefined and
    is seeded from the (HBM-aliased) input once, then accumulated.

    There is NO per-triangle liveness branch: class compaction places all
    live records first, so dead records are a contiguous tail — whole-dead
    blocks skip under one any_live test, and the single boundary block's
    dead records self-neutralize (zero records fail every biased edge
    compare, so they min-merge _EMPTY over window (0, 0): a no-op). The
    straight-line TRI_BLOCK body lets Mosaic overlap record t+1's scalar
    setup with record t's vector window (the small classes were measured
    scalar/branch-bound at ~4x the big classes' per-row cost).

    There is also no per-record WIDTH branch on the common path: the class
    sort places records by min(n_extra, 2) — narrow (bbox inside one
    128-lane block, ~85-90% at 1080p), then exactly-two-block, then wider
    — so homogeneous blocks run straight-line bodies: a per-record
    `pl.when(n_extra > 0)` around the extra-block fori was measured to
    cost ~56 ns on EVERY record, branch taken or not (2.7x the whole
    narrow body; tools/microbench_span4.py), because it fences Mosaic's
    cross-record software pipelining. The two-block body is also straight-
    line (second window statically emitted, offset clamped so a narrow
    record in the one mixed boundary block degenerates to an idempotent
    duplicate min-merge); only blocks containing a 3+-block record (rare
    grazing silhouettes) pay the branchy fori body."""

    @pl.when(pl.program_id(0) == 0)
    def _seed():
        fb_ref[:, :] = fb_in_ref[:, :]

    # skip fully-dead record blocks (oversized caps cost ~nothing) and
    # pick the block's width body from PRE-REDUCED per-block flags:
    # flag[0] = min over the block of row 28 (live = -1, dead = 0;
    # far-straddlers, the only positive values, never reach the span
    # classes — coverage._setup_t), flag[1] = max of row 14 (n_extra).
    # Round-5 change: reducing these lane-parallel in _block_flags
    # replaces a 3*TRI_BLOCK chained scalar-read reduction here that
    # priced EVERY record ~13.5 ns of "empty" floor (the skip test itself
    # was the floor — tools/microbench_span4.py).
    any_live = flag_ref[0, 0] < -0.5
    any_wide = flag_ref[0, 1] > 0.5
    any_wide2 = flag_ref[0, 1] > 1.5

    # static iotas shared by every triangle in the block (integer iota +
    # cast: Mosaic has no f32 iota)
    rowf = jax.lax.broadcasted_iota(_I32, (winh, WIN_W), 0).astype(_F32)
    colf = jax.lax.broadcasted_iota(_I32, (winh, WIN_W), 1).astype(_F32)

    def _block(mode):
        # static unroll: dynamic-t fori_loop variants measurably lose
        # Mosaic's cross-record static scheduling (measured +18% kernel)
        def f():
            for t in range(TRI_BLOCK):
                _one_triangle(winh, width_pad, wireframe, rec_ref, fb_ref,
                              t, rowf, colf, mode=mode)
        return f

    pl.when(any_live & ~any_wide)(_block("narrow"))
    pl.when(any_live & any_wide & ~any_wide2)(_block("two"))
    pl.when(any_live & any_wide2)(_block("general"))


def _one_triangle(winh: int, width_pad: int, wireframe: bool, rec_ref,
                  fb_ref, t, rowf, colf, mode: str = "general"):
    """Rasterize record t into its bbox's aligned (winh, 128) window(s).

    All per-triangle invariants arrive PRECOMPUTED in the record: edge
    constants + top-left accept biases and inv_area-folded attribute
    coefficients from coverage._setup_t (rows 0-11, 15-23, 29-31), and the
    window ADDRESSING — clamped aligned row start, aligned column block
    start, straddle flag, bbox bounds relative to the window origin — from
    _class_fixup (rows 12-14, 24-27). The kernel's scalar unit does two
    f32->i32 casts and one compare per record; everything else is vector.

    Edge functions restate as e = DX*ry - DY*rx + C with ry/rx exact
    integer-valued f32 window deltas — every term is an exact multiple of
    1/256 well below 2^24, so e is the exact mathematical edge value and
    coverage stays bit-identical to the XLA path (coverage._fragments).
    The interpolated-1/w test is omitted: provably vacuous inside this
    exact domain (see coverage._fragments' iw_test note). inv_area is
    pre-multiplied into the attribute coefficients and the 1/w perspective
    divide cancels against the normal's own normalization — the two
    fragment pipelines are kept in op-for-op lockstep.

    The bbox may span ANY number of aligned 128-lane column blocks: the
    first block is a static pass (most triangles are narrow), the rest run
    in a fori_loop whose trip count comes from the record — cost tracks
    the true bbox width, so grazing-angle wide triangles stay on the span
    ladder instead of exploding the huge class (measured 1395 wide-huge
    triangles on one descending-orbit frame)."""
    f = _F32
    # rows 12-13 carry BLOCK indices; the in-kernel *8 / *128 lets Mosaic
    # prove the dynamic framebuffer slice offsets are tile-aligned (a raw
    # precomputed offset crashes its vector.load lowering)
    py0c = rec_ref[t, 12].astype(_I32) * 8
    px0b = rec_ref[t, 13].astype(_I32)
    px0a = px0b * 128
    if mode == "general":
        n_extra = rec_ref[t, 14].astype(_I32)  # column blocks past the 1st
    px0r = rec_ref[t, 24]
    px1r = rec_ref[t, 25]
    py0r = rec_ref[t, 26]
    py1r = rec_ref[t, 27]

    ec0 = (rec_ref[t, 0], rec_ref[t, 1], rec_ref[t, 2], rec_ref[t, 29])
    ec1 = (rec_ref[t, 3], rec_ref[t, 4], rec_ref[t, 5], rec_ref[t, 30])
    ec2 = (rec_ref[t, 6], rec_ref[t, 7], rec_ref[t, 8], rec_ref[t, 31])

    cz0, cz1, cz2 = rec_ref[t, 9], rec_ref[t, 10], rec_ref[t, 11]
    cnx0, cny0, cnz0 = rec_ref[t, 15], rec_ref[t, 16], rec_ref[t, 17]
    cnx1, cny1, cnz1 = rec_ref[t, 18], rec_ref[t, 19], rec_ref[t, 20]
    cnx2, cny2, cnz2 = rec_ref[t, 21], rec_ref[t, 22], rec_ref[t, 23]

    # row coverage is shared by both window passes
    ry = rowf - py0r
    rowok = (rowf >= py0r) & (rowf <= py1r)

    def window(cf, px0a_i):
        # window pixel deltas from the bbox-min pixel center: exact
        # integer-valued f32, identical to _fragments' (pc - o) values
        rx = cf - px0r

        def edge(DX, DY, c, bias):
            e = (DX * ry - DY * rx) + c
            # one-compare top-left rule, bias from the record (lockstep
            # with coverage._fragments' biased compare)
            return e, e > bias

        e0, a0 = edge(*ec0)
        e1, a1 = edge(*ec1)
        e2, a2 = edge(*ec2)
        inside = a0 & a1 & a2
        if wireframe:
            # (2e)^2 <= |D|^2 edge-distance test, op-for-op the XLA
            # path's coverage._fragments wireframe predicate (bit-parity)
            def on_edge(e, DX, DY):
                e2w = e + e
                return e2w * e2w <= DX * DX + DY * DY

            inside = inside & (on_edge(e0, ec0[0], ec0[1])
                               | on_edge(e1, ec1[0], ec1[1])
                               | on_edge(e2, ec2[0], ec2[1]))

        z = (e0 * cz0 + e1 * cz1) + e2 * cz2
        nx = (e0 * cnx0 + e1 * cnx1) + e2 * cnx2
        ny = (e0 * cny0 + e1 * cny1) + e2 * cny2
        nz = (e0 * cnz0 + e1 * cnz1) + e2 * cnz2
        nlen = jnp.sqrt((nx * nx + ny * ny) + nz * nz)
        ndl = (ny * f(cov._LIGHT[1])
               + nz * f(cov._LIGHT[2])) / jnp.where(nlen > f(0.0), nlen,
                                                    f(1.0))
        shade = jnp.sqrt(f(0.001) + jnp.maximum(f(0.0), ndl))

        in_box = (cf >= px0r) & (cf <= px1r) & rowok
        # near fragment test only: far-straddlers never reach the span
        # classes (routed to the huge kernel, which interpolates the 1/w
        # the view-space far clip needs — coverage module docstring)
        ok = inside & in_box & (z >= f(-1.0))

        # lower clamps dropped (accepted z >= -1 and shade > 0; rejected
        # lanes mask to _EMPTY) — same values as coverage._fragments
        zq = jnp.minimum((z * f(0.5) + f(0.5)) * f(2**_DEPTH_BITS - 1),
                         f(2**_DEPTH_BITS - 2)).astype(_I32)
        sq = jnp.minimum(shade * f(2**_SHADE_BITS - 1),
                         f(2**_SHADE_BITS - 1)).astype(_I32)
        packed = jnp.where(ok, (zq << _SHADE_BITS) | sq, _EMPTY)

        old = fb_ref[pl.ds(py0c, winh), pl.ds(px0a_i, WIN_W)]
        fb_ref[pl.ds(py0c, winh), pl.ds(px0a_i, WIN_W)] = \
            jnp.minimum(old, packed)

    window(colf, px0a)
    if mode == "narrow":
        return
    if mode == "two":
        # second window, straight-line: clamp keeps a narrow record in the
        # mixed boundary block in bounds (its second window duplicates the
        # first — fragments recompute bit-identically and the min-merge is
        # idempotent; true two-block records never clamp, their px1 block
        # is a valid window start by construction). Clamp the BLOCK index
        # and multiply after: Mosaic must statically prove the framebuffer
        # slice offset is 128-aligned, and min() of raw offsets breaks
        # that proof.
        blk2 = jnp.minimum(px0b + 1, width_pad // 128 - 1)
        px0a2 = blk2 * 128
        window(colf + (px0a2 - px0a).astype(_F32), px0a2)
        return

    @pl.when(n_extra > 0)
    def _more_blocks():
        def body(j, carry):
            window(colf + (j * 128).astype(_F32), px0a + j * 128)
            return carry

        jax.lax.fori_loop(1, n_extra + 1, body, 0)


def _huge_class_kernel(width_pad: int, height_pad: int, wireframe: bool,
                       rec_ref, fb_in_ref, fb_ref):
    """One grid step: HUGE_BLOCK huge triangles (bbox taller than the span
    ladder) each rasterized over exactly its bbox's aligned (32, 128)
    tiles, via two scalar-bounded fori_loops. Replaces the XLA full-screen
    scan (coverage._huge_pass), which paid the whole 1080p framebuffer per
    slot (~4 ms/frame whenever a huge triangle was live). Work here is
    proportional to bbox area; the fragment math is the same op sequence
    as _one_triangle (bit-parity with coverage._fragments). Batching
    HUGE_BLOCK records per step with a whole-dead skip keeps the ~1.5k-cap
    grid cheap when only a handful are live (horizon-silhouette frames of
    the moving orbit carry ~1150, normal frames ~10)."""

    @pl.when(pl.program_id(0) == 0)
    def _seed():
        fb_ref[:, :] = fb_in_ref[:, :]

    # row 28: 0 dead, -1 live, +1/far_w live far-straddler
    any_live = rec_ref[0, 28] != 0.0
    for t in range(1, HUGE_BLOCK):
        any_live = any_live | (rec_ref[t, 28] != 0.0)

    def _block():
        for t in range(HUGE_BLOCK):
            _one_huge(height_pad, wireframe, rec_ref, fb_ref, t)

    pl.when(any_live)(_block)


def _one_huge(height_pad: int, wireframe: bool, rec_ref, fb_ref, t):
    f = _F32
    # row 28: 0 dead, -1 live, +1/far_w live far-straddler (view-space
    # far clip via interpolated 1/w — coverage._setup_t row-28 comment)
    ilim = rec_ref[t, 28]
    live = ilim != f(0.0)
    px0 = rec_ref[t, 24].astype(_I32)
    py0 = rec_ref[t, 25].astype(_I32)
    px1 = rec_ref[t, 26].astype(_I32)
    py1 = rec_ref[t, 27].astype(_I32)

    ec0 = (rec_ref[t, 0], rec_ref[t, 1], rec_ref[t, 2], rec_ref[t, 29])
    ec1 = (rec_ref[t, 3], rec_ref[t, 4], rec_ref[t, 5], rec_ref[t, 30])
    ec2 = (rec_ref[t, 6], rec_ref[t, 7], rec_ref[t, 8], rec_ref[t, 31])

    cz0, cz1, cz2 = rec_ref[t, 9], rec_ref[t, 10], rec_ref[t, 11]
    cw0, cw1, cw2 = rec_ref[t, 12], rec_ref[t, 13], rec_ref[t, 14]
    cnx0, cny0, cnz0 = rec_ref[t, 15], rec_ref[t, 16], rec_ref[t, 17]
    cnx1, cny1, cnz1 = rec_ref[t, 18], rec_ref[t, 19], rec_ref[t, 20]
    cnx2, cny2, cnz2 = rec_ref[t, 21], rec_ref[t, 22], rec_ref[t, 23]

    STRIP = 32
    rowi = jax.lax.broadcasted_iota(_I32, (STRIP, 128), 0)
    coli = jax.lax.broadcasted_iota(_I32, (STRIP, 128), 1)
    rowf = rowi.astype(f)
    colf = coli.astype(f)

    def do_block(bi, sy):
        px0a = bi * 128
        rx = colf - (px0 - px0a).astype(f)
        ry = rowf - (py0 - sy).astype(f)

        def edge(DX, DY, c, bias):
            e = (DX * ry - DY * rx) + c
            # one-compare top-left rule, bias precomputed in the record
            return e, e > bias

        e0, a0 = edge(*ec0)
        e1, a1 = edge(*ec1)
        e2, a2 = edge(*ec2)
        inside = a0 & a1 & a2
        if wireframe:
            def on_edge(e, DX, DY):
                e2w = e + e
                return e2w * e2w <= DX * DX + DY * DY

            inside = inside & (on_edge(e0, ec0[0], ec0[1])
                               | on_edge(e1, ec1[0], ec1[1])
                               | on_edge(e2, ec2[0], ec2[1]))

        z = (e0 * cz0 + e1 * cz1) + e2 * cz2
        iw = (e0 * cw0 + e1 * cw1) + e2 * cw2
        nx = (e0 * cnx0 + e1 * cnx1) + e2 * cnx2
        ny = (e0 * cny0 + e1 * cny1) + e2 * cny2
        nz = (e0 * cnz0 + e1 * cnz1) + e2 * cnz2
        nlen = jnp.sqrt((nx * nx + ny * ny) + nz * nz)
        ndl = (ny * f(cov._LIGHT[1])
               + nz * f(cov._LIGHT[2])) / jnp.where(nlen > f(0.0), nlen,
                                                    f(1.0))
        shade = jnp.sqrt(f(0.001) + jnp.maximum(f(0.0), ndl))

        in_box = ((coli >= px0 - px0a) & (coli <= px1 - px0a)
                  & (rowi >= py0 - sy) & (rowi <= py1 - sy))
        # huge triangles evaluate edges OUTSIDE the exact coverage domain,
        # so the spec's interpolated-1/w positivity test stays (see
        # coverage._fragments' iw_test note)
        # iw > ilim is the view-space far clip (ilim = 1/far for
        # far-straddlers, -1 = vacuous otherwise)
        ok = (inside & in_box & (z >= f(-1.0)) & (iw > f(0.0))
              & (iw > ilim))

        zq = jnp.minimum((z * f(0.5) + f(0.5)) * f(2**_DEPTH_BITS - 1),
                         f(2**_DEPTH_BITS - 2)).astype(_I32)
        sq = jnp.minimum(shade * f(2**_SHADE_BITS - 1),
                         f(2**_SHADE_BITS - 1)).astype(_I32)
        packed = jnp.where(ok, (zq << _SHADE_BITS) | sq, _EMPTY)

        old = fb_ref[pl.ds(sy, STRIP), pl.ds(px0a, 128)]
        fb_ref[pl.ds(sy, STRIP), pl.ds(px0a, 128)] = \
            jnp.minimum(old, packed)
        return sy

    def do_strip(si, _):
        # height_pad is a multiple of 8, not STRIP: clamp the last strip
        # start (overlapping windows recompute identical fragments, and
        # the min-merge is idempotent). The trailing *8 keeps the offset
        # provably 8-aligned for Mosaic.
        sy = jnp.minimum(si * (STRIP // 8), (height_pad - STRIP) // 8) * 8
        jax.lax.fori_loop(px0 // 128, px1 // 128 + 1, do_block, sy)
        return 0

    def _scan():
        jax.lax.fori_loop(py0 // STRIP, py1 // STRIP + 1, do_strip, 0)

    pl.when(live)(_scan)


@functools.partial(jax.jit, static_argnames=(
    "cap", "width_pad", "height_pad", "interpret", "wireframe"))
def _run_huge(records, fb, *, cap, width_pad, height_pad,
              interpret=False, wireframe=False):
    """records (cap, 32) f32 huge-class records -> fb' min-merged.
    cap must be a multiple of HUGE_BLOCK (compaction places live records
    first, so whole-dead blocks skip)."""
    if cap % HUGE_BLOCK:
        raise ValueError(
            f"huge cap {cap} must be a multiple of HUGE_BLOCK={HUGE_BLOCK}")
    kernel = functools.partial(_huge_class_kernel, width_pad, height_pad,
                               wireframe)
    return pl.pallas_call(
        kernel,
        grid=(cap // HUGE_BLOCK,),
        in_specs=[
            pl.BlockSpec((HUGE_BLOCK, 32), lambda i: (i, 0),
                         memory_space=REC_SPACE),
            pl.BlockSpec((height_pad, width_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((height_pad, width_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height_pad, width_pad), jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(records, fb)


REC_SPACE = pltpu.SMEM       # triangle records: scalar reads come from SMEM
                             # (VMEM scalar extracts measurably dominate)


def _class_fixup(recs_t, winh: int, width_pad: int, height_pad: int):
    """Precompute the per-class window addressing into the record matrix.

    Rows 12-14 of the shared record matrix hold the 1/w barycentric
    coefficients — dead weight for the span classes (the interpolated-1/w
    test is provably vacuous inside the exact coverage domain, see
    coverage._fragments) — and rows 24-27 the raw clamped bbox. Replace
    them with what the kernel actually needs, computed lane-parallel here
    instead of on the kernel's scalar unit (~12 scalar ops/record saved;
    the small classes were measured scalar-bound):

      12: py0c / 8 — clamped aligned window row BLOCK (winh-dependent)
      13: px0a / 128 — aligned window column BLOCK
      14: extra column blocks beyond the first (the kernel's per-record
          fori trip count; 0 for bboxes inside one 128-lane block)
      24: px0 - px0a   25: px1 - px0a   (bbox cols rel. window origin)
      26: py0 - py0c   27: py1 - py0c   (bbox rows rel. window origin)

    All values are exact small integers in f32. The pad column (all-zero
    record) maps to window (0, 0) with a [0,0]x[0,0] bbox; its zero edge
    constants fail every biased compare, so it min-merges _EMPTY — a
    no-op. The huge class keeps the raw layout (its kernel scans the raw
    bbox and keeps the 1/w test)."""
    px0, py0 = recs_t[24], recs_t[25]
    px1, py1 = recs_t[26], recs_t[27]
    f = jnp.float32
    pyblk = jnp.clip(jnp.floor(py0 * f(0.125)), 0,
                     (height_pad - winh) // 8)
    py0c = pyblk * f(8.0)
    blk0 = jnp.clip(jnp.floor(px0 * f(1.0 / 128.0)), 0,
                    (width_pad - WIN_W) // 128)
    px0a = blk0 * f(128.0)
    # px1 is clamped to width-1 < width_pad, so the end block never
    # overruns the padded framebuffer
    n_extra = jnp.maximum(jnp.floor(px1 * f(1.0 / 128.0)) - blk0, 0.0)
    addr = jnp.stack([pyblk, blk0, n_extra])
    rel = jnp.stack([px0 - px0a, px1 - px0a, py0 - py0c, py1 - py0c])
    return jnp.concatenate([recs_t[:12], addr, recs_t[15:24], rel,
                            recs_t[28:]], axis=0)


def _tr_kernel(in_ref, out_ref):
    out_ref[:, :] = in_ref[:, :].T


@functools.partial(jax.jit, static_argnames=("interpret",))
def _transpose_records(recs_t, interpret=False):
    """(32, cap) record columns -> (cap, 32) row records, as a Pallas
    relayout kernel. XLA's transpose of this shape lowers to a tiled copy
    costing ~0.85 ms per 65k records at 1080p (tiny minor dim); in-kernel
    vreg transposes of (32, TR_BLOCK) tiles run at ~bandwidth, so the
    class gathers stay lane-major end to end and the row-record kernels
    (SMEM (TRI_BLOCK, 32) blocks with static scalar indexing) keep their
    fast layout. cap must be a multiple of TR_BLOCK."""
    cap = recs_t.shape[1]
    if cap % TR_BLOCK:
        raise ValueError(f"cap {cap} must be a multiple of {TR_BLOCK}")
    return pl.pallas_call(
        _tr_kernel,
        grid=(cap // TR_BLOCK,),
        in_specs=[pl.BlockSpec((32, TR_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TR_BLOCK, 32), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap, 32), jnp.float32),
        interpret=interpret,
    )(recs_t)


def _block_flags(recs_t):
    """Per-TRI_BLOCK skip/width flags, reduced lane-parallel from the
    POST-FIXUP transposed record matrix (32, cap): column 0 = min of row
    28 (any-live test), column 1 = max of row 14 (n_extra -> width body).
    Two scalar reads per grid step replace the kernel's former
    3*TRI_BLOCK chained scalar-read reduction (~13.5 ns/record of floor,
    tools/microbench_span4.py)."""
    cap = recs_t.shape[1]
    live = recs_t[28].reshape(cap // TRI_BLOCK, TRI_BLOCK)
    wide = recs_t[14].reshape(cap // TRI_BLOCK, TRI_BLOCK)
    return jnp.stack([jnp.min(live, axis=1), jnp.max(wide, axis=1)],
                     axis=1)


@functools.partial(jax.jit, static_argnames=(
    "winh", "cap", "width_pad", "height_pad", "interpret", "wireframe"))
def _run_class(records, fb, flags=None, *, winh, cap, width_pad,
               height_pad, interpret=False, wireframe=False):
    """records (cap, 32) f32 row records -> fb' with all class triangles
    min-merged. flags: (cap // TRI_BLOCK, 2) from _block_flags; computed
    here from the row records when omitted (standalone tool use)."""
    if cap % TRI_BLOCK:
        raise ValueError(
            f"class cap {cap} must be a multiple of TRI_BLOCK={TRI_BLOCK} "
            "(the grid would silently drop the trailing records)")
    if flags is None:
        flags = jnp.stack(
            [jnp.min(records[:, 28].reshape(-1, TRI_BLOCK), axis=1),
             jnp.max(records[:, 14].reshape(-1, TRI_BLOCK), axis=1)],
            axis=1)
    kernel = functools.partial(_raster_class_kernel, winh, width_pad,
                               wireframe)
    return pl.pallas_call(
        kernel,
        grid=(cap // TRI_BLOCK,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TRI_BLOCK, 32), lambda i: (i, 0),
                         memory_space=REC_SPACE),
            pl.BlockSpec((height_pad, width_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((height_pad, width_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height_pad, width_pad), jnp.int32),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(flags, records, fb)


def raster_frame_auto(clip, normal, valid, width: int, height: int, *,
                      cell_mask=None, background: float = 0.0,
                      decode: bool = True, wireframe: bool = False,
                      **kw):
    """Backend dispatch for the exact-coverage raster: the Pallas fragment
    engine on TPU, the XLA row-job path elsewhere (CPU tests/dryruns).

    kw: capacity overrides (quad_cap, caps, huge_cap, clip_cap,
    clip_run_cap) forwarded to the Pallas engine — the engine passes these
    through build_device_render(raster_cfg=...) to size the record ladder
    to the workload (the defaults fit the quality=1 1080p LOD scene; a
    reference-shape ~1k-leaf scene needs ~2.5x). The XLA fallback only
    understands the subset it shares."""
    if jax.default_backend() == "tpu":
        return raster_frame_pallas(clip, normal, valid, width, height,
                                   cell_mask=cell_mask,
                                   background=background, decode=decode,
                                   wireframe=wireframe, **kw)
    xla_kw = {k: v for k, v in kw.items()
              if k in ("huge_cap", "clip_cap", "clip_run_cap", "far_w")}
    return cov.raster_frame(clip, normal, valid, width, height,
                            cell_mask=cell_mask, background=background,
                            decode=decode, wireframe=wireframe, **xla_kw)


def raster_frame_pallas(clip, normal, valid, width: int, height: int, *,
                        caps=DEFAULT_CAPS,
                        huge_cap: int = DEFAULT_HUGE_CAP,
                        background: float = 0.0,
                        cell_mask=None, interpret: bool = False,
                        decode: bool = True, wireframe: bool = False,
                        quad_cap: int = 128, clip_cap: int = 512,
                        clip_run_cap: int = 64, far_w=None):
    """Drop-in twin of coverage.raster_frame running the fragment path as
    Pallas window kernels. Returns (image, depth, RasterCounters), or
    (packed, counters) when decode=False.

    quad_cap: when the batch has more than quad_cap quads, quads with no
    live triangle (backfacing / out of frustum / dead) are compacted away
    BEFORE triangle setup (coverage._quad_live_t — exact same liveness
    rules, so the image is unchanged). The LOD leaf set covers the whole
    planet while only ~10-25% of quads face the camera in-frustum, so
    this shrinks the sort/record/gather candidate space ~4-8x. More than
    quad_cap live quads sets the overflow counter (never silent). None
    disables."""
    n_tris_full = None
    overflow_quads = jnp.bool_(False)
    if quad_cap is not None and clip.shape[0] > quad_cap:
        qlive, n_tris_full = cov._quad_live_t(clip, valid, width, height,
                                              cell_mask)
        qidx, nq = cov._compact_indices(qlive, quad_cap)
        sel = jnp.minimum(qidx, clip.shape[0] - 1)
        keep = qidx < clip.shape[0]
        clip = jnp.take(clip, sel, axis=0)
        normal = jnp.take(normal, sel, axis=0)
        valid = jnp.take(valid, sel, axis=0) & keep[:, None, None]
        overflow_quads = nq > quad_cap

    # Fused SoA setup + transposed record pack: every field stays a flat
    # (N,) lane-major array end to end (coverage._setup_t) — the XLA
    # path's (N, 3) AoS intermediates cost ~4.7 ms in tiled relayout
    # copies at 1080p, and records-as-COLUMNS makes the per-class gathers
    # lane-axis takes (~10x cheaper than 128-byte row gathers). The
    # barrier materializes the matrix ONCE; without it XLA fuses the
    # construction into every class's gather.
    tm, live, bw, bh, span = cov._setup_t(clip, normal, valid, width,
                                          height, cell_mask, far_w=far_w)
    tm = jax.lax.optimization_barrier(tm)
    # any width is eligible (the class kernel fori-loops over the bbox's
    # 128-lane column blocks); only span (bbox row blocks) picks the
    # class. Far-straddlers (row 28 > 0) route to the huge kernel — the
    # only fragment path interpolating the 1/w the view-space far clip
    # needs (coverage module docstring).
    eligible = live & (span <= SPAN_CLASSES[-1]) & ~(tm[28] > 0.0)

    width_pad = -(-max(width, WIN_W) // 128) * 128
    height_pad = -(-max(height, 8 * SPAN_CLASSES[-1]) // 8) * 8
    fb = jnp.full((height_pad, width_pad), _EMPTY, jnp.int32)

    # ONE keyed sort compacts every class at once: key =
    # (3*class + min(n_extra, 2))*(n+1) + pos, ascending sort groups
    # classes contiguously in original order, sub-ordered narrow / two-
    # block / wider — homogeneous record blocks then take the class
    # kernels' branch-free straight-line bodies (the per-record width
    # branch cost ~56 ns/record, see _raster_class_kernel). Each class
    # slices its segment at the running-count offset and masks strays
    # (class id check) to the pad row. This replaces six separate
    # sort-compactions and an intermediate 131k-row gather (~10 ms of the
    # frame on TPU).
    n = live.shape[0]
    stride = jnp.int32(n + 1)
    stride3 = jnp.int32(3 * (n + 1))
    pos = jnp.arange(n, dtype=_I32)
    # tm rows 24/26 are the clamped bbox px0/px1 (exact small ints in f32)
    nblk = (jnp.floor(tm[26] * _F32(1.0 / 128.0))
            - jnp.floor(tm[24] * _F32(1.0 / 128.0))).astype(_I32)
    sub = jnp.minimum(nblk, 2)
    # class ids: 0..len(SPAN_CLASSES)-1 span ladder, then huge, then
    # near-plane straddlers (disjoint from live — they fail tri_ok), dead
    cid_straddle = len(SPAN_CLASSES) + 1
    cid_dead = len(SPAN_CLASSES) + 2
    class_id = jnp.full((n,), cid_dead, _I32)
    straddle = nearclip.straddle_mask_t(clip, valid, cell_mask)
    class_id = jnp.where(straddle, jnp.int32(cid_straddle), class_id)
    need_huge = live & ~eligible
    class_id = jnp.where(need_huge, len(SPAN_CLASSES), class_id)
    for c in reversed(range(len(SPAN_CLASSES))):
        class_id = jnp.where(eligible & (span <= SPAN_CLASSES[c]),
                             jnp.int32(c), class_id)
    sorted_keys = jax.lax.sort(class_id * stride3 + sub * stride + pos)
    # pad with dead keys so fixed-size class slices exist even when the
    # scene has fewer triangles than a class cap
    pad_len = max(max(caps), huge_cap, clip_cap)
    sorted_keys = jnp.pad(sorted_keys, (0, pad_len),
                          constant_values=cid_dead * 3 * (n + 1))

    counts = [jnp.sum((class_id == c).astype(_I32))
              for c in range(len(SPAN_CLASSES) + 2)]

    def _segment(c, off, cap):
        seg = jax.lax.dynamic_slice(sorted_keys, (off,), (cap,))
        return jnp.where(seg // stride3 == c, seg % stride, jnp.int32(n))

    n_per_class = []
    overflowed = jnp.bool_(False)
    off = jnp.int32(0)
    for c, (cspan, cap) in enumerate(zip(SPAN_CLASSES, caps)):
        idxs = _segment(c, off, cap)
        off = off + counts[c]
        recs_t_fixed = _class_fixup(cov._gather_packed_t(tm, idxs),
                                    8 * cspan, width_pad, height_pad)
        recs = _transpose_records(recs_t_fixed, interpret=interpret)
        fb = _run_class(recs, fb, _block_flags(recs_t_fixed),
                        winh=8 * cspan, cap=cap,
                        width_pad=width_pad, height_pad=height_pad,
                        interpret=interpret, wireframe=wireframe)
        n_per_class.append(counts[c])
        overflowed = overflowed | (counts[c] > cap)

    # huge triangles: bbox-bounded Pallas scan (one grid step per record,
    # fori_loops over the bbox's 32x128 tiles — see _huge_class_kernel).
    # The tiny huge class pays the XLA relayout (.T of (32, huge_cap)).
    hg_idx = _segment(len(SPAN_CLASSES), off, huge_cap)
    off = off + counts[len(SPAN_CLASSES)]
    n_huge = counts[len(SPAN_CLASSES)]
    recs_h = cov._gather_packed_t(tm, hg_idx).T
    overflowed = overflowed | (n_huge > huge_cap)
    fb = jax.lax.cond(
        n_huge > 0,
        lambda b: _run_huge(recs_h, b, cap=huge_cap, width_pad=width_pad,
                            height_pad=height_pad, interpret=interpret,
                            wireframe=wireframe),
        lambda b: b, fb)

    # near-plane straddlers: Sutherland-Hodgman clipped into 1-2 triangles
    # each (GL parity, raster/nearclip.py), rasterized by the same
    # bbox-bounded huge kernel. The mask's det3 + frustum-outcode filters
    # keep only straddlers whose clipped parts can reach the screen (a
    # handful, near-surface flight only), so the whole gather/clip/record
    # pass sits behind one cond and costs nothing at altitude.
    n_straddle = counts[cid_straddle]
    overflowed = overflowed | (n_straddle > clip_cap)

    def _run_clipped(b):
        s_idx = _segment(cid_straddle, off, clip_cap)
        tclip = nearclip.clipped_tris(clip, normal, s_idx, width, height,
                                      far_w=far_w)
        lidx, n_live_clip = cov._compact_indices(tclip.live, clip_run_cap)
        keep = lidx < tclip.live.shape[0]
        sel = jnp.minimum(lidx, tclip.live.shape[0] - 1)
        tliv = jax.tree.map(lambda a: jnp.take(a, sel, axis=0), tclip)
        tliv = tliv._replace(live=tliv.live & keep)
        recs_c = nearclip.records_from_tris(tliv)
        b = _run_huge(recs_c, b, cap=clip_run_cap, width_pad=width_pad,
                      height_pad=height_pad, interpret=interpret,
                      wireframe=wireframe)
        return b, n_live_clip.astype(_I32)

    fb, n_live_clip = jax.lax.cond(
        n_straddle > 0, _run_clipped,
        lambda b: (b, jnp.int32(0)), fb)
    overflowed = overflowed | (n_live_clip > clip_run_cap)

    img_packed = fb[:height, :width]
    counters = cov.RasterCounters(
        n_tris=(jnp.sum(live.astype(_I32)) if n_tris_full is None
                else n_tris_full),
        n_per_class=jnp.stack(n_per_class + [n_huge]),
        n_huge=n_huge, overflowed=overflowed | overflow_quads,
        n_straddle=n_straddle)
    if not decode:
        return img_packed, counters
    image, depth = cov.decode_packed(img_packed, background)
    return image, depth, counters
