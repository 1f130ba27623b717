"""One-kernel cube-sphere heightfield: coords + noise + normals + shade.

The full-frame regen step (BASELINE config 2: 6x2048^2 texels of ridged-6
terrain + central-difference normals + Lambert shade, reference
main.cpp:123-151 GenerateHeightMap, 338-346 compute_normal, 369-381 shade)
was previously composed from XLA pieces around the flat noise kernel:
facemesh.face_grid_points_df built double-float sphere points in XLA
(~600 MB of HBM intermediates), the noise kernel read them back, and
normals/shade made further full-grid HBM passes. On a v5e the noise kernel
itself ran at ~2.9 Gtexels/s (8.8 ms) while the XLA plumbing around it cost
another ~12 ms — the frame was HBM-traffic-bound, not compute-bound.

This kernel fuses the entire frame step so NOTHING but the two outputs
(heights, shade) ever touches HBM:

* **In-kernel coordinates from iota.** A cube face is an axis-aligned
  parallelogram of the +-1 cube, so the cube-space position at texel
  (row, col) is q_j = C_j + A_j*a + B_j*b with per-face constants
  A,B,C in {-1,0,1} (exactly one nonzero per component; derived from
  geom.cubesphere.root_corners at trace time, same u/v winding) and
  a = (2*col+1-n)/n, b = (2*row+1-n)/n. For power-of-two n these are EXACT
  small-mantissa float32 values — the entire cube-space bilinear needs no
  double-float at all. Only the sphere normalization radius/sqrt(1+a^2+b^2)
  runs in double-float (in-kernel mirrors of nums.df.sqrt/div), and because
  a^2, b^2 are exact, 1+a^2+b^2 needs just two quick_two_sums. ~100 VPU
  ops/texel, vs ~380 for the generic DF bilinear+normalize — and the
  normalized direction is mathematically identical to bilinear interpolation
  of the normalized corners (uniform |corner| = sqrt(3) scales out).
* **Sequential halo carry.** Normals need the 4 neighbours. The grid walks
  each face's blocks in order on one core, so the +-1-image-row halo (the
  reference's overscan strategy, main.cpp:135-148) is NOT recomputed per
  block: a VMEM scratch carries the last 2*(n/128) computed noise rows from
  block b to block b+1, whose top halo they are exactly (same absolute
  coords => bit-identical values). Only a face's first block evaluates its
  own 2-row top strip, and the off-face half of that strip is junk that the
  row_c == 0 edge clamp masks. Net recompute overhead is ~0.1% (was 6.25%
  at 512-row blocks; the carry bought ~1.1 ms of the 2048 frame). The
  col +-1 neighbours are lane rolls with a row-carry fix at lanes 0/127;
  face edges clamp to the edge texel (replication, exactly the padded
  central difference the XLA path computes).
* Noise itself is the shared multi-octave engine of
  ops.kernels.perlin_pallas (packed pair-table gathers, octave-parallel
  int24 splits) — op-for-op the same accumulation, so this kernel matches
  the flat-kernel heights to the coordinate rounding (~1e-3 m of 8848 m
  amplitude; the f64-oracle parity bar is enforced by tests).

Layout: outputs are (6*n*n/128, 128) blocks, a bitcast-reshape away from
(6, n, n) row-major — callers can sum/consume without any relayout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planet_tpu.ops.kernels import perlin_pallas as pk

_F32 = jnp.float32
_I32 = jnp.int32
LANES = 128
DEFAULT_BLOCK_ROWS = 512


@functools.lru_cache(maxsize=None)
def _device_vmem_bytes() -> int:
    """Per-core VMEM of the local default device. v2/v3 cores have 16 MiB;
    v4 and later (incl. v5e/v5p/v6e) have 128 MiB. Conservative 16 MiB when
    the platform is unknown (CPU interpret runs never reach this)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 16 * 1024 * 1024
    if "v2" in kind or "v3" in kind:
        return 16 * 1024 * 1024
    return 128 * 1024 * 1024


def _max_block_rows_for_vmem() -> int:
    """Largest block_rows the local device's VMEM comfortably fits. The
    octave accumulator's live set measures ~24 KB per block row (512-row
    blocks just fit the default 16 MiB scoped budget), so size against
    3/4 of the device's VMEM: 512 rows on 16 MiB parts (v2/v3), 4096 on
    128 MiB parts (v4+)."""
    budget = _device_vmem_bytes() * 3 // 4
    rows = budget // (48 * LANES * 4)
    p = 128
    while p * 2 <= rows:
        p *= 2
    return p


@functools.lru_cache(maxsize=None)
def _face_affine_np():
    """(6, 3, 3) f32: [face, component j, {C, A, B}] with
    q_j(u, v) = C + A*(2u-1) + B*(2v-1) on the +-1 cube, matching
    root_corners' corner order/winding (u along p0->p1, v along p0->p2)."""
    from planet_tpu.geom import cubesphere

    c = cubesphere.root_corners(1.0) * np.sqrt(3.0)
    c = np.round(c)           # exact +-1 cube corners
    assert np.allclose(c[:, 3], c[:, 1] + c[:, 2] - c[:, 0])
    C = (c[:, 0] + c[:, 3]) / 2
    A = (c[:, 1] - c[:, 0]) / 2
    B = (c[:, 2] - c[:, 0]) / 2
    out = np.stack([C, A, B], axis=-1).astype(np.float32)   # (6, 3, 3)
    assert ((out != 0).sum(axis=-1) == 1).all()
    return out


def _two_prod(a, b):
    split = np.float32(4097.0)
    p = a * b
    ca = split * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = split * b
    bhi = cb - (cb - b)
    blo = b - bhi
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def _df_sqrt(h, l):
    """In-kernel mirror of nums.df.sqrt (Karp + one Newton step)."""
    x = jax.lax.rsqrt(h)
    ax = h * x
    p, e = _two_prod(ax, ax)
    d_hi, d_e = pk._two_sum(h, -p)
    diff = d_hi + (d_e + l - e)
    corr = diff * (x * np.float32(0.5))
    return pk._quick_two_sum(ax, corr)


def _df_div_const(ah, al, bh, bl):
    """In-kernel mirror of nums.df.div for a scalar-constant numerator."""
    q1 = ah / bh
    p, e = _two_prod(q1, bh)
    r_hi, r_e = pk._two_sum(ah, -p)
    r = r_hi + (r_e + al - e - q1 * bl)
    q2 = r / bh
    return pk._quick_two_sum(q1, q2)


def _make_field_kernel(n: int, block_rows: int, kind: str, octaves: int,
                       lacunarity: float, gain: float, k_hi, k_lo,
                       amplitude: float, xyscale: float, light,
                       strip: bool = False):
    log2n = int(n).bit_length() - 1
    hb = n // LANES                 # block-rows per image row
    ext = block_rows + 2 * hb
    nmask = np.int32(n - 1)
    inv_n = np.float32(1.0 / n)
    lx, ly, lz = (np.float32(v) for v in light)
    ny_const = np.float32(2.0 * xyscale)
    amp = np.float32(amplitude)

    def kernel(*refs):
        # strip mode: a leading SMEM scalar carries the TRACED flat-row
        # offset (row0 * n/LANES) — all coordinate math is absolute, so a
        # strip's halo rows (the first block's self-evaluated top strip and
        # the last block's overhang) recompute the NEIGHBOR strip's values
        # bit-identically: the sharded config-5 fast path needs no row
        # ppermute at all (the reference's locally-generated-halo strategy,
        # main.cpp:135-148, at chip granularity)
        if strip:
            (off_ref, abc_ref, ct_ref, pt_ref,
             h_ref, shade_ref, carry_ref) = refs
            off = off_ref[0]
        else:
            abc_ref, ct_ref, pt_ref, h_ref, shade_ref, carry_ref = refs
            off = 0
        f = pl.program_id(0)
        b = pl.program_id(1)
        boff = b * block_rows + off      # absolute flat-row block start

        def eval_heights(base, rows):
            # noise heights for `rows` flat rows starting at flat row
            # base//LANES (halo may run off the face: benign, masked below)
            rr = jax.lax.broadcasted_iota(_I32, (rows, LANES), 0)
            lane = jax.lax.broadcasted_iota(_I32, (rows, LANES), 1)
            idx = base + rr * LANES + lane
            col = idx & nmask
            row = jax.lax.shift_right_arithmetic(idx, np.int32(log2n))

            a = (2 * col + (1 - n)).astype(_F32) * inv_n      # exact f32
            bv = (2 * row + (1 - n)).astype(_F32) * inv_n

            # sphere scale: K/sqrt(1 + a^2 + b^2), K = radius*coord_scale (DF)
            a2 = a * a                           # exact: <= 24-bit products
            b2 = bv * bv
            s1, e1 = pk._quick_two_sum(np.float32(1.0), a2)
            s2, e2 = pk._quick_two_sum(s1, b2)
            n2h, n2l = pk._quick_two_sum(s2, e1 + e2)
            sh, sl = _df_sqrt(n2h, n2l)
            invh, invl = _df_div_const(k_hi, k_lo, sh, sl)

            # cube position per component from the per-face affine constants
            coords = []
            for j in range(3):
                qj = (abc_ref[f, j, 0] + abc_ref[f, j, 1] * a
                      + abc_ref[f, j, 2] * bv)   # exact f32 (one term nonzero)
                p, e = _two_prod(invh, qj)
                e = e + invl * qj
                coords.extend(pk._quick_two_sum(p, e))

            value = pk.accumulate_octaves(kind, octaves, lacunarity, gain,
                                          ct_ref, pt_ref, *coords)
            return value * amp

        # Halo carry: the grid is sequential in b, so the top halo
        # (flat rows [b*BR - hb, b*BR + hb)) is exactly the tail of the
        # previous block's computed span — read it from VMEM scratch instead
        # of recomputing (same absolute coords => bit-identical values).
        # Only the first block of a face evaluates its own top strip; its
        # off-face half (rows < 0) is junk but every use is masked by the
        # row_c == 0 edge clamp below.
        @pl.when(b == 0)
        def _():
            carry_ref[:] = eval_heights((boff - hb) * LANES, 2 * hb)

        h_new = eval_heights((boff + hb) * LANES, block_rows)
        h_ext = jnp.concatenate([carry_ref[:], h_new], axis=0)
        carry_ref[:] = h_new[block_rows - 2 * hb:]

        cs = slice(hb, hb + block_rows)          # center rows
        h_c = h_ext[cs]
        h_u = h_ext[0:block_rows]                # image row - 1
        h_d = h_ext[2 * hb:2 * hb + block_rows]  # image row + 1

        # col +-1: lane roll with row-carry fix at the wrapped lane.
        # (lane_c is a fresh center-sized iota: slicing the row-replicated
        # `lane` iota trips a Mosaic internal check, limits > dim.)
        lane_c = jax.lax.broadcasted_iota(_I32, (block_rows, LANES), 1)
        left = pltpu.roll(h_ext, 1, 1)
        left_c = jnp.where(lane_c == 0,
                           pltpu.roll(left, 1, 0)[cs], left[cs])
        right = pltpu.roll(h_ext, LANES - 1, 1)
        right_c = jnp.where(lane_c == LANES - 1,
                            pltpu.roll(right, ext - 1, 0)[cs], right[cs])

        # face-edge clamp = edge replication (the XLA path's h_pad)
        rr_c = jax.lax.broadcasted_iota(_I32, (block_rows, LANES), 0)
        idx_c = boff * LANES + rr_c * LANES + lane_c
        col_c = idx_c & nmask
        row_c = jax.lax.shift_right_arithmetic(idx_c, np.int32(log2n))
        h_l = jnp.where(col_c == 0, h_c, left_c)
        h_r = jnp.where(col_c == nmask, h_c, right_c)
        h_un = jnp.where(row_c == 0, h_c, h_u)
        h_dn = jnp.where(row_c == nmask, h_c, h_d)

        dx = h_l - h_r
        dy = h_un - h_dn
        inv_len = jax.lax.rsqrt(dx * dx + (ny_const * ny_const) + dy * dy)
        dot = (dx * lx + ny_const * ly + dy * lz) * inv_len
        shade = jnp.sqrt(np.float32(0.001) + jnp.maximum(np.float32(0.0), dot))

        h_ref[:] = h_c
        shade_ref[:] = shade

    return kernel


@functools.lru_cache(maxsize=None)
def _build_field_call(n: int, block_rows: int, kind: str, octaves: int,
                      lacunarity: float, gain: float, k_hi, k_lo,
                      amplitude: float, xyscale: float, light,
                      interpret: bool):
    rows_per_face = n * n // LANES
    nb = rows_per_face // block_rows
    kernel = _make_field_kernel(n, block_rows, kind, octaves, lacunarity,
                                gain, k_hi, k_lo, amplitude, xyscale, light)
    out_spec = pl.BlockSpec((block_rows, LANES),
                            lambda f, b: (f * nb + b, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((8, LANES), lambda f, b: (0, 0),
                              memory_space=pltpu.VMEM)
    abc_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((6 * rows_per_face, LANES), jnp.float32)
    # The default 16 MB *scoped*-VMEM budget caps block_rows at 512; v5e has
    # 128 MB of VMEM, and larger blocks amortize the flat halo recompute
    # (overhead = 2*(n/128)/block_rows). Raise the cap so 1024-row blocks fit,
    # clamped to the local device's VMEM on smaller generations (v2/v3).
    # dimension_semantics pins both grid axes SEQUENTIAL ("arbitrary"): the
    # halo carry in carry_ref is only correct when block b+1 runs after b on
    # the same core — a parallel/megacore partition of the grid would
    # silently corrupt block halos.
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=min(100 * 1024 * 1024,
                             _device_vmem_bytes() * 3 // 4))
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape),
        grid=(6, nb),
        in_specs=[abc_spec] + [table_spec] * 2,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((2 * (n // LANES), LANES), jnp.float32)],
        interpret=interpret,
        compiler_params=params,
    )


@functools.lru_cache(maxsize=None)
def _build_field_strip_call(n: int, rows: int, block_rows: int, kind: str,
                            octaves: int, lacunarity: float, gain: float,
                            k_hi, k_lo, amplitude: float, xyscale: float,
                            light, interpret: bool):
    rows_per_strip = rows * n // LANES
    nb = rows_per_strip // block_rows
    kernel = _make_field_kernel(n, block_rows, kind, octaves, lacunarity,
                                gain, k_hi, k_lo, amplitude, xyscale, light,
                                strip=True)
    out_spec = pl.BlockSpec((block_rows, LANES),
                            lambda f, b: (f * nb + b, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((8, LANES), lambda f, b: (0, 0),
                              memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((6 * rows_per_strip, LANES),
                                     jnp.float32)
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=min(100 * 1024 * 1024,
                             _device_vmem_bytes() * 3 // 4))
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape),
        grid=(6, nb),
        in_specs=[smem_spec, smem_spec] + [table_spec] * 2,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((2 * (n // LANES), LANES), jnp.float32)],
        interpret=interpret,
        compiler_params=params,
    )


def field_cube_strip(n: int, radius: float, row0, rows: int, *,
                     kind="ridged", octaves=6, lacunarity=2.0, gain=0.55,
                     coord_scale=0.00001, amplitude=8848.0, xyscale=None,
                     light=None, block_rows=DEFAULT_BLOCK_ROWS,
                     interpret=None):
    """Fused field for a horizontal strip of `rows` image rows starting at
    TRACED global row `row0` of every face: returns (heights, shade), each
    (6, rows, n) f32 — the sharded config-5 fast path (one chip per strip).

    Coordinates are absolute (in-kernel iota + the traced flat-row
    offset), so the strip's halo rows recompute the NEIGHBOR strip's
    values bit-identically — no row ppermute is needed between chips; only
    the face-edge seams differ from the exchange-mode XLA path (this
    kernel clamps at face edges, seam='clamp'). Strip values equal the
    corresponding rows of field_cube(n) exactly (same absolute-coordinate
    arithmetic; asserted in tests/test_field_pallas.py)."""
    n = int(n)
    rows = int(rows)
    if n & (n - 1) or n % LANES:
        raise ValueError(f"n must be a power-of-two multiple of 128: {n}")
    if (rows * n) % LANES:
        raise ValueError(f"rows*n must be a multiple of {LANES}")
    if kind not in ("fbm", "ridged"):
        raise ValueError(kind)
    if interpret is None:
        interpret = not pk._is_tpu()
    rows_per_strip = rows * n // LANES
    block_rows = min(int(block_rows), rows_per_strip)
    if not interpret:
        block_rows = min(block_rows, _max_block_rows_for_vmem())
    while rows_per_strip % block_rows:
        block_rows //= 2
    block_rows = max(block_rows, 2 * (n // LANES))
    if rows_per_strip % block_rows:
        raise ValueError(
            f"rows={rows} not tileable: strip flat rows {rows_per_strip} "
            f"must divide by block_rows >= {2 * (n // LANES)}")
    if xyscale is None:
        xyscale = (np.pi / 2) * float(radius) / n
    if light is None:
        from planet_tpu.raster import shade as shade_mod
        light = tuple(float(v) for v in np.asarray(shade_mod._LIGHT))
    k = np.float64(radius) * np.float64(coord_scale)
    k_hi = np.float32(k)
    k_lo = np.float32(k - np.float64(k_hi))

    call = _build_field_strip_call(
        n, rows, block_rows, kind, int(octaves), float(lacunarity),
        float(np.float32(gain)), k_hi, k_lo, float(amplitude),
        float(xyscale), tuple(light), bool(interpret))
    off = jnp.asarray(row0, jnp.int32).reshape(1) * jnp.int32(n // LANES)
    abc = jnp.asarray(_face_affine_np())
    h, shade = call(off, abc, *pk._tables_for_kernel())
    return h.reshape(6, rows, n), shade.reshape(6, rows, n)


def field_cube(n: int, radius: float, *, kind="ridged", octaves=6,
               lacunarity=2.0, gain=0.55, coord_scale=0.00001,
               amplitude=8848.0, xyscale=None, light=None,
               block_rows=DEFAULT_BLOCK_ROWS, interpret=None):
    """Fused full-cube heightfield frame: returns (heights, shade), each
    (6, n, n) float32. n must be a power of two and a multiple of 128."""
    n = int(n)
    if n & (n - 1) or n % LANES:
        raise ValueError(f"n must be a power-of-two multiple of 128: {n}")
    if kind not in ("fbm", "ridged"):
        raise ValueError(kind)
    if interpret is None:
        interpret = not pk._is_tpu()
    rows_per_face = n * n // LANES
    block_rows = min(int(block_rows), rows_per_face)
    if not interpret:
        block_rows = min(block_rows, _max_block_rows_for_vmem())
    while rows_per_face % block_rows:
        block_rows //= 2
    # the halo carry needs the previous block to cover a full 2-row halo
    block_rows = max(block_rows, 2 * (n // LANES))
    if xyscale is None:
        xyscale = (np.pi / 2) * float(radius) / n
    if light is None:
        from planet_tpu.raster import shade as shade_mod
        light = tuple(float(v) for v in np.asarray(shade_mod._LIGHT))
    k = np.float64(radius) * np.float64(coord_scale)
    k_hi = np.float32(k)
    k_lo = np.float32(k - np.float64(k_hi))

    call = _build_field_call(n, block_rows, kind, int(octaves),
                             float(lacunarity), float(np.float32(gain)),
                             k_hi, k_lo, float(amplitude), float(xyscale),
                             tuple(light), bool(interpret))
    abc = jnp.asarray(_face_affine_np())
    h, shade = call(abc, *pk._tables_for_kernel())
    return h.reshape(6, n, n), shade.reshape(6, n, n)
