"""Fused Pallas TPU kernel for Perlin fBm / ridged-multifractal noise.

This is the engine's hottest loop (reference GenerateHeightMap -> PerlinRidged
-> PerlinNoise3, main.cpp:123-151, 689-734, perlin.h:50-88): every texel of
every heightmap tile evaluates `octaves` gradient-noise samples, each needing
8 corner hashes through a 3-stage chained 256-entry permutation lookup.

TPU-native design decisions (measured on a v5e chip, tools/microbench_*.py):

* **Lane-wise dynamic gather** for table lookups: Mosaic lowers
  ``jnp.take_along_axis(table, idx, axis=1)`` on (rows, 128) registers to a
  native per-lane gather. This beats one-hot MXU matmuls (~0.1 G/s) and
  XLA's general gather (~0.03 G/s) by two orders of magnitude.
* **Packed pair tables** (round 3): the hash chain always needs the pair
  ``t[i], t[i+1]`` (corner dx/dy/dz in {0,1}, perlin.h:68-75), and a
  256-entry table must live in 128 lanes. One int32 table entry therefore
  packs FOUR values: ``t[l], t[l+1]`` (low half) and ``t[l+128], t[l+129]``
  (high half); a single lane-gather + a bit-7-driven variable shift yields
  both hash values of a corner pair. That is 7 gathers per octave (1 for the
  x stage, 2 for y, 4 for z) instead of the 28 a naive two-gather-per-lookup
  chain costs — the gather stage was the measured 72%-of-time bottleneck in
  round 2.
* **Packed gradient signs**: the final hash stage folds the table lookup,
  ``& 15`` and the 16-gradient-vector selection (perlin.h:30-48) into a
  6-bit-packed sign code (sx+1) | (sy+1)<<2 | (sz+1)<<4, decoded with
  shifts; the dz=0/dz=1 codes of a corner column ride in one packed entry.
* **Double-float coordinates** (planet_tpu.nums.df): the cell/frac split
  needs ~49 mantissa bits at planet scale; the error-free transformations run
  as plain f32 VPU ops inside the kernel.
* **Incremental octave doubling**: with lacunarity exactly 2.0 (the product
  config, main.cpp:828), octave i+1's cell/frac split is derived from octave
  i's by one exact doubling + conditional Sterbenz subtract — bit-identical
  to re-splitting the scaled coordinate (the fraction of the planet-scale
  coordinate spans <= 48 contiguous mantissa bits, so the normalized DF pair
  represents it exactly in both derivations) at a third of the ops.
* **Static octave unroll**: octave count, lacunarity and gain are
  compile-time constants (the terrain functor picks octaves per quad depth,
  main.cpp:823-832), so the whole multi-octave evaluation is one straight-line
  kernel with everything resident in vector registers / VMEM.
* **Flat (rows, 128) layout**: texels are streamed as lane-aligned blocks;
  tile structure is irrelevant to the noise itself and is reshaped away.

Parity contract: identical permutation table and gradient set, identical
index arithmetic, f32 fade evaluated from the f32 fraction (documented
deviation from the reference's double-evaluated fade; error < 2 f32 ulps,
inside the 1e-5 bar — see planet_tpu.ops.perlin docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planet_tpu.ops.tables import PERLIN_TABLE, PERLIN_VECTORS

_F32 = jnp.float32
_I32 = jnp.int32

LANES = 128
DEFAULT_BLOCK_ROWS = 512        # A/B on v5e: 3.45 G ridged-6 texels/s
                                # vs 3.30 at 256 (scoped-VMEM caps 1024)


def _packed_sign_table() -> np.ndarray:
    """P[s] = packed signs of gradient PERLIN_VECTORS[PERLIN_TABLE[s] & 15]."""
    g = PERLIN_VECTORS[PERLIN_TABLE & 15].astype(np.int32)   # (256, 3) in -1..1
    return ((g[:, 0] + 1) | ((g[:, 1] + 1) << 2) | ((g[:, 2] + 1) << 4)).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _packed_tables_np():
    """The two packed pair tables as (8, 128) int32 numpy arrays
    (sublane-broadcast so the in-kernel row broadcast is free).

    CT[l] = t[l] | t[(l+1)&255]<<8 | t[l+128]<<16 | t[(l+129)&255]<<24
    PT[l] = P[l] | P[(l+1)&255]<<6 | (P[l+128] | P[(l+129)&255]<<6) << 16

    so table[idx&255], table[(idx+1)&255] are both recovered from ONE
    128-lane gather at idx&127 followed by ``>> ((idx>>3)&16)``.
    """
    t = PERLIN_TABLE.astype(np.int64)
    p = _packed_sign_table().astype(np.int64)
    l = np.arange(LANES)
    ct = (t[l] | t[(l + 1) & 255] << 8
          | t[l + 128] << 16 | t[(l + 129) & 255] << 24)
    p2lo = p[l] | p[(l + 1) & 255] << 6
    p2hi = p[l + 128] | p[(l + 129) & 255] << 6
    pt = p2lo | p2hi << 16
    def rep(arr):
        a = arr.astype(np.uint32).view(np.int32)
        return np.broadcast_to(a[None, :], (8, LANES)).copy()
    return rep(ct), rep(pt)


def _tables_for_kernel():
    ct, pt = _packed_tables_np()
    return jnp.asarray(ct), jnp.asarray(pt)


def _lookup_pair(ref, idx):
    """(table[idx&255], table[(idx+1)&255]) packed into one 16-bit field,
    for idx (rows, 128) int32, via ONE lane gather on a packed pair table.

    NOTE the returned word is NOT masked to 16 bits: bit 7 of idx selects
    the high half's 16-bit field by a variable shift, and when it is 0 the
    high half's bits remain above bit 15 (sign bits included). Callers
    always re-mask the two 8-bit (ct) / 6-bit (pt) values they extract, so
    the mask here would be a wasted VPU op in the hottest loop."""
    tab = jnp.broadcast_to(ref[0:1, :], idx.shape)
    g = jnp.take_along_axis(tab, idx & 127, axis=1)
    return g >> ((idx >> 3) & 16)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _floor_split_df(hi, lo):
    """(cell int32, frac as a normalized DF pair) with the reference FLOOR
    semantics (perlin.h:52-56) from a double-float coordinate — the in-kernel
    restatement of nums.df.floor_split_parts (see there for the full
    rationale, including the frac == 1.0 exact-negative-integer case). The
    op sequence MUST stay in lockstep with that function: the XLA and Pallas
    engines are bit-identical because the two are structurally identical."""
    one = np.float32(1.0)
    neg = hi < 0.0
    cell_f = jnp.where(neg, jnp.trunc(hi - one), jnp.trunc(hi))
    d, derr = _two_sum(hi, -cell_f)
    f, e = _two_sum(d, lo)
    e = e + derr
    f, e = _quick_two_sum(f, e)
    adj = jnp.floor(f)
    adj = jnp.where((f == one) & (e <= 0.0), np.float32(0.0), adj)
    cell = cell_f.astype(_I32) + adj.astype(_I32)
    ff, ferr = _two_sum(f, -adj)
    fh, fl = _quick_two_sum(ff, e + ferr)
    return cell, fh, fl


def _fm1(fh, fl):
    """f32-rounded (frac - 1) from the DF fraction — nums.df.frac_m1."""
    t, terr = _two_sum(fh, -np.float32(1.0))
    return t + (terr + fl)


def _floor_split(hi, lo):
    cell, fh, fl = _floor_split_df(hi, lo)
    return cell, fh, _fm1(fh, fl)


_M24 = np.int32(2**24 - 1)
_P24 = np.float32(2.0**-24)



def _int24_parts(hi, lo):
    """(cell, hi24, lo24) int24 fixed-point split — the in-kernel restatement
    of nums.df.int24_parts (see there for exactness/truncation analysis and
    the FLOOR-quirk canonicalization). Keep the op sequence in lockstep:
    XLA/Pallas bit-identity depends on it."""
    cell, fh, fl = _floor_split_df(hi, lo)
    t = fh * np.float32(2.0**24)
    hi_f = jnp.trunc(t)
    r = t - hi_f
    lo_f = jnp.floor(r * np.float32(2.0**24) + fl * np.float32(2.0**48))
    lo_i = lo_f.astype(_I32)
    hi_i = hi_f.astype(_I32) + (lo_i >> 24)
    lo_i = lo_i & _M24
    cell = cell + (hi_i >> 24)
    hi_i = hi_i & _M24
    return cell, hi_i, lo_i


def _shift_split24(cell, hi24, lo24, o: int):
    """Octave-o (cell, frac, frac-1) by static shifts of octave 0's int24
    parts — nums.df.shift_split24 restated in-kernel. All octaves derive
    from octave 0 independently: no cross-octave dependency chain (the
    double-float double_mod1 chain this replaces was 63% of kernel time).
    The fraction is the 24-bit hi window (truncation < 2^-24, inside the
    oracle bar — see nums.df.shift_split24), so frac-1 is one exact sub."""
    o = int(o)
    cell_o = (cell << o) + (hi24 >> (24 - o)) if o else cell
    hi_o = ((hi24 << o) | (lo24 >> (24 - o))) & _M24 if o else hi24
    fh = hi_o.astype(_F32) * _P24
    fm1 = fh - np.float32(1.0)
    return cell_o, fh, fm1


def _fade(t):
    return ((t * np.float32(6.0) - np.float32(15.0)) * t + np.float32(10.0)) * t * t * t


def _noise3_core(ct, pt, cx, fx, fxm1, cy, fy, fym1, cz, fz, fzm1):
    """One octave of gradient noise for a (rows, 128) block, given cell/frac
    splits per axis. Returns f32 noise values.

    Hash chain (perlin.h:68-75) with pair lookups: stage 1 yields
    A0=t[ix], A1=t[ix+1] from one gather; stage 2 yields (B00,B01) and
    (B10,B11); stage 3 yields each corner column's packed dz=0/dz=1 sign
    codes. 7 gathers total."""
    u, v, w = _fade(fx), _fade(fy), _fade(fz)

    # No &255 masks on the chained indices: _lookup_pair only consumes bits
    # 0..7 of its index (gather at idx&127, half-select from bit 7), and
    # addition carries propagate upward only, so junk above bit 7 of the
    # unmasked pair word cannot reach the bits that matter. Each dropped
    # mask is one VPU op per gather in the hottest loop.
    pa = _lookup_pair(ct, cx)
    pb0 = _lookup_pair(ct, pa + cy)
    pb1 = _lookup_pair(ct, (pa >> 8) + cy)

    one = np.float32(1.0)

    def grad2(pb_shift, gx, gy):
        # corner column (dx, dy) fixed by b = t[a+iy(+1)]; returns the dz=0
        # (frac fz) and dz=1 (frac fzm1) gradient dots. No &63 field masks:
        # each 2-bit extract below reads bits <= 11 of the pair word, and
        # _lookup_pair's unmasked junk lives at bits >= 16, so the field
        # isolation masks would be dead ops (2 per corner column).
        s2 = _lookup_pair(pt, pb_shift + cz)
        def dot(s, gz):
            sx = (s & 3).astype(_F32) - one
            sy = ((s >> 2) & 3).astype(_F32) - one
            sz = ((s >> 4) & 3).astype(_F32) - one
            return (gx * sx + gy * sy) + gz * sz
        return dot(s2, fz), dot(s2 >> 6, fzm1)

    g000, g001 = grad2(pb0, fx, fy)
    g010, g011 = grad2(pb0 >> 8, fx, fym1)
    g100, g101 = grad2(pb1, fxm1, fy)
    g110, g111 = grad2(pb1 >> 8, fxm1, fym1)

    def lerp(a, b, t):
        return a + (b - a) * t

    x00 = lerp(g000, g100, u)
    x10 = lerp(g010, g110, u)
    x01 = lerp(g001, g101, u)
    x11 = lerp(g011, g111, u)
    return lerp(lerp(x00, x10, v), lerp(x01, x11, v), w)


def _freq_consts(lacunarity: float, octaves: int):
    """Per-octave frequency as exact double-float (hi, lo) host constants,
    accumulated the way the reference accumulates it (freq *= lacunarity in
    double, main.cpp:702)."""
    out = []
    freq = np.float64(1.0)
    for _ in range(octaves):
        hi = np.float32(freq)
        lo = np.float32(freq - np.float64(hi))
        out.append((hi, lo))
        freq = freq * np.float64(lacunarity)
    return out


def _df_scale(xhi, xlo, chi, clo):
    """Double-float multiply by a (hi, lo) compile-time constant (Dekker)."""
    if float(clo) == 0.0 and float(chi) == 1.0:
        return xhi, xlo
    if float(clo) == 0.0 and float(chi) in (2.0**i for i in range(64)):
        return xhi * chi, xlo * chi     # exact power-of-two scaling
    split = np.float32(4097.0)
    p = xhi * chi
    ca = split * xhi
    ahi = ca - (ca - xhi)
    alo = xhi - ahi
    cb = split * chi
    bhi = cb - (cb - chi)
    blo = chi - bhi
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    err = err + (xhi * clo + xlo * chi)
    hi, lo = _quick_two_sum(p, err)
    return hi, lo


def accumulate_octaves(kind: str, octaves: int, lacunarity: float, gain,
                       ct_ref, pt_ref,
                       xh, xl, yh, yl, zh, zl, oct_mask_fn=None):
    """The multi-octave fBm/ridged accumulation over double-float coordinate
    blocks — shared by the flat noise kernel and the fused tile kernel.

    oct_mask_fn(i) -> bool mask (or None): when given, octave i only
    contributes where the mask is True — the mixed-octave-count mode for
    batches whose rows want different depth-dependent octave counts
    (reference main.cpp:827) in a single launch.
    """
    gain = np.float32(gain)
    freqs = _freq_consts(lacunarity, octaves)
    pow2 = float(lacunarity) == 2.0

    value = jnp.zeros_like(xh)
    weight = None if kind == "fbm" else jnp.ones_like(xh)
    amplitude = np.float32(1.0)
    parts = None

    for i in range(octaves):
        if pow2:
            # octave-parallel: one int24 split at octave 0, every octave's
            # cell/frac derived from it by static shifts (no serial chain).
            if parts is None:
                parts = (_int24_parts(xh, xl), _int24_parts(yh, yl),
                         _int24_parts(zh, zl))
            (cx, fx, fxm1), (cy, fy, fym1), (cz, fz, fzm1) = (
                _shift_split24(*p, i) for p in parts)
        else:
            chi, clo = freqs[i]
            oxh, oxl = _df_scale(xh, xl, chi, clo)
            oyh, oyl = _df_scale(yh, yl, chi, clo)
            ozh, ozl = _df_scale(zh, zl, chi, clo)
            cx, fx, fxm1 = _floor_split(oxh, oxl)
            cy, fy, fym1 = _floor_split(oyh, oyl)
            cz, fz, fzm1 = _floor_split(ozh, ozl)

        n = _noise3_core(ct_ref, pt_ref,
                         cx, fx, fxm1, cy, fy, fym1, cz, fz, fzm1)

        live = None if oct_mask_fn is None else oct_mask_fn(i)
        if kind == "fbm":
            contrib = n * amplitude
            if live is not None:
                contrib = jnp.where(live, contrib, 0.0)
            value = value + contrib
        else:   # ridged (main.cpp:721-731): unclamped weight feedback
            v = np.float32(1.0) - jnp.abs(n)
            v = v * v
            contrib = v * amplitude * weight
            if live is not None:
                contrib = jnp.where(live, contrib, 0.0)
                weight = jnp.where(live, v, weight)
            else:
                weight = v
            value = value + contrib
        amplitude = amplitude * gain

    return value


def _make_kernel(kind: str, octaves: int, lacunarity: float, gain: float):
    def kernel(xh_ref, xl_ref, yh_ref, yl_ref, zh_ref, zl_ref,
               ct_ref, pt_ref, out_ref):
        out_ref[:] = accumulate_octaves(
            kind, octaves, lacunarity, gain, ct_ref, pt_ref,
            xh_ref[:], xl_ref[:], yh_ref[:], yl_ref[:], zh_ref[:], zl_ref[:])

    return kernel


@functools.lru_cache(maxsize=None)
def _build_call(kind: str, octaves: int, lacunarity: float, gain: float,
                rows: int, block_rows: int, interpret: bool):
    kernel = _make_kernel(kind, octaves, lacunarity, gain)
    grid = rows // block_rows
    data_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((8, LANES), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        grid=(grid,),
        in_specs=[data_spec] * 6 + [table_spec] * 2,
        out_specs=data_spec,
        interpret=interpret,
    )


def _is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def noise_df(kind, xhi, xlo, yhi, ylo, zhi, zlo, *, lacunarity=2.0,
             gain=0.55, octaves=6, block_rows=DEFAULT_BLOCK_ROWS,
             interpret=None):
    """Fused multi-octave noise over double-float coordinates.

    kind: "fbm" or "ridged". All six coordinate arrays share one shape.
    Returns f32 noise of that shape. Off-TPU the kernel runs in Pallas
    interpreter mode (slow, test-only) unless interpret=False is forced.
    """
    if kind not in ("fbm", "ridged"):
        raise ValueError(kind)
    if interpret is None:
        interpret = not _is_tpu()
    shape = jnp.shape(xhi)
    n = int(np.prod(shape)) if shape else 1

    # Adapt the block to the input: small batches (the refiner's frontier
    # probes) should not pad up to a full default block, and blocks stay
    # sublane-aligned. Large inputs keep the requested (default) size.
    rows_needed = -(-n // LANES)
    block_rows = max(8, min(int(block_rows), -(-rows_needed // 8) * 8))
    chunk = block_rows * LANES
    rows_total = -(-n // chunk) * block_rows   # pad to whole blocks
    pad = rows_total * LANES - n

    def prep(a):
        flat = jnp.ravel(jnp.asarray(a, _F32))
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), _F32)])
        return flat.reshape(rows_total, LANES)

    args = [prep(a) for a in (xhi, xlo, yhi, ylo, zhi, zlo)]
    call = _build_call(kind, int(octaves), float(lacunarity),
                       float(np.float32(gain)), rows_total, block_rows,
                       bool(interpret))
    out = call(*args, *_tables_for_kernel())
    return out.reshape(-1)[:n].reshape(shape)


def fbm_df(x, y, z, lacunarity=2.0, gain=np.float32(0.5), octaves=6, **kw):
    """Drop-in kernel twin of planet_tpu.ops.perlin.fbm_df (DF pytree in)."""
    return noise_df("fbm", x.hi, x.lo, y.hi, y.lo, z.hi, z.lo,
                    lacunarity=lacunarity, gain=gain, octaves=octaves, **kw)


def ridged_df(x, y, z, lacunarity=2.0, gain=np.float32(0.5), octaves=6, **kw):
    """Drop-in kernel twin of planet_tpu.ops.perlin.ridged_df."""
    return noise_df("ridged", x.hi, x.lo, y.hi, y.lo, z.hi, z.lo,
                    lacunarity=lacunarity, gain=gain, octaves=octaves, **kw)
