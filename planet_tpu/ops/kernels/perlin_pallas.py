"""Fused Pallas TPU kernel for Perlin fBm / ridged-multifractal noise.

This is the engine's hottest loop (reference GenerateHeightMap -> PerlinRidged
-> PerlinNoise3, main.cpp:123-151, 689-734, perlin.h:50-88): every texel of
every heightmap tile evaluates `octaves` gradient-noise samples, each needing
8 corner hashes through a 3-stage chained 256-entry permutation lookup.

TPU-native design decisions (measured on a v5e chip, tools/microbench_*.py):

* **Lane-wise dynamic gather** for table lookups: Mosaic lowers
  ``jnp.take_along_axis(table, idx, axis=1)`` on (rows, 128) registers to a
  native per-lane gather (~11 G lookups/s measured). A 256-entry table is
  two 128-lane gathers + a bit-7 select. This beats one-hot MXU matmuls
  (~0.1 G/s) and XLA's general gather (~0.03 G/s) by two orders of magnitude.
* **Packed gradient signs**: the final hash stage folds the table lookup,
  ``& 15`` and the 16-gradient-vector selection (perlin.h:30-48) into ONE
  6-bit-packed sign table P[s] = (sx+1) | (sy+1)<<2 | (sz+1)<<4, decoded with
  shifts — 8 lookups per corner-set instead of 24.
* **Double-float coordinates** (planet_tpu.nums.df): the cell/frac split
  needs ~49 mantissa bits at planet scale; the error-free transformations run
  as plain f32 VPU ops inside the kernel.
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
DEFAULT_BLOCK_ROWS = 256


def _packed_sign_table() -> np.ndarray:
    """P[s] = packed signs of gradient PERLIN_VECTORS[PERLIN_TABLE[s] & 15]."""
    g = PERLIN_VECTORS[PERLIN_TABLE & 15].astype(np.int32)   # (256, 3) in -1..1
    return ((g[:, 0] + 1) | ((g[:, 1] + 1) << 2) | ((g[:, 2] + 1) << 4)).astype(np.int32)


def _tables_for_kernel():
    """Both 256-entry tables as (8, 128) lo/hi halves (sublane-broadcast so
    the in-kernel row broadcast is free)."""
    t = PERLIN_TABLE.astype(np.int32)
    p = _packed_sign_table()
    def halves(arr):
        return (np.broadcast_to(arr[None, :LANES], (8, LANES)).copy(),
                np.broadcast_to(arr[None, LANES:], (8, LANES)).copy())
    tlo, thi = halves(t)
    plo, phi = halves(p)
    return jnp.asarray(tlo), jnp.asarray(thi), jnp.asarray(plo), jnp.asarray(phi)


def _lookup256(lo_ref, hi_ref, idx):
    """table[idx & 255] for idx (rows, 128) int32 via two lane gathers."""
    idx = idx & 255
    low7 = idx & 127
    tlo = jnp.broadcast_to(lo_ref[0:1, :], low7.shape)
    thi = jnp.broadcast_to(hi_ref[0:1, :], low7.shape)
    a = jnp.take_along_axis(tlo, low7, axis=1)
    b = jnp.take_along_axis(thi, low7, axis=1)
    return jnp.where(idx >= 128, b, a)


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _quick_two_sum(a, b):
    s = a + b
    return s, b - (s - a)


def _floor_split(hi, lo):
    """(cell int32, frac f32, frac-1 f32) with the reference FLOOR semantics
    (perlin.h:52-56) from a double-float coordinate — the in-kernel
    restatement of nums.df.floor_split_ref (see there for the full rationale,
    including the frac == 1.0 exact-negative-integer case)."""
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
    ff = f - adj
    fh, fl = _quick_two_sum(ff, e)
    t, terr = _two_sum(fh, -one)
    return cell, fh, t + (terr + fl)


def _fade(t):
    return ((t * np.float32(6.0) - np.float32(15.0)) * t + np.float32(10.0)) * t * t * t


def _noise3_core(tlo, thi, plo, phi, cx, fx, fxm1, cy, fy, fym1, cz, fz, fzm1):
    """One octave of gradient noise for a (rows, 128) block, given cell/frac
    splits per axis. Returns f32 noise values."""
    u, v, w = _fade(fx), _fade(fy), _fade(fz)

    # Stage 1: A0 = t[ix], A1 = t[ix+1]
    a0 = _lookup256(tlo, thi, cx)
    a1 = _lookup256(tlo, thi, cx + 1)
    # Stage 2: B(a, dy) = t[(a + iy + dy) & 255]
    b00 = _lookup256(tlo, thi, a0 + cy)
    b01 = _lookup256(tlo, thi, a0 + cy + 1)
    b10 = _lookup256(tlo, thi, a1 + cy)
    b11 = _lookup256(tlo, thi, a1 + cy + 1)

    def grad(b, dz, gx, gy, gz):
        s = _lookup256(plo, phi, b + cz + dz)
        sx = (s & 3).astype(_F32) - np.float32(1.0)
        sy = ((s >> 2) & 3).astype(_F32) - np.float32(1.0)
        sz = ((s >> 4) & 3).astype(_F32) - np.float32(1.0)
        return (gx * sx + gy * sy) + gz * sz

    g000 = grad(b00, 0, fx, fy, fz)
    g100 = grad(b10, 0, fxm1, fy, fz)
    g010 = grad(b01, 0, fx, fym1, fz)
    g110 = grad(b11, 0, fxm1, fym1, fz)
    g001 = grad(b00, 1, fx, fy, fzm1)
    g101 = grad(b10, 1, fxm1, fy, fzm1)
    g011 = grad(b01, 1, fx, fym1, fzm1)
    g111 = grad(b11, 1, fxm1, fym1, fzm1)

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
                       tlo_ref, thi_ref, plo_ref, phi_ref,
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

    for i in range(octaves):
        if pow2:
            s = np.float32(2.0) ** i     # exact
            oxh, oxl = xh * s, xl * s
            oyh, oyl = yh * s, yl * s
            ozh, ozl = zh * s, zl * s
        else:
            chi, clo = freqs[i]
            oxh, oxl = _df_scale(xh, xl, chi, clo)
            oyh, oyl = _df_scale(yh, yl, chi, clo)
            ozh, ozl = _df_scale(zh, zl, chi, clo)

        cx, fx, fxm1 = _floor_split(oxh, oxl)
        cy, fy, fym1 = _floor_split(oyh, oyl)
        cz, fz, fzm1 = _floor_split(ozh, ozl)

        n = _noise3_core(tlo_ref, thi_ref, plo_ref, phi_ref,
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
               tlo_ref, thi_ref, plo_ref, phi_ref, out_ref):
        out_ref[:] = accumulate_octaves(
            kind, octaves, lacunarity, gain,
            tlo_ref, thi_ref, plo_ref, phi_ref,
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
        in_specs=[data_spec] * 6 + [table_spec] * 4,
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
