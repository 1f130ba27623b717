"""Gradient noise with the reference's exact mixed-precision semantics.

Two evaluation paths share one combiner:

* ``perlin3_f64`` — the specification path. Takes float64 coordinates and
  reproduces the reference scalar pipeline (perlin.h:50-88) bit-for-bit:
  FLOOR-macro cell split on doubles, fade curve evaluated in double and
  narrowed to f32, gradient fractions narrowed to f32 *after* the -1 offsets
  are applied in double, all lerps in f32. Runs wherever x64 is enabled
  (CPU tests, golden generation).

* ``perlin3_df`` — the TPU path. Takes double-float coordinates
  (planet_tpu.nums.df) and produces the same values to ~1e-7 absolute: the
  cell/frac split is exact to ~49 bits, the fade curve is evaluated in f32
  from the f32 fraction (the one deliberate deviation from
  double-then-narrow; error < 2 f32 ulps, far inside the 1e-5 parity bar).

Octave wrappers ``fbm``/``ridged`` mirror reference main.cpp:689-734,
including the unclamped ridged weight feedback and the f32 amplitude chain
with float64 (resp. double-float) frequency.

The table lookups here use jnp.take — correct everywhere, fast enough on CPU.
The performance path is planet_tpu.ops.kernels.perlin_pallas, which evaluates
the same chain with MXU/VPU-friendly lookup strategies and is parity-tested
against this module.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from planet_tpu.nums import df as dfm
from planet_tpu.ops.tables import PERLIN_TABLE, fused_gradient_tables

_TABLE = jnp.asarray(PERLIN_TABLE, dtype=jnp.int32)
_SX, _SY, _SZ = (jnp.asarray(t) for t in fused_gradient_tables())

_F32 = jnp.float32


def _floor_ref_f64(x):
    """The reference FLOOR macro (perlin.h:52): (int)((x < 0) ? x - 1 : x).

    Truncation toward zero of a conditionally shifted value — NOT a true
    floor at exact negative integers (FLOOR(-2.0) == -3, frac == 1.0).
    """
    shifted = jnp.where(x < 0.0, x - 1.0, x)
    return jnp.trunc(shifted).astype(jnp.int32)


def _final_hash(ix, iy, iz):
    """s = (t[(t[ix & 255] + iy) & 255] + iz) & 255 — the chained permutation
    hash (perlin.h:43-48) up to (but not including) the final lookup, which is
    folded into the sign tables (see tables.fused_gradient_tables)."""
    r1 = jnp.take(_TABLE, ix & 255)
    r2 = jnp.take(_TABLE, (r1 + iy) & 255)
    return (r2 + iz) & 255


def _gradient(s, fx, fy, fz):
    """Gradient dot product via the fused sign tables, matching the reference
    left-to-right f32 sum x*v0 + y*v1 + z*v2 (perlin.h:47)."""
    gx = jnp.take(_SX, s)
    gy = jnp.take(_SY, s)
    gz = jnp.take(_SZ, s)
    return (fx * gx + fy * gy) + fz * gz


def _combine(ix, iy, iz, fx, fy, fz, fxm1, fym1, fzm1, u, v, w):
    """Trilinear gradient blend given cells, f32 fractions (and their
    pre-narrowing -1 offsets) and f32 fade values. Lerp is a + (b-a)*t in f32
    (perlin.h:77-87)."""
    ix1, iy1, iz1 = ix + 1, iy + 1, iz + 1

    g0 = _gradient(_final_hash(ix, iy, iz), fx, fy, fz)
    g1 = _gradient(_final_hash(ix1, iy, iz), fxm1, fy, fz)
    g2 = _gradient(_final_hash(ix, iy1, iz), fx, fym1, fz)
    g3 = _gradient(_final_hash(ix1, iy1, iz), fxm1, fym1, fz)
    g4 = _gradient(_final_hash(ix, iy, iz1), fx, fy, fzm1)
    g5 = _gradient(_final_hash(ix1, iy, iz1), fxm1, fy, fzm1)
    g6 = _gradient(_final_hash(ix, iy1, iz1), fx, fym1, fzm1)
    g7 = _gradient(_final_hash(ix1, iy1, iz1), fxm1, fym1, fzm1)

    def lerp(a, b, t):
        return a + (b - a) * t

    l0 = lerp(g0, g1, u)
    l1 = lerp(g2, g3, u)
    l2 = lerp(g4, g5, u)
    l3 = lerp(g6, g7, u)
    l4 = lerp(l0, l1, v)
    l5 = lerp(l2, l3, v)
    return lerp(l4, l5, w)


def _fade_f64(t):
    """Quintic fade evaluated in double, narrowed to f32 (perlin.h:62-66)."""
    return (((t * 6.0 - 15.0) * t + 10.0) * t * t * t).astype(_F32)


def _fade_f32(t):
    t = t.astype(_F32)
    six = np.float32(6.0)
    fifteen = np.float32(15.0)
    ten = np.float32(10.0)
    return ((t * six - fifteen) * t + ten) * t * t * t


def perlin3_f64(x, y, z):
    """Specification path: float64 in, float32 out. Bit-exact vs the C build."""
    x = jnp.asarray(x, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    z = jnp.asarray(z, jnp.float64)
    ix, iy, iz = _floor_ref_f64(x), _floor_ref_f64(y), _floor_ref_f64(z)
    fx64 = x - ix
    fy64 = y - iy
    fz64 = z - iz
    u, v, w = _fade_f64(fx64), _fade_f64(fy64), _fade_f64(fz64)
    # The -1 corner offsets are applied in double, then each operand narrows
    # to f32 at the PerlinGradient call boundary (perlin.h:68-75).
    fx, fy, fz = fx64.astype(_F32), fy64.astype(_F32), fz64.astype(_F32)
    fxm1 = (fx64 - 1.0).astype(_F32)
    fym1 = (fy64 - 1.0).astype(_F32)
    fzm1 = (fz64 - 1.0).astype(_F32)
    return _combine(ix, iy, iz, fx, fy, fz, fxm1, fym1, fzm1, u, v, w)


def _perlin3_from_splits(px, py, pz):
    """One noise evaluation from per-axis (cell, frac, frac-1) f32 splits —
    the shared core of perlin3_df and the octave-parallel loops below."""
    (ix, fx, fxm1), (iy, fy, fym1), (iz, fz, fzm1) = px, py, pz
    u, v, w = _fade_f32(fx), _fade_f32(fy), _fade_f32(fz)
    return _combine(ix, iy, iz, fx, fy, fz, fxm1, fym1, fzm1, u, v, w)


def perlin3_df(x: dfm.DF, y: dfm.DF, z: dfm.DF):
    """TPU path: double-float in, float32 out. Routes through the int24
    fixed-point fraction (nums.df.int24_parts) so a single evaluation is
    bit-identical to octave 0 of the multi-octave loops."""
    return _perlin3_from_splits(
        dfm.shift_split24(*dfm.int24_parts(x), 0),
        dfm.shift_split24(*dfm.int24_parts(y), 0),
        dfm.shift_split24(*dfm.int24_parts(z), 0))


# ---------------------------------------------------------------------------
# Octave wrappers (reference main.cpp:689-734)
# ---------------------------------------------------------------------------


def fbm_f64(x, y, z, lacunarity=2.0, gain=np.float32(0.5), octaves=6):
    """fBm: value += noise*amp; freq *= lacunarity (f64); amp *= gain (f32)."""
    x = jnp.asarray(x, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    z = jnp.asarray(z, jnp.float64)
    gain = np.float32(gain)
    frequency = np.float64(1.0)
    amplitude = np.float32(1.0)
    value = jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape, z.shape), _F32)
    for _ in range(octaves):
        value = value + perlin3_f64(x * frequency, y * frequency, z * frequency) * amplitude
        frequency = frequency * np.float64(lacunarity)
        amplitude = amplitude * gain
    return value


def ridged_f64(x, y, z, lacunarity=2.0, gain=np.float32(0.5), octaves=6):
    """Ridged multifractal with the reference's unclamped weight feedback
    (main.cpp:721-731): v = (1 - |noise|)^2; value += v*amp*weight; weight = v."""
    x = jnp.asarray(x, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    z = jnp.asarray(z, jnp.float64)
    gain = np.float32(gain)
    offset = np.float32(1.0)
    frequency = np.float64(1.0)
    amplitude = np.float32(1.0)
    shape = jnp.broadcast_shapes(x.shape, y.shape, z.shape)
    weight = jnp.ones(shape, _F32)
    value = jnp.zeros(shape, _F32)
    for _ in range(octaves):
        n = perlin3_f64(x * frequency, y * frequency, z * frequency)
        v = jnp.abs(n)
        v = offset - v
        v = v * v
        value = value + v * amplitude * weight
        weight = v
        frequency = frequency * np.float64(lacunarity)
        amplitude = amplitude * gain
    return value


def _df_freq_coords(x, y, z, lacunarity, i):
    """Octave-i coordinates. Lacunarity 2 scales exactly by a power of two;
    other lacunarities use a double-float frequency product accumulated the
    way the reference accumulates it (sequential ``frequency *= lacunarity``,
    main.cpp:702)."""
    if float(lacunarity) == 2.0:
        s = np.float32(2.0) ** i  # exact in f32 for i <= 127
        return dfm.mul_pow2(x, s), dfm.mul_pow2(y, s), dfm.mul_pow2(z, s)
    freq = np.float64(1.0)
    for _ in range(i):
        freq = freq * np.float64(lacunarity)
    fdf = dfm.from_f64(freq)
    return dfm.mul(x, fdf), dfm.mul(y, fdf), dfm.mul(z, fdf)


def _df_octave_noises(x, y, z, lacunarity, octaves):
    """Per-octave noise values. Lacunarity 2.0 (the product config) runs the
    octave-parallel scheme: one int24 fixed-point split at octave 0, then
    every octave's cell/frac split is a STATIC bit shift of it
    (nums.df.shift_split24) — no serial dependency chain across octaves, in
    lockstep with the Pallas kernel's accumulate_octaves so the two engines
    stay bit-identical. Other lacunarities rescale the coordinates per
    octave."""
    if float(lacunarity) == 2.0:
        parts = (dfm.int24_parts(x), dfm.int24_parts(y), dfm.int24_parts(z))
        for i in range(octaves):
            yield _perlin3_from_splits(*(dfm.shift_split24(*p, i) for p in parts))
    else:
        for i in range(octaves):
            xi, yi, zi = _df_freq_coords(x, y, z, lacunarity, i)
            yield perlin3_df(xi, yi, zi)


def fbm_df(x: dfm.DF, y: dfm.DF, z: dfm.DF, lacunarity=2.0,
           gain=np.float32(0.5), octaves=6):
    gain = np.float32(gain)
    amplitude = np.float32(1.0)
    value = jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape, z.shape), _F32)
    for n in _df_octave_noises(x, y, z, lacunarity, octaves):
        value = value + n * amplitude
        amplitude = amplitude * gain
    return value


def ridged_df(x: dfm.DF, y: dfm.DF, z: dfm.DF, lacunarity=2.0,
              gain=np.float32(0.5), octaves=6):
    gain = np.float32(gain)
    offset = np.float32(1.0)
    amplitude = np.float32(1.0)
    shape = jnp.broadcast_shapes(x.shape, y.shape, z.shape)
    weight = jnp.ones(shape, _F32)
    value = jnp.zeros(shape, _F32)
    for n in _df_octave_noises(x, y, z, lacunarity, octaves):
        v = jnp.abs(n)
        v = offset - v
        v = v * v
        value = value + v * amplitude * weight
        weight = v
        amplitude = amplitude * gain
    return value
