"""Double-float (two-float32) arithmetic for TPU.

TPUs have no native float64, but planet-scale coordinates need ~48 bits of
mantissa: the reference keeps positions in double (reference vec3.h Vec3d,
main.cpp:668 `Vec3d p = q.p[j] - cam.position`) and the noise floor/frac split
happens on doubles (reference perlin.h:52-56). At radius 6.371e6 m, terrain
scale 1e-5, and up to 18 octaves of lacunarity-2 fBm (reference main.cpp:827),
effective noise coordinates reach ~8.4e6 where a single f32 ulp is 0.5 — the
fractional part would be garbage.

A double-float value represents x = hi + lo with |lo| <= ulp(hi)/2, giving
~49 bits of effective mantissa (between f32's 24 and f64's 53). All algorithms
below are the classic error-free transformations (Knuth two-sum, Dekker split
product) and work with plain IEEE round-to-nearest f32 ops, which the TPU VPU
provides. XLA does not apply unsafe floating-point algebra, so the
cancellation tricks survive jit.

Layout: a DF array is a pair (hi, lo) of equal-shaped float32 jnp arrays,
carried as a small pytree (NamedTuple) so it flows through jit/shard_map/scan.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32

# Dekker split constant for binary32: 2**ceil(24/2) + 1.
_SPLIT = np.float32(4097.0)


class DF(NamedTuple):
    """A double-float number: value = hi + lo, both float32."""

    hi: jnp.ndarray
    lo: jnp.ndarray

    @property
    def shape(self):
        return jnp.shape(self.hi)

    def __neg__(self):
        return DF(-self.hi, -self.lo)

    def __add__(self, other):
        return add(self, other)

    def __sub__(self, other):
        return sub(self, other)

    def __mul__(self, other):
        return mul(self, other)

    def __getitem__(self, idx):
        if isinstance(idx, int):  # NamedTuple field access for 0/1
            return tuple.__getitem__(self, idx)
        return DF(self.hi[idx], self.lo[idx])

    def astype_f64(self):
        """Widen to float64 (only valid where x64 is enabled, e.g. CPU tests)."""
        return self.hi.astype(jnp.float64) + self.lo.astype(jnp.float64)


DFLike = Union[DF, jnp.ndarray, float, int]


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=_F32)


def from_f32(x) -> DF:
    """Lift an exact float32 value into DF (lo = 0)."""
    x = _f32(x)
    return DF(x, jnp.zeros_like(x))


def from_f64_np(x):
    """Host-side exact split of float64 into an (hi, lo) numpy f32 pair."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def from_f64(x) -> DF:
    """Split host float64 data into an exact-to-49-bits DF pair.

    Must be called on concrete (numpy) data — this is the host-side ingestion
    point for double-precision state (camera positions, quad corners).
    """
    hi, lo = from_f64_np(x)
    return DF(jnp.asarray(hi), jnp.asarray(lo))


def _coerce(x: DFLike) -> DF:
    if isinstance(x, DF):
        return x
    return from_f32(x)


# BACKEND CAVEAT (measured 2026-08): under jit, XLA:CPU's LLVM backend
# rematerializes producer multiplies inside consumer fusions and contracts
# them to FMA, which breaks the (s, err) exactness invariant of the EFTs
# below — composed DF mul/add chains degrade to ~5e-8 relative accuracy on
# CPU (an optimization_barrier does NOT survive the rematerialization). The
# TPU backend is measured exact (mul 1.4e-14, dot3 9.5e-15 rel on v5e).
# CPU tests that need full DF accuracy must compare against x64/f64
# references instead; the production TPU path is unaffected, and the Pallas
# kernels carry their own EFT copies (Mosaic does not contract).


def two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Error-free sum: a + b = s + err exactly (Knuth)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Error-free sum assuming |a| >= |b|."""
    s = a + b
    err = b - (s - a)
    return s, err


def two_prod(a: jnp.ndarray, b: jnp.ndarray):
    """Error-free product via Dekker splitting: a * b = p + err exactly."""
    p = a * b
    ca = _SPLIT * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = _SPLIT * b
    bhi = cb - (cb - b)
    blo = b - bhi
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


def add(a: DFLike, b: DFLike) -> DF:
    """Accurate double-float addition (Knuth/Shewchuk): stays fully accurate
    even under cancellation, which matters for corner differences of deep
    quads (p1 - p0 with |p| ~ 6.4e6 and |p1-p0| ~ metres)."""
    a, b = _coerce(a), _coerce(b)
    s, e = two_sum(a.hi, b.hi)
    t, f = two_sum(a.lo, b.lo)
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    hi, lo = quick_two_sum(s, e)
    return DF(hi, lo)


def sub(a: DFLike, b: DFLike) -> DF:
    b = _coerce(b)
    return add(a, DF(-b.hi, -b.lo))


def mul(a: DFLike, b: DFLike) -> DF:
    a, b = _coerce(a), _coerce(b)
    p, e = two_prod(a.hi, b.hi)
    e = e + (a.hi * b.lo + a.lo * b.hi)
    hi, lo = quick_two_sum(p, e)
    return DF(hi, lo)


def mul_pow2(a: DF, scale) -> DF:
    """Exact multiply by a power of two (e.g. lacunarity-2 octave scaling)."""
    s = _f32(scale)
    return DF(a.hi * s, a.lo * s)


def div(a: DFLike, b: DFLike) -> DF:
    a, b = _coerce(a), _coerce(b)
    q1 = a.hi / b.hi
    # r = a - q1*b, computed accurately
    p, e = two_prod(q1, b.hi)
    r_hi, r_e = two_sum(a.hi, -p)
    r = r_hi + (r_e + a.lo - e - q1 * b.lo)
    q2 = r / b.hi
    hi, lo = quick_two_sum(q1, q2)
    return DF(hi, lo)


def sqrt(a: DF) -> DF:
    """Double-float square root (Karp's method, one Newton step)."""
    x = jax_rsqrt(a.hi)
    ax = a.hi * x  # approx sqrt
    p, e = two_prod(ax, ax)
    d_hi, d_e = two_sum(a.hi, -p)
    diff = d_hi + (d_e + a.lo - e)
    corr = diff * (x * np.float32(0.5))
    hi, lo = quick_two_sum(ax, corr)
    return DF(hi, lo)


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def dot3(ax: DF, ay: DF, az: DF, bx: DF, by: DF, bz: DF) -> DF:
    return add(add(mul(ax, bx), mul(ay, by)), mul(az, bz))


def to_f32(a: DF) -> jnp.ndarray:
    """Round a DF to the nearest float32 (hi already is, since |lo|<=ulp(hi)/2)."""
    return a.hi


def floor_split_ref(a: DF):
    """Split DF coordinate into (int32 cell, float32 frac) with the reference's
    FLOOR semantics (reference perlin.h:52-56):

        FLOOR(x) = (int)((x < 0) ? x - 1.0 : x)   // truncation toward zero

    Note this is NOT mathematical floor at exact negative integers: for
    x == -2.0 it yields -3 with frac 1.0. We replicate that exactly.

    Valid for |a| < 2**23 (the engine's octave coordinates stay below ~8.4e6,
    see module docstring). Returns frac as float32 (the narrow-to-float that
    happens at the PerlinGradient call boundary, reference perlin.h:68) and
    frac_m1 = frac - 1 computed before narrowing (reference perlin.h:69 passes
    `x - 1` evaluated in double).
    """
    one = np.float32(1.0)
    neg = a.hi < 0.0
    # Candidate cell from hi alone: trunc(hi) for hi >= 0, trunc(hi - 1) for
    # hi < 0. Exact for |hi| < 2**24 (integer arithmetic; engine coords stay
    # below ~8.4e6).
    cell_f = jnp.where(neg, jnp.trunc(a.hi - one), jnp.trunc(a.hi))
    # True fraction = (hi - cell_f) + lo, tracked error-free: hi - cell_f can
    # round when |hi| < 1 (e.g. 1 + (-0.38) needs one more bit), so capture
    # its residual too.
    d, derr = two_sum(a.hi, -cell_f)
    f, e = two_sum(d, a.lo)
    e = e + derr
    f, e = quick_two_sum(f, e)
    # lo can push the true value across a cell boundary relative to the
    # hi-only decision; renormalize by floor(f). One special case: at exact
    # negative integers the reference macro legitimately yields frac == 1.0
    # (FLOOR(-2.0) = -3), so f == 1.0 with no positive residual must NOT be
    # renormalized, while f == 1.0 that arose from rounding a slightly larger
    # sum (e > 0) must be.
    adj = jnp.floor(f)
    adj = jnp.where((f == one) & (e <= 0.0), np.float32(0.0), adj)
    cell = cell_f.astype(jnp.int32) + adj.astype(jnp.int32)
    ff = f - adj  # exact (adj in {-1, 0, 1}, result in [0, 1])
    fh, fl = quick_two_sum(ff, e)
    frac = fh  # already the correctly rounded f32 fraction
    # frac - 1 must round ONCE from the full-precision fraction (the C code
    # subtracts in double and narrows at the call boundary). fh - 1 alone can
    # itself round (ulp grows to 2^-24 on [-1,0)), so track its residual.
    t, terr = two_sum(fh, -one)
    frac_m1 = t + (terr + fl)
    return cell, frac, frac_m1
