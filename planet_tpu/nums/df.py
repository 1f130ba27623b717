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


def floor_split_parts(a: DF):
    """Split DF coordinate into (int32 cell, fraction as a normalized DF
    pair) with the reference's FLOOR semantics (reference perlin.h:52-56):

        FLOOR(x) = (int)((x < 0) ? x - 1.0 : x)   // truncation toward zero

    Note this is NOT mathematical floor at exact negative integers: for
    x == -2.0 it yields -3 with frac 1.0. We replicate that exactly.

    Valid for |a| < 2**23 (the engine's octave coordinates stay below ~8.4e6,
    see module docstring). The DF pair carries the fraction to ~2^-48, which
    is what licenses `double_mod1`'s incremental octave scheme. The op
    sequence here is mirrored exactly by the Pallas kernel's in-kernel
    restatement (ops.kernels.perlin_pallas._floor_split_df) — keep them in
    lockstep, bit-identity between the XLA and Pallas engines depends on it.
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
    # f - adj itself can round (f = -8e-5, adj = -1: the sum needs ~37 bits),
    # so capture its residual too — the pair must represent the fraction to
    # full DF precision for the incremental doubling to be sound.
    ff, ferr = two_sum(f, -adj)
    fh, fl = quick_two_sum(ff, e + ferr)
    return cell, fh, fl


def frac_m1(fh, fl):
    """f32-rounded (frac - 1) from a DF fraction. frac - 1 must round ONCE
    from the full-precision fraction (the C code subtracts in double and
    narrows at the PerlinGradient call boundary, perlin.h:69); fh - 1 alone
    can itself round (ulp grows to 2^-24 on [-1,0)), so track its residual."""
    t, terr = two_sum(fh, -np.float32(1.0))
    return t + (terr + fl)


def double_mod1(cell, fh, fl):
    """Cell/frac split of 2*(cell + frac) from an existing split: one exact
    doubling, a carry test, a Sterbenz-exact subtract, a renormalization.
    The DF value 2*(fh + fl) - carry is preserved EXACTLY, so chaining this
    per octave (lacunarity 2.0, reference main.cpp:828) keeps the octave-0
    fraction's full precision through every octave."""
    one = np.float32(1.0)
    th = fh + fh
    tl = fl + fl
    # Normalization gives |tl| <= ulp(th)/2, so th + tl >= 1 reduces to:
    carry = (th > one) | ((th == one) & (tl >= 0.0))
    fh2 = jnp.where(carry, th - one, th)
    fh3, fl3 = quick_two_sum(fh2, tl)
    return cell * 2 + carry.astype(jnp.int32), fh3, fl3


def floor_split_ref(a: DF):
    """(int32 cell, f32 frac, f32 frac-1) — the point-query form of
    floor_split_parts; see there for the FLOOR-macro semantics."""
    cell, fh, fl = floor_split_parts(a)
    return cell, fh, frac_m1(fh, fl)


# ---------------------------------------------------------------------------
# int24-pair fraction representation: the octave-parallel split scheme
# ---------------------------------------------------------------------------
#
# With lacunarity exactly 2.0 (the product config, reference main.cpp:828)
# octave o's cell/frac split of 2^o * x is a pure BIT SHIFT of octave 0's
# split when the fraction is held as a 48-bit fixed-point integer pair
# (hi24, lo24): frac = hi24 * 2^-24 + lo24 * 2^-48. Every octave's split is
# then derived from octave 0 by STATIC shifts — no serial dependency chain
# across octaves, which is what made the double_mod1 scheme the measured
# bottleneck of the noise kernel (63% of kernel time on a v5e chip was the
# per-octave split/renormalize chain; see tools/microbench_stages.py).
#
# Exactness: planet-scale engine coordinates are products of an f32 DF pair,
# whose lowest-order bits sit at ~2^-43 — comfortably above the 2^-48
# truncation floor, so the int24 pair carries the octave-0 fraction exactly
# and every shifted octave split is exact. Coordinates with bits below 2^-48
# (possible for |x| << 1 near cube-face centers) are truncated at 2^-48,
# an error far inside the 1e-5 parity bar.
#
# Documented deviation from the reference FLOOR quirk: the reference's
# FLOOR(x) = (int)(x<0 ? x-1 : x) yields cell = x-1 / frac = 1.0 at exact
# negative integers (perlin.h:52-56). int24_parts canonicalizes frac 1.0 to
# (cell+1, frac 0.0). The two forms select the same lattice gradient with
# zero weight; the only numeric difference is the reference's f32 lerp
# a + (b-a)*1.0 vs the exact b — a <=1-ulp difference on a measure-zero set
# of inputs (exact dyadic coordinates). The f64 spec path (ops.perlin)
# keeps the exact quirk semantics.


_M24 = np.int32(2**24 - 1)
_P24 = np.float32(2.0**-24)



def int24_parts(a: DF):
    """(cell int32, hi24 int32, lo24 int32) from a DF coordinate: the
    FLOOR-macro cell plus the fraction as 48-bit fixed point (truncated
    toward zero at 2^-48, canonicalized so frac in [0, 1)).

    The op sequence is mirrored by the Pallas kernel's in-kernel restatement
    (ops.kernels.perlin_pallas._int24_parts) — keep them in lockstep;
    bit-identity between the XLA and Pallas engines depends on it."""
    cell, fh, fl = floor_split_parts(a)
    t = fh * np.float32(2.0**24)         # exact: power-of-two scale
    hi_f = jnp.trunc(t)
    r = t - hi_f                         # exact: fractional bits of t
    lo_f = jnp.floor(r * np.float32(2.0**24) + fl * np.float32(2.0**48))
    lo_i = lo_f.astype(jnp.int32)
    hi_i = hi_f.astype(jnp.int32) + (lo_i >> 24)   # borrow/carry (+-1)
    lo_i = lo_i & _M24
    # canonicalize: frac == 1.0 (the reference FLOOR quirk at exact negative
    # integers) becomes cell+1 / frac 0. floor_split_parts guarantees
    # frac >= 0, so hi_i >= 0 and the shift is a plain carry.
    cell = cell + (hi_i >> 24)
    hi_i = hi_i & _M24
    return cell, hi_i, lo_i


def shift_split24(cell, hi24, lo24, o: int):
    """Octave-o cell/frac split from octave 0's int24 parts, by static
    shifts (o in [0, 24)). Returns (cell_o int32, frac f32, frac-1 f32).

    The fraction is truncated to the 24-bit window hi_o (bits o..o+24 of
    the exact 48-bit fraction): frac error < 2^-24, which propagates to a
    noise-value error < ~1e-6 — far inside the 1e-5 oracle-parity bar —
    while making ``frac - 1`` an EXACT single f32 subtract (hi_o < 2^24,
    so (hi_o - 2^24)·2^-24 is representable), which removes the lo-residue
    reconstruction (4 VPU ops/axis/octave) from the hottest loop. Mirrored
    in-kernel by ops.kernels.perlin_pallas._shift_split24 — keep the op
    sequence in lockstep; XLA/Pallas bit-identity depends on it."""
    o = int(o)
    assert 0 <= o < 24, o
    cell_o = (cell << o) + (hi24 >> (24 - o)) if o else cell
    hi_o = ((hi24 << o) | (lo24 >> (24 - o))) & _M24 if o else hi24
    fh = hi_o.astype(jnp.float32) * _P24
    fm1 = fh - np.float32(1.0)
    return cell_o, fh, fm1
