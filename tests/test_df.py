"""Unit tests for double-float arithmetic vs float64 ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from planet_tpu.nums import df as dfm


def _rand(n, lo, hi, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, n)


def test_from_f64_roundtrip():
    x = _rand(1000, -1e7, 1e7, 0)
    d = dfm.from_f64(x)
    back = np.asarray(d.hi, np.float64) + np.asarray(d.lo, np.float64)
    # 49-bit split: relative error below 2^-48
    np.testing.assert_allclose(back, x, rtol=2**-48)


@pytest.mark.parametrize("op,npop", [
    (dfm.add, np.add),
    (dfm.sub, np.subtract),
    (dfm.mul, np.multiply),
    (dfm.div, np.divide),
])
def test_df_binary_ops(op, npop):
    a = _rand(2000, -1e6, 1e6, 1)
    b = _rand(2000, -1e6, 1e6, 2)
    b = np.where(np.abs(b) < 1.0, b + 2.0, b)  # keep div well-conditioned
    got = op(dfm.from_f64(a), dfm.from_f64(b))
    want = npop(a, b)
    err = np.abs(np.asarray(got.astype_f64()) - want)
    if npop in (np.add, np.subtract):
        # under cancellation the floor is the input split error (~2^-49 of
        # the operand magnitude), not a relative error of the result
        tol = (np.abs(a) + np.abs(b)) * 2**-45
    else:
        tol = np.maximum(np.abs(want), 1e-30) * 2**-44
    assert np.all(err <= tol), float(np.max(err / tol))


def test_df_sqrt():
    a = _rand(2000, 1e-3, 1e13, 3)
    got = np.asarray(dfm.sqrt(dfm.from_f64(a)).astype_f64())
    want = np.sqrt(a)
    np.testing.assert_allclose(got, want, rtol=2**-44)


def test_mul_pow2_exact():
    a = _rand(100, -64.0, 64.0, 4)
    d = dfm.from_f64(a)
    s = dfm.mul_pow2(d, 2.0**17)
    np.testing.assert_array_equal(np.asarray(s.hi), np.asarray(d.hi) * np.float32(2.0**17))
    np.testing.assert_array_equal(np.asarray(s.lo), np.asarray(d.lo) * np.float32(2.0**17))


def _ref_floor_split(x):
    """f64 model of the reference FLOOR macro + frac narrowing."""
    shifted = np.where(x < 0.0, x - 1.0, x)
    cell = np.trunc(shifted).astype(np.int64)
    frac = x - cell
    return cell, frac.astype(np.float32), (frac - 1.0).astype(np.float32)


def test_floor_split_random():
    x = _rand(5000, -8.4e6, 8.4e6, 5)
    cell, frac, fracm1 = dfm.floor_split_ref(dfm.from_f64(x))
    wc, wf, wfm1 = _ref_floor_split(x)
    np.testing.assert_array_equal(np.asarray(cell, np.int64), wc)
    # frac is f32-rounded from a ~49-bit value; for coords up to 2^23 the df
    # split may differ from f64 in the last f32 ulp
    np.testing.assert_allclose(np.asarray(frac), wf, atol=2**-23)
    np.testing.assert_allclose(np.asarray(fracm1), wfm1, atol=2**-23)


def test_floor_split_small_coords_bitexact():
    x = _rand(5000, -70.0, 70.0, 6)
    cell, frac, fracm1 = dfm.floor_split_ref(dfm.from_f64(x))
    wc, wf, wfm1 = _ref_floor_split(x)
    np.testing.assert_array_equal(np.asarray(cell, np.int64), wc)
    np.testing.assert_array_equal(np.asarray(frac), wf)
    np.testing.assert_array_equal(np.asarray(fracm1), wfm1)


def test_floor_split_negative_integers():
    # the FLOOR macro quirk: FLOOR(-2.0) == -3 with frac == 1.0
    x = np.array([-2.0, -1.0, -255.0, 2.0, 0.0, 5.0])
    cell, frac, _ = dfm.floor_split_ref(dfm.from_f64(x))
    np.testing.assert_array_equal(np.asarray(cell), [-3, -2, -256, 2, 0, 5])
    np.testing.assert_array_equal(np.asarray(frac), [1.0, 1.0, 1.0, 0.0, 0.0, 0.0])


def test_floor_split_doubled_octaves():
    # exact power-of-two octave scaling keeps cells exact across 18 octaves
    x = _rand(512, -64.0, 64.0, 7)
    d = dfm.from_f64(x)
    for i in range(18):
        s = 2.0**i
        cell, frac, _ = dfm.floor_split_ref(dfm.mul_pow2(d, s))
        wc, wf, _ = _ref_floor_split(x * s)
        np.testing.assert_array_equal(np.asarray(cell, np.int64), wc, err_msg=f"octave {i}")
        np.testing.assert_allclose(np.asarray(frac), wf, atol=2**-22, err_msg=f"octave {i}")
