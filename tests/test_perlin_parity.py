"""Parity of the JAX noise stack against the C oracle goldens.

The f64 path must match BIT-FOR-BIT (it is the spec). The double-float TPU
path must stay within the BASELINE.md fidelity bar (1e-5 relative).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from planet_tpu.nums import df as dfm
from planet_tpu.ops import perlin
from planet_tpu.models.terrain import RidgedTerrain

GOLD = pathlib.Path(__file__).parent / "goldens"


def g(name):
    return np.load(GOLD / f"{name}.npy")


# ------------------------------------------------------------ f64 spec path


def test_perlin3_f64_bitexact_unit():
    pts = g("pts_unit")
    want = g("perlin3_unit")
    got = np.asarray(perlin.perlin3_f64(pts[:, 0], pts[:, 1], pts[:, 2]))
    np.testing.assert_array_equal(got, want)


def test_perlin3_f64_bitexact_special():
    pts = g("pts_special")
    want = g("perlin3_special")
    got = np.asarray(perlin.perlin3_f64(pts[:, 0], pts[:, 1], pts[:, 2]))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name,fn,kwargs", [
    ("fbm_o4_g05", perlin.fbm_f64, dict(lacunarity=2.0, gain=0.5, octaves=4)),
    ("fbm_o6_g055", perlin.fbm_f64, dict(lacunarity=2.0, gain=0.55, octaves=6)),
    ("ridged_o6_g055", perlin.ridged_f64, dict(lacunarity=2.0, gain=0.55, octaves=6)),
    ("ridged_o18_g055", perlin.ridged_f64, dict(lacunarity=2.0, gain=0.55, octaves=18)),
    ("fbm_lac17_o5", perlin.fbm_f64, dict(lacunarity=1.7, gain=0.5, octaves=5)),
])
def test_octaves_f64_bitexact(name, fn, kwargs):
    pts = g("pts_fbm")
    want = g(name)
    kwargs = dict(kwargs)
    kwargs["gain"] = np.float32(kwargs["gain"])
    got = np.asarray(fn(pts[:, 0], pts[:, 1], pts[:, 2], **kwargs))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name,depth,max_depth", [
    ("terrain_d0_md1", 0, 1),
    ("terrain_d6_md18", 6, 18),
    ("terrain_d18_md18", 18, 18),
])
def test_terrain_f64_bitexact(name, depth, max_depth):
    pts = g("pts_sphere")
    want = g(name)
    got = np.asarray(RidgedTerrain().height_f64(pts, depth, max_depth))
    np.testing.assert_array_equal(got, want)


# ------------------------------------------------------- double-float path


def _df3(pts):
    return (dfm.from_f64(pts[:, 0]), dfm.from_f64(pts[:, 1]),
            dfm.from_f64(pts[:, 2]))


def test_perlin3_df_close():
    pts = g("pts_unit")
    want = g("perlin3_unit")
    x, y, z = _df3(pts)
    got = np.asarray(perlin.perlin3_df(x, y, z))
    # fade curve evaluated in f32 instead of f64-then-narrow: ~1e-6 absolute
    np.testing.assert_allclose(got, want, atol=5e-6)


@pytest.mark.parametrize("name,fn,kwargs,atol", [
    ("fbm_o4_g05", perlin.fbm_df, dict(lacunarity=2.0, gain=0.5, octaves=4), 2e-5),
    ("ridged_o6_g055", perlin.ridged_df, dict(lacunarity=2.0, gain=0.55, octaves=6), 2e-5),
    ("ridged_o18_g055", perlin.ridged_df, dict(lacunarity=2.0, gain=0.55, octaves=18), 5e-5),
    ("fbm_lac17_o5", perlin.fbm_df, dict(lacunarity=1.7, gain=0.5, octaves=5), 2e-5),
])
def test_octaves_df_close(name, fn, kwargs, atol):
    pts = g("pts_fbm")
    want = g(name)
    x, y, z = _df3(pts)
    kwargs = dict(kwargs)
    kwargs["gain"] = np.float32(kwargs["gain"])
    got = np.asarray(fn(x, y, z, **kwargs))
    np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize("name,depth,max_depth", [
    ("terrain_d0_md1", 0, 1),
    ("terrain_d6_md18", 6, 18),
    ("terrain_d18_md18", 18, 18),
])
def test_terrain_df_fidelity_bar(name, depth, max_depth):
    """The BASELINE bar: heights within 1e-5 relative error of the C build.

    Heights scale with 8848 m; we hold the df path to 1e-5 * amplitude-scale
    absolute, which is stricter than 1e-5 relative on typical heights.
    """
    pts = g("pts_sphere")
    want = g(name)
    x, y, z = _df3(pts)
    got = np.asarray(RidgedTerrain().height_df(x, y, z, depth, max_depth))
    scale = np.maximum(np.abs(want), 8848.0 * 0.1)
    rel = np.abs(got - want) / scale
    assert float(rel.max()) <= 1e-5, float(rel.max())


def test_perlin3_df_under_jit():
    # jit may contract mul+add into FMA (which only tightens the double-float
    # error terms) — values can differ from eager by ~1 ulp, not more.
    pts = g("pts_unit")[:256]
    x, y, z = _df3(pts)
    eager = np.asarray(perlin.perlin3_df(x, y, z))
    jitted = np.asarray(jax.jit(perlin.perlin3_df)(x, y, z))
    np.testing.assert_allclose(jitted, eager, atol=2e-6)
    # and the jitted values still match the oracle within the df bar
    np.testing.assert_allclose(jitted, g("perlin3_unit")[:256], atol=5e-6)
