"""Parity tests for the fused Pallas noise kernel (interpreter mode on CPU).

The kernel must match (a) the jnp double-float path to ~f32 ulps (same op
sequence, different compiler) and (b) the C oracle goldens within the 1e-5
relative bar, including at planet scale.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from planet_tpu.nums import df as dfm
from planet_tpu.ops import perlin
from planet_tpu.ops.kernels import perlin_pallas as pk

GOLD = "tests/goldens/"


def _load_pts(name):
    return np.load(GOLD + name)


def _max_abs_err(got, want):
    return np.max(np.abs(np.asarray(got, np.float64) - np.asarray(want, np.float64)))


@pytest.mark.parametrize("kind,octaves,gain", [
    ("fbm", 4, 0.5), ("fbm", 6, 0.55), ("ridged", 6, 0.55), ("ridged", 18, 0.55),
])
def test_kernel_matches_df_path(kind, octaves, gain):
    pts = _load_pts("pts_fbm.npy")[:512]
    x, y, z = (dfm.from_f64(pts[:, i]) for i in range(3))
    ref_fn = perlin.fbm_df if kind == "fbm" else perlin.ridged_df
    got = pk.noise_df(kind, x.hi, x.lo, y.hi, y.lo, z.hi, z.lo,
                      octaves=octaves, gain=np.float32(gain), interpret=True)
    want = ref_fn(x, y, z, lacunarity=2.0, gain=np.float32(gain), octaves=octaves)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("name,kind,octaves,gain,lac,atol", [
    ("fbm_o4_g05.npy", "fbm", 4, 0.5, 2.0, 2e-5),
    ("fbm_o6_g055.npy", "fbm", 6, 0.55, 2.0, 2e-5),
    ("ridged_o6_g055.npy", "ridged", 6, 0.55, 2.0, 2e-5),
    ("ridged_o18_g055.npy", "ridged", 18, 0.55, 2.0, 5e-5),
    ("fbm_lac17_o5.npy", "fbm", 5, 0.5, 1.7, 2e-5),
])
def test_kernel_matches_oracle(name, kind, octaves, gain, lac, atol):
    pts = _load_pts("pts_fbm.npy")
    want = np.load(GOLD + name)
    x, y, z = (dfm.from_f64(pts[:, i]) for i in range(3))
    got = pk.noise_df(kind, x.hi, x.lo, y.hi, y.lo, z.hi, z.lo,
                      octaves=octaves, gain=np.float32(gain),
                      lacunarity=lac, interpret=True)
    assert _max_abs_err(got, want) < atol


def test_kernel_terrain_scale():
    """Planet-scale coordinates through the full ridged chain (the case that
    motivates double-float: f32-only coordinates would be garbage)."""
    pts = _load_pts("pts_sphere.npy")
    want = np.load(GOLD + "terrain_d18_md18.npy")
    scale = dfm.from_f64(np.float64(0.00001))
    x, y, z = (dfm.mul(dfm.from_f64(pts[:, i]), scale) for i in range(3))
    got = pk.noise_df("ridged", x.hi, x.lo, y.hi, y.lo, z.hi, z.lo,
                      octaves=18, gain=np.float32(0.55), interpret=True)
    got = np.asarray(got) * np.float32(8848.0)
    scale = np.maximum(np.abs(want), 8848.0 * 0.1)
    rel = np.abs(got - want) / scale
    assert float(rel.max()) <= 1e-5, float(rel.max())


def test_kernel_padding_shapes():
    """Non-multiple-of-block sizes and 2D shapes pad correctly."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(-50, 50, (7, 33, 3))
    x, y, z = (dfm.from_f64(pts[..., i]) for i in range(3))
    got = pk.noise_df("fbm", x.hi, x.lo, y.hi, y.lo, z.hi, z.lo,
                      octaves=2, gain=np.float32(0.5), interpret=True)
    want = perlin.fbm_df(x, y, z, octaves=2, gain=np.float32(0.5))
    assert got.shape == (7, 33)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)
