"""Fused field kernel (coords+noise+normals+shade in one Pallas launch) vs
the composed XLA spec path — see ops/kernels/field_pallas.py.

Reference anchors: GenerateHeightMap main.cpp:123-151, compute_normal
main.cpp:338-346, shade main.cpp:369-381.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from planet_tpu.models import heightfield
from planet_tpu.ops.kernels import field_pallas

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

N = 128
RADIUS = 6.371e6


@pytest.fixture(scope="module")
def spec_frame():
    return heightfield.frame_cube(N, RADIUS, use_pallas=False)


@pytest.fixture(scope="module")
def fused_frame():
    return heightfield.frame_cube(N, RADIUS, use_pallas=True,
                                  interpret=True, block_rows=32)


def test_heights_match_spec(spec_frame, fused_frame):
    """In-kernel iota coordinates deviate from the XLA DF bilinear only by
    rounding (~1e-11 relative position); through six ridged octaves and the
    8848 m amplitude that bounds the height difference well under a metre."""
    h_spec, _ = spec_frame
    h_fused, _ = fused_frame
    assert h_fused.shape == (6, N, N)
    err = float(jnp.max(jnp.abs(h_fused - h_spec)))
    assert err < 0.2, err


def test_shade_matches_spec(spec_frame, fused_frame):
    """Shade (normals + Lambert) from the in-kernel halo recompute matches
    the edge-padded central-difference spec, including face-edge clamping."""
    _, s_spec = spec_frame
    _, s_fused = fused_frame
    err = float(jnp.max(jnp.abs(s_fused - s_spec)))
    assert err < 1e-3, err


def test_block_size_invariance(fused_frame):
    """Halo recompute is deterministic: different grid blockings produce
    bitwise-identical frames (each block derives its halo from iota, not
    from neighbours)."""
    h_a, s_a = fused_frame
    h_b, s_b = heightfield.frame_cube(N, RADIUS, use_pallas=True,
                                      interpret=True, block_rows=8)
    assert jnp.array_equal(h_a, h_b)
    assert jnp.array_equal(s_a, s_b)


def test_face_edge_shade_is_clamped(fused_frame):
    """Face-boundary texels use replicated-edge differences (the reference
    pads by replication, main.cpp:338-346): shade at the boundary must be
    finite and within the lambert range everywhere."""
    _, s = fused_frame
    assert bool(jnp.isfinite(s).all())
    assert float(s.min()) >= np.sqrt(0.001) - 1e-6
    assert float(s.max()) <= np.sqrt(1.001) + 1e-6


def test_bad_n_rejected():
    with pytest.raises(ValueError):
        field_pallas.field_cube(192, RADIUS)
    with pytest.raises(ValueError):
        field_pallas.field_cube(64, RADIUS)


def test_field_strip_matches_full_cube():
    """field_cube_strip (the sharded config-5 fast path: traced row offset,
    in-kernel halo recompute) returns exactly the corresponding rows of the
    full-cube kernel — same absolute-coordinate arithmetic, bitwise."""
    import jax.numpy as jnp

    n, rows = 256, 64
    h_full, s_full = field_pallas.field_cube(n, 6.371e6, interpret=True)
    for row0 in (0, 64, 192):
        h, s = field_pallas.field_cube_strip(n, 6.371e6, jnp.int32(row0),
                                             rows, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(h), np.asarray(h_full[:, row0:row0 + rows, :]))
        np.testing.assert_array_equal(
            np.asarray(s), np.asarray(s_full[:, row0:row0 + rows, :]))
