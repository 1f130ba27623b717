"""Splat raster, PNG writer, and checkpoint round-trip tests."""

import os

import numpy as np
import jax.numpy as jnp

from planet_tpu.geom.camera import Camera
from planet_tpu.io import checkpoint, png
from planet_tpu.raster import splat


def test_splat_depth_test():
    """Two fragments on the same pixel: the nearer one wins."""
    clip = jnp.asarray(np.array([
        [0.0, 0.0, 0.5, 1.0],       # further
        [0.0, 0.0, -0.5, 1.0],      # nearer
    ], np.float32))
    shade = jnp.asarray(np.array([0.25, 0.75], np.float32))
    valid = jnp.asarray(np.array([True, True]))
    img, depth = splat.splat_frame(clip, shade, valid, 8, 8,
                                   fill_rounds=0)
    img = np.asarray(img)
    y, x = 4, 4
    assert abs(img[y, x] - 0.75) < 2e-3
    assert abs(np.asarray(depth)[y, x] + 0.5) < 1e-4
    # all other pixels background
    mask = np.ones((8, 8), bool)
    mask[y, x] = False
    assert (img[mask] == 0.0).all()


def test_splat_culls_invalid_and_behind():
    clip = jnp.asarray(np.array([
        [0.0, 0.0, 0.0, -1.0],      # behind camera
        [0.0, 0.0, 0.0, 1.0],       # valid=False
        [5.0, 0.0, 0.0, 1.0],       # off-screen
    ], np.float32))
    shade = jnp.asarray(np.array([0.5, 0.5, 0.5], np.float32))
    valid = jnp.asarray(np.array([True, False, True]))
    img, _ = splat.splat_frame(clip, shade, valid, 8, 8, fill_rounds=0)
    assert (np.asarray(img) == 0.0).all()


def test_hole_fill():
    clip = jnp.asarray(np.array([[0.0, 0.0, 0.0, 1.0]], np.float32))
    shade = jnp.asarray(np.array([1.0], np.float32))
    valid = jnp.asarray(np.array([True]))
    img, _ = splat.splat_frame(clip, shade, valid, 8, 8, fill_rounds=1)
    img = np.asarray(img)
    assert (img[3:6, 3:6] > 0.9).all()      # 3x3 filled
    assert img[0, 0] == 0.0


def test_upsample_cells_counts():
    q, g = 2, 4
    clip = jnp.zeros((q, g, g, 4), jnp.float32)
    shade = jnp.zeros((q, g, g), jnp.float32)
    valid = jnp.ones((q, g, g), bool)
    c, s, v = splat.upsample_cells(clip, shade, valid, 3)
    assert c.shape == (q, g - 1, g - 1, 9, 4)
    assert s.shape == (q, g - 1, g - 1, 9)
    assert v.shape == s.shape


def test_png_roundtrip_size(tmp_path):
    img = np.linspace(0, 1, 64 * 32).reshape(32, 64).astype(np.float32)
    p = str(tmp_path / "t.png")
    png.write_png(p, img)
    data = open(p, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 100


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "save.npz")
    active = Camera(position=np.array([1.0, 2.0, 3.0]),
                    angles=np.array([0.1, 0.2, 0.3], np.float32))
    slots = [Camera(position=np.array([float(i), 0.0, 0.0]))
             for i in range(12)]
    checkpoint.save(p, active, slots)
    a2, s2 = checkpoint.load(p)
    np.testing.assert_array_equal(a2.position, active.position)
    np.testing.assert_array_equal(a2.angles, active.angles)
    np.testing.assert_array_equal(s2[7].position, slots[7].position)


def test_checkpoint_missing_file_defaults(tmp_path):
    a, slots = checkpoint.load(str(tmp_path / "nonexistent.npz"))
    assert a.position[2] == -6371010.0
    assert len(slots) == 12
