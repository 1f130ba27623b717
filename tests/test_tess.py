"""Tessellation parity: patch mesh invariants + the batched vertex program
against the C oracle's scalar f32 restatement of the reference GLSL
(main.cpp:286-367)."""

import numpy as np
import pytest

from planet_tpu.geom import camera as cam_mod
from planet_tpu.geom import cubesphere
from planet_tpu.raster import shade
from planet_tpu.tess import mesh, vertex

GOLD = "tests/goldens/"
RADIUS = 6371000.0


def g(name):
    return np.load(GOLD + name + ".npy")


# ------------------------------------------------------------------ mesh

def test_mesh_reference_counts():
    assert mesh.vertex_list().shape == (1020, 3)
    assert mesh.strip_indices().shape == (2036,)
    assert mesh.interior_triangle_count() == 1682


def test_strip_indices_are_valid():
    idx = mesh.strip_indices()
    assert idx.min() == 0
    assert idx.max() == 1019


def test_grid_covers_vertex_list_exactly():
    """Every reference vertex maps to a dense-grid cell with identical
    (u, v, skirt); the 4 phantom corners are masked out."""
    vl = mesh.vertex_list()
    rows, cols = mesh.flat_to_grid()
    u, v, s, mask = mesh.grid_uv_skirt()
    np.testing.assert_array_equal(u[rows, cols], vl[:, 0])
    np.testing.assert_array_equal(v[rows, cols], vl[:, 1])
    np.testing.assert_array_equal(s[rows, cols], vl[:, 2])
    onmap = np.zeros((32, 32), bool)
    onmap[rows, cols] = True
    np.testing.assert_array_equal(onmap, mask)


def test_grid_triangles_match_strip():
    """Dense-grid triangles = strip triangles mapped through the grid; the
    interior count matches the reference's on-screen stat."""
    tris = mesh.grid_triangles()
    # interior triangles: all three vertices strictly inside the grid ring
    r, c = tris // 32, tris % 32
    interior = ((r > 0) & (r < 31) & (c > 0) & (c < 31)).all(axis=1)
    assert int(interior.sum()) == 1682
    # each triangle has 3 distinct vertices (degenerates were dropped)
    assert (tris[:, 0] != tris[:, 1]).all()
    assert (tris[:, 1] != tris[:, 2]).all()


# ------------------------------------------------------------- camera math

def test_viewproj_matches_oracle():
    cam_pos = g("tess_cam")
    cam = cam_mod.Camera(position=cam_pos,
                         angles=np.array([0.15, 0.6, 0.05], np.float32))
    rot = cam_mod.camera_rotation(cam)
    np.testing.assert_allclose(rot, g("tess_rot"), rtol=0, atol=2e-7)
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(50.0))
    proj = cam_mod.perspective_lh(pf, 800.0 / 600.0, 1.0, 2e7)
    vp = proj @ cam_mod.view_from_rotation(rot)
    np.testing.assert_allclose(vp, g("tess_viewproj"), rtol=1e-6, atol=1e-7)


def test_corner_inputs_match_oracle():
    """Cube-sphere corners from the golden paths, narrowed camera-relative,
    reproduce the oracle's P/N uniforms bit-for-bit."""
    paths = g("tess_paths")
    cam_pos = g("tess_cam")
    P, N = [], []
    for row in paths:
        face, digits = int(row[0]), [int(d) for d in row[1:] if d >= 0]
        corners = cubesphere.corners_from_path(face, digits, RADIUS)
        P.append((corners - cam_pos).astype(np.float32))
        N.append(cubesphere.normalize(corners).astype(np.float32))
    np.testing.assert_array_equal(np.stack(P), g("tess_P"))
    np.testing.assert_array_equal(np.stack(N), g("tess_N"))


# ---------------------------------------------------------- vertex program

def _run_vertex_program():
    T = g("tess_P").shape[0]
    dim = 32
    c0, c1 = 1.5 / dim, (dim - 1.5) / dim
    rect_lo = np.full((T, 2), c0, np.float32)
    rect_hi = np.full((T, 2), c1, np.float32)
    pix = np.full((T, 2), 1.0 / dim, np.float32)
    return vertex.tessellate(
        g("tess_P"), g("tess_N"), g("tess_tiles"), rect_lo, rect_hi,
        pix, g("tess_skirt"), g("tess_viewproj"))


def _flat(grid_arr):
    """(Q, 32, 32, ...) dense grid -> (Q, 1020, ...) reference vertex order."""
    rows, cols = mesh.flat_to_grid()
    return np.asarray(grid_arr)[:, rows, cols]


@pytest.fixture(scope="module")
def pv():
    return _run_vertex_program()


def test_vertex_heights(pv):
    got = _flat(pv.height)
    want = g("tess_height")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-2)


def test_vertex_world_positions(pv):
    got = _flat(pv.world)
    want = g("tess_world")
    scale = np.maximum(np.abs(want).max(), 1.0)
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_vertex_normals(pv):
    got = _flat(pv.normal)
    want = g("tess_normal")
    # unit vectors: compare by angle-ish absolute tolerance
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)


def test_vertex_clip_positions(pv):
    got = _flat(pv.clip)
    want = g("tess_clip")
    scale = np.maximum(np.abs(want), np.abs(want).max() * 1e-3)
    assert np.max(np.abs(got - want) / scale) < 2e-4


def test_vertex_shade(pv):
    got = np.asarray(shade.lambert(_flat(pv.normal)))
    want = g("tess_shade")
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-4)
