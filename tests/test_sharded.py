"""Multi-chip sharding tests on the fake 8-device CPU mesh: the sharded
heightfield step (halo exchange + psum) must equal the unsharded program."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planet_tpu.nums import df as dfm
from planet_tpu.parallel import facemesh, sharded


def _points(H=32, W=32, radius=6371000.0):
    pts = np.stack([facemesh.face_grid_points(f, H, radius) for f in range(6)])
    assert pts.shape == (6, H, W, 3)
    comps = []
    for k in range(3):
        df = dfm.from_f64(pts[..., k])
        comps += [df.hi, df.lo]
    return comps


def test_mesh_has_8_fake_devices():
    assert len(jax.devices()) == 8


def test_sharded_equals_unsharded():
    comps = _points()
    mesh = sharded.make_mesh(8)
    f_sh = sharded.sharded_field_step(mesh, octaves=4, xyscale=1000.0)
    f_un = sharded.unsharded_field_step(octaves=4, xyscale=1000.0)
    h_s, sh_s, st_s = f_sh(*comps)
    h_u, sh_u, st_u = f_un(*comps)
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_u))
    # halo rows crossed chips: shading at strip seams must still match
    np.testing.assert_array_equal(np.asarray(sh_s), np.asarray(sh_u))
    np.testing.assert_allclose(np.asarray(st_s), np.asarray(st_u), rtol=1e-6)


def test_sharded_on_subset_mesh():
    comps = _points(H=16, W=16)
    mesh = sharded.make_mesh(4)
    f_sh = sharded.sharded_field_step(mesh, octaves=2, xyscale=500.0)
    f_un = sharded.unsharded_field_step(octaves=2, xyscale=500.0)
    _, sh_s, _ = f_sh(*comps)
    _, sh_u, _ = f_un(*comps)
    np.testing.assert_array_equal(np.asarray(sh_s), np.asarray(sh_u))


def test_face_adjacency_table():
    nbr_face, nbr_edge, rev = facemesh.edge_adjacency()
    # every edge is shared symmetrically
    for f in range(6):
        for e in range(4):
            g, e2 = int(nbr_face[f, e]), int(nbr_edge[f, e])
            assert int(nbr_face[g, e2]) == f
            assert int(nbr_edge[g, e2]) == e
            assert bool(rev[g, e2]) == bool(rev[f, e])
    # each face has 4 distinct neighbors
    for f in range(6):
        assert len(set(nbr_face[f])) == 4
        assert f not in set(nbr_face[f])


def test_face_grid_overscan_continuity():
    """Overscanned border texels of one face coincide with the first texels
    of the adjacent face's interior grid (they sample the same sphere points
    up to parameterization) — sanity: all points lie on the sphere."""
    p = facemesh.face_grid_points(0, 16, 1.0, overscan=1)
    r = np.linalg.norm(p, axis=-1)
    np.testing.assert_allclose(r, 1.0, rtol=1e-12)
