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


def _face_uv(face_corners, q):
    """Invert the cube-face parameterization for unit-sphere points q:
    centrally project q onto the face's plane and solve the (affine on a
    planar quad) bilinear map for (u, v). Returns (u, v, t) with t the
    projection scale (t > 0 iff q is on the face's hemisphere)."""
    c0, c1, c2 = face_corners[0], face_corners[1], face_corners[2]
    normal = np.cross(c1 - c0, c2 - c0)
    t = np.dot(c0, normal) / (q @ normal)
    x = q * t[..., None]
    e1, e2 = c1 - c0, c2 - c0
    u = (x - c0) @ e1 / np.dot(e1, e1)
    v = (x - c0) @ e2 / np.dot(e2, e2)
    return u, v, t


def test_face_grid_overscan_continuity():
    """The one-texel overscan ring of every face lands just inside the
    adjacent face named by edge_adjacency(), with the along-edge ordering
    matching the orientation flag — i.e. the locally generated halo
    (reference overscan, main.cpp:135-148) is continuous across face seams
    and edge_adjacency() correctly routes it."""
    from planet_tpu.geom import cubesphere

    n = 16
    corners = cubesphere.root_corners(1.0)            # (6, 4, 3)
    nbr_face, nbr_edge, rev = facemesh.edge_adjacency()

    for f in range(6):
        p = facemesh.face_grid_points(f, n, 1.0, overscan=1)  # (n+2, n+2, 3)
        np.testing.assert_allclose(np.linalg.norm(p, axis=-1), 1.0, rtol=1e-12)
        # overscan strips (excluding the 4 diagonal corner texels);
        # rows index v, columns index u (meshgrid indexing="xy")
        strips = {
            facemesh.EDGE_V0: p[0, 1:-1],
            facemesh.EDGE_V1: p[-1, 1:-1],
            facemesh.EDGE_U0: p[1:-1, 0],
            facemesh.EDGE_U1: p[1:-1, -1],
        }
        for e, q in strips.items():
            g = int(nbr_face[f, e])
            u, v, t = _face_uv(corners[g], q)
            # the strip projects onto the neighbor face's front hemisphere...
            assert (t > 0).all(), (f, e, g)
            # ...inside its parameter square...
            assert (u > -1e-12).all() and (u < 1 + 1e-12).all(), (f, e, g)
            assert (v > -1e-12).all() and (v < 1 + 1e-12).all(), (f, e, g)
            # ...within ~one texel of the shared edge (perpendicular coord
            # near 0 or 1), running along it (parallel coord spans (0,1))
            e2 = int(nbr_edge[f, e])
            perp = {facemesh.EDGE_V0: v, facemesh.EDGE_V1: 1 - v,
                    facemesh.EDGE_U0: u, facemesh.EDGE_U1: 1 - u}[e2]
            along = u if e2 in (facemesh.EDGE_V0, facemesh.EDGE_V1) else v
            assert (perp < 1.5 / n).all(), (f, e, g, perp.max())
            # orientation: along-edge parameter strictly monotonic, direction
            # given by the reversed flag
            d = np.diff(along)
            if bool(rev[f, e]):
                assert (d < 0).all(), (f, e, g)
            else:
                assert (d > 0).all(), (f, e, g)
