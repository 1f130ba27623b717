"""Multi-chip sharding tests on the fake 8-device CPU mesh: the sharded
heightfield step (halo exchange + psum) must equal the unsharded program."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from planet_tpu.nums import df as dfm
from planet_tpu.parallel import facemesh, sharded

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles


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


def test_sharded_2d_slice_mesh_equals_unsharded():
    """Multi-slice (DCN) layout, docs/multislice.md: a (2, 4) mesh with
    faces sharded over the outer "slice" axis and rows over the inner ICI
    axis must still be bitwise-equal to the unsharded program — the
    face-seam ring psum now crosses the slice boundary."""
    comps = _points()
    mesh = sharded.make_mesh_2d(2, 4)
    f_sh = sharded.sharded_field_step(mesh, octaves=4, xyscale=1000.0)
    f_un = sharded.unsharded_field_step(octaves=4, xyscale=1000.0)
    h_s, sh_s, st_s = f_sh(*comps)
    h_u, sh_u, st_u = f_un(*comps)
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_u))
    np.testing.assert_array_equal(np.asarray(sh_s), np.asarray(sh_u))
    np.testing.assert_allclose(np.asarray(st_s), np.asarray(st_u), rtol=1e-6)


def test_sharded_2d_clamp_mode():
    comps = _points(H=16, W=16)
    mesh = sharded.make_mesh_2d(3, 2)
    f_sh = sharded.sharded_field_step(mesh, octaves=2, xyscale=500.0,
                                      seam="clamp")
    f_un = sharded.unsharded_field_step(octaves=2, xyscale=500.0,
                                        seam="clamp")
    _, sh_s, _ = f_sh(*comps)
    _, sh_u, _ = f_un(*comps)
    np.testing.assert_array_equal(np.asarray(sh_s), np.asarray(sh_u))


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


def test_seam_lines_route_neighbor_texels():
    """The face-seam halo must be the geometrically nearest boundary texel
    of the adjacent face (the texel just across the seam): brute-force the
    nearest neighbor in 3D and check _seam_lines routes exactly it."""
    n = 16
    h = np.arange(6 * n * n, dtype=np.float32).reshape(6, n, n)
    ring = np.stack([h[:, 0, :], h[:, :, -1], h[:, -1, :], h[:, :, 0]],
                    axis=1)
    top, bot, left, right = (np.asarray(a) for a in
                             sharded._seam_lines(jnp.asarray(ring)))
    pts = np.stack([facemesh.face_grid_points(f, n, 1.0) for f in range(6)])
    own_pos = {facemesh.EDGE_V0: pts[:, 0, :],     # (6, n, 3) along u
               facemesh.EDGE_V1: pts[:, -1, :],
               facemesh.EDGE_U0: pts[:, :, 0],     # along v
               facemesh.EDGE_U1: pts[:, :, -1]}
    halo = {facemesh.EDGE_V0: top, facemesh.EDGE_V1: bot,
            facemesh.EDGE_U0: left, facemesh.EDGE_U1: right}
    nbr_face, nbr_edge, _ = facemesh.edge_adjacency()
    for f in range(6):
        for e in range(4):
            g, e2 = int(nbr_face[f, e]), int(nbr_edge[f, e])
            gpos = own_pos[e2][g]                  # (n, 3) g's boundary
            gval = ring[g, e2]                     # matching values
            for i in range(n):
                j = np.argmin(((gpos - own_pos[e][f, i]) ** 2).sum(-1))
                assert halo[e][f, i] == gval[j], (f, e, i, g, e2, j)


def test_sharded_clamp_mode_still_available():
    comps = _points(H=16, W=16)
    mesh = sharded.make_mesh(4)
    f_sh = sharded.sharded_field_step(mesh, octaves=2, xyscale=500.0,
                                      seam="clamp")
    f_un = sharded.unsharded_field_step(octaves=2, xyscale=500.0,
                                        seam="clamp")
    _, sh_s, _ = f_sh(*comps)
    _, sh_u, _ = f_un(*comps)
    np.testing.assert_array_equal(np.asarray(sh_s), np.asarray(sh_u))


def test_exchange_fixes_seam_derivatives():
    """With face-seam exchange, the central difference at a face's edge
    texel must use the neighbor face's height (not a clamped copy): compare
    the u-derivative implied at the u=0 edge against a direct computation
    from the two faces' heights."""
    comps = _points(H=16, W=16)
    f_ex = sharded.unsharded_field_step(octaves=2, xyscale=500.0)
    f_cl = sharded.unsharded_field_step(octaves=2, xyscale=500.0,
                                        seam="clamp")
    h, sh_ex, _ = f_ex(*comps)
    _, sh_cl, _ = f_cl(*comps)
    h = np.asarray(h)
    sh_ex, sh_cl = np.asarray(sh_ex), np.asarray(sh_cl)
    # interior must be identical; some edge texels must differ
    np.testing.assert_array_equal(sh_ex[:, 1:-1, 1:-1], sh_cl[:, 1:-1, 1:-1])
    edge_mask = np.ones_like(sh_ex, bool)
    edge_mask[:, 1:-1, 1:-1] = False
    assert (sh_ex[edge_mask] != sh_cl[edge_mask]).any()


def test_face_grid_points_df_row_strips_tile_the_grid():
    """Strip generation (row0/rows) must reproduce the full grid exactly:
    same DF hi/lo words, strip by strip (the streaming config-5 path)."""
    import jax

    n, radius = 32, 6371000.0
    ref = np.stack([facemesh.face_grid_points(f, n, radius)
                    for f in range(6)])               # (6, n, n, 3) f64
    strip = 8
    f = jax.jit(lambda r0: facemesh.face_grid_points_df(
        n, radius, row0=r0, rows=strip))
    for r0 in range(0, n, strip):
        got = f(jnp.int32(r0))
        vals = np.stack([np.asarray(a.hi, np.float64)
                         + np.asarray(a.lo, np.float64) for a in got],
                        axis=-1)
        # XLA:CPU's FMA contraction bounds jitted DF at ~5e-8 relative
        # (nums/df.py note); TPU is exact to ~1e-13
        err = np.abs(vals - ref[:, r0:r0 + strip]) / radius
        assert err.max() < 5e-7, (r0, err.max())


def test_face_grid_points_df_matches_host_f64():
    """Device-side DF cube-sphere points vs the host f64 generator.

    Eager DF is exact to ~1e-14 relative; under jit on XLA:CPU the EFTs
    lose to FMA contraction (documented in nums/df.py), so the jitted
    check only asserts ~f32-level agreement — the TPU backend is measured
    exact (see df.py note).
    """
    import jax
    import numpy as np

    from planet_tpu.parallel import facemesh

    n, radius, o = 32, 6371000.0, 1
    ref = np.stack([facemesh.face_grid_points(f, n, radius, o)
                    for f in range(6)])

    def collect(px, py, pz):
        return np.stack(
            [np.asarray(a.hi, np.float64) + np.asarray(a.lo, np.float64)
             for a in (px, py, pz)], axis=-1)

    eager = collect(*facemesh.face_grid_points_df(n, radius, o))
    assert (np.abs(eager - ref) / radius).max() < 1e-12

    jitted = collect(*jax.jit(
        lambda: facemesh.face_grid_points_df(n, radius, o))())
    assert (np.abs(jitted - ref) / radius).max() < 5e-7


def test_sharded_fused_field_matches_full_cube():
    """The config-5 fast path (per-chip fused strips, zero inter-chip
    halo traffic): the row-sharded (6, n, n) outputs equal the
    single-device fused full-cube kernel BITWISE — the strips recompute
    their halo rows from absolute coordinates."""
    from planet_tpu.ops.kernels import field_pallas

    n = 256
    mesh = sharded.make_mesh(8)
    fn = sharded.sharded_field_step_fused(mesh, n, 6.371e6, octaves=4,
                                          interpret=True)
    h, sh, stats = fn(jnp.float32(0))
    h_full, s_full = field_pallas.field_cube(n, 6.371e6, octaves=4,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_full))
    np.testing.assert_array_equal(np.asarray(sh), np.asarray(s_full))
    assert float(np.asarray(stats)[0]) == 6 * n * n
