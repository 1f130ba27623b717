"""Heightfield model family (configs 1/2) and camera-control semantics."""

import numpy as np

from planet_tpu.geom import camera as cam_mod
from planet_tpu.models import heightfield
from planet_tpu.nums import df as dfm
from planet_tpu.ops import perlin_np
from planet_tpu.parallel import facemesh


def test_flat_patch_field_matches_numpy_reference():
    n = 32
    px, py, pz, xyscale = heightfield.flat_patch_points(n, extent=64.0)
    out = heightfield.field_from_padded_points(
        px, py, pz, xyscale, kind="fbm", octaves=4, gain=0.5,
        coord_scale=1.0, amplitude=1.0, use_pallas=False)
    assert out.heights.shape == (n, n)
    assert out.normal.shape == (n, n, 3)
    assert out.shade.shape == (n, n)
    # heights equal the host numpy fBm at the interior points
    o = 1
    pts_x = np.asarray(px.hi, np.float64) + np.asarray(px.lo, np.float64)
    pts_y = np.asarray(py.hi, np.float64) + np.asarray(py.lo, np.float64)
    pts_z = np.asarray(pz.hi, np.float64) + np.asarray(pz.lo, np.float64)
    want = perlin_np.fbm(pts_x, pts_y, pts_z, octaves=4,
                         gain=np.float32(0.5))[o:-o, o:-o]
    np.testing.assert_allclose(np.asarray(out.heights), want, atol=2e-5)
    nrm = np.linalg.norm(np.asarray(out.normal), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)


def test_cubesphere_field_runs():
    pts = np.stack([facemesh.face_grid_points(f, 16, 6371000.0, overscan=1)
                    for f in range(6)])
    comps = [dfm.from_f64(pts[..., k]) for k in range(3)]
    out = heightfield.field_from_padded_points(
        comps[0], comps[1], comps[2], 1000.0, kind="ridged", octaves=3,
        use_pallas=False)
    assert out.heights.shape == (6, 16, 16)
    assert np.isfinite(np.asarray(out.heights)).all()
    assert (np.asarray(out.shade) > 0).all()


def test_update_camera_moves_along_basis():
    cam = cam_mod.Camera(position=np.array([0.0, 0.0, -7e6]))
    rot0 = cam_mod.camera_rotation(cam)
    fwd = rot0[:, 2].copy()
    cam2 = cam.copy()
    cam_mod.update_camera(cam2, move=np.array([0.0, 0.0, 1.0]),
                          look=np.zeros(3), move_speed=1000.0,
                          look_speed=2.0, dt=0.5)
    delta = cam2.position - cam.position
    np.testing.assert_allclose(delta, fwd.astype(np.float64) * 500.0,
                               rtol=1e-6)


def test_update_camera_look_changes_angles():
    cam = cam_mod.Camera(position=np.array([0.0, 0.0, -7e6]))
    cam_mod.update_camera(cam, move=np.zeros(3),
                          look=np.array([1.0, -1.0, 0.0]),
                          move_speed=0.0, look_speed=2.0, dt=0.25)
    np.testing.assert_allclose(cam.angles[:2], [0.5, -0.5], atol=1e-6)


def test_speed_for_digit():
    assert cam_mod.speed_for_digit(1) == 10.0
    assert cam_mod.speed_for_digit(8) == 1e8


def test_ortho_lh_maps_box_to_ndc():
    m = cam_mod.ortho_lh(-2, 2, -1, 1, 5, 15)
    near_c = m @ np.array([0, 0, 5, 1], np.float32)
    far_c = m @ np.array([0, 0, 15, 1], np.float32)
    assert abs(near_c[2] - (-1.0)) < 1e-6
    assert abs(far_c[2] - 1.0) < 1e-6
    corner = m @ np.array([2, 1, 5, 1], np.float32)
    np.testing.assert_allclose(corner[:2], [1.0, 1.0], atol=1e-6)


def test_wireframe_upsample_keeps_edges_only():
    import jax.numpy as jnp
    from planet_tpu.raster import splat
    clip = jnp.zeros((1, 4, 4, 4), jnp.float32)
    shade = jnp.zeros((1, 4, 4), jnp.float32)
    valid = jnp.ones((1, 4, 4), bool)
    c_full, _, _ = splat.upsample_cells(clip, shade, valid, 4)
    c_wire, _, _ = splat.upsample_cells(clip, shade, valid, 4,
                                        wireframe=True)
    assert c_full.shape[-2] == 16
    assert c_wire.shape[-2] == 7       # i==0 row + j==0 col of a 4x4 grid
