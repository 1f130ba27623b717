"""Near-plane clipping (raster/nearclip.py): GL parity for triangles
straddling the near plane (reference renders through GL which clips,
render.cpp:455-491, near=1.0 at main.cpp:1074; the exact raster previously
whole-culled any triangle with a vertex at w <= 1e-9)."""

import numpy as np
import jax.numpy as jnp

from planet_tpu.raster import coverage as cov
from planet_tpu.raster import coverage_pallas as cpal
from planet_tpu.raster import nearclip


def _grid_patch(zs, xs, ys, near=1.0, far=1e6):
    """Build a (1, G, G, 4) clip grid from eye-space points: the engine's
    projection has w' = z_view, z' = A*z_view + B."""
    a = (far + near) / (far - near)
    b = -2.0 * far * near / (far - near)
    g = zs.shape[0]
    clip = np.zeros((1, g, g, 4), np.float32)
    clip[0, ..., 0] = xs
    clip[0, ..., 1] = ys
    clip[0, ..., 2] = a * zs + b
    clip[0, ..., 3] = zs
    return jnp.asarray(clip)


def _floor_scene(g=8, w=64, h=64):
    """A ground plane running under the camera: rows span eye-space z from
    behind the camera (z < 0) to far in front — the front rows straddle
    the near plane. Returns (clip, normal, valid)."""
    z_rows = np.linspace(-2.0, 40.0, g)                 # eye z per row
    zs = np.broadcast_to(z_rows[:, None], (g, g)).copy()
    # x spreads with z so the plane fills the viewport horizontally
    # (ascending so the cell winding is front-facing under FRONT_SIGN —
    # flipped with the round-5 winding-sign fix)
    xcol = np.linspace(-1.2, 1.2, g)
    xs = (xcol[None, :] * np.maximum(np.abs(zs), 0.3)).astype(np.float32)
    # a floor below the camera: y_clip = y_eye * proj; keep it simple with
    # y_eye = -1.5 (slightly below), scaled by proj factor 1
    ys = np.full((g, g), -1.5, np.float32)
    clip = _grid_patch(zs.astype(np.float32), xs, ys)
    normal = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (1, g, g, 3))
    valid = jnp.ones((1, g, g), bool)
    return clip, normal, valid


def test_clip_expand_counts_and_plane():
    # one triangle, one vertex inside (f > 0), two behind
    vc = jnp.asarray([[[0.0, 0.0, 5.0, 6.0],        # f = 11 > 0
                       [1.0, 0.0, -3.0, 1.0],       # f = -2
                       [0.0, 1.0, -4.0, 2.0]]],     # f = -2
                     jnp.float32)
    vn = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                          (1, 3, 3))
    cvc, cvn, clive = nearclip.clip_expand(vc, vn, jnp.ones((1,), bool))
    clive = np.asarray(clive)
    assert clive[0] and not clive[1]            # cnt==1 -> one triangle
    f = np.asarray(cvc[0, :, 2] + cvc[0, :, 3])
    assert f[0] > 0                              # kept vertex
    assert abs(f[1]) < 1e-4 and abs(f[2]) < 1e-4  # clip-plane vertices

    # two vertices inside -> quad -> two triangles
    vc2 = jnp.asarray([[[0.0, 0.0, -3.0, 1.0],      # f = -2
                        [1.0, 0.0, 5.0, 6.0],       # f = 11
                        [0.0, 1.0, 4.0, 5.0]]],     # f = 9
                      jnp.float32)
    cvc2, _, clive2 = nearclip.clip_expand(vc2, vn, jnp.ones((1,), bool))
    clive2 = np.asarray(clive2)
    assert clive2[0] and clive2[1]
    # every emitted vertex is on or inside the near plane
    ff = np.asarray(cvc2[:, :, 2] + cvc2[:, :, 3])
    assert (ff > -1e-3).all()


def test_straddlers_drawn_not_vanished():
    clip, normal, valid = _floor_scene()
    w = h = 64
    img, depth, rc = cov.raster_frame(clip, normal, valid, w, h)
    assert int(rc.n_straddle) > 0
    assert not bool(rc.overflowed)
    # the floor fills the bottom of the frame right up to the bottom edge:
    # without clipping the straddling band vanishes and the last rows are
    # background
    bottom = np.asarray(img[-4:, :])
    assert (bottom > 0).mean() > 0.5, (bottom > 0).mean()


def test_clip_path_backends_agree():
    clip, normal, valid = _floor_scene()
    w = h = 64
    img_a, dep_a, rc_a = cov.raster_frame(clip, normal, valid, w, h)
    img_b, dep_b, rc_b = cpal.raster_frame_pallas(clip, normal, valid, w, h,
                                                  interpret=True)
    assert int(rc_a.n_straddle) == int(rc_b.n_straddle)
    a = np.asarray(img_a)
    b = np.asarray(img_b)
    # clipped triangles evaluate outside the exact coverage domain; demand
    # near-total agreement (same tolerance as the huge-class tests)
    eq = (a > 0) == (b > 0)
    assert eq.mean() > 0.995, eq.mean()
    both = (a > 0) & (b > 0)
    assert np.abs(a[both] - b[both]).max() <= 2.5 / 1023


def test_no_straddlers_zero_cost_path_unchanged():
    # a fully-in-front scene: n_straddle == 0 and images match the
    # pre-clip behavior (regression guard for the classification)
    g = 8
    zs = np.linspace(5.0, 40.0, g)
    zs = np.broadcast_to(zs[:, None], (g, g)).astype(np.float32)
    # ascending x: front-facing under FRONT_SIGN (round-5 winding fix)
    xs = (np.linspace(-1.0, 1.0, g)[None, :]
          * np.maximum(np.abs(zs), 0.3)).astype(np.float32)
    ys = np.full((g, g), -1.5, np.float32)
    clip = _grid_patch(zs, xs, ys)
    normal = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32), (1, g, g, 3))
    valid = jnp.ones((1, g, g), bool)
    img, depth, rc = cov.raster_frame(clip, normal, valid, 64, 64)
    assert int(rc.n_straddle) == 0
    assert int(rc.n_tris) > 0
