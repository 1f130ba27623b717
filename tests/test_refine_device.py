"""Device-side refinement vs the host refiner (smooth-sphere probes)."""

import numpy as np
import jax.numpy as jnp

from planet_tpu.geom import cubesphere, quadid
from planet_tpu.lod import refine, refine_device
from planet_tpu.nums import df as dfm

RADIUS = 6371000.0


def _roots():
    corners = cubesphere.root_corners(RADIUS)
    ids = np.array([quadid.make_root(f) for f in range(6)], np.uint64)
    lo, hi = quadid.to_words(ids)
    ch, cl = (np.asarray(a) for a in dfm.from_f64(corners))
    return lo, hi, ch, cl


def test_device_refine_matches_host_zero_probes():
    cam = np.array([0.0, 0.0, -2.5 * RADIUS])
    max_lod = 6

    host = refine.refine(cam, max_lod, RADIUS,
                         height_fn=lambda p: np.zeros(p.shape[:-1], np.float32))

    lo, hi, ch, cl = _roots()
    cam_df = dfm.from_f64(cam)
    dev = refine_device.refine_device(
        np.asarray(cam_df.hi), np.asarray(cam_df.lo), lo, hi, ch, cl,
        max_lod=max_lod, cap=4096, radius=RADIUS, probe_fn_name="zero")

    n = int(dev.n_leaves)
    assert not bool(dev.overflowed)
    got_ids = quadid.from_words(np.asarray(dev.leaf_lo[:n]),
                                np.asarray(dev.leaf_hi[:n]))
    # same leaf SET (device emits in level order, host in DFS order)
    assert set(int(q) for q in got_ids) == set(int(q) for q in host.ids)
    # depths consistent
    depths = np.asarray(dev.leaf_depth[:n])
    np.testing.assert_array_equal(
        depths, [int(quadid.depth_of(np.uint64(q))) for q in got_ids])
    # corners match host corners for matching ids (to DF precision)
    host_by_id = {int(q): c for q, c in zip(host.ids, host.corners)}
    got_c = (np.asarray(dev.leaf_corners_hi[:n], np.float64)
             + np.asarray(dev.leaf_corners_lo[:n], np.float64))
    for i, q in enumerate(got_ids):
        want = host_by_id[int(q)]
        err = np.max(np.abs(got_c[i] - want) / np.maximum(np.abs(want), 1.0))
        assert err < 1e-9, (i, err)


def test_device_refine_overflow_flag():
    cam = np.array([0.0, 0.0, -(RADIUS + 50.0)])   # very close: deep splits
    lo, hi, ch, cl = _roots()
    cam_df = dfm.from_f64(cam)
    dev = refine_device.refine_device(
        np.asarray(cam_df.hi), np.asarray(cam_df.lo), lo, hi, ch, cl,
        max_lod=10, cap=64, radius=RADIUS, probe_fn_name="zero")
    assert bool(dev.overflowed)
