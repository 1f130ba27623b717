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


def _ridged6_height_fn(p):
    """Host-side probe heights through the device's own DF noise path, so
    host and device refiners see identical probe heights and the test
    isolates the refiner's split geometry (reference terrain chain
    main.cpp:552-556 / 823-832)."""
    from planet_tpu.ops.kernels import perlin_pallas as pk

    d = dfm.from_f64(np.asarray(p, np.float64))
    sh = np.float32(1e-5)
    sl = np.float32(np.float64(1e-5) - np.float64(sh))
    xh, xl = pk._df_scale(d.hi[..., 0], d.lo[..., 0], sh, sl)
    yh, yl = pk._df_scale(d.hi[..., 1], d.lo[..., 1], sh, sl)
    zh, zl = pk._df_scale(d.hi[..., 2], d.lo[..., 2], sh, sl)
    h = pk.noise_df("ridged", xh, xl, yh, yl, zh, zl,
                    octaves=6, gain=np.float32(0.55))
    return np.asarray(h) * np.float32(8848.0)


def test_device_refine_matches_host_terrain_orbit():
    """DF-exact split decisions: across an orbit of real-terrain cameras the
    device refiner must produce the host refiner's exact leaf sets (the
    reference evaluates ProcessQuad in double, main.cpp:546-571; the device
    evaluates it in double-float, ~1e-14 relative)."""
    max_lod = 7
    lo, hi, ch, cl = _roots()

    rng = np.random.default_rng(42)
    angles = np.linspace(0.0, 2 * np.pi, 4, endpoint=False)
    alts = [30e3, 300e3, 3000e3, 120.0]
    for ang, alt in zip(angles, alts):
        cdir = np.array([np.cos(ang), 0.31 * np.sin(2 * ang), np.sin(ang)])
        cdir /= np.linalg.norm(cdir)
        cam = cdir * (RADIUS + alt)

        host = refine.refine(cam, max_lod, RADIUS,
                             height_fn=_ridged6_height_fn)

        cam_df = dfm.from_f64(cam)
        dev = refine_device.refine_device(
            np.asarray(cam_df.hi), np.asarray(cam_df.lo), lo, hi, ch, cl,
            max_lod=max_lod, cap=8192, radius=RADIUS,
            probe_fn_name="ridged6")
        assert not bool(dev.overflowed)
        n = int(dev.n_leaves)
        got = set(int(q) for q in quadid.from_words(
            np.asarray(dev.leaf_lo[:n]), np.asarray(dev.leaf_hi[:n])))
        want = set(int(q) for q in host.ids)
        assert got == want, (
            f"alt={alt}: {len(got - want)} extra, {len(want - got)} missing "
            f"of {len(want)} leaves")


def test_device_refine_quality_matches_host():
    """lod_quality != 1 must keep the device refiner leaf-set equal to the
    host refiner's (the dial multiplies the split threshold d in both; the
    device does it in double-float, host in f64). Also sanity-check the
    dial's direction: quality > 1 refines at least as deep."""
    max_lod = 7
    lo, hi, ch, cl = _roots()
    cam_dir = np.array([0.3, 0.25, -0.9])
    cam_dir /= np.linalg.norm(cam_dir)
    cam = cam_dir * (RADIUS + 30e3)
    cam_df = dfm.from_f64(cam)

    n_prev = 0
    for q in (1.0, 3.0, 8.0):
        host = refine.refine(cam, max_lod, RADIUS,
                             height_fn=_ridged6_height_fn, quality=q)
        dev = refine_device.refine_device(
            np.asarray(cam_df.hi), np.asarray(cam_df.lo), lo, hi, ch, cl,
            max_lod=max_lod, cap=8192, radius=RADIUS,
            probe_fn_name="ridged6", quality=q)
        assert not bool(dev.overflowed)
        n = int(dev.n_leaves)
        got = set(int(x) for x in quadid.from_words(
            np.asarray(dev.leaf_lo[:n]), np.asarray(dev.leaf_hi[:n])))
        want = set(int(x) for x in host.ids)
        assert got == want, (
            f"quality={q}: {len(got - want)} extra, {len(want - got)} "
            f"missing of {len(want)} leaves")
        assert n >= n_prev
        n_prev = n


def test_device_refine_overflow_flag():
    cam = np.array([0.0, 0.0, -(RADIUS + 50.0)])   # very close: deep splits
    lo, hi, ch, cl = _roots()
    cam_df = dfm.from_f64(cam)
    dev = refine_device.refine_device(
        np.asarray(cam_df.hi), np.asarray(cam_df.lo), lo, hi, ch, cl,
        max_lod=10, cap=64, radius=RADIUS, probe_fn_name="zero")
    assert bool(dev.overflowed)


def test_device_refine_matches_host_at_max_depth_18():
    """Round-2 VERDICT item 5: DF split decisions at full reference depth.
    At depth ~18 the quad diagonal is ~60 m and displaced-corner
    coordinates burn most of an f32 mantissa on the planet radius — the
    regime where plain f32 split decisions diverge from the reference's
    double evaluation (main.cpp:546-571). Near-surface cameras force the
    deepest splits; device leaf sets must equal the f64 host refiner's
    exactly."""
    max_lod = 18
    lo, hi, ch, cl = _roots()

    # two near-surface cameras over distinct terrain (one on a face
    # center, one near a cube edge where root quads are most distorted),
    # placed relative to the DISPLACED surface (terrain height at the
    # camera direction) so the deepest quads actually split
    dirs = [np.array([0.12, 0.08, -1.0]), np.array([0.9, 0.1, -1.0])]
    for alt in (40.0, 900.0):
        for cdir in dirs:
            cdir = cdir / np.linalg.norm(cdir)
            h = float(_ridged6_height_fn((cdir * RADIUS)[None, :])[0])
            cam = cdir * (RADIUS + h + alt)

            host = refine.refine(cam, max_lod, RADIUS,
                                 height_fn=_ridged6_height_fn)

            cam_df = dfm.from_f64(cam)
            dev = refine_device.refine_device(
                np.asarray(cam_df.hi), np.asarray(cam_df.lo), lo, hi, ch,
                cl, max_lod=max_lod, cap=16384, radius=RADIUS,
                probe_fn_name="ridged6")
            assert not bool(dev.overflowed)
            n = int(dev.n_leaves)
            got = set(int(q) for q in quadid.from_words(
                np.asarray(dev.leaf_lo[:n]), np.asarray(dev.leaf_hi[:n])))
            want = set(int(q) for q in host.ids)
            assert got == want, (
                f"alt={alt} dir={cdir}: {len(got - want)} extra, "
                f"{len(want - got)} missing of {len(want)} leaves")
            # the scene must actually reach full depth for the test to
            # bite (40 m above the displaced surface guarantees it)
            if alt == 40.0:
                assert int(np.asarray(dev.leaf_depth[:n]).max()) == max_lod
