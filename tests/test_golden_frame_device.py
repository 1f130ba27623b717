"""Config-4 golden-image acceptance for the FUSED DEVICE path (round-2
VERDICT item 4): the one-jit frame step (device refine -> device pool ->
mixed-octave tile generation -> tessellate -> exact-coverage raster,
engine/device_step.build_device_render) rendering the committed golden
camera with production terrain, held to the same bars as the host path
(tests/test_golden_frame.py) against the C oracle's scalar render
(native/oracle_main.cpp section 8; reference RenderPlanet
main.cpp:600-683).

The host golden test drives PlanetEngine (host orchestration, f64 probes,
host tile pool); this twin proves the production fused path — DF probes,
device pool, blend-matrix tessellation, exact raster — lands on the same
image. Bars are identical; additionally the device step's leaf count must
match the oracle's exactly (DF-exact split decisions)."""

import pathlib

import numpy as np

from planet_tpu.cache import device_pool as dp
from planet_tpu.engine import device_step
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm
from tests.test_golden_frame import _ssim
import pytest

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

GOLD = pathlib.Path(__file__).parent / "goldens"


def test_device_step_frame_matches_golden():
    cam_pos = np.load(GOLD / "frame_cam.npy")
    angles = np.load(GOLD / "frame_angles.npy")
    meta = np.load(GOLD / "frame_meta.npy")
    gold_img = np.load(GOLD / "frame_image.npy")
    gold_dep = np.load(GOLD / "frame_depth.npy")

    cfg = EngineConfig(use_pallas=False)
    W, H = cfg.window_w, cfg.window_h
    cam = cam_mod.Camera(position=cam_pos, angles=angles)
    rot = cam_mod.camera_rotation(cam)
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
    proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
    vp = (proj @ cam_mod.view_from_rotation(rot)).astype(np.float32)
    ch, cl = dfm.from_f64_np(cam_pos)

    step = device_step.build_device_render(
        cfg, W, H, cap=4096, render_cap=512, gen_cap=128,
        probe="ridged6", interpret=True)
    pool = dp.init(cfg.cache_capacity, cfg.tile_dim)

    # the oracle renders a converged frame: iterate until the soft budget
    # stops generating (the golden scene needs ~210 tiles at 100/frame)
    for _ in range(4):
        pool, frame = step(pool, np.asarray(ch), np.asarray(cl), vp)
        if int(frame.n_generated) == 0:
            break
    assert int(frame.n_generated) == 0
    assert not bool(frame.overflowed)
    assert int(frame.n_leaves) == int(meta[0])

    image = np.asarray(frame.image)
    depth = np.asarray(frame.depth)

    cov = np.isfinite(depth)
    gcov = np.isfinite(gold_dep)
    agree = (cov == gcov).mean()
    assert agree > 0.999, f"coverage agreement {agree}"

    both = cov & gcov
    ds = np.abs(image[both] - gold_img[both])
    assert np.quantile(ds, 0.99) <= 2.5 / 1023, np.quantile(ds, 0.99)
    assert ds.mean() < 1.0 / 1023, ds.mean()

    dd = np.abs(depth[both] - gold_dep[both])
    assert np.quantile(dd, 0.99) < 1e-5, np.quantile(dd, 0.99)

    assert _ssim(image, gold_img) > 0.99
