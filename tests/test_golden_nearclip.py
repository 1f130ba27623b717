"""Near-surface golden-image acceptance: the engine frame at a camera 0.5 m
above the terrain, pitched down, where ground cells straddle the near plane
(w <= 1e-9 vertices) — against the C oracle's scalar render with
Sutherland-Hodgman near clipping (native/oracle_main.cpp scene 1; GL
reference semantics: the full pipeline clips at near=1.0, main.cpp:1074).

Beyond the image comparison, the straddle/live-clip counters are asserted
EXACTLY against the oracle's — a broken clip path (wrong det3 orientation,
wrong plane, dropped triangles) changes them before it changes statistics.
"""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_golden_frame import _ssim

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

GOLD = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def nearclip_frame():
    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.engine.planet import PlanetEngine
    from planet_tpu.geom import camera as cam_mod
    from planet_tpu.raster import coverage as cov
    from planet_tpu.tess import mesh

    cam_pos = np.load(GOLD / "nearclip_cam.npy")
    angles = np.load(GOLD / "nearclip_angles.npy")
    cfg = EngineConfig(use_pallas=False)
    eng = PlanetEngine(cfg)
    cam = cam_mod.Camera(position=cam_pos, angles=angles)
    out = eng.frame(cam)

    # raster with counters (same call PlanetEngine.render makes, unwrapped
    # so the straddle/live-clip counts are visible)
    l_pad = out.vertices.clip.shape[0]
    grid_mask = mesh.grid_uv_skirt(cfg.patch_verts)[3]
    row_ok = np.arange(l_pad) < out.n_leaves
    valid = jnp.asarray(row_ok[:, None, None] & grid_mask[None, :, :])
    # near-surface scenes carry more huge (screen-filling) triangles than
    # the altitude default (49 here vs huge_cap=16)
    image, depth, rc = cov.raster_frame(
        out.vertices.clip, out.vertices.normal, valid,
        cfg.window_w, cfg.window_h, cell_mask=mesh.cell_triangle_mask(),
        huge_cap=64)
    return out, np.asarray(image), np.asarray(depth), rc


def test_nearclip_leaf_count(nearclip_frame):
    out = nearclip_frame[0]
    meta = np.load(GOLD / "nearclip_meta.npy")
    assert out.n_leaves == int(meta[0])


def test_nearclip_straddle_counters_match_oracle(nearclip_frame):
    rc = nearclip_frame[3]
    meta = np.load(GOLD / "nearclip_meta.npy")
    assert int(rc.n_straddle) == int(meta[3])
    assert not bool(rc.overflowed)


def test_nearclip_coverage_and_image(nearclip_frame):
    _, image, depth, _ = nearclip_frame
    gold_img = np.load(GOLD / "nearclip_image.npy")
    gold_dep = np.load(GOLD / "nearclip_depth.npy")

    cov_m = np.isfinite(depth)
    gcov = np.isfinite(gold_dep)
    # ground fills the lower frame, sky above (the round-5 winding fix
    # draws the NEAR side, so the scene gained a real horizon); a
    # whole-culled straddler band would still punch holes in the ground
    assert 0.5 < gcov.mean() < 0.95, gcov.mean()
    agree = (cov_m == gcov).mean()
    assert agree > 0.999, f"coverage agreement {agree}"

    both = cov_m & gcov
    ds = np.abs(image[both] - gold_img[both])
    assert np.quantile(ds, 0.99) <= 2.5 / 1023, np.quantile(ds, 0.99)
    assert ds.mean() < 1.0 / 1023, ds.mean()
    assert _ssim(image, gold_img) > 0.99
