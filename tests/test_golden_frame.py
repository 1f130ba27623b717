"""Config-4 golden-image acceptance: the engine's full frame (refine ->
generate -> tessellate -> exact raster) against the C oracle's scalar render
of the same scene (native/oracle_main.cpp section 8; reference semantics:
RenderPlanet main.cpp:600-683, GL draw render.cpp:455-491).

The comparison is statistical, not bitwise: vertex positions agree to ~1e-6
relative (tess parity tests), so a small fraction of edge pixels may resolve
differently; shade/depth are compared on commonly covered pixels and the
whole image via SSIM.
"""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

GOLD = pathlib.Path(__file__).parent / "goldens"


def _ssim(a, b, window: int = 8):
    """Mean local SSIM over non-overlapping windows (f32 images in [0, 1])."""
    h = a.shape[0] // window * window
    w = a.shape[1] // window * window

    def blocks(x):
        return x[:h, :w].reshape(h // window, window, w // window, window) \
            .transpose(0, 2, 1, 3).reshape(-1, window * window)

    xa, xb = blocks(a.astype(np.float64)), blocks(b.astype(np.float64))
    mu_a, mu_b = xa.mean(1), xb.mean(1)
    va, vb = xa.var(1), xb.var(1)
    cov = ((xa - mu_a[:, None]) * (xb - mu_b[:, None])).mean(1)
    c1, c2 = 0.01**2, 0.03**2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
         / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2)))
    return float(s.mean())


@pytest.fixture(scope="module")
def engine_frame():
    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.engine.planet import PlanetEngine
    from planet_tpu.geom import camera as cam_mod

    cam_pos = np.load(GOLD / "frame_cam.npy")
    angles = np.load(GOLD / "frame_angles.npy")
    cfg = EngineConfig(use_pallas=False)
    eng = PlanetEngine(cfg)
    cam = cam_mod.Camera(position=cam_pos, angles=angles)
    out, image, depth = eng.render(cam)
    return out, np.asarray(image), np.asarray(depth), eng, cam


def test_camera_matrices_match_golden(engine_frame):
    from planet_tpu.geom import camera as cam_mod

    _, _, _, eng, cam = engine_frame
    # the C oracle's 3x3 matrix chain contracts to FMA; allow 1-2 ulps
    rot = cam_mod.camera_rotation(cam)
    np.testing.assert_allclose(rot, np.load(GOLD / "frame_rot.npy"),
                               rtol=0, atol=2e-7)
    vp = (eng.proj @ cam_mod.view_from_rotation(rot)).astype(np.float32)
    gold_vp = np.load(GOLD / "frame_viewproj.npy")
    np.testing.assert_allclose(vp, gold_vp, rtol=1e-6, atol=1e-4)


def test_leaf_count_matches_golden(engine_frame):
    out = engine_frame[0]
    meta = np.load(GOLD / "frame_meta.npy")
    assert out.n_leaves == int(meta[0])


def test_frame_coverage_and_image_match_golden(engine_frame):
    _, image, depth, _, _ = engine_frame
    gold_img = np.load(GOLD / "frame_image.npy")
    gold_dep = np.load(GOLD / "frame_depth.npy")

    cov = np.isfinite(depth)
    gcov = np.isfinite(gold_dep)
    agree = (cov == gcov).mean()
    assert agree > 0.999, f"coverage agreement {agree}"

    both = cov & gcov
    # shade: 10-bit quantized in both pipelines
    ds = np.abs(image[both] - gold_img[both])
    assert np.quantile(ds, 0.99) <= 2.5 / 1023, np.quantile(ds, 0.99)
    assert ds.mean() < 1.0 / 1023, ds.mean()

    # depth: 21-bit quantized NDC
    dd = np.abs(depth[both] - gold_dep[both])
    assert np.quantile(dd, 0.99) < 1e-5, np.quantile(dd, 0.99)

    assert _ssim(image, gold_img) > 0.99
