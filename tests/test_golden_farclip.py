"""Far-plane golden-image acceptance (round 5): the engine frame from a
16,000 km-altitude camera pitched at the planet limb, where a band of
terrain sits beyond far=2e7 (reference main.cpp:1075) — against the C
oracle's scalar render with GL far-clip semantics (native/oracle_main.cpp
scene 2).

GL clips primitives at z_clip > w: triangles with a vertex beyond far
drop their z > 1 fragments (NDC z is screen-affine, so that IS the
clipped polygon's fragment set), while fully-inside triangles keep GL's
depth-clamp. A depth-CLAMPING raster (the pre-round-5 behavior) draws
the beyond-far band into the last depth quantum instead of background —
the oracle scene has ~32k far-clipped fragments (farclip_meta[5]), so
that bug changes coverage long before image statistics.
"""

import pathlib

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_golden_frame import _ssim

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

GOLD = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="module")
def farclip_frame():
    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.engine.planet import PlanetEngine
    from planet_tpu.geom import camera as cam_mod
    from planet_tpu.raster import coverage as cov
    from planet_tpu.tess import mesh

    cam_pos = np.load(GOLD / "farclip_cam.npy")
    angles = np.load(GOLD / "farclip_angles.npy")
    cfg = EngineConfig(use_pallas=False)
    eng = PlanetEngine(cfg)
    cam = cam_mod.Camera(position=cam_pos, angles=angles)
    out = eng.frame(cam)

    l_pad = out.vertices.clip.shape[0]
    grid_mask = mesh.grid_uv_skirt(cfg.patch_verts)[3]
    row_ok = np.arange(l_pad) < out.n_leaves
    valid = jnp.asarray(row_ok[:, None, None] & grid_mask[None, :, :])
    image, depth, rc = cov.raster_frame(
        out.vertices.clip, out.vertices.normal, valid,
        cfg.window_w, cfg.window_h, cell_mask=mesh.cell_triangle_mask(),
        huge_cap=1024, far_w=cfg.far_plane)
    return out, np.asarray(image), np.asarray(depth), rc


def test_farclip_leaf_count(farclip_frame):
    out = farclip_frame[0]
    meta = np.load(GOLD / "farclip_meta.npy")
    assert out.n_leaves == int(meta[0])


def test_farclip_scene_exercises_far_plane():
    # the oracle counted thousands of far-clipped fragments: the scene
    # really does cross far=2e7 (a scene that stopped crossing it would
    # silently stop testing the clip)
    meta = np.load(GOLD / "farclip_meta.npy")
    assert int(meta[5]) > 1000, int(meta[5])


def test_farclip_coverage_and_image(farclip_frame):
    _, image, depth, rc = farclip_frame
    gold_img = np.load(GOLD / "farclip_image.npy")
    gold_dep = np.load(GOLD / "farclip_depth.npy")
    assert not bool(rc.overflowed)

    cov_m = np.isfinite(depth)
    gcov = np.isfinite(gold_dep)
    # the far-clipped band must be BACKGROUND: a depth-clamping raster
    # covers it (oracle coverage ~0.15 of the frame; clamped ~0.2+)
    agree = (cov_m == gcov).mean()
    assert agree > 0.999, f"coverage agreement {agree}"

    both = cov_m & gcov
    ds = np.abs(image[both] - gold_img[both])
    assert np.quantile(ds, 0.99) <= 2.5 / 1023, np.quantile(ds, 0.99)
    assert ds.mean() < 1.0 / 1023, ds.mean()
    assert _ssim(image, gold_img) > 0.99
