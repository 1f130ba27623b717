"""Sharded streaming-LOD engine on the fake 8-device CPU mesh: the pmin
z-composite of per-chip subtree renders must equal the single-device fused
step over the same 24 depth-1 roots BITWISE, with matching leaf sets and
psum'd stats (parallel/sharded_lod.py; reference semantics RenderPlanet
main.cpp:600-683, subtree split main.cpp:581-594)."""

import numpy as np
import jax.numpy as jnp

from planet_tpu.cache import device_pool as dp
from planet_tpu.engine import device_step
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import camera as cam_mod, quadid
from planet_tpu.nums import df as dfm
from planet_tpu.parallel import sharded, sharded_lod
from planet_tpu.raster import coverage
import pytest

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

W, H = 160, 120
MAX_LOD = 4
CFG = EngineConfig(use_pallas=False, cache_capacity=256)


def _camera_args():
    cdir = np.array([0.3, 0.4, -0.85])
    cdir /= np.linalg.norm(cdir)
    cam_pos = cdir * (CFG.radius * 1.8)
    cam = cam_mod.Camera(position=cam_pos,
                         angles=np.array([0.6, 0.2, 0.0], np.float32))
    rot = cam_mod.camera_rotation(cam)
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(CFG.fovy_deg))
    proj = cam_mod.perspective_lh(pf, W / H, CFG.near_plane, CFG.far_plane)
    vp = jnp.asarray((proj @ cam_mod.view_from_rotation(rot))
                     .astype(np.float32))
    ch, cl = dfm.from_f64_np(cam_pos)
    return jnp.asarray(ch), jnp.asarray(cl), vp


def _leaf_ids(q_lo, q_hi, count):
    n = int(count)
    return set(int(q) for q in quadid.from_words(
        np.asarray(q_lo[:n]), np.asarray(q_hi[:n])))


def test_subtree_roots_are_the_24_depth1_quads():
    lo, hi, ch, cl, depth = sharded_lod.subtree_roots(CFG.radius)
    ids = quadid.from_words(np.asarray(lo), np.asarray(hi))
    assert len(set(int(q) for q in ids)) == 24
    np.testing.assert_array_equal(np.asarray(depth), 1)
    for q in ids:
        assert int(quadid.depth_of(np.uint64(q))) == 1
    # corners lie on the sphere to DF precision (jitted XLA:CPU degrades
    # the EFTs to ~5e-9 by FMA contraction — see nums/df.py; TPU is exact)
    p = np.asarray(ch, np.float64) + np.asarray(cl, np.float64)
    r = np.linalg.norm(p, axis=-1)
    np.testing.assert_allclose(r, CFG.radius, rtol=1e-8)


def _sharded_vs_single(probe, max_lod, n_dev=8, rc=64):
    mesh = sharded.make_mesh(n_dev, axis="quads")
    fn = sharded_lod.build_sharded_render(
        CFG, mesh, W, H, cap=512, render_cap=rc, gen_cap=rc,
        max_lod=max_lod, probe=probe, interpret=True)
    roots = sharded_lod.subtree_roots(CFG.radius)
    pools = sharded_lod.init_pools(n_dev, CFG.cache_capacity, CFG.tile_dim)
    ch, cl, vp = _camera_args()
    pools, frame, leaves = fn(pools, ch, cl, vp, *roots)

    base = device_step.build_device_render(
        CFG, W, H, cap=4096, render_cap=512, gen_cap=512,
        max_lod=max_lod, probe=probe, interpret=True,
        dynamic_roots=True, raster_out="packed")
    pool1 = dp.init(1024, CFG.tile_dim)
    pool1, single = base(pool1, ch, cl, vp, *roots)
    return pools, frame, leaves, pool1, single


def test_sharded_lod_matches_single_device():
    n_dev, rc = 8, 64
    pools, frame, (llo, lhi, lcnt, gcnt), pool1, single = _sharded_vs_single(
        "zero", MAX_LOD, n_dev=n_dev, rc=rc)
    assert not bool(frame.overflowed)
    packed, n1, ngen1, ovf1, qlo1, qhi1 = single
    img1, dep1 = coverage.decode_packed(packed)

    # stats: psum'd totals equal the single-device run, and the per-chip
    # generation counts account for every generated tile
    assert int(frame.n_leaves) == int(n1)
    assert int(frame.n_generated) == int(ngen1)
    assert int(np.asarray(gcnt).sum()) == int(ngen1)

    # leaf sets: the union of per-chip subtree leaves is the global set
    lcnt = np.asarray(lcnt)
    got = set()
    for i in range(n_dev):
        part = _leaf_ids(llo[i * rc:(i + 1) * rc],
                         lhi[i * rc:(i + 1) * rc], lcnt[i])
        assert not (got & part), "subtree leaf sets must be disjoint"
        got |= part
    want = _leaf_ids(qlo1, qhi1, n1)
    assert got == want

    # the composited PACKED frame is bitwise the single-device frame; the
    # f32 decode may differ by 1 ulp between programs (XLA lowers /1023
    # as reciprocal-mul in one and true divide in the other), so compare
    # after re-quantizing to the packed integers
    img_s = np.asarray(frame.image)
    dep_s = np.asarray(frame.depth)
    img_1 = np.asarray(img1)
    dep_1 = np.asarray(dep1)
    np.testing.assert_array_equal(np.isfinite(dep_s), np.isfinite(dep_1))
    np.testing.assert_array_equal(np.round(img_s * 1023).astype(np.int32),
                                  np.round(img_1 * 1023).astype(np.int32))
    cov = np.isfinite(dep_s)
    # NDC z decode: 1-ulp divide differences near z=1 re-quantize off by
    # one, so bound the decoded difference by one 21-bit quantum instead
    assert np.abs(dep_s[cov] - dep_1[cov]).max() <= 2.0 / (2**21 - 1)
    assert cov.any()


def test_sharded_lod_matches_single_device_terrain():
    """The composed sharded engine with the PRODUCTION terrain probes
    (ridged6 DF noise in the split decisions, real ridged tiles in the
    pools) composites bitwise the single-device frame — the probe +
    per-chip-budget interaction the zero-probe test cannot see
    (reference ProcessQuad probes, main.cpp:552-556)."""
    n_dev, rc = 8, 64
    pools, frame, (llo, lhi, lcnt, gcnt), pool1, single = _sharded_vs_single(
        "ridged6", 3, n_dev=n_dev, rc=rc)
    assert not bool(frame.overflowed)
    packed, n1, ngen1, ovf1, qlo1, qhi1 = single
    img1, dep1 = coverage.decode_packed(packed)

    # real terrain flowed through the per-chip pools: generated tiles carry
    # mountain-scale heights, and every chip that rendered leaves generated
    lcnt, gcnt = np.asarray(lcnt), np.asarray(gcnt)
    assert float(np.abs(np.asarray(pools.tiles)).max()) > 100.0
    assert int(gcnt.sum()) == int(ngen1) > 0
    np.testing.assert_array_equal(gcnt > 0, lcnt > 0)

    assert int(frame.n_leaves) == int(n1)
    got = set()
    for i in range(n_dev):
        part = _leaf_ids(llo[i * rc:(i + 1) * rc],
                         lhi[i * rc:(i + 1) * rc], lcnt[i])
        assert not (got & part), "subtree leaf sets must be disjoint"
        got |= part
    assert got == _leaf_ids(qlo1, qhi1, n1)

    # composited packed frame == single-device frame (same requantize
    # comparison as the zero-probe test; see the 1-ulp decode note there)
    img_s, dep_s = np.asarray(frame.image), np.asarray(frame.depth)
    img_1, dep_1 = np.asarray(img1), np.asarray(dep1)
    np.testing.assert_array_equal(np.isfinite(dep_s), np.isfinite(dep_1))
    np.testing.assert_array_equal(np.round(img_s * 1023).astype(np.int32),
                                  np.round(img_1 * 1023).astype(np.int32))
    cov = np.isfinite(dep_s)
    assert cov.any()
    assert np.abs(dep_s[cov] - dep_1[cov]).max() <= 2.0 / (2**21 - 1)


def test_sharded_lod_second_frame_cache_hits():
    """Frame 2 with warm pools: no regeneration, same image (the per-chip
    pools keyed by QuadID behave like the reference cache, main.cpp:191-278,
    replicated per chip)."""
    n_dev = 4
    mesh = sharded.make_mesh(n_dev, axis="quads")
    fn = sharded_lod.build_sharded_render(
        CFG, mesh, W, H, cap=512, render_cap=128, gen_cap=128,
        max_lod=MAX_LOD, probe="zero", interpret=True)
    roots = sharded_lod.subtree_roots(CFG.radius)
    pools = sharded_lod.init_pools(n_dev, CFG.cache_capacity, CFG.tile_dim)
    ch, cl, vp = _camera_args()
    pools, f1, _ = fn(pools, ch, cl, vp, *roots)
    img1 = np.asarray(f1.image)
    n_gen1 = int(f1.n_generated)
    pools, f2, _ = fn(pools, ch, cl, vp, *roots)
    assert n_gen1 > 0
    assert int(f2.n_generated) == 0
    np.testing.assert_array_equal(np.asarray(f2.image), img1)


def test_sharded_lod_2d_slice_mesh_matches_1d():
    """Multi-slice streaming LOD (docs/multislice.md, "Streaming-LOD
    path"): subtrees sharded over the flattened ("slice", "quads") product
    with the pmin composite crossing both axes composite BITWISE the same
    frame as the 1-axis 8-device mesh — the only cross-slice traffic is
    the once-per-frame packed-framebuffer reduction."""
    roots = sharded_lod.subtree_roots(CFG.radius)
    ch, cl, vp = _camera_args()

    frames = []
    for shape in ((2, 4), (4, 2)):
        mesh = sharded.make_mesh_2d(shape[0], shape[1], axis="quads")
        fn = sharded_lod.build_sharded_render(
            CFG, mesh, W, H, axis=("slice", "quads"), cap=512,
            render_cap=64, gen_cap=64, max_lod=MAX_LOD, probe="zero",
            interpret=True)
        pools = sharded_lod.init_pools(8, CFG.cache_capacity, CFG.tile_dim)
        pools, frame, (llo, lhi, lcnt, gcnt) = fn(pools, ch, cl, vp, *roots)
        assert not bool(frame.overflowed)
        frames.append((np.asarray(frame.image), np.asarray(frame.depth),
                       int(frame.n_leaves), int(frame.n_generated)))

    mesh1 = sharded.make_mesh(8, axis="quads")
    fn1 = sharded_lod.build_sharded_render(
        CFG, mesh1, W, H, cap=512, render_cap=64, gen_cap=64,
        max_lod=MAX_LOD, probe="zero", interpret=True)
    pools1 = sharded_lod.init_pools(8, CFG.cache_capacity, CFG.tile_dim)
    pools1, f1, _ = fn1(pools1, ch, cl, vp, *roots)
    base = (np.asarray(f1.image), np.asarray(f1.depth),
            int(f1.n_leaves), int(f1.n_generated))

    for img, dep, nl, ng in frames:
        np.testing.assert_array_equal(img, base[0])
        np.testing.assert_array_equal(np.isfinite(dep),
                                      np.isfinite(base[1]))
        assert (nl, ng) == (base[2], base[3])
