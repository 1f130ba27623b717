"""Engine frame-step tests: leaf counts vs oracle, cache/budget semantics,
parent-crop rects, stats (CPU, XLA noise path)."""

import numpy as np
import pytest

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.planet import PlanetEngine
from planet_tpu.geom import camera as cam_mod
from planet_tpu.geom import quadid

GOLD = "tests/goldens/"


def g(name):
    return np.load(GOLD + name + ".npy")


CFG = EngineConfig(use_pallas=False)


def _camera_at(pos):
    return cam_mod.Camera(position=np.asarray(pos, np.float64),
                          angles=np.zeros(3, np.float32))


@pytest.fixture(scope="module")
def far_engine_frames():
    """Two frames from the far camera (3R): first cold, second warm."""
    eng = PlanetEngine(CFG)
    cam = _camera_at(g("lod_cams")[2])
    f1 = eng.frame(cam)
    f2 = eng.frame(cam)
    return eng, f1, f2


def test_frame_leaf_count_matches_oracle(far_engine_frames):
    _, f1, _ = far_engine_frames
    assert f1.n_leaves == g("lod_leaf_counts")[2]
    counts = g("lod_leaf_counts")
    offset = int(counts[0] + counts[1])
    np.testing.assert_array_equal(
        f1.leaf_ids, g("lod_leaf_ids")[offset:offset + counts[2]])


def test_first_frame_generates_all_soft_budget(far_engine_frames):
    """Cold cache: every miss has no cached parent, so the soft budget forces
    generation of every tile (reference main.cpp:239)."""
    _, f1, _ = far_engine_frames
    assert f1.stats.tiles_generated == f1.n_leaves
    assert f1.stats.texels_generated == f1.n_leaves * 32 * 32


def test_second_frame_all_hits(far_engine_frames):
    _, _, f2 = far_engine_frames
    assert f2.stats.tiles_generated == 0


def test_stats_quartet(far_engine_frames):
    _, f1, _ = far_engine_frames
    assert f1.stats.quads == f1.n_leaves
    assert f1.stats.tris == f1.n_leaves * 29 * 29 * 2
    assert f1.stats.frametime_ms > 0


def test_vertex_outputs_sane(far_engine_frames):
    _, f1, _ = far_engine_frames
    n = f1.n_leaves
    world = np.asarray(f1.vertices.world)[:n]
    assert np.isfinite(world).all()
    shade = np.asarray(f1.vertex_shade)[:n]
    assert np.isfinite(shade).all()
    assert (shade >= np.sqrt(0.001) - 1e-6).all()
    assert (shade <= np.sqrt(1.001) + 1e-6).all()
    nrm = np.asarray(f1.vertices.normal)[:n]
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-5)


def test_zero_budget_uses_parent_crop():
    """Frame 1 fills the cache; a closer camera then splits quads, and with a
    zero budget the children crop their parents' tiles with the reference
    rect constants (main.cpp:216-237)."""
    eng = PlanetEngine(EngineConfig(use_pallas=False, generations_per_frame=0))
    far = _camera_at(g("lod_cams")[2])
    f1 = eng.frame(far)     # cold: forced generation fills pool

    # move camera to ~1.5R: more splitting
    near = _camera_at(np.asarray(g("lod_cams")[2]) * 0.55)
    f2 = eng.frame(near)
    assert f2.n_leaves > f1.n_leaves

    res = eng.pool.resolve(f2.leaf_ids, budget=0)
    dim = 32
    # any leaf whose parent is cached and itself missing must use crop rects
    crops = 0
    for i, qid in enumerate(f2.leaf_ids):
        qid_i = int(qid)
        in_pool = qid_i in eng.pool.slot_of
        parent = int(quadid.parent_of(np.uint64(qid_i))) \
            if quadid.depth_of(np.uint64(qid_i)) > 0 else None
        if not in_pool and parent is not None and parent in eng.pool.slot_of:
            crops += 1
            child = int(quadid.child_index_of(np.uint64(qid_i)))
            x0 = 1.5 if child in (0, 2) else dim / 2 + 0.5
            y0 = 1.5 if child in (0, 1) else dim / 2 + 0.5
            np.testing.assert_allclose(
                res.rect_lo[i], [x0 / dim, y0 / dim])
            np.testing.assert_allclose(
                res.pixel_size[i], ((dim / 2 - 1) / (dim - 3)) / dim)
    assert crops > 0


def test_lru_eviction_when_full():
    from planet_tpu.cache.tile_pool import TilePool
    pool = TilePool(capacity=4, dim=8)
    ids = [int(quadid.from_path(0, [c])) for c in range(4)]
    ids += [int(quadid.from_path(1, [c])) for c in range(2)]
    r1 = pool.resolve(np.array(ids[:4], np.uint64), budget=10)
    assert list(r1.generate_mask) == [True] * 4
    pool.end_frame()
    # touch ids[2], ids[3] in frame 2 so ids[0], ids[1] go stale
    pool.resolve(np.array(ids[2:4], np.uint64), budget=10)
    pool.end_frame()
    # two new ids must evict the two stalest (ids[0], ids[1])
    pool.resolve(np.array(ids[4:6], np.uint64), budget=10)
    assert ids[0] not in pool.slot_of
    assert ids[1] not in pool.slot_of
    assert ids[2] in pool.slot_of and ids[3] in pool.slot_of
