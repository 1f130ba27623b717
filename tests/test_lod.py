"""LOD refinement parity: leaf sets and DFS order against the oracle's
recursive refiner (4 fixed cameras, max_lod 18), and numpy noise parity."""

import numpy as np

from planet_tpu.lod import refine
from planet_tpu.ops import perlin_np

GOLD = "tests/goldens/"


def g(name):
    return np.load(GOLD + name + ".npy")


def test_perlin_np_bitwise():
    pts = g("pts_unit")
    got = perlin_np.perlin3(pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_array_equal(got, g("perlin3_unit"))


def test_terrain_np_bitwise():
    pts = g("pts_sphere")
    got = perlin_np.terrain_height(pts, 6, 18)
    np.testing.assert_array_equal(got, g("terrain_d6_md18"))


def test_refine_matches_oracle_leaf_sets():
    cams = g("lod_cams")
    counts = g("lod_leaf_counts")
    all_ids = g("lod_leaf_ids")
    offset = 0
    for ci in range(len(cams)):
        want = all_ids[offset:offset + counts[ci]]
        offset += counts[ci]
        got = refine.refine(cams[ci], max_lod=18)
        assert len(got.ids) == counts[ci], (ci, len(got.ids), counts[ci])
        # exact leaf IDs in exact DFS order
        np.testing.assert_array_equal(got.ids, want)
        # depths consistent with ids
        from planet_tpu.geom import quadid
        np.testing.assert_array_equal(
            got.depths, [int(quadid.depth_of(q)) for q in got.ids])


def test_refine_leaf_corners_lie_on_reasonable_sphere():
    got = refine.refine(g("lod_cams")[0], max_lod=18)
    r = np.linalg.norm(got.corners, axis=-1)
    np.testing.assert_allclose(r, 6371000.0, rtol=1e-9)


def test_refine_probe_cache_exact():
    """Cached probe heights must not change leaf sets (pure function)."""
    cams = g("lod_cams")
    counts = g("lod_leaf_counts")
    all_ids = g("lod_leaf_ids")
    cache = {}
    offset = 0
    for ci in range(len(cams)):
        want = all_ids[offset:offset + counts[ci]]
        offset += counts[ci]
        got = refine.refine(cams[ci], max_lod=18, probe_cache=cache)
        np.testing.assert_array_equal(got.ids, want)
    assert len(cache) > 0
    # second pass fully cache-hit, still exact
    got = refine.refine(cams[0], max_lod=18, probe_cache=cache)
    np.testing.assert_array_equal(got.ids, all_ids[:counts[0]])
