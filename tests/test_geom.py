"""Geometry parity: QuadID encoding and cube-sphere corner derivation vs the
oracle, plus device word-pair round trips."""

import pathlib

import jax.numpy as jnp
import numpy as np

from planet_tpu.geom import cubesphere as cs
from planet_tpu.geom import quadid as qi
from planet_tpu.models.terrain import RidgedTerrain
from planet_tpu.nums import df as dfm
from planet_tpu.ops import heightmap

GOLD = pathlib.Path(__file__).parent / "goldens"
RADIUS = 6371000.0
MAX_LOD = 18


def g(name):
    return np.load(GOLD / f"{name}.npy")


def _paths():
    raw = g("tile_paths")
    out = []
    for row in raw:
        face = int(row[0])
        digits = [int(c) for c in row[1:] if c >= 0]
        out.append((face, digits))
    return out


def test_quadid_from_path_matches_oracle():
    ids = g("tile_ids")
    for (face, digits), want in zip(_paths(), ids):
        assert qi.from_path(face, digits) == want


def test_quadid_roundtrip():
    ids = g("tile_ids")
    for q in ids:
        q = np.uint64(q)
        d = int(qi.depth_of(q))
        digits = qi.path_digits(q)
        assert len(digits) == d
        assert qi.from_path(qi.root_of(q), digits) == q
        if d > 0:
            assert qi.child_index_of(q) == digits[-1]
            p = qi.parent_of(q)
            assert qi.depth_of(p) == d - 1
            assert qi.make_child(p, digits[-1]) == q


def test_quadid_words_roundtrip():
    ids = g("tile_ids")
    lo, hi = qi.to_words(ids)
    back = qi.from_words(lo, hi)
    np.testing.assert_array_equal(back, ids)


def test_quadid_words_ops():
    ids = g("tile_ids")
    lo, hi = (jnp.asarray(w) for w in qi.to_words(ids))
    np.testing.assert_array_equal(
        np.asarray(qi.words_depth(hi)), [int(qi.depth_of(q)) for q in ids])
    np.testing.assert_array_equal(
        np.asarray(qi.words_root(hi)), [int(qi.root_of(q)) for q in ids])
    assert bool(np.all(np.asarray(qi.words_valid(lo, hi))))

    deep = ids[np.array([int(qi.depth_of(q)) for q in ids]) > 0]
    lo, hi = (jnp.asarray(w) for w in qi.to_words(deep))
    np.testing.assert_array_equal(
        np.asarray(qi.words_child_index(lo, hi)),
        [int(qi.child_index_of(q)) for q in deep])
    plo, phi = qi.words_parent(lo, hi)
    np.testing.assert_array_equal(
        qi.from_words(np.asarray(plo), np.asarray(phi)),
        [qi.parent_of(q) for q in deep])
    # rebuild children on device words
    ci = jnp.asarray([int(qi.child_index_of(q)) for q in deep], jnp.int32)
    clo, chi = qi.words_make_child(plo, phi, ci)
    np.testing.assert_array_equal(qi.from_words(np.asarray(clo), np.asarray(chi)), deep)


def test_words_cross_boundary_depths():
    # exercise path bits straddling the 32-bit word boundary (depths 16-18)
    rng = np.random.default_rng(42)
    for _ in range(50):
        face = int(rng.integers(6))
        digits = [int(c) for c in rng.integers(0, 4, 18)]
        q = qi.from_path(face, digits)
        lo, hi = (jnp.asarray(np.atleast_1d(w)) for w in qi.to_words(q))
        for lvl in range(1, 19):
            got = int(np.asarray(qi.words_path_digit(lo, hi, lvl))[0])
            assert got == digits[lvl - 1], (lvl, digits)


def test_root_corners_vs_oracle():
    want = g("tile_corners")
    paths = _paths()
    for i, (face, digits) in enumerate(paths):
        if not digits:
            np.testing.assert_array_equal(
                cs.root_corners(RADIUS)[face], want[i])


def test_corners_from_path_bitexact():
    want = g("tile_corners")
    for i, (face, digits) in enumerate(_paths()):
        got = cs.corners_from_path(face, digits, RADIUS)
        np.testing.assert_array_equal(got, want[i], err_msg=f"tile {i}")


def test_dfs_key_orders_reference_leaves():
    """The oracle emits LOD leaves in the reference's DFS order; dfs_key must
    sort them identically (it's how the device engine reproduces the
    generation-budget priority)."""
    counts = g("lod_leaf_counts")
    ids = g("lod_leaf_ids")
    off = 0
    for c in counts:
        leaves = ids[off:off + int(c)]
        off += int(c)
        keys = np.array([qi.dfs_key(q) for q in leaves], np.uint64)
        assert np.all(keys[:-1] < keys[1:]), "dfs keys must be strictly increasing"


def test_tiles32_f64_bitexact():
    """End-to-end tile parity: path -> corners -> 32x32 heights, bit-for-bit."""
    want = g("tiles32")
    terrain = RidgedTerrain()
    for i, (face, digits) in enumerate(_paths()):
        corners = cs.corners_from_path(face, digits, RADIUS)
        got = np.asarray(heightmap.generate_tile_f64(
            corners, 32, terrain, len(digits), MAX_LOD))
        np.testing.assert_array_equal(got, want[i], err_msg=f"tile {i}")


def test_tiles32_df_fidelity():
    """Double-float tile path within the 1e-5 relative bar on all depths."""
    want = g("tiles32")
    terrain = RidgedTerrain()
    for i, (face, digits) in enumerate(_paths()):
        corners = cs.corners_from_path(face, digits, RADIUS)
        hi = corners.astype(np.float32)
        lo = (corners - hi.astype(np.float64)).astype(np.float32)
        got = np.asarray(heightmap.generate_tile_df(
            hi, lo, 32, terrain, len(digits), MAX_LOD))
        scale = np.maximum(np.abs(want[i]), 884.8)
        rel = np.abs(got - want[i]) / scale
        assert float(rel.max()) <= 1e-5, (i, len(digits), float(rel.max()))
