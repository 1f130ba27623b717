"""Parity for the fused tile kernel against the oracle's 32x32 golden tiles
(interpret mode on CPU)."""

import numpy as np

from planet_tpu.geom import quadid
from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import tile_pallas

GOLD = "tests/goldens/"


def g(name):
    return np.load(GOLD + name + ".npy")


def test_tiles_match_oracle():
    corners = g("tile_corners")          # (T, 4, 3) f64
    ids = g("tile_ids")
    want = g("tiles32")                  # (T, 32, 32)
    depths = np.array([int(quadid.depth_of(np.uint64(q))) for q in ids])
    max_depth = 18

    scaled = corners * 1e-5              # host f64 pre-scale
    ch, cl = (np.asarray(a) for a in dfm.from_f64(scaled))

    got = np.empty_like(want)
    for o in np.unique(6 + (12 * depths) // max_depth):
        sel = np.nonzero(6 + (12 * depths) // max_depth == o)[0]
        tiles = tile_pallas.generate_tiles(
            ch[sel], cl[sel], kind="ridged", octaves=int(o),
            gain=np.float32(0.55), amplitude=8848.0, interpret=True)
        got[sel] = np.asarray(tiles)

    scale = np.maximum(np.abs(want), 8848.0 * 0.1)
    rel = np.abs(got - want) / scale
    assert float(rel.max()) <= 1e-5, float(rel.max())


def test_tile_kernel_padding():
    corners = g("tile_corners")[:3] * 1e-5
    ch, cl = (np.asarray(a) for a in dfm.from_f64(corners))
    tiles = tile_pallas.generate_tiles(ch, cl, octaves=6,
                                       gain=np.float32(0.55), interpret=True)
    assert tiles.shape == (3, 32, 32)
    want = g("tiles32")[:3]
    ids = g("tile_ids")[:3]
    depths = [int(quadid.depth_of(np.uint64(q))) for q in ids]
    assert all(6 + (12 * d) // 18 == 6 for d in depths)
    scale = np.maximum(np.abs(want), 8848.0 * 0.1)
    assert float((np.abs(np.asarray(tiles) - want) / scale).max()) <= 1e-5
