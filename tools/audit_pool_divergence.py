"""Long-horizon pool-divergence audit (VERDICT r4 #8): drive the host and
device pools with identical leaf sequences from a sustained low-altitude
orbit under capacity pressure for a few hundred frames; print the
hit-rate / generation-count divergence curve as a markdown table.

Usage: python tools/audit_pool_divergence.py [n_frames] [max_lod]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from planet_tpu.cache import device_pool as dp
from planet_tpu.cache.tile_pool import TilePool
from planet_tpu.engine.config import EngineConfig
from planet_tpu.lod import refine as lod_refine

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))
from test_pool_divergence import _device_frame, _host_frame, DIM

CFG = EngineConfig()

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
max_lod = int(sys.argv[2]) if len(sys.argv) > 2 else 6

frames = []
for i in range(n_frames):
    t = 2.0 * np.pi * i / n_frames
    pos = 1.05 * CFG.radius * np.array([np.sin(t), 0.2, -np.cos(t)])
    res = lod_refine.refine(pos, max_lod, CFG.radius)
    frames.append((res.ids, res.depths.astype(np.int64)))

med = int(np.median([len(ids) for ids, _ in frames]))
capacity = max(64, (med * 3) // 5)        # sustained pressure
budget = 10**6
print(f"frames={n_frames} max_lod={max_lod} median_leaves={med} "
      f"capacity={capacity}")

pool = dp.init(capacity, DIM)
hpool = TilePool(capacity=capacity, dim=DIM)

rows = []
cum_d = cum_h = 0
for f, (ids, depths) in enumerate(frames):
    (pool, gen_d, crop_d, n_over, gathered, expected,
     gen_ok) = _device_frame(pool, ids, depths, budget, gen_cap=capacity)
    gen_h, _ = _host_frame(hpool, ids, depths, budget)
    ok_rows = ~(gen_d & ~gen_ok)
    assert (gathered[ok_rows, 0, 0] == expected[ok_rows]).all(), f
    nd, nh, L = int(gen_d.sum()), int(gen_h.sum()), len(ids)
    cum_d += nd
    cum_h += nh
    rows.append((f, L, nd, nh, 1 - nd / L, 1 - nh / L, n_over))

print("\n| frame | leaves | gen_dev | gen_host | hit_dev | hit_host | dropped |")
print("|---|---|---|---|---|---|---|")
for f, L, nd, nh, hd, hh, n_over in rows:
    if f % max(1, n_frames // 24) == 0 or f == n_frames - 1:
        print(f"| {f} | {L} | {nd} | {nh} | {hd:.3f} | {hh:.3f} | {n_over} |")

gd = np.array([r[2] for r in rows], float)
gh = np.array([r[3] for r in rows], float)
w = 20
rd = np.convolve(gd, np.ones(w), "valid")
rh = np.convolve(gh, np.ones(w), "valid")
print(f"\ncumulative: device {cum_d} vs host {cum_h} "
      f"({cum_d / max(cum_h, 1):.4f}x)")
print(f"worst 20-frame window ratio: "
      f"{np.max(np.abs(rd - rh) / np.maximum(rh, 1)):.4f}")
print(f"hit-rate mean: device {np.mean(1 - gd / [r[1] for r in rows]):.4f} "
      f"host {np.mean(1 - gh / [r[1] for r in rows]):.4f}")
