"""Host-path scaling measurement (round-1 VERDICT weak item 6): the
per-leaf Python costs of the HOST orchestration path — TilePool.resolve's
sequential budget loop and the refine probe memo — as leaf count grows.

The host path is the convenience/parity path; the production path is the
fused device step (engine/device_step.py), which has none of these loops.
This prints the measured ceiling so the tradeoff is documented with
numbers. Run on any backend (host-only work):

    python tools/bench_host_path.py
"""

import time

import numpy as np

from planet_tpu.cache.tile_pool import TilePool
from planet_tpu.engine.config import EngineConfig
from planet_tpu.lod import refine as lod_refine

cfg = EngineConfig()
zero = lambda p: np.zeros(p.shape[:-1], np.float32)

for alt_km, max_lod in ((3000, 8), (300, 10), (30, 12), (3, 14)):
    cam = np.array([0.0, 0.0, -(cfg.radius + alt_km * 1000.0)])

    t0 = time.perf_counter()
    res = lod_refine.refine(cam, max_lod, cfg.radius, height_fn=zero)
    t_refine_cold = time.perf_counter() - t0

    memo: dict = {}
    lod_refine.refine(cam, max_lod, cfg.radius, height_fn=zero,
                      probe_cache=memo)
    t0 = time.perf_counter()
    lod_refine.refine(cam, max_lod, cfg.radius, height_fn=zero,
                      probe_cache=memo)
    t_refine_warm = time.perf_counter() - t0

    pool = TilePool(capacity=4096, dim=cfg.tile_dim)
    pool.resolve(res.ids, 10**9)        # warm: all tiles allocated
    pool.end_frame()
    t0 = time.perf_counter()
    r = pool.resolve(res.ids, cfg.generations_per_frame)
    t_resolve = time.perf_counter() - t0
    pool.end_frame()

    n = len(res.ids)
    print(f"alt {alt_km:>5} km  max_lod {max_lod:>2}  leaves {n:>6}  "
          f"refine cold {t_refine_cold * 1e3:8.1f} ms  "
          f"warm {t_refine_warm * 1e3:7.1f} ms  "
          f"resolve {t_resolve * 1e3:6.2f} ms "
          f"({t_resolve / max(n, 1) * 1e6:5.1f} us/leaf)")
