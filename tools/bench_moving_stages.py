"""Stage bisect of the MOVING 1080p LOD frame (VERDICT r4 #1 workload).

Times the truncated geometry step (stop_after ladder) plus the raster jit
on the bench_moving descending orbit, so each stage's marginal cost is
measured under real churn. Usage:
  python tools/bench_moving_stages.py [quality] [render_cap] [cap]
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine import device_step
from planet_tpu.cache import device_pool as dp
from tools.bench_moving import camera_at

quality = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
render_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
cap = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

cfg = EngineConfig(lod_quality=quality) if quality != 1.0 else EngineConfig()
W, H = 1920, 1080
n_frames = 24
alts = np.linspace(20000.0, 3000.0, n_frames)
thetas = np.arange(n_frames) * 1e-3
cams = [camera_at(cfg, t, a, W, H) for t, a in zip(thetas, alts)]

STAGES = ("refine", "cache", "generate", "uniforms", "tess", "geometry")
prev = 0.0
for stage in STAGES:
    step = device_step.build_device_render(
        cfg, W, H, cap=cap, gen_cap=256, render_cap=render_cap,
        probe="ridged6", stop_after=stage)
    pool = dp.init(cfg.cache_capacity, cfg.tile_dim)

    def run(pool, c):
        pool, out = step(pool, *c)
        return pool, out

    # prime
    for c in cams[:8]:
        pool, out = run(pool, c)
    ref = out[0] if isinstance(out, tuple) else out.image
    jax.block_until_ready(ref)
    t0 = time.perf_counter()
    for c in cams[8:24]:
        pool, out = run(pool, c)
    ref = out[0] if isinstance(out, tuple) else out.image
    jax.block_until_ready(jax.tree.leaves(ref))
    dt = (time.perf_counter() - t0) / 16 * 1e3
    print(f"{stage:9s}: {dt:7.2f} ms  (marginal {dt - prev:+6.2f})",
          flush=True)
    prev = dt
