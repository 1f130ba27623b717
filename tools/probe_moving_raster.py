"""Per-class live-triangle counts + bbox-width histogram for the MOVING
1080p scene (tools/bench_moving.py orbit), to target raster optimization."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.device_step import build_device_render
from planet_tpu.cache import device_pool as dp
from planet_tpu.raster import coverage as cov
from planet_tpu.tess import mesh
from tools.bench_moving import camera_at

quality = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
render_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
quad_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 128
if quality > 2.0:
    cfg = EngineConfig(lod_quality=quality, cache_capacity=4096)
else:
    cfg = EngineConfig(lod_quality=quality) if quality != 1.0 else EngineConfig()
W, H = 1920, 1080
geom = build_device_render(cfg, W, H, cap=8192, gen_cap=256,
                           render_cap=render_cap, stop_after="geometry")
pool = dp.init(cfg.cache_capacity, cfg.tile_dim)

n_frames = 20
alts = np.linspace(20000.0, 3000.0, n_frames)
thetas = np.arange(n_frames) * 1e-3
cams = [camera_at(cfg, t, a, W, H) for t, a in zip(thetas, alts)]
for ch, cl, vp in cams[:12]:
    pool, (pv, vshade, valid, meta) = geom(pool, ch, cl, vp)

clip, normal = pv.clip, pv.normal
valid_m = valid
cm = mesh.cell_triangle_mask()

# quad compaction stats
qlive, n_tris_full = cov._quad_live_t(clip, valid_m, W, H, cm)
print("render_cap quads:", clip.shape[0], " live quads:",
      int(jnp.sum(qlive)), " live tris:", int(n_tris_full))

qidx, nq = cov._compact_indices(qlive, quad_cap)
sel = jnp.minimum(qidx, clip.shape[0] - 1)
keep = qidx < clip.shape[0]
clip_c = jnp.take(clip, sel, axis=0)
normal_c = jnp.take(normal, sel, axis=0)
valid_c = jnp.take(valid_m, sel, axis=0) & keep[:, None, None]

tm, live, bw, bh, span = cov._setup_t(clip_c, normal_c, valid_c, W, H, cm)
live = np.asarray(live); bw = np.asarray(bw); span = np.asarray(span)
SPAN_CLASSES = (1, 2, 3, 4, 8, 16)
prev = 0
for c in SPAN_CLASSES:
    m = live & (span > prev) & (span <= c) & (bw <= 128)
    print(f"span<={c:2d}: {m.sum():6d} live   bw hist "
          f"{np.histogram(bw[m], bins=[0,8,16,32,64,128,129])[0]}")
    prev = c
huge = live & ((span > 16) | (bw > 128))
print("huge:", huge.sum())
print("total live:", live.sum())
# window-rows actually paid per class (winh = 8*class span)
prev = 0
tot_rows = 0
for c in SPAN_CLASSES:
    m = live & (span > prev) & (span <= c) & (bw <= 128)
    tot_rows += m.sum() * 8 * c
    prev = c
print(f"window rows paid: {tot_rows}  (at ~9.7 ns/row -> "
      f"{tot_rows * 9.7e-6:.2f} ms)")
