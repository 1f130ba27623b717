"""Which raster cap overflows on the moving orbit? Prints per-frame
counters for frames whose overflow flag is set.

Usage: python tools/debug_overflow.py [quality] [render_cap]
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from planet_tpu.engine.device_step import build_device_render
from planet_tpu.cache import device_pool as dp
from planet_tpu.raster import coverage_pallas
from planet_tpu.tess import mesh
from tools.bench_moving import camera_at, cfg, RASTER_CFG

quality = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
render_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
W, H = 1920, 1080

geom = build_device_render(cfg, W, H, cap=8192, gen_cap=256,
                           render_cap=render_cap, stop_after="geometry",
                           raster_cfg=RASTER_CFG)
cmask = mesh.cell_triangle_mask()

@jax.jit
def raster_counts(clip, normal, valid):
    _, rc = coverage_pallas.raster_frame_pallas(
        clip, normal, valid, W, H, cell_mask=cmask, decode=False,
        **(RASTER_CFG or {}))
    return rc

from planet_tpu.raster import coverage as cov


@jax.jit
def shape_stats(clip, normal, valid):
    qlive, _ = cov._quad_live_t(clip, valid, W, H, cmask)
    qidx, _ = cov._compact_indices(qlive, RASTER_CFG["quad_cap"]
                                   if RASTER_CFG else 128)
    sel = jnp.minimum(qidx, clip.shape[0] - 1)
    keep = qidx < clip.shape[0]
    clip_c = jnp.take(clip, sel, axis=0)
    normal_c = jnp.take(normal, sel, axis=0)
    valid_c = jnp.take(valid, sel, axis=0) & keep[:, None, None]
    tm, live, bw, bh, span = cov._setup_t(clip_c, normal_c, valid_c,
                                          W, H, cmask)
    return live, bw, bh, span


pool = dp.init(cfg.cache_capacity, cfg.tile_dim)
n_frames = 48
alts = np.linspace(20000.0, 3000.0, n_frames)
cams = [camera_at(cfg, i * 1e-3, a, W, H)
        for i, a in enumerate(alts)]
for i, c in enumerate(cams):
    pool, (pv, vshade, valid, meta) = geom(pool, *c)
    rc = raster_counts(pv.clip, pv.normal, valid)
    g_ovf = bool(meta[2])
    if bool(rc.overflowed) or g_ovf:
        print(f"frame {i}: geom_ovf={g_ovf} raster_ovf="
              f"{bool(rc.overflowed)} per_class="
              f"{np.asarray(rc.n_per_class)} huge={int(rc.n_huge)} "
              f"straddle={int(rc.n_straddle)} tris={int(rc.n_tris)}")
        live, bw, bh, span = (np.asarray(a) for a in
                              shape_stats(pv.clip, pv.normal, valid))
        hg = live & ((span > 16) | (bw > 128))
        wide = hg & (span <= 16)
        tall = hg & (span > 16)
        print(f"  huge breakdown: wide(bw>128)={wide.sum()} "
              f"tall(span>16)={tall.sum()}")
        if hg.any():
            print(f"  wide bw hist {np.histogram(bw[wide], bins=[129,192,256,384,512,1024,1921])[0]}"
                  f" span hist {np.histogram(span[wide], bins=[1,2,3,5,9,17])[0]}")
            print(f"  tall span hist {np.histogram(span[tall], bins=[17,24,32,48,64,136])[0]}"
                  f" bw hist {np.histogram(bw[tall], bins=[0,32,64,128,256,1921])[0]}")
            print(f"  huge bbox area sum: {((bw[hg]*1.0)*(bh[hg])).sum()/1e6:.1f} Mpx")
print("caps:", RASTER_CFG or
      dict(caps=coverage_pallas.DEFAULT_CAPS, quad_cap=128,
           huge_cap=64, clip_cap=512, clip_run_cap=64))
