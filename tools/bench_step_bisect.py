"""Bisect the device step's 3.4s warm cost by truncation stage."""
import sys, time, pathlib
import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.cache import device_pool as dp
from planet_tpu.engine import device_step
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm

W, H = 640, 480
CFG = EngineConfig(window_w=W, window_h=H, raster_supersample=4)
cam = cam_mod.Camera(position=np.array([0.0, 0.0, -(CFG.radius + 50000.0)]))
rot = cam_mod.camera_rotation(cam)
pf = cam_mod.proj_factor_from_fovy(np.deg2rad(CFG.fovy_deg))
proj = cam_mod.perspective_lh(pf, W / H, CFG.near_plane, CFG.far_plane)
vp = (proj @ cam_mod.view_from_rotation(rot)).astype(np.float32)
cam_df = dfm.from_f64(cam.position)

for stage in ("generate", "uniforms", "tess", "full"):
    step = device_step.build_device_render(
        CFG, W, H, cap=2048, gen_cap=128, probe="ridged6", stop_after=stage)
    pool = dp.init(CFG.cache_capacity, CFG.tile_dim)
    pool, f = step(pool, np.asarray(cam_df.hi), np.asarray(cam_df.lo), vp)
    jax.block_until_ready(f.image)
    t0 = time.perf_counter()
    for _ in range(4):
        pool, f = step(pool, np.asarray(cam_df.hi), np.asarray(cam_df.lo), vp)
    jax.block_until_ready(f.image)
    print(f"{stage:9s}: warm {(time.perf_counter()-t0)/4*1e3:9.1f} ms",
          flush=True)
