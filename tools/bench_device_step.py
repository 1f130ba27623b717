"""On-chip timing of the fully-fused device frame step (production terrain,
ridged probes), cold and warm, plus a small orbit."""
import sys, time, pathlib
import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.cache import device_pool as dp
from planet_tpu.engine import device_step
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm
from planet_tpu.io import png

W, H = 1920, 1080
CFG = EngineConfig(window_w=W, window_h=H, raster_supersample=8)

renderer = device_step.DeviceRenderer(CFG, W, H, cap=4096, gen_cap=256,
                                      probe="ridged6", interpret=False)
step = renderer.render
pool = renderer.init_pool()

r = CFG.radius + 50000.0


def render(pool, theta):
    cam = cam_mod.Camera(position=r * np.array(
        [np.sin(theta), 0.0, -np.cos(theta)]))
    rot = cam_mod.camera_rotation(cam)
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(CFG.fovy_deg))
    proj = cam_mod.perspective_lh(pf, W / H, CFG.near_plane, CFG.far_plane)
    vp = (proj @ cam_mod.view_from_rotation(rot)).astype(np.float32)
    cam_df = dfm.from_f64(cam.position)
    return step(pool, np.asarray(cam_df.hi), np.asarray(cam_df.lo), vp)


t0 = time.perf_counter()
pool, f = render(pool, 0.0)
jax.block_until_ready(f.image)
print(f"cold (compile): {time.perf_counter()-t0:.1f} s  "
      f"leaves={int(f.n_leaves)} gen={int(f.n_generated)} "
      f"overflow={bool(f.overflowed)}", flush=True)

# warm, same camera (all cache hits)
t0 = time.perf_counter()
for _ in range(8):
    pool, f = render(pool, 0.0)
jax.block_until_ready(f.image)
print(f"warm static:    {(time.perf_counter()-t0)/8*1e3:8.2f} ms/frame "
      f"gen={int(f.n_generated)}", flush=True)

# orbit: incremental regeneration each frame
thetas = np.linspace(0, 0.001, 9)
pool, f = render(pool, thetas[0])
jax.block_until_ready(f.image)
t0 = time.perf_counter()
for th in thetas[1:]:
    pool, f = render(pool, th)
jax.block_until_ready(f.image)
print(f"warm orbit:     {(time.perf_counter()-t0)/8*1e3:8.2f} ms/frame "
      f"leaves={int(f.n_leaves)} gen={int(f.n_generated)}", flush=True)

png.write_png("/tmp/device_step.png", np.asarray(f.image))
print("frame written to /tmp/device_step.png", flush=True)
