"""Stage-cost bisection of the 1080p LOD device frame on TPU."""
import sys, time, pathlib
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine import device_step
from planet_tpu.engine.device_step import DeviceRenderer, build_device_render
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm
from planet_tpu.cache import device_pool as dp

cfg = EngineConfig()
W, H = 1920, 1080
cdir = np.array([0.2, 0.5, -0.8]); cdir /= np.linalg.norm(cdir)
cam_pos = cdir * (cfg.radius + 20000.0)
cam = cam_mod.Camera(position=cam_pos, angles=np.array([0.35, 0.3, 0.0], np.float32))
rot = cam_mod.camera_rotation(cam)
pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
vp = jnp.asarray((proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))
ch, cl = dfm.from_f64_np(cam_pos)
ch, cl = jnp.asarray(ch), jnp.asarray(cl)

def timeit(name, fn, pool, iters=8):
    for _ in range(3):
        pool, out = fn(pool, ch, cl, vp)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        pool, out = fn(pool, ch, cl, vp)
    jax.block_until_ready(jax.tree.leaves(out))
    print(f"{name:12s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms", flush=True)
    return pool

for stage in ("refine", "cache", "generate", "uniforms", "tess", "full"):
    f = build_device_render(cfg, W, H, stop_after=stage)
    pool = dp.init(cfg.cache_capacity, cfg.tile_dim)
    timeit(stage, f, pool)

# two-dispatch renderer split
r = DeviceRenderer(cfg, W, H)
pool = r.init_pool()
for _ in range(3):
    pool, frame = r.render(pool, ch, cl, vp)
jax.block_until_ready(frame.image)
t0 = time.perf_counter()
for _ in range(8):
    pool, (pv, vshade, valid, meta) = r._geom(pool, ch, cl, vp)
jax.block_until_ready(pv.clip)
print(f"geom only    {(time.perf_counter()-t0)/8*1e3:9.2f} ms", flush=True)
args = (pv.clip, vshade, pv.normal, valid, pv.world, pv.snormal)
t0 = time.perf_counter()
for _ in range(8):
    img, dep = r._raster(*args)
jax.block_until_ready(img)
print(f"raster only  {(time.perf_counter()-t0)/8*1e3:9.2f} ms", flush=True)
