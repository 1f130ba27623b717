"""Per-stage timing of the warm 1080p frame on TPU: refine (host), resolve,
tess+shade, raster; plus raster sub-costs at varying supersample."""
import sys, time, pathlib
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.planet import PlanetEngine, _tess_shade_fn, _raster_fn
from planet_tpu.geom import camera as cam_mod
from planet_tpu.lod import refine as lod_refine
from planet_tpu.tess import mesh

cfg = EngineConfig(window_w=1920, window_h=1080, raster_supersample=8)
eng = PlanetEngine(cfg)
cam = cam_mod.Camera(position=np.array([0.0, 0.0, -(cfg.radius + 50000.0)]))

for _ in range(2):
    out, img, _ = eng.render(cam)
    jax.block_until_ready(img)

# --- host refine
t0 = time.perf_counter()
for _ in range(4):
    res = lod_refine.refine(cam.position, cfg.max_lod, cfg.radius)
print(f"refine host:      {(time.perf_counter()-t0)/4*1e3:8.2f} ms "
      f"({len(res.ids)} leaves)", flush=True)

# --- resolve
t0 = time.perf_counter()
for _ in range(4):
    r = eng.pool.resolve(res.ids, cfg.generations_per_frame)
print(f"pool resolve:     {(time.perf_counter()-t0)/4*1e3:8.2f} ms", flush=True)

# --- full frame (no raster)
t0 = time.perf_counter()
for _ in range(4):
    out = eng.frame(cam)
    jax.block_until_ready(out.vertex_shade)
print(f"frame() synced:   {(time.perf_counter()-t0)/4*1e3:8.2f} ms", flush=True)

# --- raster alone at several supersample levels
l_pad = out.vertices.clip.shape[0]
_, _, _, grid_mask = mesh.grid_uv_skirt(cfg.patch_verts)
row_ok = np.arange(l_pad) < out.n_leaves
valid = jnp.asarray(row_ok[:, None, None] & grid_mask[None, :, :])
args = (out.vertices.clip, out.vertex_shade, out.vertices.normal, valid,
        out.vertices.world, out.vertices.snormal)
for ss in (2, 4, 8):
    f = _raster_fn(1920, 1080, ss, False)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(8)]
    jax.block_until_ready(outs)
    print(f"raster ss={ss}:      {(time.perf_counter()-t0)/8*1e3:8.2f} ms",
          flush=True)

# --- full render synced
t0 = time.perf_counter()
for _ in range(4):
    out2, img, _ = eng.render(cam)
    jax.block_until_ready(img)
print(f"render() synced:  {(time.perf_counter()-t0)/4*1e3:8.2f} ms", flush=True)
