"""Trace-attributed per-op costs of the 1080p LOD device frame on TPU."""
import sys, pathlib, tempfile, glob, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.device_step import build_device_render
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm
from planet_tpu.cache import device_pool as dp

cfg = EngineConfig()
W, H = 1920, 1080
cdir = np.array([0.2, 0.5, -0.8]); cdir /= np.linalg.norm(cdir)
cam_pos = cdir * (cfg.radius + 20000.0)
cam = cam_mod.Camera(position=cam_pos,
                     angles=np.array([0.35, 0.3, 0.0], np.float32))
rot = cam_mod.camera_rotation(cam)
pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
vp = jnp.asarray((proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))
ch, cl = dfm.from_f64_np(cam_pos)
ch, cl = jnp.asarray(ch), jnp.asarray(cl)

f = build_device_render(cfg, W, H)
pool = dp.init(cfg.cache_capacity, cfg.tile_dim)
ITERS = 8
for _ in range(3):
    pool, out = f(pool, ch, cl, vp)
jax.block_until_ready(jax.tree.leaves(out))

outdir = tempfile.mkdtemp(prefix="lod_trace_")
with jax.profiler.trace(outdir):
    for _ in range(ITERS):
        pool, out = f(pool, ch, cl, vp)
    jax.block_until_ready(jax.tree.leaves(out))

from tensorflow.tsl.profiler.protobuf import xplane_pb2
totals = collections.Counter()
for fn in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fn, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, "")
                totals[nm] += ev.duration_ps

tot = sum(totals.values())
print(f"total device: {tot/1e12/ITERS*1e3:.2f} ms/iter (lines may double-count)")
for nm, ps in totals.most_common(30):
    print(f"{ps/1e12/ITERS*1e3:9.3f} ms  {nm[:120]}")
