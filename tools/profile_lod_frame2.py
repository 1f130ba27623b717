"""Trace-attributed per-op costs of the DeviceRenderer 1080p LOD frame
(the two-dispatch geometry + raster path that bench.py measures).

Usage: python tools/profile_lod_frame2.py [alt_m] [quality] [render_cap]
"""
import sys, pathlib, tempfile, glob, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.device_step import DeviceRenderer
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm

alt = float(sys.argv[1]) if len(sys.argv) > 1 else 20000.0
quality = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
render_cap = int(sys.argv[3]) if len(sys.argv) > 3 else 512

cfg = EngineConfig()
if quality != 1.0:
    cfg = EngineConfig(lod_quality=quality)
W, H = 1920, 1080
cdir = np.array([0.2, 0.5, -0.8]); cdir /= np.linalg.norm(cdir)
cam_pos = cdir * (cfg.radius + alt)
cam = cam_mod.Camera(position=cam_pos,
                     angles=np.array([0.35, 0.3, 0.0], np.float32))
rot = cam_mod.camera_rotation(cam)
pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
vp = jnp.asarray((proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))
ch, cl = dfm.from_f64_np(cam_pos)
ch, cl = jnp.asarray(ch), jnp.asarray(cl)

r = DeviceRenderer(cfg, W, H, render_cap=render_cap)
pool = r.init_pool()
ITERS = 8
for _ in range(3):
    pool, out = r.render(pool, ch, cl, vp)
jax.block_until_ready(jax.tree.leaves(out))
print(f"n_leaves={int(out.n_leaves)} n_gen={int(out.n_generated)} "
      f"overflowed={bool(out.overflowed)}")

outdir = tempfile.mkdtemp(prefix="lod_trace_")
with jax.profiler.trace(outdir):
    for _ in range(ITERS):
        pool, out = r.render(pool, ch, cl, vp)
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
for nm, ps in totals.most_common(40):
    print(f"{ps/1e12/ITERS*1e3:9.3f} ms  {nm[:120]}")
