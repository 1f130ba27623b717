"""Trace-attributed cost split of the Pallas exact raster at the real
1080p LOD workload: XLA preprocess (setup/sort/compact) vs each per-class
fragment kernel vs decode."""
import sys, pathlib, tempfile, glob, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp
from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.device_step import DeviceRenderer
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm
from planet_tpu.raster import coverage

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

r = DeviceRenderer(cfg, W, H)
pool = r.init_pool()
pool, frame = r.render(pool, ch, cl, vp)
pool, (pv, vshade, valid, meta) = r._geom(pool, ch, cl, vp)
args = (pv.clip, vshade, pv.normal, valid, pv.world, pv.snormal)
jax.block_until_ready(args)

# counters on this real workload
_, _, counters = coverage.raster_frame(pv.clip, pv.normal, valid, W, H)
print("n_tris:", int(counters.n_tris), "per_class:",
      np.asarray(counters.n_per_class), "huge:", int(counters.n_huge))

ITERS = 10
img, dep = r._raster(*args); jax.block_until_ready(img)
outdir = tempfile.mkdtemp(prefix="raster_trace_")
with jax.profiler.trace(outdir):
    for _ in range(ITERS):
        img, dep = r._raster(*args)
    jax.block_until_ready(img)

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
for nm, ps in totals.most_common(25):
    print(f"{ps/1e12/ITERS*1e3:9.3f} ms  {nm[:110]}")
