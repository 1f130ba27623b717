"""Profile one warm device-step frame and print the top self-time ops."""
import glob, gzip, sys, time, pathlib
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

step = device_step.build_device_render(CFG, W, H, cap=2048, gen_cap=128,
                                       probe="ridged6")
pool = dp.init(CFG.cache_capacity, CFG.tile_dim)
pool, f = step(pool, np.asarray(cam_df.hi), np.asarray(cam_df.lo), vp)
jax.block_until_ready(f.image)

outdir = "/tmp/prof_step"
with jax.profiler.trace(outdir):
    for _ in range(2):
        pool, f = step(pool, np.asarray(cam_df.hi), np.asarray(cam_df.lo), vp)
    jax.block_until_ready(f.image)
print("trace written", flush=True)

# parse the xplane protobuf for op self-times
files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
print("files:", files, flush=True)
try:
    from xprof.convert import _pywrap_profiler_plugin as pp
except Exception:
    pp = None
try:
    from tensorflow.python.profiler.internal import _pywrap_profiler
except Exception:
    pass

# fall back: raw xplane proto parse via xprof's proto defs
from tensorflow.tsl.profiler.protobuf import xplane_pb2
import collections

for fn in files:
    data = open(fn, "rb").read()
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(data)
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                totals[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps
        print(f"== plane {plane.name}")
        for name, ps in totals.most_common(25):
            print(f"  {ps/1e9:10.3f} ms  {name[:110]}")
