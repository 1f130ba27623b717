"""Trace-attributed op costs of the device refiner alone on TPU."""
import sys, pathlib, tempfile, glob, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine import device_step
from planet_tpu.lod import refine_device
from planet_tpu.nums import df as dfm

CFG = EngineConfig()
cdir = np.array([0.2, 0.5, -0.8]); cdir /= np.linalg.norm(cdir)
cam = cdir * (CFG.radius + 20000.0)
cam_df = dfm.from_f64(cam)
roots = device_step._roots_static(CFG.radius)

ITERS = 16


def run():
    return refine_device.refine_device(
        np.asarray(cam_df.hi), np.asarray(cam_df.lo), *roots,
        max_lod=CFG.max_lod, cap=4096, radius=CFG.radius,
        probe_fn_name="ridged6")


for _ in range(2):
    ref = run()
jax.block_until_ready(ref.n_leaves)
print("leaves:", int(ref.n_leaves))

import time
t0 = time.perf_counter()
for _ in range(ITERS):
    ref = run()
jax.block_until_ready(ref.n_leaves)
print(f"wall: {(time.perf_counter()-t0)/ITERS*1e3:.2f} ms/iter")

outdir = tempfile.mkdtemp(prefix="refine_trace_")
with jax.profiler.trace(outdir):
    for _ in range(ITERS):
        ref = run()
    jax.block_until_ready(ref.n_leaves)

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
print(f"total device: {tot/1e12/ITERS*1e3:.2f} ms/iter (lines double-count)")
for nm, ps in totals.most_common(40):
    print(f"{ps/1e12/ITERS*1e3:9.3f} ms  {nm[:130]}")
