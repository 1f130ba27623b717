"""Trace-attributed per-op costs of the MOVING 1080p LOD frame on TPU.

Same orbit as tools/bench_moving.py: every traced frame pays refine +
generation churn + pool scatter + raster (VERDICT r4 #1 workload).
"""
import sys, pathlib, tempfile, glob, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from planet_tpu.engine.device_step import DeviceRenderer
from tools.bench_moving import camera_at, cfg, RASTER_CFG

quality = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
render_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

W, H = 1920, 1080
r = DeviceRenderer(cfg, W, H, cap=8192, gen_cap=256, render_cap=render_cap,
                   raster_cfg=RASTER_CFG)
pool = r.init_pool()

n_frames = 40
alts = np.linspace(20000.0, 3000.0, n_frames)
thetas = np.arange(n_frames) * 1e-3
cams = [camera_at(cfg, t, a, W, H) for t, a in zip(thetas, alts)]

# prime: first 8 frames fill the pool mid-orbit
for ch, cl, vp in cams[:8]:
    pool, out = r.render(pool, ch, cl, vp)
jax.block_until_ready(out.image)

ITERS = 16
outdir = tempfile.mkdtemp(prefix="mov_trace_")
with jax.profiler.trace(outdir):
    for ch, cl, vp in cams[8:8 + ITERS]:
        pool, out = r.render(pool, ch, cl, vp)
    jax.block_until_ready(out.image)

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
