"""Ground-truth tile-kernel time from the hardware trace (xplane), immune to
tunnel dispatch/fetch artifacts."""
import collections, glob, sys, time, pathlib
import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.planet import _gen_tiles_fn
from planet_tpu.lod import refine as lod_refine
from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import tile_pallas

cfg = EngineConfig()
cam = np.array([0.0, 0.0, -1.2 * cfg.radius])
res = lod_refine.refine(cam, cfg.max_lod, cfg.radius)
corners = np.tile(res.corners, (-(-4096 // len(res.corners)), 1, 1))[:4096]
corners = corners * cfg.coord_scale
ch, cl = dfm.from_f64_np(corners)
rows = jax.device_put(tile_pallas.build_payload_host(ch, cl, 4096, 32))
fn = _gen_tiles_fn(6, 32, 2.0, float(np.float32(0.55)), cfg.coord_scale,
                   cfg.amplitude, True)
out = fn(rows, 4096)
_ = np.asarray(out[0, 0, 0])

ITERS = 16
outdir = "/tmp/prof_tiles"
with jax.profiler.trace(outdir):
    outs = [fn(rows, 4096) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    _ = np.asarray(outs[-1][0, 0, 0])

from tensorflow.tsl.profiler.protobuf import xplane_pb2
files = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(files[-1], "rb").read())
for plane in xs.planes:
    if "TPU" not in plane.name:
        continue
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    totals = collections.Counter()
    counts = collections.Counter()
    for line in plane.lines:
        for ev in line.events:
            nm = ev_meta.get(ev.metadata_id, "?")
            totals[nm] += ev.duration_ps
            counts[nm] += 1
    for name, ps in totals.most_common(6):
        print(f"{ps/1e9:10.3f} ms total ({counts[name]:3d}x) {name[:90]}")
    # texel throughput from the pallas custom-call total
    for name, ps in totals.items():
        if "custom-call" in name and "tile" not in name:
            pass
texels = 4096 * 1024 * ITERS
best = max((ps for name, ps in totals.items() if "custom" in name),
           default=0)
if best:
    print(f"kernel: {best/1e9/ITERS:.3f} ms/launch  "
          f"{texels/(best/1e12):.3e} texels/s")
