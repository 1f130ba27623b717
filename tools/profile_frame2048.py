"""Trace-attributed stage costs of the 6x2048^2 frame step (bench_frame_2048)."""
import sys, pathlib, tempfile, glob, collections
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from planet_tpu.engine.config import EngineConfig
from planet_tpu.models import heightfield
from planet_tpu.parallel import facemesh
from planet_tpu.raster import shade as shade_mod

cfg = EngineConfig()
n = 2048
xyscale = (np.pi / 2) * cfg.radius / n
ITERS = 8


def frame(tick):
    px, py, pz = facemesh.face_grid_points_df(n, cfg.radius)
    h = heightfield.heights_df(px, py, pz, kind="ridged", octaves=6,
                               use_pallas=True)
    h = h + tick * jnp.float32(0.0)
    h_rows = jnp.concatenate([h[:, :1], h, h[:, -1:]], axis=1)
    h_pad = jnp.concatenate([h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]],
                            axis=2)
    normal = heightfield.normals_from_heights(h_pad, xyscale)
    sh = shade_mod.lambert(normal)
    return jnp.sum(h, dtype=jnp.float32) + jnp.sum(sh, dtype=jnp.float32)


fn = jax.jit(frame)
out = fn(jnp.float32(0))
np.asarray(out)

outdir = tempfile.mkdtemp(prefix="f2048_trace_")
with jax.profiler.trace(outdir):
    outs = [fn(jnp.float32(i)) for i in range(ITERS)]
    jax.block_until_ready(outs)
    np.asarray(outs[-1])

from tensorflow.tsl.profiler.protobuf import xplane_pb2
totals = collections.Counter()
for f in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                nm = ev_meta.get(ev.metadata_id, "")
                totals[nm] += ev.duration_ps

tot = sum(totals.values())
print(f"total device: {tot/1e12/ITERS*1e3:.2f} ms/iter (may double-count lines)")
for nm, ps in totals.most_common(25):
    print(f"{ps/1e12/ITERS*1e3:9.3f} ms  {nm[:110]}")
