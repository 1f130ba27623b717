"""Sweep tiles_per_block for the fused tile kernel on the real chip."""
import sys, time, pathlib
import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import tile_pallas
from planet_tpu.lod import refine as lod_refine

N = 4096
cfg_scale = 1e-5
cam = np.array([0.0, 0.0, -1.2 * 6371000.0])
res = lod_refine.refine(cam, 18, 6371000.0)
corners = np.tile(res.corners, (-(-N // len(res.corners)), 1, 1))[:N] * cfg_scale
ch, cl = (np.asarray(a) for a in dfm.from_f64(corners))

for tpb in (8, 16, 32, 64, 128):
    try:
        fn = jax.jit(lambda a, b, t=tpb: tile_pallas.generate_tiles(
            a, b, octaves=6, gain=np.float32(0.55), tiles_per_block=t,
            interpret=False))
        out = fn(ch, cl)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(ch, cl) for _ in range(16)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 16
        tex = N * 1024
        print(f"tpb={tpb:4d}: {dt*1e3:8.3f} ms  {tex/dt/1e9:6.3f} Gtexels/s",
              flush=True)
    except Exception as e:
        print(f"tpb={tpb}: FAILED {str(e)[:200]}", flush=True)
