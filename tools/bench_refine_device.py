"""Isolate device-step stage costs on TPU: refinement alone (zero + ridged
probes), then the remainder."""
import sys, time, pathlib
import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine import device_step
from planet_tpu.lod import refine_device
from planet_tpu.nums import df as dfm

CFG = EngineConfig()
cam = np.array([0.0, 0.0, -(CFG.radius + 50000.0)])
cam_df = dfm.from_f64(cam)
roots = device_step._roots_static(CFG.radius)

for probe in ("zero", "ridged6"):
    t0 = time.perf_counter()
    ref = refine_device.refine_device(
        np.asarray(cam_df.hi), np.asarray(cam_df.lo), *roots,
        max_lod=CFG.max_lod, cap=4096, radius=CFG.radius,
        probe_fn_name=probe)
    jax.block_until_ready(ref.n_leaves)
    print(f"refine[{probe}] compile+run: {time.perf_counter()-t0:.1f} s "
          f"leaves={int(ref.n_leaves)}", flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        ref = refine_device.refine_device(
            np.asarray(cam_df.hi), np.asarray(cam_df.lo), *roots,
            max_lod=CFG.max_lod, cap=4096, radius=CFG.radius,
            probe_fn_name=probe)
        jax.block_until_ready(ref.n_leaves)
    print(f"refine[{probe}] warm: {(time.perf_counter()-t0)/4*1e3:.1f} ms",
          flush=True)
