"""Two-frame pipelining: sequential fetch-per-frame loop vs
PipelinedRenderer (frame N fetched while frame N+1 computes), at both
fetch widths (f32 image vs on-device-quantized u8).

Measured on the tunneled dev chip (2026-08-18): the f32 fetch paces both
loops at the tunnel's 8.3 MB-transfer wall (1253 ms/frame sequential —
the tunnel was ~5x slower than the round-2 measurement; pipelining only
queues more transfers, 0.51x). The u8 fetch (DeviceRenderer(fetch="u8"),
4x less transfer, PNG-bit-identical) collapses the frame loop 1253 ->
94 ms/frame, and overlapping then pays: 94 -> 86 ms/frame (1.10x).
Output equality (bitwise) is what the test suite asserts; this tool
records the wall-clock picture."""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from planet_tpu.engine import device_step
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm

W, H = 1920, 1080
FRAMES = 24

cfg = EngineConfig()
on_tpu = jax.default_backend() == "tpu"


def make_renderer(fetch):
    if on_tpu:
        return device_step.DeviceRenderer(cfg, W, H, fetch=fetch)
    return device_step.DeviceRenderer(
        EngineConfig(use_pallas=False), 320, 180, fetch=fetch,
        cap=1024, gen_cap=128, render_cap=128, max_lod=4, interpret=True)


pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
args = []
for i in range(FRAMES):
    t = 0.002 * i
    cam = cam_mod.Camera(
        position=(cfg.radius + 30000.0) * np.array(
            [np.sin(t), 0.0, -np.cos(t)]),
        angles=np.array([0.35, 0.2, 0.0], np.float32))
    rot = cam_mod.camera_rotation(cam)
    vp = (proj @ cam_mod.view_from_rotation(rot)).astype(np.float32)
    ch, cl = dfm.from_f64_np(cam.position)
    args.append((np.asarray(ch), np.asarray(cl), vp))

for fetch in ("f32", "u8"):
    r = make_renderer(fetch)

    # warm: compile + fill cache along the orbit
    pool = r.init_pool()
    for a in args:
        pool, fr = r.render(pool, *a)
    np.asarray(fr.image)

    t0 = time.perf_counter()
    pool2 = r.init_pool()
    for a in args:
        pool2, fr = r.render(pool2, *a)
        _ = np.asarray(fr.image)      # sequential: fetch blocks the loop
    seq = (time.perf_counter() - t0) / FRAMES

    t0 = time.perf_counter()
    pipe = device_step.PipelinedRenderer(r, r.init_pool())
    for a in args:
        out = pipe.submit(*a)
        if out is not None:
            out[0].sum()              # consume on host, overlapped
    pipe.flush()[0].sum()
    pl = (time.perf_counter() - t0) / FRAMES

    print(f"[fetch={fetch}] sequential: {seq * 1e3:8.2f} ms/frame")
    print(f"[fetch={fetch}] pipelined:  {pl * 1e3:8.2f} ms/frame   "
          f"({seq / pl:.2f}x)")
