"""Moving-camera 1080p LOD frame: churn exploration + timing.

VERDICT r4 #1: the static bench measures a warm-cache zero-churn frame;
the reference's real workload regenerates up to 100 tiles/frame while the
camera moves (main.cpp:653). This tool drives a descending strafing orbit,
reports per-frame leaves/generated/overflow, and slope-times the sustained
moving frame.

Usage: python tools/bench_moving.py [quality] [render_cap] [omega_mrad]
           [n_frames] [cap] [mode]
mode: "two" (DeviceRenderer, geometry+raster jits) | "one" (single fused
jit, stop_after="full").
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.device_step import DeviceRenderer, build_device_render
from planet_tpu.cache import device_pool as dp
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm

quality = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
render_cap = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
omega = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0   # mrad/frame
n_frames = int(sys.argv[4]) if len(sys.argv) > 4 else 48
cap = int(sys.argv[5]) if len(sys.argv) > 5 else 8192
mode = sys.argv[6] if len(sys.argv) > 6 else "two"

# capacities sized to the workload: the reference-shape scene (~1k leaves)
# needs a deeper pool (its working set exceeds the reference's 1024-slot
# cache), a wider quad compaction, and ~2.5x the class caps
MOVING_RASTER_CFG = dict(caps=(24576, 36864, 14336, 5120, 5120, 2048),
                         huge_cap=1536)
if quality > 2.0:
    cfg = EngineConfig(lod_quality=quality, cache_capacity=4096)
    RASTER_CFG = dict(quad_cap=640,
                      caps=(65536, 73728, 28672, 10240, 10240, 4096),
                      huge_cap=3072)
else:
    cfg = EngineConfig(lod_quality=quality) if quality != 1.0 \
        else EngineConfig()
    # the orbit's horizon-grazing frames need ~1.6x the static-scene
    # ladder + a deep tall-sliver huge class (tools/debug_overflow.py)
    RASTER_CFG = MOVING_RASTER_CFG
W, H = 1920, 1080


def camera_at(cfg, theta, alt, W, H):
    """Descending orbit camera: position on a great circle at altitude,
    pitched down toward the surface, yaw following the motion."""
    cdir = np.array([np.cos(theta) * 0.8, 0.6, np.sin(theta) * 0.8])
    cdir /= np.linalg.norm(cdir)
    cam_pos = cdir * (cfg.radius + alt)
    cam = cam_mod.Camera(position=cam_pos,
                         angles=np.array([0.35, theta, 0.0], np.float32))
    rot = cam_mod.camera_rotation(cam)
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
    proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
    vp = np.asarray((proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))
    ch, cl = dfm.from_f64_np(cam_pos)
    return jnp.asarray(ch), jnp.asarray(cl), jnp.asarray(vp)


class OneJitRenderer:
    """Single fused program per frame (stop_after='full')."""

    def __init__(self, cfg, W, H, **kw):
        self.cfg = cfg
        self._step = build_device_render(cfg, W, H, stop_after="full", **kw)

    def init_pool(self):
        return dp.init(self.cfg.cache_capacity, self.cfg.tile_dim)

    def render(self, pool, ch, cl, vp):
        return self._step(pool, ch, cl, vp)


def main():
    cls = OneJitRenderer if mode == "one" else DeviceRenderer
    r = cls(cfg, W, H, cap=cap, gen_cap=256,
            render_cap=render_cap, raster_cfg=RASTER_CFG)
    pool = r.init_pool()

    # trajectory: orbit at omega mrad/frame, descending 20 km -> 3 km
    alts = np.linspace(20000.0, 3000.0, n_frames)
    thetas = np.arange(n_frames) * omega * 1e-3
    cams = [camera_at(cfg, t, a, W, H) for t, a in zip(thetas, alts)]

    # warm compile + stats pass
    stats = []
    t0 = time.perf_counter()
    for i, (ch, cl, vp) in enumerate(cams):
        pool, out = r.render(pool, ch, cl, vp)
        stats.append((int(out.n_leaves), int(out.n_generated),
                      bool(out.overflowed)))
    wall = time.perf_counter() - t0
    leaves = np.array([s[0] for s in stats])
    gens = np.array([s[1] for s in stats])
    ovf = np.array([s[2] for s in stats])
    print(f"quality={quality} render_cap={render_cap} omega={omega}mrad "
          f"frames={n_frames}")
    print(f"leaves: min {leaves.min()} p50 {int(np.median(leaves))} "
          f"max {leaves.max()}")
    print(f"generated/frame: min {gens.min()} p50 {int(np.median(gens))} "
          f"mean {gens.mean():.0f} max {gens.max()}")
    print(f"overflowed frames: {ovf.sum()}/{n_frames}")
    print(f"serial wall (tunnel-bound): {wall / n_frames * 1e3:.1f} ms/frame")
    print("per-frame gens:", list(gens))

    # slope timing over the SUSTAINED moving segment: re-run the same
    # trajectory from a mid-state pool so every timed frame pays refine +
    # generation churn + raster. Queue depth cancels the tunnel latency;
    # the median of 3 repeats cancels tunnel/queue noise (single slopes
    # were measured wandering +-1.5 ms run to run).
    checksum = jax.jit(lambda img: jnp.sum(img, dtype=jnp.float32))
    dts = []
    for rep in range(3):
        walls = []
        for nq in (8, 24):
            pool2 = r.init_pool()
            # prime with the first 8 frames
            for ch, cl, vp in cams[:8]:
                pool2, out = r.render(pool2, ch, cl, vp)
            np.asarray(checksum(out.image))
            t0 = time.perf_counter()
            for ch, cl, vp in cams[8:8 + nq]:
                pool2, out = r.render(pool2, ch, cl, vp)
            np.asarray(checksum(out.image))
            walls.append(time.perf_counter() - t0)
        dts.append((walls[1] - walls[0]) / 16)
    print("slope repeats:", [f"{d * 1e3:.2f}" for d in dts])
    dt = float(np.median(dts))
    print(f"moving frame (slope median, churn sustained): {dt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
