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
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")


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


def _slope(step, n_small=4, n_big=16):
    """Per-program device time: step(i) returns a SCALAR device array;
    programs execute in submission order, so fetching only the last
    output syncs the queue, and the two-depth slope cancels the ~30 ms
    tunnel round trip (see docs/architecture.md benchmarking notes)."""
    np.asarray(step(0))
    walls = []
    for n in (n_small, n_big):
        t0 = time.perf_counter()
        outs = [step(i) for i in range(n)]
        np.asarray(outs[-1])
        walls.append(time.perf_counter() - t0)
    return max((walls[1] - walls[0]) / (n_big - n_small), 1e-9)


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
    """Static cube-sphere 6x1024^2: on-device DF sphere points + heights +
    normals + shade, one jitted program (no host grids cross the tunnel)."""
    import jax
    import jax.numpy as jnp
    from planet_tpu.models import heightfield
    from planet_tpu.parallel import facemesh
    from planet_tpu.raster import shade as shade_mod

    on_tpu = jax.default_backend() == "tpu"
    n = 1024 if on_tpu else 128
    xyscale = (np.pi / 2.0) * 6371000.0 / n

    def frame(tick):
        px, py, pz = facemesh.face_grid_points_df(n, 6371000.0)
        h = heightfield.heights_df(px, py, pz, kind="ridged", octaves=6,
                                   gain=0.55, use_pallas=on_tpu)
        h = h + tick * jnp.float32(0.0)
        h_rows = jnp.concatenate([h[:, :1], h, h[:, -1:]], axis=1)
        h_pad = jnp.concatenate(
            [h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]], axis=2)
        normal = heightfield.normals_from_heights(h_pad, xyscale)
        sh = shade_mod.lambert(normal)
        return jnp.sum(h, dtype=jnp.float32) + jnp.sum(sh,
                                                       dtype=jnp.float32)

    f = jax.jit(frame)
    if on_tpu:
        dt = _slope(lambda i: f(jnp.float32(i)))
    else:
        dt = _steady(f, jnp.float32(0), iters=1)
    _emit("config2_cubesphere_6x1024_frame_ms", dt * 1e3, "ms", 10.0)


def _device_lod_frame(width, height, orbit: bool):
    """Shared body for configs 3/4: the PRODUCTION fused device frame
    (engine/device_step; the host-orchestrated PlanetEngine path is the
    parity/convenience path and is tunnel-dispatch-bound, ~100 small
    dispatches x ~27 ms through the dev tunnel)."""
    import jax
    import jax.numpy as jnp
    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.engine.device_step import DeviceRenderer
    from planet_tpu.geom import camera as cam_mod
    from planet_tpu.nums import df as dfm

    cfg = EngineConfig()
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        width, height = width // 6, height // 6
    r = DeviceRenderer(cfg, width, height)
    pool = r.init_pool()
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
    proj = cam_mod.perspective_lh(pf, width / height, cfg.near_plane,
                                  cfg.far_plane)

    def cam_args(t):
        cdir = np.array([0.2 + np.sin(t), 0.5, -np.cos(t) * 0.8])
        cdir /= np.linalg.norm(cdir)
        cam = cam_mod.Camera(position=cdir * (cfg.radius + 20000.0),
                             angles=np.array([0.35, 0.3, 0.0], np.float32))
        rot = cam_mod.camera_rotation(cam)
        vp = jnp.asarray(
            (proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))
        ch, cl = dfm.from_f64_np(cam.position)
        return jnp.asarray(ch), jnp.asarray(cl), vp

    ts = np.linspace(0.0, 2e-4, 16) if orbit else np.zeros(16)
    args = [cam_args(t) for t in ts]
    checksum = jax.jit(lambda img: jnp.sum(img, dtype=jnp.float32))
    for a in args:                         # warm: compile + fill cache
        pool, frame = r.render(pool, *a)
    np.asarray(checksum(frame.image))

    # slope timing: frames chain through the pool; syncing the last
    # frame's scalar checksum proves the whole queue executed
    walls = []
    for lo, hi in ((0, 4), (0, 16)):
        t0 = time.perf_counter()
        for a in args[lo:hi]:
            pool, frame = r.render(pool, *a)
        np.asarray(checksum(frame.image))
        walls.append(time.perf_counter() - t0)
    return (walls[1] - walls[0]) / 12


def config3():
    """Camera-driven quadtree LOD: steady orbit of fused device frames
    (regen under budget + retessellate + exact raster) at 800x600."""
    dt = _device_lod_frame(800, 600, orbit=True)
    # reference pacing floor: 10 ms/frame (SDL_Delay, main.cpp:1095)
    _emit("config3_lod_frame_ms", dt * 1e3, "ms", 10.0)


def config4():
    """Full frame parity workload at 1920x1080: the fused device frame
    with the exact-coverage Pallas raster, static camera."""
    dt = _device_lod_frame(1920, 1080, orbit=False)
    _emit("config4_fullframe_1080p_ms", dt * 1e3, "ms", 10.0)


def config5():
    """The FULL 6x8192^2 heightfield on one chip through the PRODUCTION
    tile generator: 6*4^8 = 393,216 depth-8 tiles of 32x32 through the
    fused Pallas kernel at the engine's octave schedule for that depth
    (6 + 12*8/18 = 11, main.cpp:827). Per-tile corner payloads (37 MB)
    ship once outside the timed region; all chunk launches queue before
    one sync. (Round 1 measured 12 s here — host f64 point grids; the
    round-2 field path measured 5.95 s — XLA double-float point math;
    the tile path generates points inside the kernel.)"""
    import jax
    import jax.numpy as jnp
    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.geom import cubesphere
    from planet_tpu.lod import refine as lod_refine
    from planet_tpu.nums import df as dfm
    from planet_tpu.ops.kernels import tile_pallas

    cfg = EngineConfig()
    on_tpu = jax.default_backend() == "tpu"
    depth = 8 if on_tpu else 3
    corners = cubesphere.root_corners(cfg.radius)
    for _ in range(depth):
        corners = lod_refine._subdivide_batch(
            corners, cfg.radius).reshape(-1, 4, 3)
    n = len(corners)
    octs = cfg.octaves_for_depth(depth)
    ch, cl = dfm.from_f64_np(corners * cfg.coord_scale)
    per_tile = np.stack(
        [np.asarray(ch, np.float32).transpose(0, 2, 1),
         np.asarray(cl, np.float32).transpose(0, 2, 1)],
        axis=-1).reshape(n, 24)
    dev = jax.device_put(jnp.asarray(per_tile))
    chunk = min(8192 if on_tpu else 512, n)   # dynamic_slice needs <= n
    rows_per_tile = cfg.tile_dim * cfg.tile_dim // tile_pallas.LANES

    def chunk_sum(pt_all, start):
        pt = jax.lax.dynamic_slice(pt_all, (start, 0), (chunk, 24))
        rows = jnp.repeat(pt, rows_per_tile, axis=0)
        tiles = tile_pallas.tiles_from_payload(
            rows, chunk, kind="ridged", octaves=octs,
            lacunarity=cfg.lacunarity, gain=cfg.gain,
            amplitude=cfg.amplitude, dim=cfg.tile_dim,
            interpret=not on_tpu)
        return jnp.sum(tiles, dtype=jnp.float32)

    f = jax.jit(chunk_sum, static_argnames=())
    starts = [jnp.int32(i) for i in range(0, n, chunk)]
    out = f(dev, starts[0])
    jax.block_until_ready(out)
    _fetch(out)
    t0 = time.perf_counter()
    outs = [f(dev, s) for s in starts]            # full planet, queued
    jax.block_until_ready(outs)
    _fetch(outs[-1])
    full_s = (time.perf_counter() - t0) * (393216 / n) * (1024 / 1024)
    assert all(np.isfinite(float(o)) for o in outs)
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
