"""Headline benchmark + BASELINE metric set on one TPU chip.

Reports the three numbers BASELINE.json's metric line names:
  * fBm/ridged texel throughput (headline `value`) — batched 32x32 tile
    generation with the fused Pallas ridged kernel at the production
    octave count (6; reference terrain chain main.cpp:823-832),
  * p50 frame-step ms — the full 6x2048^2 cube-sphere regen + normals +
    shade frame as ONE jitted program (config-2/north-star shape; points
    generated on device in double-float, parallel/facemesh.py),
  * patches tessellated/sec — the batched vertex program
    (tess/vertex.tessellate_blend) over 512-patch batches,
plus the 1920x1080 LOD engine frame time (refine -> cache -> generate ->
tessellate -> exact-coverage raster, engine/device_step.DeviceRenderer).

Timing: the dev chip sits behind a network tunnel, so the headline kernel
number comes from the hardware trace (xplane custom-call self time) when
available; whole-frame numbers use deep-queue wall clock (N dispatches
queued, one final fetch) which amortizes dispatch latency to ~device time.

Baseline: the reference's architectural tile-generation ceiling is
100 tiles x 32x32 texels per frame at its 100 fps pacing cap
(main.cpp:653, 194, 1095) = 10.24e6 texels/s. vs_baseline is ours/theirs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import glob
import json
import os
import sys
import tempfile
import time

# persistent compilation cache: the Pallas raster kernels take minutes to
# compile through the AOT tunnel; cache them across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import numpy as np

ITERS = 16
N_TILES = 4096


def _kernel_time_from_trace(outdir: str) -> float:
    """Total device time (s) of the heaviest custom-call in the trace."""
    import collections
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    best = 0
    for fn in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fn, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            totals = collections.Counter()
            for line in plane.lines:
                for ev in line.events:
                    nm = ev_meta.get(ev.metadata_id, "")
                    if "custom-call" in nm:
                        totals[nm] += ev.duration_ps
            if totals:
                best = max(best, max(totals.values()))
    return best / 1e12


def _queue_time(fn, args, iters, warmup=2):
    """Deep-queue wall time per call: queue `iters` dispatches, block once."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def _slope_time(step, n_small=4, n_big=16):
    """True per-program device time through the tunnel.

    step(i) must return a small device array whose host fetch proves the
    program ran (block_until_ready alone can return early through the
    tunnel; fetching big outputs pollutes the wall with ~33 ms/8 MB of
    transfer). Programs on one device execute in submission order, so
    fetching only the LAST output syncs the whole queue; timing two queue
    depths and taking the slope cancels the fixed ~30 ms round trip."""
    np.asarray(step(0))                       # warm / compile
    walls = []
    for n in (n_small, n_big):
        t0 = time.perf_counter()
        outs = [step(i) for i in range(n)]
        np.asarray(outs[-1])
        walls.append(time.perf_counter() - t0)
    return max((walls[1] - walls[0]) / (n_big - n_small), 1e-9)


def bench_texels(cfg):
    """Headline: ridged-6 tile-generation texel throughput."""
    import jax

    from planet_tpu.engine.planet import _gen_tiles_fn
    from planet_tpu.lod import refine as lod_refine
    from planet_tpu.nums import df as dfm

    cam_pos = np.array([0.0, 0.0, -1.2 * cfg.radius])
    res = lod_refine.refine(cam_pos, cfg.max_lod, cfg.radius)
    reps = -(-N_TILES // len(res.corners))
    corners = np.tile(res.corners, (reps, 1, 1))[:N_TILES]
    corners = corners * cfg.coord_scale          # host f64 pre-scale
    ch, cl = dfm.from_f64_np(corners)

    octaves = 6
    on_tpu = jax.default_backend() == "tpu"
    fn = _gen_tiles_fn(octaves, cfg.tile_dim, cfg.lacunarity,
                       float(np.float32(cfg.gain)), cfg.coord_scale,
                       cfg.amplitude, use_pallas=on_tpu)
    if on_tpu:
        from planet_tpu.ops.kernels import tile_pallas
        rows = jax.device_put(
            tile_pallas.build_payload_host(ch, cl, N_TILES, cfg.tile_dim))
        args = (rows, N_TILES)
    else:
        args = (ch, cl)

    out = fn(*args)
    _ = np.asarray(out[0, 0, 0])                 # true warm-up fetch

    texels = N_TILES * cfg.tile_dim * cfg.tile_dim
    dt = None
    if on_tpu:
        try:
            outdir = tempfile.mkdtemp(prefix="bench_trace_")
            with jax.profiler.trace(outdir):
                outs = [fn(*args) for _ in range(ITERS)]
                jax.block_until_ready(outs)
                _ = np.asarray(outs[-1][0, 0, 0])
            total = _kernel_time_from_trace(outdir)
            if total > 0:
                dt = total / ITERS
        except Exception:
            dt = None
    if dt is None:                               # wall-clock fallback
        dt = _queue_time(fn, args, ITERS if on_tpu else 2)
    return texels / dt


def bench_frame_2048(cfg):
    """p50 frame-step ms: 6x2048^2 regen + normals + shade, one program
    (the fused field kernel on TPU: ops/kernels/field_pallas.py)."""
    import jax
    import jax.numpy as jnp

    from planet_tpu.models import heightfield

    on_tpu = jax.default_backend() == "tpu"
    n = 2048 if on_tpu else 128

    def frame(tick):
        h, sh = heightfield.frame_cube(n, cfg.radius, kind="ridged",
                                       octaves=6, use_pallas=on_tpu)
        h = h + tick * jnp.float32(0.0)          # keep a live input
        # scalar checksum: proves full execution with a 4-byte fetch
        return jnp.sum(h, dtype=jnp.float32) + jnp.sum(sh,
                                                       dtype=jnp.float32)

    fn = jax.jit(frame)
    if not on_tpu:
        return _queue_time(fn, (jnp.float32(0),), 1) * 1e3
    times = [_slope_time(lambda i: fn(jnp.float32(i))) for _ in range(3)]
    return float(np.median(times) * 1e3)


def bench_tess(cfg):
    """Patches tessellated per second (vertex program throughput)."""
    import jax
    import jax.numpy as jnp

    from planet_tpu.tess import vertex

    q = 512
    rng = np.random.default_rng(0)
    r = cfg.radius
    corners = rng.normal(0, 1, (q, 4, 3))
    corners /= np.linalg.norm(corners, axis=-1, keepdims=True)
    normals = corners.astype(np.float32)
    corners_rel = (corners * r - np.array([0, 0, -1.001 * r])).astype(np.float32)
    tiles = rng.normal(0, 1000, (q, cfg.tile_dim, cfg.tile_dim)).astype(np.float32)
    vx = np.zeros(q, np.int32)
    vy = np.zeros(q, np.int32)
    skirt = np.full(q, 100.0, np.float32)
    vp = np.eye(4, dtype=np.float32)

    args = tuple(jnp.asarray(a) for a in
                 (corners_rel, normals, tiles, vx, vy, skirt, vp))
    on_tpu = jax.default_backend() == "tpu"
    reps = 32 if on_tpu else 1       # batches per program: the vertex
                                     # program is ~sub-ms, below slope
                                     # resolution one launch at a time

    def many(t, *a):
        def body(i, acc):
            pv = vertex.tessellate_blend(a[0] + i * jnp.float32(0.0), *a[1:])
            return acc + jnp.sum(pv.clip, dtype=jnp.float32)
        return jax.lax.fori_loop(0, reps, body, t)

    fn = jax.jit(many)
    if not on_tpu:
        return q * reps / _queue_time(fn, (jnp.float32(0),) + args, 2)
    dt = _slope_time(lambda i: fn(jnp.float32(i), *args), 4, 16)
    return q * reps / dt


def bench_lod_frame(cfg):
    """1920x1080 LOD engine frame (geometry + exact raster), ms."""
    import jax
    import jax.numpy as jnp

    from planet_tpu.engine.device_step import DeviceRenderer
    from planet_tpu.geom import camera as cam_mod
    from planet_tpu.nums import df as dfm

    on_tpu = jax.default_backend() == "tpu"
    size = (1920, 1080) if on_tpu else (320, 180)
    r = DeviceRenderer(cfg, *size)
    pool = r.init_pool()

    cdir = np.array([0.2, 0.5, -0.8])
    cdir /= np.linalg.norm(cdir)
    cam_pos = cdir * (cfg.radius + 20000.0)
    cam = cam_mod.Camera(position=cam_pos,
                         angles=np.array([0.35, 0.3, 0.0], np.float32))
    rot = cam_mod.camera_rotation(cam)
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
    proj = cam_mod.perspective_lh(pf, size[0] / size[1], cfg.near_plane,
                                  cfg.far_plane)
    vp = jnp.asarray((proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))
    ch, cl = dfm.from_f64_np(cam_pos)
    ch, cl = jnp.asarray(ch), jnp.asarray(cl)

    checksum = jax.jit(lambda img: jnp.sum(img, dtype=jnp.float32))

    # warm up + fill the tile cache (steady state: no generation churn)
    for _ in range(3):
        pool, frame = r.render(pool, ch, cl, vp)
    np.asarray(checksum(frame.image))

    if not on_tpu:
        t0 = time.perf_counter()
        pool, frame = r.render(pool, ch, cl, vp)
        np.asarray(checksum(frame.image))
        return (time.perf_counter() - t0) * 1e3

    # slope timing: frames chain through the pool, so syncing the last
    # frame's checksum proves the whole queue ran. Median of 3 repeats:
    # single slopes through the tunnel wander +-1.5 ms run to run.
    dts = []
    for rep in range(3):
        walls = []
        for n in (4, 16):
            t0 = time.perf_counter()
            for _ in range(n):
                pool, frame = r.render(pool, ch, cl, vp)
            np.asarray(checksum(frame.image))
            walls.append(time.perf_counter() - t0)
        dts.append((walls[1] - walls[0]) / 12)
    return float(np.median(dts)) * 1e3


def bench_lod_frame_moving(cfg):
    """MOVING-camera 1920x1080 LOD frame, ms (VERDICT r4 #1: the
    reference's workload regenerates tiles while the camera moves —
    main.cpp:653 — where the static bench is a warm-cache zero-churn
    frame). Descending orbit 20 km -> 3 km, every timed frame pays
    refine + generation churn + pool scatter + raster; leaves 162-408,
    mean ~36 generated tiles/frame, 0 overflow. Sustained-mean slope over
    frames 16-32 of the orbit (median of 3 repeats)."""
    import jax
    import jax.numpy as jnp

    from planet_tpu.engine.device_step import DeviceRenderer
    from tools.bench_moving import camera_at, MOVING_RASTER_CFG

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        return None
    W, H = 1920, 1080
    r = DeviceRenderer(cfg, W, H, cap=8192, gen_cap=256, render_cap=1024,
                       raster_cfg=MOVING_RASTER_CFG)
    n_frames = 32
    alts = np.linspace(20000.0, 3000.0, 48)[:n_frames]
    cams = [camera_at(cfg, i * 1e-3, a, W, H) for i, a in enumerate(alts)]
    checksum = jax.jit(lambda img: jnp.sum(img, dtype=jnp.float32))

    dts = []
    for rep in range(3):
        walls = []
        for nq in (8, 24):
            pool = r.init_pool()
            for c in cams[:8]:
                pool, out = r.render(pool, *c)
            np.asarray(checksum(out.image))
            t0 = time.perf_counter()
            for c in cams[8:8 + nq]:
                pool, out = r.render(pool, *c)
            np.asarray(checksum(out.image))
            walls.append(time.perf_counter() - t0)
        dts.append((walls[1] - walls[0]) / 16)
    return float(np.median(dts)) * 1e3


def main():
    from planet_tpu.engine.config import EngineConfig

    cfg = EngineConfig()
    extra = {}

    rate = bench_texels(cfg)

    for name, fn in (("frame_step_2048_p50_ms", bench_frame_2048),
                     ("patches_tessellated_per_s", bench_tess),
                     ("lod_frame_1080p_ms", bench_lod_frame),
                     ("lod_frame_1080p_moving_ms", bench_lod_frame_moving)):
        try:
            val = fn(cfg)
            extra[name] = None if val is None else round(val, 2)
        except Exception as e:                   # report, never die
            extra[name] = None
            print(f"bench {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    baseline = 100 * 32 * 32 * 100.0    # reference ceiling: 10.24e6/s
    print(json.dumps({
        "metric": "ridged6_tile_texel_throughput",
        "value": round(rate, 1),
        "unit": "texels/s",
        "vs_baseline": round(rate / baseline, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
