"""Headline benchmark: production-terrain texel throughput on one TPU chip.

Measures the engine's hottest path — batched 32x32 heightmap tile
generation with the fused Pallas ridged-noise kernel at the production
octave count (6, the depth-0 terrain, reference main.cpp:823-832) — in
steady state (many queued launches, one sync, amortizing the remote-TPU
dispatch latency).

Baseline: the reference's architectural tile-generation ceiling is
100 tiles x 32x32 texels per frame at its 100 fps pacing cap
(main.cpp:653, 194, 1095) = 10.24e6 texels/s. vs_baseline is ours/theirs.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax

    from planet_tpu.engine.config import EngineConfig
    from planet_tpu.lod import refine as lod_refine
    from planet_tpu.nums import df as dfm
    from planet_tpu.engine.planet import _gen_tiles_fn

    cfg = EngineConfig()

    # a realistic quad population: leaves of a fixed camera, tiled/padded to
    # a large batch
    cam_pos = np.array([0.0, 0.0, -1.2 * cfg.radius])
    res = lod_refine.refine(cam_pos, cfg.max_lod, cfg.radius)
    corners = res.corners
    reps = -(-4096 // len(corners))
    corners = np.tile(corners, (reps, 1, 1))[:4096]     # 4096 tiles
    corners = corners * cfg.coord_scale                  # host f64 pre-scale
    ch, cl = (np.asarray(a) for a in dfm.from_f64(corners))

    octaves = 6
    on_tpu = jax.default_backend() == "tpu"
    fn = _gen_tiles_fn(octaves, cfg.tile_dim, cfg.lacunarity,
                       float(np.float32(cfg.gain)), cfg.coord_scale,
                       cfg.amplitude, use_pallas=on_tpu)
    if on_tpu:
        from planet_tpu.ops.kernels import tile_pallas
        n = corners.shape[0]
        # commit the payload to the device once — the steady-state loop
        # measures kernel throughput, not host->device link bandwidth
        rows = jax.device_put(
            tile_pallas.build_payload_host(ch, cl, n, cfg.tile_dim))
        args = (rows, n)
    else:
        args = (ch, cl)

    out = fn(*args)
    jax.block_until_ready(out)          # compile + warm

    iters = 16 if on_tpu else 2
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters

    texels = corners.shape[0] * cfg.tile_dim * cfg.tile_dim
    rate = texels / dt
    baseline = 100 * 32 * 32 * 100.0    # reference ceiling: 10.24e6 texels/s
    print(json.dumps({
        "metric": "ridged6_tile_texel_throughput",
        "value": round(rate, 1),
        "unit": "texels/s",
        "vs_baseline": round(rate / baseline, 2),
    }))


if __name__ == "__main__":
    main()
