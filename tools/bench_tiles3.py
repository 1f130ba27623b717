"""Clean comparison: generate_tiles (payload built in-jit) vs prebuilt rows,
vs no-reshape output, to find the composition overhead."""
import sys, time, pathlib
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import tile_pallas as tp
from planet_tpu.ops.kernels import perlin_pallas as pk
from planet_tpu.lod import refine as lod_refine

N = 4096
TPB = 32
cam = np.array([0.0, 0.0, -1.2 * 6371000.0])
res = lod_refine.refine(cam, 18, 6371000.0)
corners = np.tile(res.corners, (-(-N // len(res.corners)), 1, 1))[:N] * 1e-5
ch, cl = (np.asarray(a) for a in dfm.from_f64(corners))


def bench(fn, *args, iters=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


# (a) public API
fa = jax.jit(lambda a, b: tp.generate_tiles(
    a, b, octaves=6, gain=np.float32(0.55), tiles_per_block=TPB,
    interpret=False))
ta = bench(fa, ch, cl)
print(f"a) generate_tiles:        {ta*1e3:8.3f} ms  {N*1024/ta/1e9:6.3f} G/s", flush=True)

# (b) prebuilt rows, raw call, no output reshape
rows_np = np.repeat(
    np.stack([ch.transpose(0, 2, 1), cl.transpose(0, 2, 1)], -1).reshape(N, 24),
    8, axis=0)
rows = jnp.asarray(rows_np)
call = tp._build_tile_call("ridged", 6, 2.0, float(np.float32(0.55)),
                           8848.0, 32, N, TPB, False)
tabs = pk._tables_for_kernel()
fb = jax.jit(lambda r: call(r, *tabs))
tb = bench(fb, rows)
print(f"b) raw call prebuilt:     {tb*1e3:8.3f} ms  {N*1024/tb/1e9:6.3f} G/s", flush=True)

# (c) prebuilt rows + reshape to tiles
fc = jax.jit(lambda r: call(r, *tabs).reshape(N, 32, 32))
tc = bench(fc, rows)
print(f"c) raw + reshape:         {tc*1e3:8.3f} ms  {N*1024/tc/1e9:6.3f} G/s", flush=True)

ok = bool(jnp.allclose(fa(ch, cl), fc(rows), atol=1e-3))
print("a == c:", ok, flush=True)
