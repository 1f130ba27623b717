"""Slope-timed fused field kernel (6 x n^2 frame step) on TPU."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp
from planet_tpu.ops.kernels import field_pallas

n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
br = int(sys.argv[2]) if len(sys.argv) > 2 else 256
radius = 6.371e6

def frame(tick):
    h, s = field_pallas.field_cube(n, radius, block_rows=br)
    return jnp.sum(h, dtype=jnp.float32) + jnp.sum(s, dtype=jnp.float32) + tick * 0

fn = jax.jit(frame)
np.asarray(fn(jnp.float32(0)))
walls = []
for q in (4, 16):
    t0 = time.perf_counter()
    outs = [fn(jnp.float32(i)) for i in range(q)]
    np.asarray(outs[-1])
    walls.append(time.perf_counter() - t0)
dt = (walls[1] - walls[0]) / 12
tex = 6 * n * n
print(f"n={n} br={br}: {dt*1e3:.2f} ms/frame, {tex/dt/1e9:.3f} Gtexels/s")
