"""Independent-gather throughput on (8k,128) blocks (no serial chain)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR, REPS = 512, 24

def kern(idx_ref, tab_ref, out_ref):
    tab = jnp.broadcast_to(tab_ref[0:1, :], idx_ref.shape)
    idx = idx_ref[:]
    acc = jnp.zeros(idx.shape, jnp.int32)
    for k in range(REPS):   # independent addresses: vary by constant xor
        acc = acc + jnp.take_along_axis(tab, (idx ^ k) & 127, axis=1)
    out_ref[:] = acc

rows = 8192
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, 1 << 20, (rows, 128), dtype=np.int32))
tab = jnp.asarray(rng.integers(0, 256, (8, 128), dtype=np.int32))
spec = pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
tspec = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
fn = jax.jit(lambda a, t: pl.pallas_call(
    kern, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    grid=(rows // BR,), in_specs=[spec, tspec], out_specs=spec)(a, t))
np.asarray(fn(idx, tab)[0, 0])
t0 = time.perf_counter()
outs = [fn(idx, tab) for _ in range(32)]
np.asarray(outs[-1][0, 0])
dt = (time.perf_counter() - t0) / 32
n = rows * 128 * REPS
print(f"{dt*1e3:.3f} ms  {n/dt/1e9:.2f} G gathers/s  "
      f"({dt*0.94e9/(rows*128/1024*REPS):.2f} cyc/vreg-gather)")
