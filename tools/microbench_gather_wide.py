"""Does the per-lane table gather survive (rows, 2048) blocks?

The fused frame kernel wants to emit heights in native (6, n, n) layout,
which means noise blocks whose lane dimension is n (2048), not 128. The
packed-pair-table gather must then index a (8, 2048) table whose 128-lane
pattern repeats 16x, with indices offset into each lane group.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BR = 256          # block rows
W = 2048
REPS = 20         # gathers per kernel


def kern_narrow(idx_ref, tab_ref, out_ref):
    tab = jnp.broadcast_to(tab_ref[0:1, :], idx_ref.shape)
    acc = jnp.zeros(idx_ref.shape, jnp.int32)
    idx = idx_ref[:]
    for _ in range(REPS):
        g = jnp.take_along_axis(tab, idx & 127, axis=1)
        acc = acc + g
        idx = idx + g
    out_ref[:] = acc


def kern_wide(idx_ref, tab_ref, out_ref):
    tab = jnp.broadcast_to(tab_ref[0:1, :], idx_ref.shape)
    base = jax.lax.broadcasted_iota(jnp.int32, idx_ref.shape, 1) & ~127
    acc = jnp.zeros(idx_ref.shape, jnp.int32)
    idx = idx_ref[:]
    for _ in range(REPS):
        g = jnp.take_along_axis(tab, (idx & 127) + base, axis=1)
        acc = acc + g
        idx = idx + g
    out_ref[:] = acc


def run(name, kern, rows, width, tab_w):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 1 << 20, (rows, width), dtype=np.int32))
    tab = jnp.asarray(
        np.tile(rng.integers(0, 256, (1, 128), dtype=np.int32),
                (8, tab_w // 128)))
    spec = pl.BlockSpec((BR, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((8, tab_w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    fn = jax.jit(lambda a, t: pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((rows, width), jnp.int32),
        grid=(rows // BR,), in_specs=[spec, tspec], out_specs=spec)(a, t))
    out = fn(idx, tab)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    outs = [fn(idx, tab) for _ in range(16)]
    np.asarray(outs[-1][0, 0])
    dt = (time.perf_counter() - t0) / 16
    n = rows * width * REPS
    print(f"{name:10s} {dt*1e3:8.3f} ms  {n/dt/1e9:8.2f} G gathers/s",
          flush=True)


run("narrow128", kern_narrow, 4096 * 16, 128, 128)
run("wide2048", kern_wide, 4096, 2048, 2048)
