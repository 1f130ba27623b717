"""Scaling probe: does in-kernel gather cost scale with gather count, or is
the 28ms a fixed overhead? Also probes pure-VPU arithmetic throughput in the
same harness for calibration."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.utils.timing import bench

N = 1 << 22
R = N // 128


def run(name, kernel, idx2, tabs, out_dtype=jnp.int32, BR=1024):
    @jax.jit
    def f(idx2):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), out_dtype),
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)] * len(tabs),
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(idx2, *tabs)
    r = f(idx2)
    sec = bench(f, idx2)
    print(f"{name:56s} {sec*1e3:9.3f} ms")
    return r, sec


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    tab = jnp.broadcast_to(
        jnp.asarray(rng.integers(0, 128, 128, dtype=np.int32))[None, :], (8, 128))
    idx2 = jnp.asarray(rng.integers(0, 128, (R, 128), dtype=np.int32))

    def mk_chain(k):
        def kernel(idx_ref, tab_ref, out_ref):
            idx = idx_ref[:]
            t = jnp.broadcast_to(tab_ref[0:1, :], idx.shape)
            for _ in range(k):
                idx = jnp.take_along_axis(t, idx, axis=1)
            out_ref[:] = idx
        return kernel

    for k in (1, 4, 16):
        run(f"chain x{k} lanes-gather", mk_chain(k), idx2, [tab])

    # pure VPU arithmetic: 64 fma-ish int ops
    def arith_kernel(idx_ref, tab_ref, out_ref):
        x = idx_ref[:]
        for _ in range(64):
            x = (x * 3 + 1) & 127
        out_ref[:] = x
    run("arith x64 int ops (calibration)", arith_kernel, idx2, [tab])

    # copy only
    def copy_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = idx_ref[:]
    run("copy only", copy_kernel, idx2, [tab])

    # bigger blocks
    def one(idx_ref, tab_ref, out_ref):
        t = jnp.broadcast_to(tab_ref[0:1, :], idx_ref.shape)
        out_ref[:] = jnp.take_along_axis(t, idx_ref[:], axis=1)
    run("gather x1, BR=4096", one, idx2, [tab], BR=4096)
    run("gather x1, BR=128", one, idx2, [tab], BR=128)


if __name__ == "__main__":
    main()
