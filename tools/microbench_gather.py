"""Focused micro-tests: is a lane-wise dynamic gather available in Pallas on
this chip, and how fast? Tests:

  G1. take_along_axis along lanes, 128-entry table (one vreg of lanes)
  G2. 256-entry table via two 128-lane gathers + select on bit 7
  G3. 256-entry table as (2,128) sublane+lane gather via take_along_axis on a
      (B,256) broadcast (what C2 tried, smaller)
  R1. pltpu.repeat along lanes (needed for block-index broadcast)
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.utils.timing import bench

N = 1 << 22


def report(name, sec, items):
    print(f"{name:52s} {sec*1e3:9.3f} ms {items/sec/1e9:8.3f} Glookups/s")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    tab128 = jnp.asarray(rng.integers(0, 256, 128, dtype=np.int32))
    tab256 = jnp.asarray(rng.integers(0, 256, 256, dtype=np.int32))
    idx128 = jnp.asarray(rng.integers(0, 128, N, dtype=np.int32))
    idx256 = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))

    R = N // 128

    # --- G1: 128-entry lanes gather
    try:
        def g1_kernel(idx_ref, tab_ref, out_ref):
            idx = idx_ref[:]
            tab = jnp.broadcast_to(tab_ref[0:1, :], idx.shape)
            out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)

        BR = 1024
        @jax.jit
        def g1(idx):
            idx2 = idx.reshape(R, 128)
            return pl.pallas_call(
                g1_kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(idx2, jnp.broadcast_to(tab128[None, :], (8, 128)))
        r = g1(idx128)
        ok = bool(jnp.all(r.reshape(-1) == jnp.take(tab128, idx128)))
        sec = bench(g1, idx128)
        report(f"G1: lanes gather 128 (correct={ok})", sec, N)
    except Exception as e:
        print("G1 FAILED:", str(e)[:400])

    # --- G2: 256-entry via two 128 gathers + select
    try:
        def g2_kernel(idx_ref, tlo_ref, thi_ref, out_ref):
            idx = idx_ref[:]
            low = idx & 127
            tlo = jnp.broadcast_to(tlo_ref[0:1, :], idx.shape)
            thi = jnp.broadcast_to(thi_ref[0:1, :], idx.shape)
            a = jnp.take_along_axis(tlo, low, axis=1)
            b = jnp.take_along_axis(thi, low, axis=1)
            out_ref[:] = jnp.where(idx >= 128, b, a)

        BR = 1024
        tlo = jnp.broadcast_to(tab256[None, :128], (8, 128))
        thi = jnp.broadcast_to(tab256[None, 128:], (8, 128))
        @jax.jit
        def g2(idx):
            idx2 = idx.reshape(R, 128)
            return pl.pallas_call(
                g2_kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(idx2, tlo, thi)
        r = g2(idx256)
        ok = bool(jnp.all(r.reshape(-1) == jnp.take(tab256, idx256)))
        sec = bench(g2, idx256)
        report(f"G2: 256 via 2x128 gather+sel (correct={ok})", sec, N)
    except Exception as e:
        print("G2 FAILED:", str(e)[:400])

    # --- G2f: same but f32 table values (what the kernel actually needs)
    try:
        tab256f = tab256.astype(jnp.float32)

        def g2f_kernel(idx_ref, tlo_ref, thi_ref, out_ref):
            idx = idx_ref[:]
            low = idx & 127
            tlo = jnp.broadcast_to(tlo_ref[0:1, :], idx.shape)
            thi = jnp.broadcast_to(thi_ref[0:1, :], idx.shape)
            a = jnp.take_along_axis(tlo, low, axis=1)
            b = jnp.take_along_axis(thi, low, axis=1)
            out_ref[:] = jnp.where(idx >= 128, b, a)

        BR = 1024
        tlof = jnp.broadcast_to(tab256f[None, :128], (8, 128))
        thif = jnp.broadcast_to(tab256f[None, 128:], (8, 128))
        @jax.jit
        def g2f(idx):
            idx2 = idx.reshape(R, 128)
            return pl.pallas_call(
                g2f_kernel,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(idx2, tlof, thif)
        r = g2f(idx256)
        ok = bool(jnp.all(r.reshape(-1) == jnp.take(tab256f, idx256)))
        sec = bench(g2f, idx256)
        report(f"G2f: f32 256 gather+sel (correct={ok})", sec, N)
    except Exception as e:
        print("G2f FAILED:", str(e)[:400])

    # --- R1: pltpu.repeat along lanes
    try:
        def r1_kernel(x_ref, out_ref):
            out_ref[:] = pltpu.repeat(x_ref[:], 16, axis=1)

        @jax.jit
        def r1(x):
            return pl.pallas_call(
                r1_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)
        x = jnp.arange(64, dtype=jnp.int32).reshape(8, 8)
        r = r1(x)
        want = jnp.repeat(x, 16, axis=1)
        print("R1: pltpu.repeat lanes works, correct =", bool(jnp.all(r == want)))
    except Exception as e:
        print("R1 FAILED:", str(e)[:400])


if __name__ == "__main__":
    main()
