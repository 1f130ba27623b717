"""Microbenchmarks for 256-entry LUT strategies on TPU — picks the hash
strategy for the Pallas noise kernel. Run on the real chip:

    python tools/microbench_lut.py

Strategies:
  A. pure-XLA jnp.take end-to-end ridged noise (the perlin.py path, jitted)
  B. raw jnp.take gather throughput (isolated)
  C. pallas kernel with jnp.take on a VMEM table (does Mosaic lower it? how fast?)
  D. pallas one-hot bf16 MXU lookup
  E. pallas nibble (16x16) block-diagonal bf16 MXU lookup (8 lookups/matmul)
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from planet_tpu.ops.tables import PERLIN_TABLE
from planet_tpu.ops import perlin
from planet_tpu.nums import df as dfm
from planet_tpu.utils.timing import bench

N = 1 << 22  # 4M lookups for raw-gather benches


def report(name, sec, items, unit="lookups"):
    print(f"{name:44s} {sec*1e3:9.3f} ms   {items/sec/1e9:8.3f} G{unit}/s")


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    table_i32 = jnp.asarray(PERLIN_TABLE, jnp.int32)
    idx = jnp.asarray(rng.integers(0, 256, N, dtype=np.int32))

    # --- A: end-to-end ridged noise via perlin.py (jnp.take), 6 octaves
    side = 1024
    pts = rng.uniform(-60, 60, (side * side, 3))
    x, y, z = (dfm.from_f64(pts[:, i]) for i in range(3))
    f = jax.jit(lambda x, y, z: perlin.ridged_df(x, y, z, 2.0, np.float32(0.55), 6))
    sec = bench(f, x, y, z)
    report("A: ridged_df 6-oct XLA take (texels)", sec, side * side, "texels")

    # --- B: raw chained gather (the 3-lookup hash chain, isolated)
    @jax.jit
    def chain(idx):
        r1 = jnp.take(table_i32, idx & 255)
        r2 = jnp.take(table_i32, (r1 + idx) & 255)
        r3 = jnp.take(table_i32, (r2 + idx) & 255)
        return r3
    sec = bench(chain, idx)
    report("B: XLA 3-chained take (chains)", sec, N, "chains")

    # --- C: pallas 2D gather: take(table, idx2d) with 2D operands
    try:
        R = N // 256
        idx2 = idx.reshape(R, 256)

        def take2d_kernel(idx_ref, table_ref, out_ref):
            out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

        BR = 512
        @jax.jit
        def pallas_take2d(idx2):
            return pl.pallas_call(
                take2d_kernel,
                out_shape=jax.ShapeDtypeStruct((R, 256), jnp.int32),
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((BR, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((256,), lambda i: (0,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(idx2, table_i32)
        r = pallas_take2d(idx2)
        ok = bool(jnp.all(r.reshape(-1) == jnp.take(table_i32, idx)))
        sec = bench(pallas_take2d, idx2)
        report(f"C: pallas take(table, idx2d) (correct={ok})", sec, N)
    except Exception as e:
        print("C: pallas take2d FAILED:", str(e)[:300])

    # --- C2: pallas take_along_axis 2D form (lanes-minor)
    try:
        R = N // 256  # rows
        idx2 = idx.reshape(R, 256)
        table2 = jnp.broadcast_to(table_i32[None, :], (8, 256))

        def tala_kernel(idx_ref, table_ref, out_ref):
            tab = jnp.broadcast_to(table_ref[0:1, :], idx_ref.shape)
            out_ref[:] = jnp.take_along_axis(tab, idx_ref[:], axis=1)

        BR = 512
        @jax.jit
        def pallas_tala(idx2):
            return pl.pallas_call(
                tala_kernel,
                out_shape=jax.ShapeDtypeStruct((R, 256), jnp.int32),
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((BR, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 256), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 256), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(idx2, table2)
        r = pallas_tala(idx2)
        ok = bool(jnp.all(r.reshape(-1) == jnp.take(table_i32, idx)))
        sec = bench(pallas_tala, idx2)
        report(f"C2: pallas take_along_axis lanes (correct={ok})", sec, N)
    except Exception as e:
        print("C2: pallas take_along_axis FAILED:", str(e)[:300])

    # --- D: one-hot bf16 MXU in pallas: (BLK,256)@(256,128)
    try:
        tab_col = jnp.asarray(PERLIN_TABLE, jnp.bfloat16).reshape(256, 1)
        tab_mat = jnp.broadcast_to(tab_col, (256, 128))  # replicated columns

        def onehot_kernel(idx_ref, tab_ref, out_ref):
            idx = idx_ref[:]                       # (BLK,)  int32
            iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], 256), 1)
            oh = (iota == idx[:, None]).astype(jnp.bfloat16)
            prod = jnp.dot(oh, tab_ref[:], preferred_element_type=jnp.float32)
            out_ref[:] = prod[:, :1].astype(jnp.int32)

        BLK = 1 << 13
        @jax.jit
        def pallas_onehot(idx):
            return pl.pallas_call(
                onehot_kernel,
                out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((256, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(idx, tab_mat)
        r = pallas_onehot(idx)
        ok = bool(jnp.all(r[:, 0] == jnp.take(table_i32, idx)))
        sec = bench(pallas_onehot, idx)
        report(f"D: pallas one-hot bf16 MXU (correct={ok})", sec, N)
    except Exception as e:
        print("D: pallas one-hot FAILED:", str(e)[:300])

    # --- E: nibble block-diag: 8 lookups share one (R,128)@(128,128) matmul
    try:
        # M[a, b] = table[16a + b]; block-diag 8 copies -> (128, 128)
        M = np.asarray(PERLIN_TABLE, np.float32).reshape(16, 16)
        BD = np.zeros((128, 128), np.float32)
        for k in range(8):
            BD[16*k:16*k+16, 16*k:16*k+16] = M
        BD = jnp.asarray(BD, jnp.bfloat16)

        R = N // 8  # 8 lookups per row

        def nib_kernel(idx_ref, bd_ref, out_ref):
            idx = idx_ref[:]                                   # (BR, 8) int32
            hi = idx >> 4                                      # 0..15
            lo = idx & 15
            lane = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], 128), 1)
            blk = lane >> 4                                    # which lookup
            sub = lane & 15
            hi_l = jnp.take_along_axis(hi, blk, axis=1)        # (BR,128) replicate per block
            lo_l = jnp.take_along_axis(lo, blk, axis=1)
            oh = (sub == hi_l).astype(jnp.bfloat16)            # one-hot16 per block
            rows = jnp.dot(oh, bd_ref[:], preferred_element_type=jnp.float32)
            sel = (sub == lo_l).astype(jnp.float32)
            picked = rows * sel                                # (BR, 128)
            segs = picked.reshape(idx.shape[0], 8, 16).sum(-1) # (BR, 8)
            out_ref[:] = segs.astype(jnp.int32)

        BR = 1024
        @jax.jit
        def pallas_nib(idx):
            idx8 = idx.reshape(R, 8)
            return pl.pallas_call(
                nib_kernel,
                out_shape=jax.ShapeDtypeStruct((R, 8), jnp.int32),
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((BR, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((128, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            )(idx8, BD)
        r = pallas_nib(idx)
        ok = bool(jnp.all(r.reshape(-1) == jnp.take(table_i32, idx)))
        sec = bench(pallas_nib, idx)
        report(f"E: pallas nibble blockdiag MXU (correct={ok})", sec, N)
    except Exception as e:
        print("E: pallas nibble FAILED:", str(e)[:300])


if __name__ == "__main__":
    main()
