"""Isolate tile-kernel cost: full, bilinear-only, noise-only."""
import sys, time, pathlib
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import tile_pallas as tp
from planet_tpu.ops.kernels import perlin_pallas as pk
from planet_tpu.lod import refine as lod_refine

N = 4096
LANES = 128
cam = np.array([0.0, 0.0, -1.2 * 6371000.0])
res = lod_refine.refine(cam, 18, 6371000.0)
corners = np.tile(res.corners, (-(-N // len(res.corners)), 1, 1))[:N] * 1e-5
ch, cl = (np.asarray(a) for a in dfm.from_f64(corners))

rows_per_tile = 8
TPB = 32
BR = TPB * rows_per_tile
rows_total = N * rows_per_tile


def bench(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(16)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / 16


def make(mode):
    def kernel(cref, tlo_ref, thi_ref, plo_ref, phi_ref, out_ref):
        br = out_ref.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
        wt = (r % rows_per_tile) * LANES + lane
        x = wt % 32
        y = wt // 32
        xm1 = (x - 1).astype(jnp.float32)
        ym1 = (y - 1).astype(jnp.float32)
        div = np.float64(1.0) / np.float64(29)
        dh, dl = np.float32(div), np.float32(div - np.float64(np.float32(div)))
        uh, ul = pk._df_scale(xm1, jnp.zeros_like(xm1), dh, dl)
        vh, vl = pk._df_scale(ym1, jnp.zeros_like(ym1), dh, dl)

        if mode == "noise_only":
            coords = [uh, ul, vh, vl, uh * np.float32(0.5), ul * np.float32(0.5)]
        else:
            coords = []
            for k in range(3):
                base = k * 8
                def c(j, w):
                    col = cref[:, base + 2 * j + w][:, None]
                    return jnp.broadcast_to(col, (br, LANES))
                p0h, p0l = c(0, 0), c(0, 1)
                p1h, p1l = c(1, 0), c(1, 1)
                p2h, p2l = c(2, 0), c(2, 1)
                p3h, p3l = c(3, 0), c(3, 1)
                v0h, v0l = tp._df_sub(p1h, p1l, p0h, p0l)
                v1h, v1l = tp._df_sub(p3h, p3l, p2h, p2l)
                t0h, t0l = tp._df_mul(v0h, v0l, uh, ul)
                a_h, a_l = tp._df_add(p0h, p0l, t0h, t0l)
                t1h, t1l = tp._df_mul(v1h, v1l, uh, ul)
                b_h, b_l = tp._df_add(p2h, p2l, t1h, t1l)
                dvh, dvl = tp._df_sub(b_h, b_l, a_h, a_l)
                t2h, t2l = tp._df_mul(dvh, dvl, vh, vl)
                ph, plo = tp._df_add(a_h, a_l, t2h, t2l)
                coords += [ph, plo]

        if mode == "bilinear_only":
            out_ref[:] = coords[0] + coords[2] + coords[4] + coords[1] + coords[3] + coords[5]
        else:
            value = pk.accumulate_octaves(
                "ridged", 6, 2.0, 0.55,
                tlo_ref, thi_ref, plo_ref, phi_ref, *coords)
            out_ref[:] = value * np.float32(8848.0)

    data_spec = pl.BlockSpec((BR, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    corner_spec = pl.BlockSpec((BR, 24), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((8, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        grid=(rows_total // BR,),
        in_specs=[corner_spec] + [table_spec] * 4,
        out_specs=data_spec,
    )
    per_tile = jnp.stack([jnp.asarray(ch).transpose(0, 2, 1),
                          jnp.asarray(cl).transpose(0, 2, 1)], -1).reshape(N, 24)
    rows = jnp.repeat(per_tile, rows_per_tile, axis=0)
    tabs = pk._tables_for_kernel()
    return jax.jit(lambda rows: call(rows, *tabs)), rows


for mode in ("full", "bilinear_only", "noise_only"):
    fn, rows = make(mode)
    dt = bench(fn, rows)
    print(f"{mode:14s}: {dt*1e3:8.3f} ms  {N*1024/dt/1e9:6.3f} Gtexels/s",
          flush=True)
