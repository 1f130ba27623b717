"""Pinpoint the span-kernel per-record overhead (measured ~113 ns/rec for
1-vreg span-1 records): vary TRI_BLOCK, strip the body down, and isolate
scalar reads vs dynamic-slice RMW vs grid/DMA overhead."""
import sys, time, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from planet_tpu.raster import coverage_pallas as cp
from tools.microbench_span import make_records, WPAD, HPAD

_F32, _I32 = jnp.float32, jnp.int32


def kernel(winh, tri_block, body, rec_ref, fb_in_ref, fb_ref):
    @pl.when(pl.program_id(0) == 0)
    def _seed():
        fb_ref[:, :] = fb_in_ref[:, :]

    any_live = rec_ref[0, 28] > 0.5
    for t in range(1, tri_block):
        any_live = any_live | (rec_ref[t, 28] > 0.5)

    rowf = jax.lax.broadcasted_iota(_I32, (winh, 128), 0).astype(_F32)
    colf = jax.lax.broadcasted_iota(_I32, (winh, 128), 1).astype(_F32)

    def _block():
        for t in range(tri_block):
            if body == "empty":
                continue
            py0c = rec_ref[t, 12].astype(_I32) * 8
            px0a = rec_ref[t, 13].astype(_I32) * 128
            if body == "rmw_only":
                old = fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)]
                fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)] = \
                    jnp.minimum(old, jnp.int32(7))
                continue
            if body == "static_rmw":
                py0c, px0a = 0, 0
            # full fragment math (mirrors _one_triangle, no n_extra branch)
            px0r = rec_ref[t, 24]; px1r = rec_ref[t, 25]
            py0r = rec_ref[t, 26]; py1r = rec_ref[t, 27]
            ec0 = (rec_ref[t, 0], rec_ref[t, 1], rec_ref[t, 2], rec_ref[t, 29])
            ec1 = (rec_ref[t, 3], rec_ref[t, 4], rec_ref[t, 5], rec_ref[t, 30])
            ec2 = (rec_ref[t, 6], rec_ref[t, 7], rec_ref[t, 8], rec_ref[t, 31])
            cz0, cz1, cz2 = rec_ref[t, 9], rec_ref[t, 10], rec_ref[t, 11]
            cn = [rec_ref[t, 15 + i] for i in range(9)]
            ry = rowf - py0r
            rowok = (rowf >= py0r) & (rowf <= py1r)
            rx = colf - px0r
            def edge(DX, DY, c, bias):
                e = (DX * ry - DY * rx) + c
                return e, e > bias
            e0, a0 = edge(*ec0); e1, a1 = edge(*ec1); e2, a2 = edge(*ec2)
            inside = a0 & a1 & a2
            z = (e0 * cz0 + e1 * cz1) + e2 * cz2
            nx = (e0 * cn[0] + e1 * cn[3]) + e2 * cn[6]
            ny = (e0 * cn[1] + e1 * cn[4]) + e2 * cn[7]
            nz = (e0 * cn[2] + e1 * cn[5]) + e2 * cn[8]
            nlen = jnp.sqrt((nx * nx + ny * ny) + nz * nz)
            ndl = (ny * _F32(-0.707) + nz * _F32(0.707)) / \
                jnp.where(nlen > 0, nlen, _F32(1.0))
            shade = jnp.sqrt(_F32(0.001) + jnp.maximum(_F32(0.0), ndl))
            in_box = (colf >= px0r) & (colf <= px1r) & rowok
            ok = inside & in_box & (z >= _F32(-1.0))
            zq = jnp.minimum((z * 0.5 + 0.5) * _F32(2**21 - 1),
                             _F32(2**21 - 2)).astype(_I32)
            sq = jnp.minimum(shade * _F32(1023), _F32(1023)).astype(_I32)
            packed = jnp.where(ok, (zq << 10) | sq, jnp.int32(-1))
            old = fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)]
            fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)] = \
                jnp.minimum(old, packed)

    pl.when(any_live)(_block)


@functools.partial(jax.jit, static_argnames=("winh", "cap", "tri_block",
                                              "body"))
def run(records, fb, *, winh, cap, tri_block, body):
    k = functools.partial(kernel, winh, tri_block, body)
    return pl.pallas_call(
        k, grid=(cap // tri_block,),
        in_specs=[pl.BlockSpec((tri_block, 32), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((HPAD, WPAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((HPAD, WPAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HPAD, WPAD), jnp.int32),
        input_output_aliases={1: 0},
    )(records, fb)


def bench(tag, winh, k, tri_block, body):
    cap = -(-k // tri_block) * tri_block
    recs = make_records(cap, winh)
    fb = jnp.full((HPAD, WPAD), -1, jnp.int32)
    o = run(recs, fb, winh=winh, cap=cap, tri_block=tri_block, body=body)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        o = run(recs, o, winh=winh, cap=cap, tri_block=tri_block, body=body)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / N
    print(f"{tag:44s} {dt * 1e3:7.3f} ms  {dt * 1e9 / cap:7.1f} ns/rec",
          flush=True)


if __name__ == "__main__":
    K = 32768
    for tb in (8, 16, 32, 64):
        bench(f"span1 full body        TRI_BLOCK={tb:3d}", 8, K, tb, "full")
    for tb in (16, 64):
        bench(f"span1 empty body       TRI_BLOCK={tb:3d}", 8, K, tb, "empty")
        bench(f"span1 rmw only         TRI_BLOCK={tb:3d}", 8, K, tb,
              "rmw_only")
        bench(f"span1 static-loc full  TRI_BLOCK={tb:3d}", 8, K, tb,
              "static_rmw")
    bench("span2 full body        TRI_BLOCK= 16", 16, K, 16, "full")
    bench("span2 full body        TRI_BLOCK= 32", 16, K, 32, "full")
