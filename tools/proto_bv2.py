"""BV kernel variant matrix: isolate addressing-extract / reshape / RMW
costs and batch-size effects. Builds on tools/proto_bv.py."""
import sys, functools, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from planet_tpu.raster import coverage as cov
from planet_tpu.raster.splat import _DEPTH_BITS, _EMPTY, _SHADE_BITS
from tools.proto_bv import make_live_records, trace_time, WPAD, HPAD

_F32, _I32 = jnp.float32, jnp.int32


def bv_kernel(winh, R, addr_mode, rec_ref, addr_ref, blive_ref,
              fb_in_ref, fb_ref, noin=False):
    @pl.when(pl.program_id(0) == 0)
    def _seed():
        fb_ref[:, :] = fb_in_ref[:, :]

    L = winh * 128
    f = _F32
    lane = jax.lax.broadcasted_iota(_I32, (R, L), 1)
    rowf = (lane // 128).astype(f)
    colf = (lane % 128).astype(f)

    def col(j):
        return rec_ref[:, j:j + 1]

    def _block():
        px0r, px1r = col(24), col(25)
        py0r, py1r = col(26), col(27)
        ry = rowf - py0r
        rx = colf - px0r

        def edge(j, bj):
            e = (col(j) * ry - col(j + 1) * rx) + col(j + 2)
            return e, e > col(bj)

        e0, a0 = edge(0, 29)
        e1, a1 = edge(3, 30)
        e2, a2 = edge(6, 31)
        inside = a0 & a1 & a2
        z = (e0 * col(9) + e1 * col(10)) + e2 * col(11)
        nx = (e0 * col(15) + e1 * col(18)) + e2 * col(21)
        ny = (e0 * col(16) + e1 * col(19)) + e2 * col(22)
        nz = (e0 * col(17) + e1 * col(20)) + e2 * col(23)
        nlen = jnp.sqrt((nx * nx + ny * ny) + nz * nz)
        ndl = (ny * f(cov._LIGHT[1])
               + nz * f(cov._LIGHT[2])) / jnp.where(nlen > f(0.0), nlen,
                                                    f(1.0))
        shade = jnp.sqrt(f(0.001) + jnp.maximum(f(0.0), ndl))
        if noin:
            ok = inside & (z >= f(-1.0))
        else:
            in_box = ((colf >= px0r) & (colf <= px1r)
                      & (rowf >= py0r) & (rowf <= py1r))
            ok = inside & in_box & (z >= f(-1.0))
        zq = jnp.minimum((z * f(0.5) + f(0.5)) * f(2**_DEPTH_BITS - 1),
                         f(2**_DEPTH_BITS - 2)).astype(_I32)
        sq = jnp.minimum(shade * f(2**_SHADE_BITS - 1),
                         f(2**_SHADE_BITS - 1)).astype(_I32)
        packed = jnp.where(ok, (zq << _SHADE_BITS) | sq, _EMPTY)
        pw = packed.reshape(R * winh, 128)
        for k in range(R):
            if addr_mode == "static":
                py0c = (k * winh) % (HPAD - winh)
                px0a = 128 * (k % 15)
            elif addr_mode == "smem":
                py0c = addr_ref[k, 0] * 8
                px0a = addr_ref[k, 1] * 128
            else:  # vmem extract
                py0c = rec_ref[k, 12].astype(_I32) * 8
                px0a = rec_ref[k, 13].astype(_I32) * 128
            old = fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)]
            fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)] = \
                jnp.minimum(old, pw[k * winh:(k + 1) * winh, :])

    pl.when(blive_ref[pl.program_id(0)] > 0)(_block)


@functools.partial(jax.jit, static_argnames=("winh", "cap", "R",
                                              "addr_mode", "noin"))
def run_bv(records, addr, blive, fb, *, winh, cap, R, addr_mode,
           noin=False):
    kernel = functools.partial(bv_kernel, winh, R, addr_mode, noin=noin)
    return pl.pallas_call(
        kernel, grid=(cap // R,),
        in_specs=[
            pl.BlockSpec((R, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((HPAD, WPAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HPAD, WPAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HPAD, WPAD), jnp.int32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(records, addr, blive, fb)


if __name__ == "__main__":
    K = 32768
    for winh in (8, 16):
        mr = make_live_records(K, winh)
        recs = jnp.asarray(mr)
        addr = jnp.asarray(mr[:, 12:14].astype(np.int32))
        fb = jnp.full((HPAD, WPAD), _EMPTY, jnp.int32)
        for R in (32,):
            blive = jnp.full((K // R,), R, jnp.int32)
            o1 = run_bv(recs, addr, blive, fb, winh=winh, cap=K, R=R,
                        addr_mode="smem", noin=False)
            o2 = run_bv(recs, addr, blive, fb, winh=winh, cap=K, R=R,
                        addr_mode="smem", noin=True)
            print(f"winh{winh} crop-equal with noin:",
                  bool(jnp.all(o1[:1080] == o2[:1080])),
                  " pad rows touched:", int(jnp.sum(o2[1080:] != o1[1080:])),
                  flush=True)
            trace_time(
                f"winh{winh:2d} R{R:2d} smem noin",
                lambda r, a, b, f2, _winh=winh, _R=R:
                    run_bv(r, a, b, f2, winh=_winh, cap=K, R=_R,
                           addr_mode="smem", noin=True),
                recs, addr, blive, fb)
