"""Dedupe-proof span-kernel cost attribution (round 5).

microbench_span{,2}.py chained o = run(recs, o): once the min-merge hits
its fixpoint every dispatch carries identical content and the axon tunnel
dedupes them (verify skill: "repeated identical dispatches can
dedupe/cache"), reporting absurd ~1 ns/rec. This bench makes every
dispatch unique (each call gets a framebuffer with a distinct tag pixel)
and slope-times over cap so the per-record marginal cost falls out and
fixed prep cancels.

Variants isolate where the measured ~100 ns/record goes:
  full        exact _one_triangle body (scalar reads + math + RMW)
  noshade     drop normal interp + nlen/ndl/shade (28 vec ops, 12 reads)
  fewscalar   full vector math, but only 8 scalar reads (rest reused)
  rmw_only    dynamic-window load/min/store only
  empty       per-record nothing (grid + SMEM block DMA + skip test)
"""
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
from planet_tpu.raster.splat import _EMPTY
from tools.microbench_span import make_records, WPAD, HPAD

_F32, _I32 = jnp.float32, jnp.int32


def kernel(winh, tri_block, body, rec_ref, fb_in_ref, fb_ref):
    @pl.when(pl.program_id(0) == 0)
    def _seed():
        fb_ref[:, :] = fb_in_ref[:, :]

    any_live = rec_ref[0, 28] < -0.5
    for t in range(1, tri_block):
        any_live = any_live | (rec_ref[t, 28] < -0.5)

    rowf = jax.lax.broadcasted_iota(_I32, (winh, 128), 0).astype(_F32)
    colf = jax.lax.broadcasted_iota(_I32, (winh, 128), 1).astype(_F32)

    def _one(t):
        py0c = rec_ref[t, 12].astype(_I32) * 8
        px0a = rec_ref[t, 13].astype(_I32) * 128
        if body == "rmw_only":
            old = fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)]
            fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)] = \
                jnp.minimum(old, jnp.int32(7))
            return
        px0r = rec_ref[t, 24]; px1r = rec_ref[t, 25]
        py0r = rec_ref[t, 26]; py1r = rec_ref[t, 27]
        if body == "fewscalar":
            ec0 = (rec_ref[t, 0], rec_ref[t, 1], rec_ref[t, 2],
                   rec_ref[t, 29])
            ec1 = ec0
            ec2 = ec0
            cz0 = cz1 = cz2 = rec_ref[t, 9]
            cn = [rec_ref[t, 15]] * 9
        else:
            ec0 = (rec_ref[t, 0], rec_ref[t, 1], rec_ref[t, 2],
                   rec_ref[t, 29])
            ec1 = (rec_ref[t, 3], rec_ref[t, 4], rec_ref[t, 5],
                   rec_ref[t, 30])
            ec2 = (rec_ref[t, 6], rec_ref[t, 7], rec_ref[t, 8],
                   rec_ref[t, 31])
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
        if body == "noshade":
            shade = z
        else:
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
        packed = jnp.where(ok, (zq << 10) | sq, jnp.int32(_EMPTY))
        old = fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)]
        fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)] = \
            jnp.minimum(old, packed)

    def _block():
        if body == "empty":
            return
        for t in range(tri_block):
            _one(t)

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


BASE_FB = None


def fresh_fbs(n):
    """n framebuffers with distinct content (tag row) — dedupe-proof."""
    global BASE_FB
    if BASE_FB is None:
        BASE_FB = jnp.full((HPAD, WPAD), _EMPTY, jnp.int32)
    out = [BASE_FB.at[0, 0].set(i) for i in range(n)]
    jax.block_until_ready(out)
    return out


def timed(recs, *, winh, cap, tri_block, body, n=24):
    fbs = fresh_fbs(n + 4)
    for i in range(4):                      # warm
        o = run(recs, fbs[n + i], winh=winh, cap=cap,
                tri_block=tri_block, body=body)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [run(recs, fbs[i], winh=winh, cap=cap, tri_block=tri_block,
                body=body) for i in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def bench(tag, winh, body, tri_block=16, k_small=4096, k_big=32768,
          bw=14, reps=3):
    recs_s = make_records(k_small, winh, bw=bw)
    recs_b = make_records(k_big, winh, bw=bw)
    slopes = []
    for _ in range(reps):
        ts = timed(recs_s, winh=winh, cap=k_small, tri_block=tri_block,
                   body=body)
        tb = timed(recs_b, winh=winh, cap=k_big, tri_block=tri_block,
                   body=body)
        slopes.append((tb - ts) / (k_big - k_small))
    ns = float(np.median(slopes)) * 1e9
    print(f"{tag:44s} {ns:7.1f} ns/rec", flush=True)
    return ns


if __name__ == "__main__":
    for body in ("full", "noshade", "fewscalar", "rmw_only", "empty"):
        bench(f"span1 {body:10s} TRI_BLOCK=16", 8, body)
    for tb in (8, 32, 64):
        bench(f"span1 full       TRI_BLOCK={tb}", 8, "full", tri_block=tb)
    bench("span2 full       TRI_BLOCK=16", 16, "full")
    bench("span2 noshade    TRI_BLOCK=16", 16, "noshade")
    bench("span3 full       TRI_BLOCK=16", 24, "full")
