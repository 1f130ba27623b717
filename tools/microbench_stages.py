"""Per-stage cost attribution for the packed-pair noise kernel on the chip.

Builds variant kernels that run only a subset of the per-octave work
(splits / gathers / decode+dot / lerp+fade) and measures each, so op-budget
decisions are grounded in measured cycles, not estimates."""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import perlin_pallas as K

N = 1 << 22
ROWS = N // 128
BLOCK = 256
OCT = 6


def run(name, body):
    """body(refs...) -> (block,128) f32"""
    def kernel(xh, xl, yh, yl, zh, zl, ct, pt, out):
        out[:] = body(xh[:], xl[:], yh[:], yl[:], zh[:], zl[:], ct, pt)
    spec = pl.BlockSpec((BLOCK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
                          grid=(ROWS // BLOCK,), in_specs=[spec]*6 + [tspec]*2, out_specs=spec)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-60, 60, (3, ROWS, 128))
    args = []
    for i in range(3):
        d = dfm.from_f64(pts[i])
        args += [jnp.asarray(d.hi), jnp.asarray(d.lo)]
    ct, pt = K._tables_for_kernel()
    f = jax.jit(lambda *a: call(*a))
    out = f(*args, ct, pt); jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(*args, ct, pt) for _ in range(24)]
    jax.block_until_ready(outs)
    sec = (time.perf_counter() - t0) / 24
    print(f"{name:28s} {sec*1e3:8.3f} ms  {N/sec/1e9:7.3f} Gtexel/s")
    return sec


def splits_only(xh, xl, yh, yl, zh, zl, ct, pt):
    splits = (K._floor_split_df(xh, xl), K._floor_split_df(yh, yl), K._floor_split_df(zh, zl))
    acc = jnp.zeros_like(xh)
    for i in range(OCT):
        if i: splits = tuple(K._double_mod1(*s) for s in splits)
        (cx, fx, flx), (cy, fy, fly), (cz, fz, flz) = splits
        acc += fx + K._fm1(fx, flx) + fy + K._fm1(fy, fly) + fz + K._fm1(fz, flz) + (cx + cy + cz).astype(jnp.float32)
    return acc


def gathers_only(xh, xl, yh, yl, zh, zl, ct, pt):
    splits = (K._floor_split_df(xh, xl), K._floor_split_df(yh, yl), K._floor_split_df(zh, zl))
    acc = jnp.zeros_like(xh)
    for i in range(OCT):
        if i: splits = tuple(K._double_mod1(*s) for s in splits)
        (cx, fx, flx), (cy, fy, fly), (cz, fz, flz) = splits
        pa = K._lookup_pair(ct, cx)
        a0 = pa & 255; a1 = pa >> 8
        pb0 = K._lookup_pair(ct, a0 + cy)
        pb1 = K._lookup_pair(ct, a1 + cy)
        s0 = K._lookup_pair(pt, (pb0 & 255) + cz)
        s1 = K._lookup_pair(pt, ((pb0 >> 8) & 255) + cz)
        s2 = K._lookup_pair(pt, (pb1 & 255) + cz)
        s3 = K._lookup_pair(pt, ((pb1 >> 8) & 255) + cz)
        acc += (s0 + s1 + s2 + s3).astype(jnp.float32)
    return acc


def full(xh, xl, yh, yl, zh, zl, ct, pt):
    return K.accumulate_octaves("ridged", OCT, 2.0, 0.55, ct, pt, xh, xl, yh, yl, zh, zl)


def nosplit_full(xh, xl, yh, yl, zh, zl, ct, pt):
    # full noise core but reusing octave-0 splits every octave (isolates split cost)
    sx = K._floor_split_df(xh, xl); sy = K._floor_split_df(yh, yl); sz = K._floor_split_df(zh, zl)
    (cx, fx, flx), (cy, fy, fly), (cz, fz, flz) = sx, sy, sz
    fxm1, fym1, fzm1 = K._fm1(fx, flx), K._fm1(fy, fly), K._fm1(fz, flz)
    acc = jnp.zeros_like(xh)
    w = jnp.ones_like(xh)
    amp = np.float32(1.0)
    for i in range(OCT):
        n = K._noise3_core(ct, pt, cx + i, fx, fxm1, cy, fy, fym1, cz, fz, fzm1)
        v = np.float32(1.0) - jnp.abs(n); v = v * v
        acc = acc + v * amp * w
        w = v
        amp = amp * np.float32(0.55)
    return acc


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("full ridged-6", full)
    run("splits only", splits_only)
    run("splits+gathers", gathers_only)
    run("full, splits hoisted", nosplit_full)
