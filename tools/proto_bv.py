"""Prototype: block-vectorized span-class kernel (BV) vs current
per-record kernel. Records batched as SUBLANES of (R, winh*128) arrays so
every per-record constant is a native (R, 1) column slice (zero scalar
loads, zero branches); one C-order reshape turns the packed result into
(R*winh, 128) window rows for per-record RMW slices.

Validates bit-exactness vs cp._run_class on live synthetic records, then
trace-times both (device time, not tunnel wall).
"""
import sys, time, functools, tempfile, glob, collections, pathlib
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
from planet_tpu.raster import coverage as cov
from planet_tpu.raster.splat import _DEPTH_BITS, _EMPTY, _SHADE_BITS

_F32, _I32 = jnp.float32, jnp.int32
W, H = 1920, 1080
WPAD, HPAD = 1920, 1088
R = 8          # records per vector group (sublane batch)


def bv_kernel(winh, rec_ref, blive_ref, fb_in_ref, fb_ref):
    """One grid step: R records' (winh, 128) windows evaluated as ONE
    (R, winh*128) vector computation. rec_ref (R, 32) VMEM row records;
    blive_ref (1,) SMEM per-block live count."""
    @pl.when(pl.program_id(0) == 0)
    def _seed():
        fb_ref[:, :] = fb_in_ref[:, :]

    L = winh * 128
    f = _F32
    # static window iotas: lane l = row*128 + col
    lane = jax.lax.broadcasted_iota(_I32, (R, L), 1)
    rowf = (lane // 128).astype(f)
    colf = (lane % 128).astype(f)

    def col(j):
        return rec_ref[:, j:j + 1]          # (R, 1) native slice

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
        in_box = ((colf >= px0r) & (colf <= px1r)
                  & (rowf >= py0r) & (rowf <= py1r))
        ok = inside & in_box & (z >= f(-1.0))
        zq = jnp.minimum((z * f(0.5) + f(0.5)) * f(2**_DEPTH_BITS - 1),
                         f(2**_DEPTH_BITS - 2)).astype(_I32)
        sq = jnp.minimum(shade * f(2**_SHADE_BITS - 1),
                         f(2**_SHADE_BITS - 1)).astype(_I32)
        packed = jnp.where(ok, (zq << _SHADE_BITS) | sq, _EMPTY)
        # C-order reshape: rows [winh*k, winh*(k+1)) = record k's window
        pw = packed.reshape(R * winh, 128)
        for k in range(R):
            py0c = rec_ref[k, 12].astype(_I32) * 8
            px0a = rec_ref[k, 13].astype(_I32) * 128
            old = fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)]
            fb_ref[pl.ds(py0c, winh), pl.ds(px0a, 128)] = \
                jnp.minimum(old, pw[k * winh:(k + 1) * winh, :])

    pl.when(blive_ref[pl.program_id(0)] > 0)(_block)


@functools.partial(jax.jit, static_argnames=("winh", "cap"))
def run_bv(records, blive, fb, *, winh, cap):
    kernel = functools.partial(bv_kernel, winh)
    return pl.pallas_call(
        kernel, grid=(cap // R,),
        in_specs=[
            pl.BlockSpec((R, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((HPAD, WPAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HPAD, WPAD), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((HPAD, WPAD), jnp.int32),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(records, blive, fb)


def make_live_records(k, winh, bw=14, seed=0):
    """Records whose triangles actually cover pixels (front-facing,
    in-window), shaped like the real fixup output."""
    rng = np.random.default_rng(seed)
    m = np.zeros((k, 32), np.float32)
    pyblk = rng.integers(0, (HPAD - winh) // 8, k)
    blk0 = rng.integers(0, WPAD // 128 - 1, k)
    bh = winh
    x0 = (rng.integers(0, (128 - bw) * 16, k) / 16.0).astype(np.float32)
    y0 = (rng.integers(0, 16, k) / 16.0).astype(np.float32)
    # CCW-in-screen triangle (front under FRONT_SIGN=-1)
    xs = np.stack([x0 + bw * 0.5, x0, x0 + bw], 1).astype(np.float32)
    ys = np.stack([y0, y0 + bh - 1.2, y0 + bh - 1.2], 1).astype(np.float32)
    fs = np.float32(cov.FRONT_SIGN)
    area2 = ((xs[:, 1] - xs[:, 0]) * (ys[:, 2] - ys[:, 0])
             - (ys[:, 1] - ys[:, 0]) * (xs[:, 2] - xs[:, 0])) * fs
    inv_area = (1.0 / area2).astype(np.float32)

    def edge(a, b):
        DX = (xs[:, b] - xs[:, a]) * fs
        DY = (ys[:, b] - ys[:, a]) * fs
        c = DX * (0.5 - ys[:, a]) - DY * (0.5 - xs[:, a])
        topleft = (DY < 0) | ((DY == 0) & (DX > 0))
        bias = np.where(topleft, -1 / 512, 1 / 512).astype(np.float32)
        return np.stack([DX, DY, c], 1), bias

    (m[:, 0:3], m[:, 29]) = edge(1, 2)
    (m[:, 3:6], m[:, 30]) = edge(2, 0)
    (m[:, 6:9], m[:, 31]) = edge(0, 1)
    m[:, 9:12] = rng.uniform(0.05, 0.25, (k, 3)) * inv_area[:, None]
    nrm = rng.normal(0, 1, (k, 3, 3)).astype(np.float32)
    m[:, 15:24] = (nrm * inv_area[:, None, None]).reshape(k, 9)
    m[:, 12] = pyblk
    m[:, 13] = blk0
    m[:, 14] = 0.0
    m[:, 24] = 0.0
    m[:, 25] = bw
    m[:, 26] = 0.0
    m[:, 27] = bh - 1.2
    m[:, 28] = 1.0
    return m


def trace_time(tag, fn, *args, iters=20):
    o = fn(*args)
    jax.block_until_ready(o)
    outdir = tempfile.mkdtemp(prefix="bv_")
    with jax.profiler.trace(outdir):
        o2 = args[-1] if not isinstance(args[-1], tuple) else None
        for _ in range(iters):
            o = fn(*args)
        jax.block_until_ready(o)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    totals = collections.Counter()
    for fnm in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fnm, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {mm.id: mm.name for mm in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    nm = ev_meta.get(ev.metadata_id, "")
                    if "run" in nm or "custom" in nm or "pallas" in nm.lower():
                        totals[nm] += ev.duration_ps
    for nm, ps in totals.most_common(4):
        print(f"  {tag}: {ps / 1e12 / iters * 1e3:7.3f} ms  {nm[:80]}",
              flush=True)
    return o


if __name__ == "__main__":
    K = 32768
    for winh in (8, 16):
        mr = make_live_records(K, winh)
        recs = jnp.asarray(mr)
        blive = jnp.full((K // R,), R, jnp.int32)
        fb = jnp.full((HPAD, WPAD), _EMPTY, jnp.int32)

        out_ref = cp._run_class(recs, fb, winh=winh, cap=K,
                                width_pad=WPAD, height_pad=HPAD)
        out_bv = run_bv(recs, blive, fb, winh=winh, cap=K)
        same = bool(jnp.all(out_ref == out_bv))
        ndrawn = int(jnp.sum(out_bv != _EMPTY))
        print(f"winh={winh}: bit-identical={same} drawn_px={ndrawn}",
              flush=True)
        assert ndrawn > 1000, "synthetic records drew nothing"
        trace_time(f"ref winh{winh}",
                   lambda r, f: cp._run_class(r, f, winh=winh, cap=K,
                                              width_pad=WPAD,
                                              height_pad=HPAD), recs, fb)
        trace_time(f"bv  winh{winh}",
                   lambda r, b, f: run_bv(r, b, f, winh=winh, cap=K),
                   recs, blive, fb)
