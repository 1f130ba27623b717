"""Microbench the Pallas span-class kernels standalone with synthetic
records: isolates per-record scalar setup cost from per-vreg vector cost
(VERDICT r5 #1: the span kernels are ~6.2 ms of the 11.6 ms moving frame).

Synthesizes K live records of one class (winh rows, single column block,
fixed-size bbox) and slope-times _run_class over K, reporting ns/record
and ns/vreg-row. Variants probe the n_extra branch and dead-tail skip.
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
from planet_tpu.raster import coverage_pallas as cp

W, H = 1920, 1080
WPAD, HPAD = 1920, 1088
rng = np.random.default_rng(0)


def make_records(k, winh, bw=14, bh=None, frac_extra=0.0, cap=None):
    """(cap, 32) f32 records: live small triangles, in-window bboxes."""
    cap = cap or k
    bh = bh or winh
    m = np.zeros((cap, 32), np.float32)
    pyblk = rng.integers(0, (HPAD - winh) // 8, k)
    blk0 = rng.integers(0, WPAD // 128, k)
    # triangles covering roughly the bbox: edge constants from 3 vertices
    x0 = rng.uniform(2, 100 - bw, k).astype(np.float32)
    y0 = rng.uniform(1, winh - 1, k).astype(np.float32)
    xs = np.stack([x0, x0 + bw, x0 + bw * 0.5], 1)
    ys = np.stack([y0 + bh - 1, y0 + bh - 1, y0], 1)

    def edge(a, b):
        DX = xs[:, b] - xs[:, a]
        DY = ys[:, b] - ys[:, a]
        c = DX * (0.5 - ys[:, a]) - DY * (0.5 - xs[:, a])
        return np.stack([DX, DY, c], 1)

    m[:k, 0:3] = edge(1, 2)
    m[:k, 3:6] = edge(2, 0)
    m[:k, 6:9] = edge(0, 1)
    m[:k, 9:12] = rng.uniform(0.1, 0.3, (k, 3))
    m[:k, 15:24] = rng.normal(0, 0.1, (k, 9))
    m[:k, 29:32] = 1 / 512.0
    m[:k, 12] = pyblk
    m[:k, 13] = blk0
    n_ex = int(k * frac_extra)
    if n_ex:
        m[rng.choice(k, n_ex, replace=False), 14] = 1.0
    m[:k, 24] = 0.0
    m[:k, 25] = bw
    m[:k, 26] = 0.0
    m[:k, 27] = bh - 1
    m[:k, 28] = -1.0   # live, no far clip (row-28 encoding, round 5)
    return jnp.asarray(m)


def slope(fn, recs_small, recs_big, n_small, n_big, reps=3):
    fb = jnp.full((HPAD, WPAD), -1, jnp.int32)
    out = fn(recs_small, fb); jax.block_until_ready(out)
    out = fn(recs_big, fb); jax.block_until_ready(out)
    dts = []
    for _ in range(reps):
        walls = []
        for recs, iters in ((recs_small, 30), (recs_big, 30)):
            o = fn(recs, fb); jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(recs, o)
            jax.block_until_ready(o)
            walls.append((time.perf_counter() - t0) / iters)
        dts.append(walls[1] - walls[0])
    return float(np.median(dts)) / (n_big - n_small)


def bench(name, winh, k, bw=14, frac_extra=0.0):
    cap_s, cap_b = 2048, 2048 + k
    cap_s = -(-cap_s // cp.TRI_BLOCK) * cp.TRI_BLOCK
    cap_b = -(-cap_b // cp.TRI_BLOCK) * cp.TRI_BLOCK
    r_s = make_records(cap_s, winh, bw=bw, frac_extra=frac_extra)
    r_b = make_records(cap_b, winh, bw=bw, frac_extra=frac_extra)

    def run(recs, fb):
        return cp._run_class(recs, fb, winh=winh, cap=recs.shape[0],
                             width_pad=WPAD, height_pad=HPAD)

    ns = slope(run, r_s, r_b, cap_s, cap_b) * 1e9
    vregs = winh // 8 * (1 + frac_extra)
    print(f"{name:34s} {ns:8.1f} ns/rec  {ns / vregs:8.1f} ns/vreg")


if __name__ == "__main__":
    bench("span1 (winh 8)  bw14", 8, 32768)
    bench("span2 (winh 16) bw14", 16, 32768)
    bench("span3 (winh 24) bw24", 24, 16384, bw=24)
    bench("span4 (winh 32) bw24", 32, 8192, bw=24)
    bench("span8 (winh 64) bw40", 64, 4096, bw=40)
    bench("span1 + 10% extra col", 8, 32768, frac_extra=0.10)
    bench("span1 + 50% extra col", 8, 32768, frac_extra=0.50)
