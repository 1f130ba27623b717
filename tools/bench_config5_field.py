"""BASELINE config 5 at its STATED scale (6x8192^2) on the hardware we
have (VERDICT r4 #3): the per-chip v5e-8 shard and the full field, with
HBM high-water numbers and the projected v5e-8 frame time.

Runs (TPU):
  1. full fused field step at 6x8192^2 on one chip (the whole config-5
     field; the v5e-8 program shards this 8-way),
  2. the per-chip strip (6, 1024, 8192) through the SAME compute the
     sharded program runs per chip (points -> DF ridged heights ->
     halo-padded central-difference normals -> Lambert), i.e. the v5e-8
     per-chip shard modulo collectives (whose traffic is the 786 KB
     face-edge ring psum + 8 B stats — docs/multislice.md).

Usage: python tools/bench_config5_field.py [n] [block_rows]
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from planet_tpu.models import heightfield
from planet_tpu.parallel import facemesh
from planet_tpu.raster import shade as shade_mod

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
br = int(sys.argv[2]) if len(sys.argv) > 2 else 256
radius = 6.371e6
N_CHIPS = 8
dev = jax.devices()[0]


def mem(tag):
    try:
        s = dev.memory_stats()
        print(f"  [{tag}] bytes_in_use={s['bytes_in_use']/2**30:.2f} GiB "
              f"peak={s.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")
    except Exception as e:           # axon may not expose stats
        print(f"  [{tag}] memory_stats unavailable: {e}")


def slope(fn, mk_arg):
    """Queue-depth slope timing (cancels tunnel latency). Every call gets
    a DISTINCT traced argument: the axon tunnel dedupes identical
    (executable, args) dispatches, which silently times nothing."""
    out = fn(mk_arg(-1))
    jax.block_until_ready(out)
    walls = []
    k = 0
    for q in (3, 9):
        t0 = time.perf_counter()
        outs = []
        for _ in range(q):
            outs.append(fn(mk_arg(k)))
            k += 1
        jax.block_until_ready(outs)
        walls.append(time.perf_counter() - t0)
    return (walls[1] - walls[0]) / 6


# ---- 1. full 6 x n^2 fused field step (one chip)
def full_frame(tick):
    h, s = heightfield.frame_cube(n, radius, block_rows=br)
    # keep a live traced input INSIDE the reduction: with the sums taken
    # over a tick-independent subgraph XLA constant-folds the entire
    # field at compile time and the "frames" measure nothing (tick*0 is
    # not algebraically removable — it is NaN/inf-propagating)
    h = h + tick * jnp.float32(0.0)
    return jnp.sum(h, dtype=jnp.float32) + jnp.sum(s, dtype=jnp.float32)

f_full = jax.jit(full_frame)
dt_full = slope(f_full, lambda k: jnp.float32(k))
tex = 6 * n * n
print(f"full field 6x{n}^2 (1 chip): {dt_full*1e3:.1f} ms/frame, "
      f"{tex/dt_full/1e9:.2f} Gtexels/s")
mem("after full frame")


# ---- 2. per-chip v5e-8 strip: (6, n/8, n) rows
rows = n // N_CHIPS
xyscale = (np.pi / 2) * radius / n


def strip_step(row0):
    px, py, pz = facemesh.face_grid_points_df(n, radius, row0=row0,
                                              rows=rows)
    h = heightfield.heights_df(px, py, pz, kind="ridged", octaves=6,
                               use_pallas=True)
    # clamp halos (the sharded program swaps in ppermute'd neighbor rows
    # and the ring psum seams — same arithmetic, different sources)
    h_rows = jnp.concatenate([h[:, :1, :], h, h[:, -1:, :]], axis=1)
    h_pad = jnp.concatenate([h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]],
                            axis=2)
    normal = heightfield.normals_from_heights(h_pad, xyscale)
    sh = shade_mod.lambert(normal)
    return jnp.sum(h, dtype=jnp.float32) + jnp.sum(sh, dtype=jnp.float32)

f_strip = jax.jit(strip_step)
# vary row0 within the face (all strips cost the same noise work)
dt_strip = slope(f_strip, lambda k: jnp.int32((k % N_CHIPS) * rows))
stex = 6 * rows * n
print(f"per-chip strip XLA-composed (6, {rows}, {n}): {dt_strip*1e3:.1f} ms, "
      f"{stex/dt_strip/1e9:.2f} Gtexels/s/chip")
mem("after strip")


# ---- 3. per-chip strip through the FUSED kernel (field_cube_strip):
# in-kernel coords + halo recompute, no materialized points
def strip_fused(row0):
    from planet_tpu.ops.kernels import field_pallas
    h, s = field_pallas.field_cube_strip(n, radius, row0, rows,
                                         block_rows=br)
    h = h + row0.astype(jnp.float32) * jnp.float32(0.0)
    return jnp.sum(h, dtype=jnp.float32) + jnp.sum(s, dtype=jnp.float32)

f_fused = jax.jit(strip_fused)
dt_fused = slope(f_fused, lambda k: jnp.int32((k % N_CHIPS) * rows))
print(f"per-chip strip FUSED (6, {rows}, {n}): {dt_fused*1e3:.1f} ms, "
      f"{stex/dt_fused/1e9:.2f} Gtexels/s/chip")

# collective budget on v5e-8 (docs/multislice.md): face-edge ring psum
# 6*4*n*4 B over ICI (~0.05 ms at 100 GB/s + us latency), stats psum 8 B
ring_mb = 6 * 4 * n * 4 / 2**20
proj = min(dt_strip, dt_fused) * 1e3 + 0.1
print(f"projected v5e-8 frame: {proj:.1f} ms "
      f"(best strip + {ring_mb:.2f} MB ring psum; aggregate "
      f"{stex*N_CHIPS/min(dt_strip, dt_fused)/1e9:.1f} Gtexels/s)")
print(f'{{"config5_full_field_ms": {dt_full*1e3:.1f}, '
      f'"config5_strip_xla_ms": {dt_strip*1e3:.1f}, '
      f'"config5_strip_fused_ms": {dt_fused*1e3:.1f}, '
      f'"config5_projected_v5e8_ms": {proj:.1f}}}')
