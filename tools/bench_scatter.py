"""Probe TPU costs of raster building blocks: scatter-min, sort, take."""
import sys, time, pathlib
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = 1 << 22          # 4M fragments
PIX = 1920 * 1088


def bench(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, PIX, N, dtype=np.int32))
val = jnp.asarray(rng.integers(0, 1 << 30, N, dtype=np.int32))

@jax.jit
def scatter_min(idx, val):
    buf = jnp.full((PIX,), np.int32(2**31 - 1))
    return buf.at[idx].min(val)

t = bench(scatter_min, idx, val)
print(f"scatter_min 4M->2M: {t*1e3:9.3f} ms  {N/t/1e6:8.1f} M/s", flush=True)

@jax.jit
def sort_pairs(idx, val):
    return jax.lax.sort((idx, val), num_keys=1)

t = bench(sort_pairs, idx, val)
print(f"sort 4M pairs:      {t*1e3:9.3f} ms  {N/t/1e6:8.1f} M/s", flush=True)

rows = jnp.asarray(rng.standard_normal((N, 8)), jnp.float32)
take_idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))

@jax.jit
def take_rows(rows, take_idx):
    return jnp.take(rows, take_idx, axis=0)

t = bench(take_rows, rows, take_idx)
print(f"take 4M rows x8:    {t*1e3:9.3f} ms  {N/t/1e6:8.1f} Mrows/s", flush=True)

# segment-min after sort (the sort-based raster reduce)
@jax.jit
def sorted_reduce(idx, val):
    si, sv = jax.lax.sort((idx, val), num_keys=1)
    first = jnp.concatenate([jnp.array([True]), si[1:] != si[:-1]])
    # running min within segments via associative scan
    mins = jax.lax.associative_scan(
        jnp.minimum, jnp.where(first, sv, sv))  # placeholder op cost probe
    return si, mins

t = bench(sorted_reduce, idx, val)
print(f"sort+scan 4M:       {t*1e3:9.3f} ms", flush=True)
