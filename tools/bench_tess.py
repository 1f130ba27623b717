"""Isolated cost of the tessellate+shade jit vs batch size on TPU."""
import sys, time, pathlib
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.engine.planet import _tess_shade_fn

rng = np.random.default_rng(0)
f = _tess_shade_fn()

for l_pad in (256, 2048):
    pool_tiles = jax.device_put(
        rng.standard_normal((1024, 32, 32)).astype(np.float32) * 100)
    slots = jax.device_put(
        rng.integers(0, 1024, l_pad).astype(np.int32))
    # plausible camera-relative corners / normals
    base = rng.standard_normal((l_pad, 1, 3)) * 1e5
    corners = (base + rng.standard_normal((l_pad, 4, 3)) * 1e3).astype(np.float32)
    normals = rng.standard_normal((l_pad, 4, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    vx = np.zeros(l_pad, np.int32)
    vy = np.zeros(l_pad, np.int32)
    skirt = np.full((l_pad,), 100.0, np.float32)
    vp = np.eye(4, dtype=np.float32)
    args = tuple(jax.device_put(a) for a in
                 (slots, corners, normals, vx, vy, skirt, vp))
    out = f(pool_tiles, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [f(pool_tiles, *args) for _ in range(8)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 8
    print(f"l_pad={l_pad:5d}: {dt*1e3:9.2f} ms "
          f"({l_pad*1024*5*4/dt/1e6:8.1f} M texel-gathers/s)", flush=True)
