"""Honest standalone raster cost vs fragment count on TPU."""
import sys, time, pathlib
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.engine.planet import _raster_fn

W, H = 1920, 1080
rng = np.random.default_rng(0)

for l_pad, ss in ((256, 4), (256, 8), (512, 8)):
    f = _raster_fn(W, H, ss, False)
    clip = rng.standard_normal((l_pad, 32, 32, 4)).astype(np.float32)
    clip[..., 3] = np.abs(clip[..., 3]) + 0.5
    vshade = rng.uniform(0, 1, (l_pad, 32, 32)).astype(np.float32)
    valid = np.ones((l_pad, 32, 32), bool)
    world = rng.standard_normal((l_pad, 32, 32, 3)).astype(np.float32)
    snormal = -world  # all facing
    normal = world / np.linalg.norm(world, axis=-1, keepdims=True)
    args = tuple(jax.device_put(a) for a in (clip, vshade, normal, valid,
                                             world, snormal))
    img, dep = f(*args)
    jax.block_until_ready((img, dep))
    t0 = time.perf_counter()
    for _ in range(8):
        img, dep = f(*args)
        jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / 8
    frags = l_pad * 31 * 31 * ss * ss
    print(f"l_pad={l_pad} ss={ss}: {dt*1e3:9.2f} ms   "
          f"{frags/1e6:6.1f} M frags  {frags/dt/1e9:6.2f} G/s", flush=True)
