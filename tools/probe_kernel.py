"""Quick compile+run probe of the Pallas noise kernel on the real chip."""
import sys, time, pathlib
import numpy as np
import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import perlin_pallas as pk
from planet_tpu.ops import perlin_np

octaves = int(sys.argv[1]) if len(sys.argv) > 1 else 1
kind = sys.argv[2] if len(sys.argv) > 2 else "fbm"
logn = int(sys.argv[3]) if len(sys.argv) > 3 else 18
block_rows = int(sys.argv[4]) if len(sys.argv) > 4 else 256

rng = np.random.default_rng(0)
pts = rng.uniform(-60, 60, (1 << logn, 3))
x, y, z = (dfm.from_f64(pts[:, i]) for i in range(3))
t0 = time.time()
out = pk.noise_df(kind, x.hi, x.lo, y.hi, y.lo, z.hi, z.lo,
                  octaves=octaves, gain=np.float32(0.55), block_rows=block_rows, interpret=False)
jax.block_until_ready(out)
print(f"compile+run {kind}-{octaves}oct: {time.time()-t0:.1f} s", flush=True)
ref = perlin_np.fbm if kind == "fbm" else perlin_np.ridged
want = ref(pts[:, 0], pts[:, 1], pts[:, 2], octaves=octaves,
           gain=np.float32(0.55))
print("max abs err:", float(np.max(np.abs(np.asarray(out) - want))), flush=True)

# steady-state throughput
f = jax.jit(lambda *a: pk.noise_df(kind, *a, octaves=octaves, block_rows=block_rows,
                                   gain=np.float32(0.55), interpret=False))
args = (x.hi, x.lo, y.hi, y.lo, z.hi, z.lo)
jax.block_until_ready(f(*args))
t0 = time.time()
outs = [f(*args) for _ in range(32)]
jax.block_until_ready(outs)
dt = (time.time() - t0) / 32
n = pts.shape[0]
print(f"steady: {dt*1e3:.3f} ms/launch  {n/dt/1e9:.3f} Gtexels/s", flush=True)
