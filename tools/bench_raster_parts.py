"""Decompose the exact-coverage raster's 1080p cost on TPU: setup+compact,
ladder evaluation, and the final scatter-min, each timed standalone on a
synthetic workload shaped like the 1080p LOD frame (~500 live patches)."""
import sys, time, pathlib
import numpy as np
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
from planet_tpu.raster import coverage

W, H = 1920, 1080
Q = 512
rng = np.random.default_rng(0)

# synthetic patch grids: each patch a ~64x64 px screen blob of 31x31 cells
clip = np.zeros((Q, 32, 32, 4), np.float32)
cx = rng.uniform(0, W, Q)
cy = rng.uniform(0, H, Q)
for q in range(Q):
    u = np.linspace(0, 1, 32)
    gx = cx[q] + (u[None, :] * 64 - 32) + rng.normal(0, 0.3, (32, 32))
    gy = cy[q] + (u[:, None] * 64 - 32) + rng.normal(0, 0.3, (32, 32))
    w = np.float32(1.0)
    clip[q, ..., 0] = (gx / W * 2 - 1) * w
    clip[q, ..., 1] = (1 - gy / H * 2) * w
    clip[q, ..., 2] = rng.uniform(0.1, 0.9)
    clip[q, ..., 3] = w
normal = rng.normal(size=(Q, 32, 32, 3)).astype(np.float32)
normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
valid = np.ones((Q, 32, 32), bool)

clip, normal, valid = (jax.device_put(jnp.asarray(a))
                       for a in (clip, normal, valid))

def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3:9.2f} ms", flush=True)
    return out

# ---- full raster
full = jax.jit(lambda c, n, v: coverage.raster_frame(c, n, v, W, H))
img, dep, counters = timeit("full raster_frame", full, clip, normal, valid)
print("  n_tris:", int(counters.n_tris), "n_per_class:",
      np.asarray(counters.n_per_class))

# ---- setup + pack + compaction only
def setup_only(c, n, v):
    t = coverage._setup(c, n, v, W, H)
    tm = coverage._pack_tris(t)
    bw = t.px1 - t.px0 + 1
    bh = t.py1 - t.py0 + 1
    eligible = t.live & (bh <= coverage.MAX_BH) & (bw <= 128)
    tri_idx, n_live = coverage._compact_indices(eligible, coverage.TRI_CAP)
    tt_m = coverage._gather_packed(tm, tri_idx)
    return tt_m.sum(), n_live
timeit("setup+pack+compact+gather", jax.jit(setup_only), clip, normal, valid)

# ---- ladder eval only (scatter replaced by checksum)
def ladder_only(c, n, v):
    t = coverage._setup(c, n, v, W, H)
    tm = coverage._pack_tris(t)
    bw = t.px1 - t.px0 + 1
    bh = t.py1 - t.py0 + 1
    eligible = t.live & (bh <= coverage.MAX_BH) & (bw <= 128)
    tri_idx, _ = coverage._compact_indices(eligible, coverage.TRI_CAP)
    tt_m = coverage._gather_packed(tm, tri_idx)
    tt_m = jnp.pad(tt_m, ((0, 1), (0, 0)))
    tt = coverage._unpack_tris(tt_m[:-1])
    tbw = tt.px1 - tt.px0 + 1
    tbh = tt.py1 - tt.py0 + 1
    rows = jnp.arange(coverage.MAX_BH, dtype=jnp.int32)[None, :]
    job_live = tt.live[:, None] & (rows < tbh[:, None])
    jbw = jnp.broadcast_to(tbw[:, None], job_live.shape)
    acc = jnp.int32(0)
    prev = 0
    for win_w, cap in coverage.ROW_LADDER:
        in_class = (job_live & (jbw > prev) & (jbw <= win_w)).reshape(-1)
        prev = win_w
        jidx, _ = coverage._compact_indices(in_class, cap)
        idx, packed = coverage._row_job_pass(tt_m, jidx, coverage.MAX_BH,
                                             win_w, W, H)
        acc += jnp.sum(idx) + jnp.sum(packed)
    return acc
timeit("ladder eval (no scatter)", jax.jit(ladder_only), clip, normal, valid)

# ---- scatter-min only, same volume
n_cand = sum(w * c for w, c in coverage.ROW_LADDER)
print("static candidate lanes:", n_cand)
idx_np = rng.integers(0, W * H, n_cand, dtype=np.int32)
packed_np = rng.integers(0, 2**30, n_cand, dtype=np.int32)
idx_d = jax.device_put(jnp.asarray(idx_np))
packed_d = jax.device_put(jnp.asarray(packed_np))
def scat(idx, packed):
    buf = jnp.full((W * H + 1,), coverage._EMPTY, jnp.int32)
    return buf.at[idx].min(packed)[:W * H].sum()
timeit("scatter-min 30.7M", jax.jit(scat), idx_d, packed_d)

# scatter with mostly-dump-slot indices (the real distribution: ~80% of
# candidates reject and go to the dump slot)
idx_np2 = np.where(rng.random(n_cand) < 0.8, W * H, idx_np).astype(np.int32)
idx_d2 = jax.device_put(jnp.asarray(idx_np2))
timeit("scatter-min 80% dump", jax.jit(scat), idx_d2, packed_d)

# ---- per-class cumsum compactions alone
def compacts(c, n, v):
    t = coverage._setup(c, n, v, W, H)
    bw = t.px1 - t.px0 + 1
    bh = t.py1 - t.py0 + 1
    eligible = t.live & (bh <= coverage.MAX_BH) & (bw <= 128)
    tri_idx, _ = coverage._compact_indices(eligible, coverage.TRI_CAP)
    acc = tri_idx.sum()
    job_live = jnp.broadcast_to(eligible[:, None],
                                (eligible.shape[0], coverage.MAX_BH))
    flat = job_live.reshape(-1)
    for win_w, cap in coverage.ROW_LADDER:
        jidx, _ = coverage._compact_indices(flat, cap)
        acc += jidx.sum()
    return acc
timeit("compactions only", jax.jit(compacts), clip, normal, valid)
