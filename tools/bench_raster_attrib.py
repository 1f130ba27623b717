"""Slope-timed attribution of the 1080p exact-raster cost on TPU.

Splits raster_frame_pallas into (preprocess: records+sort+class gathers)
vs (fragment kernels on pre-gathered records) so optimization targets the
right stage. Method: queue N iters returning a scalar checksum, fetch only
the last; difference two queue depths to cancel the tunnel round trip.
"""
import sys, time, pathlib, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from planet_tpu.cache import device_pool as dp
from planet_tpu.engine import device_step
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import camera as cam_mod
from planet_tpu.nums import df as dfm
from planet_tpu.raster import coverage as cov, coverage_pallas as cp
from planet_tpu.tess import mesh

W, H = 1920, 1080
cfg = EngineConfig()
cdir = np.array([0.2, 0.5, -0.8]); cdir /= np.linalg.norm(cdir)
cam_pos = cdir * (cfg.radius + 20000.0)
cam = cam_mod.Camera(position=cam_pos,
                     angles=np.array([0.35, 0.3, 0.0], np.float32))
rot = cam_mod.camera_rotation(cam)
pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
vp = jnp.asarray((proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))
ch, cl = dfm.from_f64_np(cam_pos)

geom = device_step.build_device_render(cfg, W, H, stop_after="geometry")
pool = dp.init(cfg.cache_capacity, cfg.tile_dim)
pool, (pv, vshade, valid, meta) = geom(pool, jnp.asarray(ch), jnp.asarray(cl), vp)
clip = jax.lax.stop_gradient(pv.clip)
normal = pv.normal
cell_mask = mesh.cell_triangle_mask()
jax.block_until_ready(clip)


def slope(fn, *args, n1=6, n2=26):
    def run(n):
        r = fn(*args); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        return time.perf_counter() - t0
    run(2)
    return (run(n2) - run(n1)) / (n2 - n1) * 1e3


@jax.jit
def full_raster(clip, normal, valid):
    img, rc = cp.raster_frame_pallas(clip, normal, valid, W, H,
                                     cell_mask=cell_mask, decode=False)
    return img.astype(jnp.int64).sum() + rc.n_tris


@jax.jit
def preprocess_only(clip, normal, valid):
    tm, live, bw, bh, span = cov._setup_t(clip, normal, valid, W, H, cell_mask)
    tm = jax.lax.optimization_barrier(tm)
    eligible = live & (span <= cp.SPAN_CLASSES[-1]) & (bw <= cp.MAX_BW)
    n = live.shape[0]
    stride = jnp.int32(n + 1)
    pos = jnp.arange(n, dtype=jnp.int32)
    class_id = jnp.full((n,), len(cp.SPAN_CLASSES) + 1, jnp.int32)
    need_huge = live & ~eligible
    class_id = jnp.where(need_huge, len(cp.SPAN_CLASSES), class_id)
    for c in reversed(range(len(cp.SPAN_CLASSES))):
        class_id = jnp.where(eligible & (span <= cp.SPAN_CLASSES[c]),
                             jnp.int32(c), class_id)
    sorted_keys = jax.lax.sort(class_id * stride + pos)
    pad_len = max(max(cp.DEFAULT_CAPS), 16)
    sorted_keys = jnp.pad(sorted_keys, (0, pad_len),
                          constant_values=(len(cp.SPAN_CLASSES) + 1) * (n + 1))
    counts = [jnp.sum((class_id == c).astype(jnp.int32))
              for c in range(len(cp.SPAN_CLASSES) + 1)]
    acc = jnp.float32(0)
    off = jnp.int32(0)
    for c, (cspan, cap) in enumerate(zip(cp.SPAN_CLASSES, cp.DEFAULT_CAPS)):
        seg = jax.lax.dynamic_slice(sorted_keys, (off,), (cap,))
        idxs = jnp.where(seg // stride == c, seg % stride, jnp.int32(n))
        off = off + counts[c]
        recs = cov._gather_packed_t(tm, idxs)
        acc = acc + recs.sum()
    return acc


@jax.jit
def setup_only(clip, normal, valid):
    tm, live, bw, bh, span = cov._setup_t(clip, normal, valid, W, H, cell_mask)
    return tm.sum() + span.sum()


print("full raster      :", f"{slope(full_raster, clip, normal, valid):7.2f} ms")
print("preprocess (all) :", f"{slope(preprocess_only, clip, normal, valid):7.2f} ms")
print("setup_t only     :", f"{slope(setup_only, clip, normal, valid):7.2f} ms")

# kernels on pre-gathered records
tm, live, bw, bh, span = jax.jit(functools.partial(
    cov._setup_t, width=W, height=H, cell_mask=cell_mask))(clip, normal, valid)
n = int(live.shape[0])
eligible = live & (span <= cp.SPAN_CLASSES[-1]) & (bw <= cp.MAX_BW)
class_id = np.full((n,), len(cp.SPAN_CLASSES) + 1, np.int32)
cid = np.asarray(class_id)
el = np.asarray(eligible); sp = np.asarray(span); lv = np.asarray(live)
cid[lv & ~el] = len(cp.SPAN_CLASSES)
for c in reversed(range(len(cp.SPAN_CLASSES))):
    cid[el & (sp <= cp.SPAN_CLASSES[c])] = c
recs_by_class = []
for c, (cspan, cap) in enumerate(zip(cp.SPAN_CLASSES, cp.DEFAULT_CAPS)):
    idxs = np.where(cid == c)[0][:cap]
    idxs = np.pad(idxs, (0, cap - len(idxs)), constant_values=n)
    recs_by_class.append(jax.device_put(np.asarray(
        jax.jit(cov._gather_packed_t)(tm, jnp.asarray(idxs))).T.copy()))
    print(f"  class {c} (span<={cspan}): n={int((cid==c).sum())} cap={cap}")

width_pad = -(-W // 128) * 128
height_pad = -(-max(H, 8 * cp.SPAN_CLASSES[-1]) // 8) * 8


@jax.jit
def kernels_only(*recs):
    fb = jnp.full((height_pad, width_pad), cp._EMPTY, jnp.int32)
    for c, (cspan, cap) in enumerate(zip(cp.SPAN_CLASSES, cp.DEFAULT_CAPS)):
        fb = cp._run_class(recs[c], fb, winh=8 * cspan, cap=cap,
                           width_pad=width_pad, height_pad=height_pad)
    return fb.astype(jnp.int64).sum()


print("kernels only     :", f"{slope(kernels_only, *recs_by_class):7.2f} ms")

for c, (cspan, cap) in enumerate(zip(cp.SPAN_CLASSES, cp.DEFAULT_CAPS)):
    @jax.jit
    def one(rec, cspan=cspan, cap=cap):
        fb = jnp.full((height_pad, width_pad), cp._EMPTY, jnp.int32)
        fb = cp._run_class(rec, fb, winh=8 * cspan, cap=cap,
                           width_pad=width_pad, height_pad=height_pad)
        return fb.astype(jnp.int64).sum()
    print(f"  kernel class {c} (span<={cspan}, cap={cap}):",
          f"{slope(one, recs_by_class[c]):7.2f} ms")
