"""Scene-shape exploration for the moving-camera 1080p bench (VERDICT r4 #1).

For a ladder of altitudes, run the device refiner with the production
ridged6 probes and report: leaf count, in-frustum live quads at 1080p,
live triangle count, and the raster span-class histogram — the numbers
that size render_cap / quad_cap / class caps for the reference-shape
workload (~1k leaves, main.cpp's hundreds-thousands of quads).
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine import device_step
from planet_tpu.geom import camera as cam_mod
from planet_tpu.lod import refine_device
from planet_tpu.nums import df as dfm
from planet_tpu.raster import coverage as cov
from planet_tpu.tess import mesh, vertex

QUALITY = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

cfg = EngineConfig(lod_quality=QUALITY)
W, H = 1920, 1080
CAP = 8192

roots = device_step._roots_static(cfg.radius)

@jax.jit
def count_leaves(ch, cl):
    ref = refine_device.refine_device(
        ch, cl, roots[0], roots[1], roots[2], roots[3],
        max_lod=cfg.max_lod, cap=CAP, radius=cfg.radius,
        probe_fn_name="ridged6", quality=QUALITY)
    return ref


def look_at_ground(cam_pos, pitch=0.30):
    up = cam_pos / np.linalg.norm(cam_pos)
    cam = cam_mod.Camera(position=cam_pos,
                         angles=np.array([pitch, 0.3, 0.0], np.float32))
    rot = cam_mod.camera_rotation(cam)
    pf = cam_mod.proj_factor_from_fovy(np.deg2rad(cfg.fovy_deg))
    proj = cam_mod.perspective_lh(pf, W / H, cfg.near_plane, cfg.far_plane)
    return jnp.asarray((proj @ cam_mod.view_from_rotation(rot)).astype(np.float32))


grid_mask = jnp.asarray(mesh.grid_uv_skirt(cfg.patch_verts)[3])
cell_mask = mesh.cell_triangle_mask()

@jax.jit
def scene_stats(ch_hi, ch_lo, vp, leaf_ch, leaf_cl, n, depth):
    # camera-relative corners, tessellate with flat tiles (geometry shape
    # is what matters for the raster histogram; real heights shift bboxes
    # only slightly)
    cap = leaf_ch.shape[0]
    rel = dfm.sub(dfm.DF(leaf_ch, leaf_cl),
                  dfm.DF(jnp.broadcast_to(ch_hi, leaf_ch.shape),
                         jnp.broadcast_to(ch_lo, leaf_cl.shape)))
    nrm = leaf_ch + leaf_cl
    normals = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    tiles = jnp.zeros((cap, cfg.tile_dim, cfg.tile_dim), jnp.float32)
    vx = jnp.zeros(cap, jnp.int32)
    skirt = jnp.full(cap, 100.0, jnp.float32)
    pv = vertex.tessellate_blend(rel.hi, normals, tiles, vx, vx, skirt, vp,
                                 grid=cfg.tile_dim)
    active = jnp.arange(cap) < n
    valid = active[:, None, None] & grid_mask[None, :, :]
    qlive, n_tris = cov._quad_live_t(pv.clip, valid, W, H, cell_mask)
    tm, live, bw, bh, span = cov._setup_t(pv.clip, pv.normal, valid, W, H,
                                          cell_mask)
    hist = []
    prev = 0
    for c in (1, 2, 3, 4, 8, 16):
        hist.append(jnp.sum((live & (span > prev) & (span <= c)
                             & (bw <= 128)).astype(jnp.int32)))
        prev = c
    huge = jnp.sum((live & ((span > 16) | (bw > 128))).astype(jnp.int32))
    # micro-packet eligibility: span <= 2, bbox width <= 8, no column
    # straddle across a 128-lane block
    px0 = tm[24, :-1].astype(jnp.int32)
    micro = (live & (span <= 2) & (bw <= 8)
             & ((px0 % 128) <= (128 - 8)))
    bwh = [jnp.sum((live & (bw > p) & (bw <= c)).astype(jnp.int32))
           for p, c in ((0, 8), (8, 16), (16, 32), (32, 64), (64, 128))]
    bhh = [jnp.sum((live & (bh > p) & (bh <= c)).astype(jnp.int32))
           for p, c in ((0, 1), (1, 2), (2, 4), (4, 8), (8, 1 << 20))]
    area = jnp.sum(jnp.where(live, bw * bh, 0))
    lanes = jnp.sum(jnp.where(live & (span <= 16) & (bw <= 128),
                              span * 8 * 128, 0))
    return (qlive.sum(), n_tris,
            jnp.stack(hist + [huge, jnp.sum(micro.astype(jnp.int32))]),
            jnp.stack(bwh), jnp.stack(bhh), area, lanes)


for alt in [20000.0, 10000.0, 5000.0, 3000.0, 2000.0, 1000.0, 500.0]:
    cdir = np.array([0.2, 0.5, -0.8]); cdir /= np.linalg.norm(cdir)
    cam_pos = cdir * (cfg.radius + alt)
    ch, cl = dfm.from_f64_np(cam_pos)
    ch, cl = jnp.asarray(ch), jnp.asarray(cl)
    ref = count_leaves(ch, cl)
    vp = look_at_ground(cam_pos)
    nq, nt, hist, bwh, bhh, area, lanes = scene_stats(
        ch, cl, vp, ref.leaf_corners_hi, ref.leaf_corners_lo,
        ref.n_leaves, ref.leaf_depth)
    print(f"alt {alt:8.0f} m: leaves {int(ref.n_leaves):5d} "
          f"overflow {bool(ref.overflowed)} "
          f"live_quads {int(nq):4d} live_tris {int(nt):7d} "
          f"classes {list(np.asarray(hist))}")
    print(f"    bw hist (8/16/32/64/128): {list(np.asarray(bwh))} "
          f"bh hist (1/2/4/8/+): {list(np.asarray(bhh))} "
          f"bbox_area {int(area)} window_lanes {int(lanes)} "
          f"waste {int(lanes)/max(int(area),1):.1f}x")
