"""The fully-fused on-device frame step — one jitted XLA program per frame.

This is the SURVEY.md north-star architecture ("the entire generate ->
tessellate -> shade frame step compiles to one XLA program"): where
engine.planet orchestrates stages from the host (convenient, oracle-exact),
this module runs EVERYTHING on device:

  refine (lax.while_loop frontier, Pallas ridged probes)
  -> DFS-order leaf sort (the budget-priority order, main.cpp:591-594)
  -> cache probe/plan/allocate (cache.device_pool)
  -> mixed-octave tile generation (one Pallas launch, per-row octave mask)
  -> tessellate + shade + depth-tested splat raster
  -> stats psum-ables

Host traffic per frame: the camera (6 floats + a 4x4 matrix) in, the image
(and small stats) out. Pool state is donated in-place.

Differences from the host path (documented, not drift): probe displacement
and camera-relative distances narrow to f32 (vs f64 host / double
reference), which can flip razor-edge split decisions; the generation
budget selects the first K misses in DFS order like the reference, but
mid-frame self-eviction churn is absent (see cache/device_pool.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planet_tpu.cache import device_pool as dp
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import cubesphere, quadid
from planet_tpu.lod import refine_device
from planet_tpu.nums import df as dfm
from planet_tpu.ops.kernels import tile_pallas
from planet_tpu.raster import shade as shade_mod, splat
from planet_tpu.tess import mesh, vertex

_F32 = jnp.float32
_I32 = jnp.int32


class DeviceFrame(NamedTuple):
    image: jnp.ndarray        # (H, W) f32
    depth: jnp.ndarray        # (H, W) f32
    n_leaves: jnp.ndarray     # () i32
    n_generated: jnp.ndarray  # () i32
    overflowed: jnp.ndarray   # () bool


def _roots_static(radius: float):
    corners = cubesphere.root_corners(radius)
    ids = np.array([quadid.make_root(f) for f in range(6)], np.uint64)
    lo, hi = quadid.to_words(ids)
    ch, cl = dfm.from_f64_np(corners)
    return (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ch),
            jnp.asarray(cl))


def build_device_render(cfg: EngineConfig, width: int, height: int, *,
                        cap: int = 4096, gen_cap: int = 256,
                        max_lod: int = None, probe: str = "ridged6",
                        interpret: bool = None):
    """Returns jitted fn(pool, cam_hi (3,), cam_lo (3,), view_proj (4, 4))
    -> (pool', DeviceFrame)."""
    max_lod = cfg.max_lod if max_lod is None else int(max_lod)
    root_lo, root_hi, root_ch, root_cl = _roots_static(cfg.radius)
    dim = cfg.tile_dim
    rows_per_tile = dim * dim // tile_pallas.LANES
    # octave schedule always uses the planet's max_lod (reference passes
    # planet.max_lod, main.cpp:659); max_lod here only caps refinement depth
    max_oct = cfg.octaves_for_depth(max_lod)
    grid_mask = jnp.asarray(mesh.grid_uv_skirt(cfg.patch_verts)[3])

    sh = np.float32(cfg.coord_scale)
    sl = np.float32(np.float64(cfg.coord_scale) - np.float64(sh))

    def step(pool: dp.PoolState, cam_hi, cam_lo, view_proj):
        # ------------------------------------------------ 1. refinement
        ref = refine_device.refine_device(
            cam_hi, cam_lo, root_lo, root_hi, root_ch, root_cl,
            max_lod=max_lod, cap=cap, radius=cfg.radius,
            probe_fn_name=probe)
        n = ref.n_leaves
        row = jnp.arange(cap)
        active = row < n

        # DFS order (budget priority, reference emission order)
        khi, klo = quadid.words_dfs_key(ref.leaf_lo, ref.leaf_hi)
        # padding rows must sort strictly after every real leaf (max valid
        # khi is 5<<28 + (2^28-1) < 2^31-1)
        khi = jnp.where(active, khi, jnp.int32(2**31 - 1))
        perm1 = jnp.argsort(klo, stable=True)
        perm = perm1[jnp.argsort(khi[perm1], stable=True)]
        q_lo = ref.leaf_lo[perm]
        q_hi = ref.leaf_hi[perm]
        c_hi = ref.leaf_corners_hi[perm]
        c_lo = ref.leaf_corners_lo[perm]
        depth = ref.leaf_depth[perm]

        # ------------------------------------------------ 2. cache plan
        slot, found = dp.probe(pool, q_lo, q_hi)
        found = found & active
        p_lo, p_hi = quadid.words_parent(q_lo, q_hi)
        has_parent = depth > 0
        p_slot, p_found = dp.probe(pool, jnp.where(has_parent, p_lo, 0),
                                   jnp.where(has_parent, p_hi, 0))
        p_found = p_found & has_parent
        generate, use_crop = dp.plan(found | ~active, p_found, depth,
                                     cfg.generations_per_frame)
        pool, tgt, n_over = dp.allocate(pool, generate, q_lo, q_hi,
                                        max_gen=gen_cap)
        gen_ok = generate & (tgt >= 0)

        # ------------------------------------------------ 3. generation
        # compact generating leaves into gen_cap payload slots
        gpos = jnp.cumsum(gen_ok.astype(_I32)) - 1
        gtgt = jnp.where(gen_ok, gpos, gen_cap)
        # scaled DF corners (noise space)
        sc_h, sc_l = [], []
        for a in range(3):
            h, l = tile_pallas._df_mul(
                c_hi[..., a], c_lo[..., a],
                jnp.full_like(c_hi[..., a], sh),
                jnp.full_like(c_hi[..., a], sl))
            sc_h.append(h)
            sc_l.append(l)
        sc_h = jnp.stack(sc_h, -1)                  # (cap, 4, 3)
        sc_l = jnp.stack(sc_l, -1)
        payload = jnp.zeros((gen_cap + 1, 32), _F32)
        per_tile = jnp.concatenate(
            [jnp.stack([sc_h.transpose(0, 2, 1), sc_l.transpose(0, 2, 1)],
                       axis=-1).reshape(cap, 24),
             jnp.zeros((cap, 8), _F32)], axis=1)    # (cap, 32)
        payload = payload.at[gtgt].set(per_tile)[:gen_cap]
        octs = (6 + (12 * depth) // cfg.max_lod).astype(_F32)
        oct_slots = jnp.zeros((gen_cap + 1,), _F32).at[gtgt].set(octs)[:gen_cap]
        rows = jnp.repeat(payload, rows_per_tile, axis=0)
        oct_rows = jnp.repeat(oct_slots, rows_per_tile)
        tiles = tile_pallas.tiles_mixed_octaves(
            rows, oct_rows, gen_cap, kind="ridged", max_octaves=max_oct,
            lacunarity=cfg.lacunarity, gain=cfg.gain,
            amplitude=cfg.amplitude, dim=dim, interpret=interpret)
        # scatter generated tiles into the pool at their allocated slots
        slot_of_gen = jnp.full((gen_cap + 1,), pool.tiles.shape[0], _I32)
        slot_of_gen = slot_of_gen.at[gtgt].set(tgt)[:gen_cap]
        pool = dp.store(pool, slot_of_gen,
                        slot_of_gen < pool.tiles.shape[0], tiles)

        # refresh ticks: hits, crop-parents, and the slot to sample from
        slot = jnp.where(gen_ok, tgt, jnp.where(use_crop, p_slot, slot))
        pool = dp.touch(pool, slot, active)

        # ------------------------------------------------ 4. rects/uniforms
        child = quadid.words_child_index(q_lo, q_hi)
        fl = np.float32(1.5 / dim)
        fh = np.float32((dim - 1.5) / dim)
        x0 = jnp.where((child == 1) | (child == 3),
                       np.float32((dim / 2 + 0.5) / dim), fl)
        x1 = jnp.where((child == 1) | (child == 3),
                       np.float32((dim - 1.5) / dim),
                       np.float32((dim / 2 - 0.5) / dim))
        y0 = jnp.where((child == 2) | (child == 3),
                       np.float32((dim / 2 + 0.5) / dim), fl)
        y1 = jnp.where((child == 2) | (child == 3),
                       np.float32((dim - 1.5) / dim),
                       np.float32((dim / 2 - 0.5) / dim))
        rect_lo = jnp.where(use_crop[:, None], jnp.stack([x0, y0], -1),
                            jnp.full((cap, 2), fl))
        rect_hi = jnp.where(use_crop[:, None], jnp.stack([x1, y1], -1),
                            jnp.full((cap, 2), fh))
        pix = jnp.where(
            use_crop[:, None],
            np.float32(((dim / 2.0 - 1.0) / (dim - 3)) / dim),
            np.float32(1.0 / dim)) * jnp.ones((cap, 2), _F32)

        # camera-relative f32 corners (DF subtract then narrow — the
        # reference's main.cpp:666-672 order of operations)
        rel = dfm.sub(dfm.DF(c_hi, c_lo),
                      dfm.DF(jnp.broadcast_to(cam_hi, c_hi.shape),
                             jnp.broadcast_to(cam_lo, c_lo.shape)))
        corners_rel = rel.hi
        nrm = c_hi + c_lo
        normals = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

        d1 = depth - 1
        skirt = jnp.where(
            d1 > 0,
            np.float32(cfg.max_skirt_size)
            / jnp.exp2(d1.astype(_F32) + 1.0),
            np.float32(cfg.max_skirt_size))

        # ------------------------------------------------ 5. tess + raster
        pool_tiles = dp.gather(pool, slot)
        pv = vertex.tessellate(corners_rel, normals, pool_tiles,
                               rect_lo, rect_hi, pix, skirt,
                               view_proj, grid=dim)
        vshade = shade_mod.lambert(pv.normal)
        valid = active[:, None, None] & grid_mask[None, :, :]
        facing = jnp.sum(pv.world * pv.snormal, axis=-1) < 0.0
        c, s, v = splat.upsample_cells(pv.clip, vshade, valid & facing,
                                       cfg.raster_supersample)
        image, depthbuf = splat.splat_frame(c, s, v, width, height)

        pool = dp.end_frame(pool)
        frame = DeviceFrame(image=image, depth=depthbuf, n_leaves=n,
                            n_generated=jnp.sum(gen_ok.astype(_I32)),
                            overflowed=ref.overflowed | (n_over > 0))
        return pool, frame

    return jax.jit(step, donate_argnums=0)
