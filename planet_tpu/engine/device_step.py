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

Differences from the host path (documented, not drift): the split decision
is evaluated in double-float (~1e-14 relative, matching the reference's
double evaluation, main.cpp:546-571 — see lod/refine_device.py), so leaf
sets are bit-stable vs the host refiner except within that margin; the
generation budget selects the first K misses in DFS order like the
reference, but mid-frame self-eviction churn is absent (see
cache/device_pool.py).
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
from planet_tpu.raster import coverage, coverage_pallas, shade as shade_mod, splat
from planet_tpu.tess import mesh, vertex

_F32 = jnp.float32
_I32 = jnp.int32


class DeviceFrame(NamedTuple):
    image: jnp.ndarray        # (H, W) f32 (u8 when DeviceRenderer(fetch="u8"))
    depth: jnp.ndarray        # (H, W) f32
    n_leaves: jnp.ndarray     # () i32
    n_generated: jnp.ndarray  # () i32
    overflowed: jnp.ndarray   # () bool
    preview: jnp.ndarray = None   # (H//k, W//k) u8 when preview=k > 1


def _roots_static(radius: float):
    corners = cubesphere.root_corners(radius)
    ids = np.array([quadid.make_root(f) for f in range(6)], np.uint64)
    lo, hi = quadid.to_words(ids)
    ch, cl = dfm.from_f64_np(corners)
    return (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ch),
            jnp.asarray(cl))


def build_device_render(cfg: EngineConfig, width: int, height: int, *,
                        cap: int = 4096, render_cap: int = 512,
                        gen_cap: int = 256, max_lod: int = None,
                        probe: str = "ridged6", interpret: bool = None,
                        stop_after: str = "full",
                        dynamic_roots: bool = False,
                        raster_out: str = "decoded", jit: bool = True,
                        raster_cfg: dict = None):
    """Returns jitted fn(pool, cam_hi (3,), cam_lo (3,), view_proj (4, 4))
    -> (pool', DeviceFrame).

    cap bounds the refinement frontier/leaf buffers; render_cap bounds the
    leaves actually cached+generated+drawn per frame (the DFS sort puts
    active leaves first, so slicing after the sort keeps exactly the first
    render_cap leaves; more sets the overflow flag). Fragment count — and
    the raster scatter, the frame's dominant fixed cost — scales with
    render_cap, not cap.

    stop_after: "full" | "refine" | "cache" | "generate" | "uniforms" |
    "tess" — debug knob that truncates the program for stage-cost
    bisection (truncated stages return a zero image).

    dynamic_roots: the step takes the refinement roots as traced arguments
    (root_lo, root_hi (R,), root_ch, root_cl (R, 4, 3), root_depth (R,))
    appended to the signature — the sharded engine feeds each chip its own
    subtree roots (parallel/sharded_lod.py).

    raster_out="packed" (exact raster only) makes the full step return
    (pool, (packed (H, W) i32, n, n_gen, overflowed, q_lo, q_hi)) — the
    min-composable framebuffer plus the rendered leaf ids, for multi-chip
    pmin compositing. jit=False returns the untraced step for shard_map
    composition."""
    max_lod = cfg.max_lod if max_lod is None else int(max_lod)
    if raster_out not in ("decoded", "packed"):
        raise ValueError(raster_out)
    if raster_out == "packed" and cfg.raster_mode != "exact":
        raise ValueError("packed raster output requires raster_mode='exact'")
    static_roots = None if dynamic_roots else _roots_static(cfg.radius)
    dim = cfg.tile_dim
    rows_per_tile = dim * dim // tile_pallas.LANES
    # octave schedule always uses the planet's max_lod (reference passes
    # planet.max_lod, main.cpp:659); max_lod here only caps refinement depth
    max_oct = cfg.octaves_for_depth(max_lod)
    grid_mask = jnp.asarray(mesh.grid_uv_skirt(cfg.patch_verts)[3])

    sh = np.float32(cfg.coord_scale)
    sl = np.float32(np.float64(cfg.coord_scale) - np.float64(sh))

    def step(pool: dp.PoolState, cam_hi, cam_lo, view_proj, *roots):
        # ------------------------------------------------ 1. refinement
        if dynamic_roots:
            root_lo, root_hi, root_ch, root_cl, root_depth = roots
        else:
            root_lo, root_hi, root_ch, root_cl = static_roots
            root_depth = None
        ref = refine_device.refine_device(
            cam_hi, cam_lo, root_lo, root_hi, root_ch, root_cl,
            max_lod=max_lod, cap=cap, radius=cfg.radius,
            probe_fn_name=probe, root_depth=root_depth, transposed=True,
            quality=cfg.lod_quality)
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
        # materialize the permuted leaf arrays: without the barrier XLA
        # fuses the permutation gather into every downstream consumer and
        # recomputes it dozens of times (measured ~10x stage cost)
        perm = perm[:render_cap]
        # corners arrive lane-major (12, cap); the permutation is a lane
        # gather there (~10x cheaper than row gathers on the (cap, 4, 3)
        # T(4,128) layout), transposed back only at render_cap width
        q_lo, q_hi, c_hi_t, c_lo_t, depth = jax.lax.optimization_barrier(
            (ref.leaf_lo[perm], ref.leaf_hi[perm],
             ref.leaf_corners_hi[:, perm], ref.leaf_corners_lo[:, perm],
             ref.leaf_depth[perm]))
        c_hi = jnp.transpose(c_hi_t.reshape(4, 3, render_cap), (2, 0, 1))
        c_lo = jnp.transpose(c_lo_t.reshape(4, 3, render_cap), (2, 0, 1))
        overflow_render = n > render_cap
        n = jnp.minimum(n, render_cap)
        row = jnp.arange(render_cap)
        active = row < n

        def early(pool):
            z = jnp.zeros((height, width), _F32)
            return pool, DeviceFrame(
                image=z, depth=z, n_leaves=n, n_generated=jnp.int32(0),
                overflowed=ref.overflowed | overflow_render)

        if stop_after == "refine":
            return early(pool)

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
        # slots this frame's probe resolved (hits + crop parents) must not
        # be evicted by the batched allocator — under capacity pressure it
        # would clobber a tile a later gather reads (see dp.allocate).
        # Parents of PLANNED generations are protected too: if the
        # allocation spills (gen_cap/pool pressure) those quads fall back
        # to the parent crop below, so the parent tile must survive.
        pcap = pool.keys_lo.shape[0]
        protect = jnp.zeros((pcap + 1,), bool)
        protect = protect.at[jnp.where(found, slot, pcap)].set(True)
        protect = protect.at[jnp.where((use_crop | generate) & p_found,
                                       p_slot, pcap)].set(True)
        pool, tgt, n_over = dp.allocate(pool, generate, q_lo, q_hi,
                                        max_gen=gen_cap,
                                        protect=protect[:pcap])
        gen_ok = generate & (tgt >= 0)
        # generation spill (demand beyond gen_cap, or no evictable slot):
        # fall back to the parent crop exactly like the reference's
        # exhausted-budget path (main.cpp:208-237). Only a spilled quad
        # with NO cached parent is a real failure worth the overflow flag.
        gen_fail = generate & active & (tgt < 0)
        use_crop = use_crop | (gen_fail & p_found)
        n_over = jnp.sum((gen_fail & ~p_found).astype(_I32))

        if stop_after == "cache":
            return early(pool)

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
                       axis=-1).reshape(render_cap, 24),
             jnp.zeros((render_cap, 8), _F32)], axis=1)
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

        if stop_after == "generate":
            return early(pool)

        # ------------------------------------------------ 4. rect variants
        # (crop quadrant by child index, main.cpp:216-237, as blend-matrix
        # variant selectors)
        child = quadid.words_child_index(q_lo, q_hi)
        vx = jnp.where(use_crop, 1 + (child & 1), 0).astype(_I32)
        vy = jnp.where(use_crop, 1 + ((child >> 1) & 1), 0).astype(_I32)

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

        if stop_after == "uniforms":
            pool2, fr = early(pool)
            probe_sum = (jnp.sum(vx.astype(_F32)) + jnp.sum(skirt)
                         + jnp.sum(corners_rel) + jnp.sum(normals))
            return pool2, fr._replace(
                image=jnp.zeros((height, width), _F32) + probe_sum * 0.0)

        # ------------------------------------------------ 5. tess + raster
        pool_tiles = dp.gather(pool, slot)
        pool_tiles = jax.lax.optimization_barrier(pool_tiles)
        pv = vertex.tessellate_blend(corners_rel, normals, pool_tiles,
                                     vx, vy, skirt, view_proj, grid=dim)
        vshade = shade_mod.lambert(pv.normal)
        # barrier again: without it the raster's k*k cell supersampling
        # rematerializes the whole tessellation chain per sample offset
        pv, vshade = jax.lax.optimization_barrier((pv, vshade))
        if stop_after == "tess":
            pool2, fr = early(pool)
            return pool2, fr._replace(image=jnp.zeros((height, width), _F32)
                                      + jnp.sum(vshade) * 0.0)
        valid = active[:, None, None] & grid_mask[None, :, :]
        if stop_after == "geometry":
            pool = dp.end_frame(pool)
            meta = (n, jnp.sum(gen_ok.astype(_I32)),
                    ref.overflowed | overflow_render | (n_over > 0))
            return pool, (pv, vshade, valid, meta)
        if raster_out == "packed":
            packed, rc = coverage_pallas.raster_frame_auto(
                pv.clip, pv.normal, valid, width, height,
                cell_mask=mesh.cell_triangle_mask(), decode=False,
                far_w=cfg.far_plane, **(raster_cfg or {}))
            pool = dp.end_frame(pool)
            overflowed = (ref.overflowed | overflow_render | (n_over > 0)
                          | rc.overflowed)
            return pool, (packed, n, jnp.sum(gen_ok.astype(_I32)),
                          overflowed, q_lo, q_hi)
        if cfg.raster_mode == "exact":
            image, depthbuf, rc = coverage_pallas.raster_frame_auto(
                pv.clip, pv.normal, valid, width, height,
                cell_mask=mesh.cell_triangle_mask(), far_w=cfg.far_plane,
                **(raster_cfg or {}))
            overflow_render = overflow_render | rc.overflowed
        else:
            facing = jnp.sum(pv.world * pv.snormal, axis=-1) < 0.0
            c, s, v = splat.upsample_cells(pv.clip, vshade, valid & facing,
                                           cfg.raster_supersample)
            image, depthbuf = splat.splat_frame(c, s, v, width, height)

        pool = dp.end_frame(pool)
        frame = DeviceFrame(
            image=image, depth=depthbuf, n_leaves=n,
            n_generated=jnp.sum(gen_ok.astype(_I32)),
            overflowed=ref.overflowed | overflow_render | (n_over > 0))
        return pool, frame

    if not jit:
        return step
    return jax.jit(step, donate_argnums=0)


class DeviceRenderer:
    """Two-dispatch device frame: the fused geometry step (refine -> cache ->
    generate -> tessellate) in one jit, then the splat raster as its own jit.

    Splitting the raster out is a measured workaround: inside the mega-
    program XLA lowers the framebuffer scatter ~30x slower than the same
    scatter compiled standalone (~0.1 vs ~3 Gfragments/s on v5e).
    """

    def __init__(self, cfg: EngineConfig, width: int, height: int, *,
                 fetch: str = "f32", preview: int = 1, **kw):
        from planet_tpu.engine.planet import _raster_fn
        from planet_tpu.raster import coverage_pallas
        if fetch not in ("f32", "u8"):
            raise ValueError(fetch)
        if preview > 1 and fetch != "u8":
            raise ValueError("preview requires fetch='u8'")
        self.cfg = cfg
        self.width, self.height = int(width), int(height)
        self.fetch = fetch
        self.preview = int(preview)
        self._geom = build_device_render(cfg, self.width, self.height,
                                         stop_after="geometry", **kw)
        rcfg = kw.get("raster_cfg")
        if cfg.raster_mode == "exact":
            # the raster's own counters (class-cap/straddle overflow) must
            # surface in the frame — the shared _raster_fn drops them
            cmask = mesh.cell_triangle_mask()

            def raster(clip, vshade, normal, valid, world, snormal):
                image, depthbuf, rc = coverage_pallas.raster_frame_auto(
                    clip, normal, valid, self.width, self.height,
                    cell_mask=cmask, far_w=cfg.far_plane, **(rcfg or {}))
                return image, depthbuf, rc.overflowed
        else:
            splat_fn = _raster_fn(self.width, self.height,
                                  cfg.raster_supersample, False,
                                  cfg.raster_mode)

            def raster(clip, vshade, normal, valid, world, snormal):
                image, depthbuf = splat_fn(clip, vshade, normal, valid,
                                           world, snormal)
                return image, depthbuf, jnp.bool_(False)
        if fetch == "u8":
            # Quantize the shade image to u8 ON DEVICE, exactly as
            # io/png.write_png does host-side, so the per-frame fetch is
            # 4x smaller (1080p: 8.3 MB f32 -> 2.07 MB) and the PNG bytes
            # are bit-identical. The depth buffer stays f32 but is lazy —
            # only fetched if the caller touches frame.depth.
            # preview=k additionally returns a k x k-subsampled u8 preview
            # (VERDICT r4 #5): the interactive display fetches ~k^2 x
            # fewer bytes through the tunnel each frame while the full-res
            # u8 image stays on device, lazily fetched only on PNG dump —
            # the PNG path stays bit-exact.
            base_raster = raster
            pk = self.preview

            def raster(clip, vshade, normal, valid, world, snormal):
                image, depthbuf, ovf = base_raster(clip, vshade, normal,
                                                   valid, world, snormal)
                u8 = (jnp.clip(image, 0.0, 1.0) * np.float32(255.0)
                      + np.float32(0.5)).astype(jnp.uint8)
                prev = u8[::pk, ::pk] if pk > 1 else None
                return u8, depthbuf, ovf, prev
        else:
            base_raster2 = raster

            def raster(clip, vshade, normal, valid, world, snormal,
                       _b=base_raster2):
                image, depthbuf, ovf = _b(clip, vshade, normal, valid,
                                          world, snormal)
                return image, depthbuf, ovf, None

        self._raster = jax.jit(raster)

    def init_pool(self) -> dp.PoolState:
        return dp.init(self.cfg.cache_capacity, self.cfg.tile_dim)

    def render(self, pool, cam_hi, cam_lo, view_proj):
        pool, (pv, vshade, valid, meta) = self._geom(pool, cam_hi, cam_lo,
                                                     view_proj)
        image, depthbuf, r_ovf, prev = self._raster(
            pv.clip, vshade, pv.normal, valid, pv.world, pv.snormal)
        n, n_gen, overflowed = meta
        return pool, DeviceFrame(image=image, depth=depthbuf, n_leaves=n,
                                 n_generated=n_gen,
                                 overflowed=overflowed | r_ovf,
                                 preview=prev)


class PipelinedRenderer:
    """Two-frame pipeline over DeviceRenderer: frame N+1's geometry
    dispatch and frame N's host-side consumption overlap frame N's device
    raster.

    JAX dispatch is asynchronous, so submit() enqueues both device programs
    and returns immediately with the PREVIOUS frame, already fetched to
    host — the fetch (PNG encode, stats, tunnel transfer) runs while the
    current frame computes on device. Program order is unchanged (the pool
    threads through geometry dispatches in submission order), so pipelined
    output is bitwise the sequential output; only wall-clock overlap
    changes. This is the TPU analogue of the roadmap's "overlap frame N+1
    generation with frame N raster" — on one chip XLA executes programs
    in order, so the overlap won is host<->device, which through the axon
    tunnel is the dominant per-frame latency (measured in
    tools/bench_pipeline.py).
    """

    def __init__(self, renderer: DeviceRenderer, pool):
        self._r = renderer
        self._pool = pool
        self._pending = None

    @property
    def pool(self):
        return self._pool

    def submit(self, cam_hi, cam_lo, view_proj):
        """Enqueue one frame; returns the previous frame as host numpy
        (image, DeviceFrame) or None on the first call."""
        self._pool, frame = self._r.render(self._pool, cam_hi, cam_lo,
                                           view_proj)
        prev, self._pending = self._pending, frame
        if prev is None:
            return None
        return np.asarray(prev.preview if prev.preview is not None
                          else prev.image), prev

    def flush(self):
        """Drain the last in-flight frame."""
        prev, self._pending = self._pending, None
        if prev is None:
            return None
        return np.asarray(prev.preview if prev.preview is not None
                          else prev.image), prev
