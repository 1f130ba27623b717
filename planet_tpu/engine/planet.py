"""The planet engine: per-frame orchestration (reference RenderPlanet,
main.cpp:600-683, and InitPlanet, main.cpp:280-516).

A frame is:
  1. host: LOD refinement against the camera (lod.refine — exact reference
     leaf sets in DFS order),
  2. host: tile-cache resolution with the generation budget + parent-crop
     fallback (cache.tile_pool — reference GetHeightMapForQuad policy),
  3. device: batched tile generation, grouped by octave count so each Pallas
     noise launch runs with a static octave unroll,
  4. device: one fused tessellate+shade program over all leaves (the entire
     per-quad GL draw loop of the reference becomes one XLA program),
  5. stats (the reference's title-bar quartet + texel throughput).

Host<->device traffic per frame: leaf corners down (f32/f64 pairs, ~100 KB),
nothing back except optional framebuffer reads — tiles live in the device
pool between frames.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from planet_tpu.cache.tile_pool import TilePool
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import camera as cam_mod
from planet_tpu.lod import refine as lod_refine
from planet_tpu.nums import df as dfm
from planet_tpu.ops import heightmap
from planet_tpu.ops import perlin
from planet_tpu.ops.kernels import tile_pallas
from planet_tpu.raster import coverage
from planet_tpu.raster import shade as shade_mod
from planet_tpu.tess import mesh, vertex


@dataclasses.dataclass
class FrameStats:
    """The reference's live metrics (main.cpp:1030-1037) + texels/s."""

    frametime_ms: float
    fps: float
    tris: int
    quads: int
    tiles_generated: int
    texels_generated: int


@dataclasses.dataclass
class FrameOutput:
    vertices: vertex.PatchVertices    # (L_pad, G, G, ...) device arrays
    vertex_shade: jnp.ndarray         # (L_pad, G, G)
    leaf_ids: np.ndarray              # (L,) uint64
    leaf_depths: np.ndarray           # (L,) int32
    n_leaves: int
    stats: FrameStats


def _pad_to(n: int, m: int) -> int:
    """Next power-of-two multiple bucket >= n, floored at m — bounds the
    number of distinct jit shapes (each shape is one compile) to
    O(log(max_n)) instead of O(max_n / m)."""
    size = m
    while size < n:
        size *= 2
    return size


@functools.lru_cache(maxsize=None)
def _gen_tiles_fn(octaves: int, dim: int, lacunarity: float, gain: float,
                  coord_scale: float, amplitude: float, use_pallas: bool):
    """Jitted tile generator for one octave group.

    use_pallas: the fused tile kernel (corners pre-scaled by coord_scale on
    the host; bilinear + noise + amplitude in one launch). Otherwise the XLA
    composition (CPU tests)."""

    if use_pallas:
        def fn(rows, n_pad):                # prebuilt host payload
            return tile_pallas.tiles_from_payload(
                rows, n_pad, kind="ridged", octaves=octaves,
                lacunarity=lacunarity, gain=np.float32(gain),
                amplitude=amplitude, dim=dim)
        return jax.jit(fn, static_argnums=1)

    def fn(c_hi, c_lo):                     # pre-scaled (N, 4, 3) f32 pairs
        def one(ch, cl):
            return heightmap.tile_points_df(ch, cl, dim)
        px, py, pz = jax.vmap(one)(c_hi, c_lo)    # DF (N, dim, dim) each
        h = perlin.ridged_df(px, py, pz, lacunarity=lacunarity,
                             gain=np.float32(gain), octaves=octaves)
        return h * np.float32(amplitude)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _tess_shade_fn():
    def fn(pool_tiles, slots, corners_rel, normals, variant_x, variant_y,
           skirt, view_proj):
        tiles = jnp.take(pool_tiles, slots, axis=0)
        pv = vertex.tessellate_blend(corners_rel, normals, tiles,
                                     variant_x, variant_y, skirt, view_proj)
        return pv, shade_mod.lambert(pv.normal)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _raster_fn(width: int, height: int, supersample: int, wireframe: bool,
               mode: str = "splat", raster_cfg: tuple = None,
               far_w: float = None):
    # raster_cfg: hashable ((key, value), ...) capacity overrides for the
    # exact raster (lru_cache requires hashable args)
    raster_cfg = dict(raster_cfg) if raster_cfg else None
    """fn(clip, vshade, normal, valid, world, snormal) -> (image, depth).

    mode="exact": exact triangle coverage (raster/coverage.py; screen-space
    winding cull = the reference's GL_CW front-face cull, main.cpp:811-816);
    wireframe (key P, main.cpp:980-985) keeps the exact rasterizer and
    selects the edge-distance fragments in the same fragment engines.
    mode="splat": depth-tested vertex splats (wireframe via cell edges)."""
    if mode == "exact":
        from planet_tpu.raster import coverage_pallas

        cmask = mesh.cell_triangle_mask()

        def fn(clip, vshade, normal, valid, world, snormal):
            image, depthbuf, _ = coverage_pallas.raster_frame_auto(
                clip, normal, valid, width, height, cell_mask=cmask,
                wireframe=wireframe, far_w=far_w, **(raster_cfg or {}))
            return image, depthbuf

        return jax.jit(fn)

    from planet_tpu.raster import splat

    # wireframe selects cell-EDGE fragments, which only exist at k >= 2
    # (splat.upsample_cells is a passthrough at k = 1)
    supersample = max(supersample, 2) if wireframe else supersample

    def fn(clip, vshade, normal, valid, world, snormal):
        # backface culling: the reference enables CW front-face culling
        # (main.cpp:811-816); for a sphere, vertices whose outward normal
        # points away from the camera are on the far side.
        facing = jnp.sum(world * snormal, axis=-1) < 0.0
        valid = valid & facing
        c, s, v = splat.upsample_cells(clip, vshade, valid, supersample,
                                       wireframe=wireframe)
        return splat.splat_frame(c, s, v, width, height)

    return jax.jit(fn)


class PlanetEngine:
    """Stateful engine: tile pool + render tick (the only mutable state
    besides the camera, which the caller owns — reference Planet struct,
    main.cpp:161-181)."""

    def __init__(self, config: EngineConfig = EngineConfig(),
                 height_fn=None):
        self.config = config
        self.pool = TilePool(capacity=config.cache_capacity,
                             dim=config.tile_dim)
        self._height_fn = height_fn     # host probe override (tests)
        c = config
        pf = cam_mod.proj_factor_from_fovy(np.deg2rad(c.fovy_deg))
        self.proj = cam_mod.perspective_lh(
            pf, c.window_w / c.window_h, c.near_plane, c.far_plane)
        # runtime toggles (reference keys P / K, main.cpp:980-994)
        self.wireframe = False
        self.skirts = True
        # failure detection: count of non-finite tiles seen (config gate)
        self.nonfinite_tiles = 0
        # probe-height memo (pure function of quad id) — see lod.refine
        self._probe_cache: dict = {}

    # ----------------------------------------------------------------- frame

    def frame(self, camera: cam_mod.Camera) -> FrameOutput:
        t0 = time.perf_counter()
        c = self.config

        rot = cam_mod.camera_rotation(camera)
        view_proj = (self.proj @ cam_mod.view_from_rotation(rot)).astype(np.float32)

        # 1. refinement (host, exact reference leaf sets in DFS order)
        if len(self._probe_cache) > 1_000_000:
            self._probe_cache.clear()
        res = lod_refine.refine(camera.position, c.max_lod, c.radius,
                                height_fn=self._height_fn,
                                probe_cache=self._probe_cache,
                                quality=c.lod_quality)
        n = len(res.ids)

        # 2. cache policy
        resolved = self.pool.resolve(res.ids, c.generations_per_frame)

        # 3. generation, grouped by octave count (static unroll per launch)
        texels = 0
        gen_idx = np.nonzero(resolved.generate_mask)[0]
        if len(gen_idx):
            depths = res.depths[gen_idx]
            octs = np.array([c.octaves_for_depth(d) for d in depths])
            # pallas only on TPU: interpret mode on CPU is test-only slow
            use_pallas = c.use_pallas and jax.default_backend() == "tpu"
            for o in np.unique(octs):
                sel = gen_idx[octs == o]
                # host f64 pre-scale into noise space (exact to DF precision)
                corners = res.corners[sel] * c.coord_scale  # (K, 4, 3) f64
                k_pad = _pad_to(len(sel), c.gen_pad)
                chn, cln = dfm.from_f64_np(corners)
                gen = _gen_tiles_fn(
                    int(o), c.tile_dim, c.lacunarity, float(np.float32(c.gain)),
                    c.coord_scale, c.amplitude, use_pallas)
                if use_pallas:
                    rows = tile_pallas.build_payload_host(
                        chn, cln, k_pad, c.tile_dim)
                    tiles = gen(rows, k_pad)
                else:
                    pad = k_pad - len(sel)
                    if pad:
                        chn = np.concatenate(
                            [chn, np.repeat(chn[-1:], pad, 0)], 0)
                        cln = np.concatenate(
                            [cln, np.repeat(cln[-1:], pad, 0)], 0)
                    tiles = gen(chn, cln)
                if c.check_finite:
                    # step-level NaN/inf guard (failure detection; the
                    # reference's closest analogue is its per-frame GL error
                    # poll, main.cpp:1100-1115)
                    bad = int(jnp.sum(
                        ~jnp.isfinite(tiles[:len(sel)]).all(axis=(1, 2))))
                    if bad:
                        self.nonfinite_tiles += bad
                        import logging
                        logging.getLogger(__name__).error(
                            "%d non-finite tiles generated this frame", bad)
                self.pool.store(resolved.slot[sel], tiles[:len(sel)])
                texels += len(sel) * c.tile_dim * c.tile_dim

        # 4. tessellate + shade (one fused launch over all leaves, padded)
        l_pad = _pad_to(n, c.leaf_pad)

        def pad_rows(a, value=None):
            if len(a) == l_pad:
                return a
            reps = np.repeat(a[-1:] if value is None else value,
                             l_pad - len(a), 0)
            return np.concatenate([a, reps], 0)

        corners_rel = pad_rows(
            (res.corners - camera.position[None, None, :]).astype(np.float32))
        normals = pad_rows(
            lod_refine._normalize_rows(res.corners).astype(np.float32))
        skirt_scale = 1.0 if self.skirts else 0.0   # key-K toggle analogue
        skirt = pad_rows(np.array(
            [c.skirt_size_for_depth(d) * skirt_scale for d in res.depths],
            np.float32))
        slots = pad_rows(resolved.slot.astype(np.int32))
        vx = pad_rows(resolved.variant_x)
        vy = pad_rows(resolved.variant_y)

        pv, vshade = _tess_shade_fn()(
            self.pool.tiles, jnp.asarray(slots), jnp.asarray(corners_rel),
            jnp.asarray(normals), jnp.asarray(vx), jnp.asarray(vy),
            jnp.asarray(skirt), jnp.asarray(view_proj))

        self.pool.end_frame()

        dt = time.perf_counter() - t0
        stats = FrameStats(
            frametime_ms=dt * 1e3,
            fps=1.0 / max(dt, 1e-9),
            tris=n * mesh.interior_triangle_count(c.patch_verts),
            quads=n,
            tiles_generated=int(resolved.generated),
            texels_generated=texels,
        )
        return FrameOutput(vertices=pv, vertex_shade=vshade,
                           leaf_ids=res.ids, leaf_depths=res.depths,
                           n_leaves=n, stats=stats)

    def render(self, camera: cam_mod.Camera,
               width: Optional[int] = None, height: Optional[int] = None):
        """Full frame: tessellate + depth-tested splat raster. Returns
        (FrameOutput, image (H, W) f32, depth (H, W) f32)."""
        c = self.config
        width = width or c.window_w
        height = height or c.window_h
        out = self.frame(camera)
        l_pad = out.vertices.clip.shape[0]
        _, _, _, grid_mask = mesh.grid_uv_skirt(c.patch_verts)
        row_ok = (np.arange(l_pad) < out.n_leaves)
        valid = jnp.asarray(row_ok[:, None, None] & grid_mask[None, :, :])
        image, depth = _raster_fn(width, height, c.raster_supersample,
                                  self.wireframe, c.raster_mode,
                                  far_w=c.far_plane)(
            out.vertices.clip, out.vertex_shade, out.vertices.normal, valid,
            out.vertices.world, out.vertices.snormal)
        return out, image, depth
