"""Fully fused heightmap-tile kernel: quad corners -> 32x32 height tiles.

One Pallas launch performs the reference's entire GenerateHeightMap hot loop
(main.cpp:123-151 + the terrain functor 823-832) for a batch of tiles:

  per texel: overscan UV (x-1)/(dim-3) -> planar bilinear corner blend in
  double-float -> multi-octave ridged/fBm -> amplitude

Layout: each 32x32 tile is 1024 texels = 8 rows of 128 lanes; a block
processes `block_rows/8` tiles. Per-row corner payload (24 f32: 4 corners x
3 axes x hi/lo) rides in a second VMEM operand; texel coordinates come from
iota, so the kernel reads 128 bytes/row of geometry and writes 512 bytes/row
of heights — entirely compute-bound at full lane utilization (the v1
composition computed points in XLA at 32-lane layout and lost ~4x).

The corners are pre-scaled by the terrain coord_scale on the host (f64,
exact to DF precision), so bilinear blending happens directly in noise
space; amplitude is applied in-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from planet_tpu.ops.kernels import perlin_pallas as pk

_F32 = jnp.float32
LANES = 128


def _df_add(ah, al, bh, bl):
    s, e = pk._two_sum(ah, bh)
    t, f = pk._two_sum(al, bl)
    e = e + t
    s, e = pk._quick_two_sum(s, e)
    e = e + f
    return pk._quick_two_sum(s, e)


def _df_sub(ah, al, bh, bl):
    return _df_add(ah, al, -bh, -bl)


_SPLIT = np.float32(4097.0)


def _df_mul(ah, al, bh, bl):
    p = ah * bh
    ca = _SPLIT * ah
    xhi = ca - (ca - ah)
    xlo = ah - xhi
    cb = _SPLIT * bh
    yhi = cb - (cb - bh)
    ylo = bh - yhi
    err = ((xhi * yhi - p) + xhi * ylo + xlo * yhi) + xlo * ylo
    err = err + (ah * bl + al * bh)
    return pk._quick_two_sum(p, err)


def _make_tile_kernel(kind: str, octaves: int, lacunarity: float,
                      gain: float, amplitude: float, dim: int,
                      rows_per_tile: int, per_row_octaves: bool = False,
                      skip_dead: bool = False):
    div = np.float64(1.0) / np.float64(dim - 3)
    div_hi = np.float32(div)
    div_lo = np.float32(div - np.float64(div_hi))
    amp = np.float32(amplitude)
    lanes_per_row = dim * dim // rows_per_tile     # texels per row = LANES

    def kernel(*refs):
        # skip_dead: a leading SMEM per-block liveness flag (any tile in
        # the block has octaves > 0). The fused frame step launches a
        # fixed gen_cap of tile slots every frame while the steady-state
        # demand is ~0-40 tiles — dead blocks write zeros and skip the
        # whole octave unroll (measured ~1 ms of the static LOD frame).
        if skip_dead:
            live_ref, cref, ct_ref, pt_ref, out_ref = refs
        else:
            cref, ct_ref, pt_ref, out_ref = refs
        if skip_dead:
            @pl.when(live_ref[pl.program_id(0)] == 0)
            def _zero():
                out_ref[:] = jnp.zeros_like(out_ref)

            body = pl.when(live_ref[pl.program_id(0)] != 0)
        else:
            body = lambda f: f()

        @body
        def _run():
            _tile_block(cref, ct_ref, pt_ref, out_ref)

    def _tile_block(cref, ct_ref, pt_ref, out_ref):
        br = out_ref.shape[0]
        # texel coordinates from iota: within-tile texel = (r % rpt)*128 + lane
        r = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANES), 1)
        wt = (r % rows_per_tile) * lanes_per_row + lane
        x = wt % dim
        y = wt // dim

        # u = (x-1)*div, v = (y-1)*div as double-float (exact int minus one,
        # then one DF constant multiply)
        xm1 = (x - 1).astype(_F32)
        ym1 = (y - 1).astype(_F32)
        uh, ul = pk._df_scale(xm1, jnp.zeros_like(xm1), div_hi, div_lo)
        vh, vl = pk._df_scale(ym1, jnp.zeros_like(ym1), div_hi, div_lo)

        coords = []
        for k in range(3):
            base = k * 8

            def c(j, w):
                col = cref[:, base + 2 * j + w][:, None]     # (br, 1)
                return jnp.broadcast_to(col, (br, LANES))

            p0h, p0l = c(0, 0), c(0, 1)
            p1h, p1l = c(1, 0), c(1, 1)
            p2h, p2l = c(2, 0), c(2, 1)
            p3h, p3l = c(3, 0), c(3, 1)
            v0h, v0l = _df_sub(p1h, p1l, p0h, p0l)
            v1h, v1l = _df_sub(p3h, p3l, p2h, p2l)
            t0h, t0l = _df_mul(v0h, v0l, uh, ul)
            a_h, a_l = _df_add(p0h, p0l, t0h, t0l)
            t1h, t1l = _df_mul(v1h, v1l, uh, ul)
            b_h, b_l = _df_add(p2h, p2l, t1h, t1l)
            dvh, dvl = _df_sub(b_h, b_l, a_h, a_l)
            t2h, t2l = _df_mul(dvh, dvl, vh, vl)
            ph, plo = _df_add(a_h, a_l, t2h, t2l)
            coords += [ph, plo]

        oct_mask_fn = None
        if per_row_octaves:
            # payload column 24 carries this row's octave count (f32; the
            # unrolled loop masks octave i where i >= count)
            oct_row = jnp.broadcast_to(cref[:, 24][:, None], (br, LANES))
            oct_mask_fn = lambda i: np.float32(i) < oct_row

        value = pk.accumulate_octaves(
            kind, octaves, lacunarity, gain, ct_ref, pt_ref, *coords,
            oct_mask_fn=oct_mask_fn)
        out_ref[:] = value * amp

    return kernel


@functools.lru_cache(maxsize=None)
def _build_tile_call(kind: str, octaves: int, lacunarity: float, gain: float,
                     amplitude: float, dim: int, n_tiles: int,
                     tiles_per_block: int, interpret: bool,
                     per_row_octaves: bool = False,
                     skip_dead: bool = False):
    texels = dim * dim
    assert texels % LANES == 0
    rows_per_tile = texels // LANES
    block_rows = tiles_per_block * rows_per_tile
    rows_total = n_tiles * rows_per_tile
    assert rows_total % block_rows == 0
    kernel = _make_tile_kernel(kind, octaves, lacunarity, gain, amplitude,
                               dim, rows_per_tile, per_row_octaves,
                               skip_dead)
    grid = rows_total // block_rows
    payload_w = 32 if per_row_octaves else 24
    data_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    corner_spec = pl.BlockSpec((block_rows, payload_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((8, LANES), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    live_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if skip_dead
                  else [])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        grid=(grid,),
        in_specs=live_specs + [corner_spec] + [table_spec] * 2,
        out_specs=data_spec,
        interpret=interpret,
    )


def build_payload_host(corners_hi, corners_lo, n_pad: int, dim: int = 32
                       ) -> np.ndarray:
    """Host-side (numpy) per-row corner payload: (n_pad*rows_per_tile, 24)
    f32, layout [axis*8 + corner*2 + word]. Building this on the host saves
    ~25% kernel wall time vs constructing it inside the jit (repeat /
    transpose ops on device)."""
    ch = np.asarray(corners_hi, np.float32)
    cl = np.asarray(corners_lo, np.float32)
    n = ch.shape[0]
    if n_pad != n:
        ch = np.concatenate([ch, np.repeat(ch[-1:], n_pad - n, 0)])
        cl = np.concatenate([cl, np.repeat(cl[-1:], n_pad - n, 0)])
    per_tile = np.stack(
        [ch.transpose(0, 2, 1), cl.transpose(0, 2, 1)], axis=-1
    ).reshape(n_pad, 24)
    rows_per_tile = dim * dim // LANES
    return np.repeat(per_tile, rows_per_tile, axis=0)


def tiles_from_payload(rows, n_tiles_padded: int, *, kind="ridged",
                       octaves=6, lacunarity=2.0, gain=0.55,
                       amplitude=8848.0, dim=32, tiles_per_block=32,
                       interpret=None):
    """Run the fused tile kernel on a prebuilt per-row payload (see
    build_payload_host). rows: (n_tiles_padded * rows_per_tile, 24) f32."""
    if interpret is None:
        interpret = not pk._is_tpu()
    call = _build_tile_call(kind, int(octaves), float(lacunarity),
                            float(np.float32(gain)),
                            float(np.float32(amplitude)), int(dim),
                            int(n_tiles_padded), int(tiles_per_block),
                            bool(interpret))
    out = call(rows, *pk._tables_for_kernel())
    return out.reshape(n_tiles_padded, dim, dim)


def tiles_mixed_octaves(rows32, octaves_rows, n_tiles_padded: int, *,
                        kind="ridged", max_octaves=18, lacunarity=2.0,
                        gain=0.55, amplitude=8848.0, dim=32,
                        tiles_per_block=16, interpret=None):
    """Mixed-octave tile batch in one launch: rows32 is a (rows, 32) payload
    (first 24 columns as build_payload_host; column 24 ignored here) and
    octaves_rows a (rows,) f32 per-row octave count that is written into
    column 24. Used by the fully-fused device frame step, where leaves of
    different depths generate together (reference octave schedule,
    main.cpp:827).

    Default 16 tiles/block: the deep 18-octave unroll at (256, 128) blocks
    exceeds the 16 MB VMEM budget (measured 16.04M); (128, 128) fits."""
    if interpret is None:
        interpret = not pk._is_tpu()
    rows32 = rows32.at[:, 24].set(octaves_rows)
    # per-block liveness (SMEM flags): a block whose tiles all have
    # octaves == 0 writes zeros and skips the octave unroll — the frame
    # step launches gen_cap slots while steady-state demand is ~0-40
    rows_per_tile = dim * dim // LANES
    block_rows = tiles_per_block * rows_per_tile
    n_blocks = (n_tiles_padded * rows_per_tile) // block_rows
    blk_live = (jnp.max(octaves_rows.reshape(n_blocks, -1), axis=1)
                > 0.0).astype(jnp.int32)
    call = _build_tile_call(kind, int(max_octaves), float(lacunarity),
                            float(np.float32(gain)),
                            float(np.float32(amplitude)), int(dim),
                            int(n_tiles_padded), int(tiles_per_block),
                            bool(interpret), per_row_octaves=True,
                            skip_dead=True)
    out = call(blk_live, rows32, *pk._tables_for_kernel())
    return out.reshape(n_tiles_padded, dim, dim)


def generate_tiles(corners_hi, corners_lo, *, kind="ridged", octaves=6,
                   lacunarity=2.0, gain=0.55, amplitude=8848.0, dim=32,
                   tiles_per_block=32, interpret=None):
    """corners_hi/lo: (N, 4, 3) f32 DF pairs of CO-ORD-SCALED quad corners
    (host pre-multiplies by coord_scale in f64). Returns (N, dim, dim) f32
    height tiles. N is padded internally to a whole number of blocks.

    Traceable (payload built with jnp when inside jit); callers with host
    corners should prefer build_payload_host + tiles_from_payload."""
    n = int(corners_hi.shape[0])
    n_pad = max(tiles_per_block, -(-n // tiles_per_block) * tiles_per_block)
    rows_per_tile = dim * dim // LANES

    def payload(a):
        a = jnp.asarray(a, _F32)
        if n_pad != n:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (n_pad - n, 4, 3))])
        return a

    ch, cl = payload(corners_hi), payload(corners_lo)
    per_tile = jnp.stack(
        [ch.transpose(0, 2, 1), cl.transpose(0, 2, 1)], axis=-1
    ).reshape(n_pad, 24)
    rows = jnp.repeat(per_tile, rows_per_tile, axis=0)

    out = tiles_from_payload(rows, n_pad, kind=kind, octaves=octaves,
                             lacunarity=lacunarity, gain=gain,
                             amplitude=amplitude, dim=dim,
                             tiles_per_block=tiles_per_block,
                             interpret=interpret)
    return out[:n]
