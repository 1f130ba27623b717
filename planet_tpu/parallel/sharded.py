"""Multi-chip sharded heightfield step (BASELINE config 5 field path).

Sharding layout: the (6, H, W) cube-sphere heightfield is sharded by ROWS
over one mesh axis — each chip owns a (6, H/n, W) strip of every face.
Collectives used (all over ICI within a slice):

* `lax.ppermute` — halo exchange of the one-texel boundary rows between
  row-neighbor chips, so central-difference normals at strip seams see the
  neighbor's true heights (the TPU generalization of the reference's
  overscan border, main.cpp:135-148).
* `lax.psum` — (a) assembly of the global face-edge ring (the 6x4 boundary
  lines, ~6*4*H*4 bytes — tiny next to the field) from each chip's
  disjoint contributions, so every chip can take its face-SEAM halos from
  the true neighbor-face texels routed by the static cube adjacency table
  (parallel.facemesh.edge_adjacency — the reference's overscan-border
  semantics, main.cpp:135-148/197-199, generalized across chips);
  (b) frame statistics reduction (texel count, height checksum), the
  reference's title-bar stats (main.cpp:1030-1037) as a collective.

seam="exchange" (default) performs that face-seam exchange; seam="clamp"
keeps the historical CLAMP_TO_EDGE behavior (one-sided derivatives at face
edges) for comparison and for non-square fields.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from planet_tpu.models import heightfield
from planet_tpu.parallel import facemesh
from planet_tpu.raster import shade as shade_mod

_F32 = jnp.float32


def _seam_lines(ring):
    """(6, 4, H) global edge ring -> per-face halo lines, each indexed along
    the OWNING face's edge direction (edge 0/2: u increasing = columns;
    edge 1/3: v increasing = rows): (top, bot, left, right), each (6, H).

    The halo texel across a face seam is the neighbor face's boundary texel
    (its first interior line), so both faces' central differences at the
    seam read the same height pair."""
    nbr_f, nbr_e, rev = facemesh.edge_adjacency()
    out = []
    for e in (facemesh.EDGE_V0, facemesh.EDGE_V1,
              facemesh.EDGE_U0, facemesh.EDGE_U1):
        lines = []
        for f in range(6):
            line = ring[int(nbr_f[f, e]), int(nbr_e[f, e])]
            if rev[f, e]:
                line = line[::-1]
            lines.append(line)
        out.append(jnp.stack(lines))
    return tuple(out)                        # top, bot, left, right


def make_mesh(n_devices: Optional[int] = None, axis: str = "rows",
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_slices: int, rows_per_slice: int, axis: str = "rows",
                 devices=None) -> Mesh:
    """(n_slices, rows_per_slice) mesh with axes ("slice", axis): the outer
    "slice" axis is the DCN-spanning pod/slice dimension, the inner axis the
    ICI row dimension. See docs/multislice.md for the collective layout.

    When devices expose `slice_index` (real multi-slice TPU), devices are
    grouped by it so each inner row provably lies within one ICI slice —
    the whole point of the 2-axis layout is that the bulk per-row halo
    ppermutes ride ICI; a device order mixing slices within a row would be
    numerically correct but route them over DCN. Raises if the slices
    cannot be tiled evenly onto the requested shape."""
    devs = list(devices) if devices is not None else jax.devices()
    n = n_slices * rows_per_slice
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    slice_ids = [getattr(d, "slice_index", None) for d in devs]
    if all(s is not None for s in slice_ids) and len(set(slice_ids)) > 1:
        by_slice = {}
        for d, s in zip(devs, slice_ids):
            by_slice.setdefault(s, []).append(d)
        rows = []
        for s in sorted(by_slice):
            group = by_slice[s]
            if len(group) % rows_per_slice:
                raise ValueError(
                    f"slice {s} has {len(group)} devices; cannot tile rows "
                    f"of {rows_per_slice} within one ICI slice")
            rows.extend(group[i:i + rows_per_slice]
                        for i in range(0, len(group), rows_per_slice))
        if len(rows) < n_slices:
            raise ValueError(f"need {n_slices} mesh rows, have {len(rows)}")
        arr = np.array(rows[:n_slices])
    else:
        arr = np.array(devs[:n]).reshape(n_slices, rows_per_slice)
    return Mesh(arr, ("slice", axis))


def sharded_field_step(mesh: Mesh, *, octaves: int = 6, kind: str = "ridged",
                       xyscale: float = 1000.0, use_pallas: bool = False,
                       interpret: Optional[bool] = None, axis: str = "rows",
                       seam: str = "exchange"):
    """Builds the jitted sharded step: (6, H, W) DF point components in
    (row-sharded), -> (heights, shade, stats) with halo exchange + psum.

    use_pallas=False by default so the same program runs on CPU meshes
    (driver dry-run) and TPU; flip on for real multi-chip runs.
    seam: "exchange" routes face-seam halos from the neighbor face via the
    adjacency table (requires H == W); "clamp" keeps CLAMP_TO_EDGE.
    """
    n = mesh.shape[axis]
    if seam not in ("exchange", "clamp"):
        raise ValueError(seam)
    # Optional multi-slice (DCN) dimension: a mesh with a leading "slice"
    # axis shards FACES over slices (docs/multislice.md). Bulk row halos
    # then stay on intra-slice ICI; only the tiny 6x4 face-edge ring psum
    # and the frame stats cross the DCN boundary.
    n_slices = mesh.shape.get("slice", 1)
    red_axes = ("slice", axis) if n_slices > 1 else axis
    if 6 % n_slices:
        raise ValueError(f"slice axis must divide 6 faces: {n_slices}")
    fl = 6 // n_slices                               # local faces per slice

    def step(px_hi, px_lo, py_hi, py_lo, pz_hi, pz_lo):
        from planet_tpu.nums.df import DF
        h = heightfield.heights_df(
            DF(px_hi, px_lo), DF(py_hi, py_lo), DF(pz_hi, pz_lo),
            kind=kind, octaves=octaves, use_pallas=use_pallas,
            interpret=interpret)                     # (6/S, H/n, W) local
        hl, w = h.shape[1], h.shape[2]
        hg = hl * n                                  # global rows
        f0 = (jnp.int32(0) if n_slices == 1 else
              (lax.axis_index("slice") * fl).astype(jnp.int32))

        # --- strip halos: one boundary row each way between row neighbors
        idx = lax.axis_index(axis)
        down_links = [(i, i + 1) for i in range(n - 1)]   # my bottom -> next
        up_links = [(i, i - 1) for i in range(1, n)]      # my top -> prev
        from_above = lax.ppermute(h[:, -1:, :], axis, down_links)
        from_below = lax.ppermute(h[:, :1, :], axis, up_links)

        if seam == "exchange":
            if hg != w:
                raise ValueError("seam='exchange' needs square faces")
            # --- global face-edge ring from disjoint contributions
            r0 = (idx * hl).astype(jnp.int32)
            zero = jnp.int32(0)
            ring_l = jnp.zeros((fl, 4, hg), _F32)
            ring_l = lax.dynamic_update_slice(
                ring_l, h[:, :, -1][:, None, :], (zero, jnp.int32(1), r0))
            ring_l = lax.dynamic_update_slice(
                ring_l, h[:, :, 0][:, None, :], (zero, jnp.int32(3), r0))
            is_top = (idx == 0).astype(_F32)
            is_bot = (idx == n - 1).astype(_F32)
            ring_l = ring_l.at[:, 0, :].add(h[:, 0, :] * is_top)
            ring_l = ring_l.at[:, 2, :].add(h[:, -1, :] * is_bot)
            if n_slices == 1:
                ring = ring_l
            else:
                ring = lax.dynamic_update_slice(
                    jnp.zeros((6, 4, hg), _F32), ring_l, (f0, zero, zero))
            ring = lax.psum(ring, red_axes)

            top_all, bot_all, left, right = _seam_lines(ring)
            if n_slices > 1:                 # this slice's local faces
                top_all = lax.dynamic_slice(top_all, (f0, zero), (fl, hg))
                bot_all = lax.dynamic_slice(bot_all, (f0, zero), (fl, hg))
            top_halo = jnp.where(idx == 0, top_all[:, None, :], from_above)
            bot_halo = jnp.where(idx == n - 1, bot_all[:, None, :],
                                 from_below)
            h_rows = jnp.concatenate([top_halo, h, bot_halo], axis=1)
            lcol = lax.dynamic_slice(left, (f0, r0), (fl, hl))
            rcol = lax.dynamic_slice(right, (f0, r0), (fl, hl))
            # pad halo columns to the extended rows (corner texels are never
            # read by the central-difference normal; clamp them)
            lc = jnp.concatenate([lcol[:, :1], lcol, lcol[:, -1:]], axis=1)
            rc = jnp.concatenate([rcol[:, :1], rcol, rcol[:, -1:]], axis=1)
            h_pad = jnp.concatenate(
                [lc[:, :, None], h_rows, rc[:, :, None]], axis=2)
        else:
            top_halo = jnp.where(idx == 0, h[:, :1, :], from_above)
            bot_halo = jnp.where(idx == n - 1, h[:, -1:, :], from_below)
            h_rows = jnp.concatenate([top_halo, h, bot_halo], axis=1)
            h_pad = jnp.concatenate(
                [h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]], axis=2)

        normal = heightfield.normals_from_heights(h_pad, xyscale)
        sh = shade_mod.lambert(normal)

        # --- collective stats
        texels = lax.psum(jnp.float32(h.size), red_axes)
        checksum = lax.psum(jnp.sum(h, dtype=jnp.float32), red_axes)
        return h, sh, jnp.stack([texels, checksum])

    specs = P(None if n_slices == 1 else "slice", axis, None)
    mapped = shard_map(step, mesh=mesh,
                       in_specs=(specs,) * 6,
                       out_specs=(specs, specs, P()))
    return jax.jit(mapped)


def sharded_field_step_fused(mesh: Mesh, n: int, radius: float, *,
                             octaves: int = 6, kind: str = "ridged",
                             axis: str = "rows",
                             interpret: Optional[bool] = None):
    """Config-5 FAST path: every chip runs the fused field kernel
    (ops.kernels.field_pallas.field_cube_strip) on its own row strip —
    in-kernel iota coordinates, noise, halo, normals, shade, nothing but
    the outputs in HBM. The strip's halo rows RECOMPUTE the neighbor
    chip's values from absolute coordinates (bit-identical; tested), so
    NO ppermute crosses chips at all — only the psum'd frame stats.
    Face-edge seams clamp (the fused kernel's seam='clamp' policy; the
    exchange-seam variant is sharded_field_step).

    Returns jitted fn(tick) -> (heights (6, n, n) row-sharded, shade,
    stats). Measured 2.20 Gtexels/s/chip on the (6, 1024, 8192) v5e-8
    shard vs 1.07 for the XLA-composed sharded program (the materialized
    DF point grids are the difference) — tools/bench_config5_field.py."""
    from planet_tpu.ops.kernels import field_pallas

    nsh = mesh.shape[axis]
    if n % nsh:
        raise ValueError(f"{nsh} chips do not divide {n} rows")
    rows = n // nsh

    def step(tick):
        idx = lax.axis_index(axis)
        h, sh = field_pallas.field_cube_strip(
            n, radius, idx.astype(jnp.int32) * rows, rows, kind=kind,
            octaves=octaves, interpret=interpret)
        h = h + tick * jnp.float32(0.0)        # live traced input
        texels = lax.psum(jnp.float32(h.size), axis)
        checksum = lax.psum(jnp.sum(h, dtype=jnp.float32), axis)
        return h, sh, jnp.stack([texels, checksum])

    spec = P(None, axis, None)
    # check_vma=False: the pallas_call inside doesn't annotate its outputs'
    # mesh-axis variance (same setting as build_sharded_render)
    mapped = shard_map(step, mesh=mesh, in_specs=(P(),),
                       out_specs=(spec, spec, P()), check_vma=False)
    return jax.jit(mapped)


def unsharded_field_step(*, octaves: int = 6, kind: str = "ridged",
                         xyscale: float = 1000.0, use_pallas: bool = False,
                         interpret: Optional[bool] = None,
                         seam: str = "exchange"):
    """Single-device twin of sharded_field_step for seam-consistency tests:
    sharded output must equal this bitwise (same halo values, same op
    order)."""
    if seam not in ("exchange", "clamp"):
        raise ValueError(seam)

    def step(px_hi, px_lo, py_hi, py_lo, pz_hi, pz_lo):
        from planet_tpu.nums.df import DF
        h = heightfield.heights_df(
            DF(px_hi, px_lo), DF(py_hi, py_lo), DF(pz_hi, pz_lo),
            kind=kind, octaves=octaves, use_pallas=use_pallas,
            interpret=interpret)
        if seam == "exchange":
            if h.shape[1] != h.shape[2]:
                raise ValueError("seam='exchange' needs square faces")
            ring = jnp.stack(
                [h[:, 0, :], h[:, :, -1], h[:, -1, :], h[:, :, 0]], axis=1)
            top, bot, left, right = _seam_lines(ring)
            h_rows = jnp.concatenate(
                [top[:, None, :], h, bot[:, None, :]], axis=1)
            lc = jnp.concatenate([left[:, :1], left, left[:, -1:]], axis=1)
            rc = jnp.concatenate([right[:, :1], right, right[:, -1:]],
                                 axis=1)
            h_pad = jnp.concatenate(
                [lc[:, :, None], h_rows, rc[:, :, None]], axis=2)
        else:
            h_rows = jnp.concatenate([h[:, :1, :], h, h[:, -1:, :]], axis=1)
            h_pad = jnp.concatenate(
                [h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]], axis=2)
        normal = heightfield.normals_from_heights(h_pad, xyscale)
        sh = shade_mod.lambert(normal)
        texels = jnp.float32(h.size)
        checksum = jnp.sum(h, dtype=jnp.float32)
        return h, sh, jnp.stack([texels, checksum])

    return jax.jit(step)
