"""Multi-chip sharded heightfield step (BASELINE config 5 skeleton).

Sharding layout: the (6, H, W) cube-sphere heightfield is sharded by ROWS
over one mesh axis — each chip owns a (6, H/n, W) strip of every face.
Collectives used (all over ICI within a slice):

* `lax.ppermute` — halo exchange of the one-texel boundary rows between
  row-neighbor chips, so central-difference normals at strip seams see the
  neighbor's true heights (the TPU generalization of the reference's
  overscan border, main.cpp:135-148).
* `lax.psum` — frame statistics reduction (texel count, height checksum),
  the reference's title-bar stats (main.cpp:1030-1037) as a collective.

At the global top/bottom face edges the halo clamps to the local row
(matching CLAMP_TO_EDGE sampling; face-seam-exact normals use overscanned
point grids instead, see parallel.facemesh.face_grid_points).
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
from planet_tpu.raster import shade as shade_mod

_F32 = jnp.float32


def make_mesh(n_devices: Optional[int] = None, axis: str = "rows",
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def sharded_field_step(mesh: Mesh, *, octaves: int = 6, kind: str = "ridged",
                       xyscale: float = 1000.0, use_pallas: bool = False,
                       interpret: Optional[bool] = None, axis: str = "rows"):
    """Builds the jitted sharded step: (6, H, W) DF point components in
    (row-sharded), -> (heights, shade, stats) with halo exchange + psum.

    use_pallas=False by default so the same program runs on CPU meshes
    (driver dry-run) and TPU; flip on for real multi-chip runs.
    """
    n = mesh.shape[axis]

    def step(px_hi, px_lo, py_hi, py_lo, pz_hi, pz_lo):
        from planet_tpu.nums.df import DF
        h = heightfield.heights_df(
            DF(px_hi, px_lo), DF(py_hi, py_lo), DF(pz_hi, pz_lo),
            kind=kind, octaves=octaves, use_pallas=use_pallas,
            interpret=interpret)                     # (6, H/n, W) local

        # --- halo exchange: one boundary row in each direction over ICI
        idx = lax.axis_index(axis)
        down_links = [(i, i + 1) for i in range(n - 1)]   # my bottom -> next
        up_links = [(i, i - 1) for i in range(1, n)]      # my top -> prev
        from_above = lax.ppermute(h[:, -1:, :], axis, down_links)
        from_below = lax.ppermute(h[:, :1, :], axis, up_links)
        top_halo = jnp.where(idx == 0, h[:, :1, :], from_above)
        bot_halo = jnp.where(idx == n - 1, h[:, -1:, :], from_below)
        h_rows = jnp.concatenate([top_halo, h, bot_halo], axis=1)
        # x halo: clamp locally (rows are complete in-shard)
        h_pad = jnp.concatenate(
            [h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]], axis=2)

        normal = heightfield.normals_from_heights(h_pad, xyscale)
        sh = shade_mod.lambert(normal)

        # --- collective stats
        texels = lax.psum(jnp.float32(h.size), axis)
        checksum = lax.psum(jnp.sum(h, dtype=jnp.float32), axis)
        return h, sh, jnp.stack([texels, checksum])

    specs = P(None, axis, None)
    mapped = shard_map(step, mesh=mesh,
                       in_specs=(specs,) * 6,
                       out_specs=(specs, specs, P()))
    return jax.jit(mapped)


def unsharded_field_step(*, octaves: int = 6, kind: str = "ridged",
                         xyscale: float = 1000.0, use_pallas: bool = False,
                         interpret: Optional[bool] = None):
    """Single-device twin of sharded_field_step for seam-consistency tests:
    sharded output must equal this bitwise (same op order, clamp halos)."""

    def step(px_hi, px_lo, py_hi, py_lo, pz_hi, pz_lo):
        from planet_tpu.nums.df import DF
        h = heightfield.heights_df(
            DF(px_hi, px_lo), DF(py_hi, py_lo), DF(pz_hi, pz_lo),
            kind=kind, octaves=octaves, use_pallas=use_pallas,
            interpret=interpret)
        h_rows = jnp.concatenate([h[:, :1, :], h, h[:, -1:, :]], axis=1)
        h_pad = jnp.concatenate(
            [h_rows[:, :, :1], h_rows, h_rows[:, :, -1:]], axis=2)
        normal = heightfield.normals_from_heights(h_pad, xyscale)
        sh = shade_mod.lambert(normal)
        texels = jnp.float32(h.size)
        checksum = jnp.sum(h, dtype=jnp.float32)
        return h, sh, jnp.stack([texels, checksum])

    return jax.jit(step)
