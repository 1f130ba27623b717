"""Sharded streaming-LOD engine — BASELINE config 5's quadtree path.

The fused device frame step (refine -> cache -> generate -> tessellate ->
exact raster; engine/device_step.py) runs on every chip of a
`jax.sharding.Mesh` over its own SUBTREES of the planet quadtree, and the
chips composite one global frame with collectives:

* Work decomposition: the 24 depth-1 quads (6 faces x 4 children,
  reference root seeding + first split, main.cpp:604-624/581-594) are
  round-robin assigned to chips in DFS order — 24 divides evenly over
  1/2/3/4/6/8/12/24 chips. Refinement of disjoint subtrees is embarrassingly
  parallel (ProcessQuad's split decision depends only on (quad, camera),
  main.cpp:546-571), so per-chip leaf sets are exactly the unsharded leaf
  set restricted to that chip's subtrees.
* Tile cache: each chip keeps a private device pool (cache/device_pool.py)
  for its subtrees — tiles never migrate, so there is no cache-coherence
  traffic. The generation budget (main.cpp:653) applies PER CHIP: a
  v5e-8 streams 8x the reference's tiles per frame by construction.
* Seam continuity across chips needs NO height exchange: tiles carry the
  reference's one-texel overscan border (u=(x-1)/(dim-3),
  main.cpp:135-148), which is a pure function of quad geometry — the
  locally generated halo is bit-identical on every chip that computes it.
  (The collective-halo variant for non-recomputable data lives in
  parallel/sharded.py's face-seam exchange.)
* Compositing: the exact-coverage rasterizer's framebuffer packs
  (21-bit quantized depth, 10-bit shade) int32 keys whose elementwise MIN
  is exactly the LEQUAL depth test (raster/coverage.py), so the global
  frame is one `lax.pmin` over per-chip framebuffers — a distributed
  z-buffer composite riding ICI. Frame stats reduce with `lax.psum`
  (the reference's title-bar quartet, main.cpp:1030-1037).

Single-chip equivalence: pmin is associative and commutative and every
other stage is per-leaf, so the composited frame equals the single-device
step over all 24 roots BITWISE (asserted on the fake 8-device CPU mesh in
tests/test_sharded_lod.py) whenever no chip overruns its generation budget
or caps; budget overruns change which tiles regenerate first, exactly like
the reference's frame-order dependence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from planet_tpu.cache import device_pool as dp
from planet_tpu.engine import device_step
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import quadid
from planet_tpu.lod import refine_device
from planet_tpu.raster import coverage

_I32 = jnp.int32
_F32 = jnp.float32

N_SUBTREES = 24


def subtree_roots(radius: float):
    """The 24 depth-1 quads in DFS order: (lo, hi (24,) i32 id words,
    ch, cl (24, 4, 3) f32 DF corners, depth (24,) i32). Corners come from
    the device refiner's own DF subdivision of the 6 root faces, so a
    sharded refine from these roots replays the unsharded refine's exact
    arithmetic from its first split onward."""
    root_lo, root_hi, root_ch, root_cl = device_step._roots_static(radius)
    kids_h, kids_l = jax.jit(
        lambda h, l: refine_device._subdivide(h, l, radius))(root_ch, root_cl)
    ids = np.array([quadid.make_root(f) for f in range(6)], np.uint64)
    child_ids = np.array([[quadid.make_child(q, c) for c in range(4)]
                          for q in ids], np.uint64).reshape(-1)
    lo, hi = quadid.to_words(child_ids)
    ch = np.asarray(kids_h).reshape(N_SUBTREES, 4, 3)
    cl = np.asarray(kids_l).reshape(N_SUBTREES, 4, 3)
    depth = np.ones((N_SUBTREES,), np.int32)
    return (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(ch),
            jnp.asarray(cl), jnp.asarray(depth))


def init_pools(n_shards: int, capacity: int, dim: int) -> dp.PoolState:
    """Stacked per-chip pools: every array gets a leading shard axis folded
    into dim 0 ((n*CAP, ...) keys/ticks/tiles, (n,) ticks-now) so one
    PoolState pytree shards over the mesh with PartitionSpec on axis 0."""
    return dp.PoolState(
        keys_lo=jnp.zeros((n_shards * capacity,), _I32),
        keys_hi=jnp.zeros((n_shards * capacity,), _I32),
        tick=jnp.zeros((n_shards * capacity,), _I32),
        tiles=jnp.zeros((n_shards * capacity, dim, dim), _F32),
        now=jnp.zeros((n_shards,), _I32),
    )


def build_sharded_render(cfg: EngineConfig, mesh: Mesh, width: int,
                         height: int, *, axis="quads",
                         cap: int = 4096, render_cap: int = 512,
                         gen_cap: int = 256, max_lod: int = None,
                         probe: str = "ridged6", interpret: bool = None):
    """Returns (roots, jitted fn(pools, cam_hi, cam_lo, view_proj, *roots)
    -> (pools', DeviceFrame, (leaf_lo, leaf_hi, leaf_counts, gen_counts))).

    pools from init_pools(n, cfg.cache_capacity, cfg.tile_dim); roots from
    subtree_roots(cfg.radius). The returned leaf arrays are the per-chip
    DFS-ordered rendered leaf ids ((n*render_cap,) words + (n,) counts,
    plus the per-chip tile-generation counts) for seam/equivalence and
    budget auditing; DeviceFrame holds the composited image and psum'd
    stats. Caps (cap/render_cap/gen_cap/budget) are PER CHIP.

    axis: one mesh axis name, or a TUPLE of names for multi-slice (DCN)
    meshes — subtrees shard over the FLATTENED axis product (refine/cache/
    generate/raster touch no collective, so the fabric is irrelevant) and
    the packed-framebuffer pmin composite reduces the inner (ICI) axis
    first, then crosses DCN once per frame (docs/multislice.md,
    "Streaming-LOD path"). Results are bitwise the 1-axis (and single-
    device) frame: pmin/psum are associative-commutative and every other
    stage is per-subtree.
    """
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    n = int(np.prod([mesh.shape[a] for a in axes]))
    axis = axes if len(axes) > 1 else axes[0]
    if N_SUBTREES % n != 0:
        raise ValueError(f"{n} devices do not divide {N_SUBTREES} subtrees")

    base = device_step.build_device_render(
        cfg, width, height, cap=cap, render_cap=render_cap, gen_cap=gen_cap,
        max_lod=max_lod, probe=probe, interpret=interpret,
        dynamic_roots=True, raster_out="packed", jit=False)

    def step(pool, cam_hi, cam_lo, view_proj, r_lo, r_hi, r_ch, r_cl, r_d):
        local = pool._replace(now=pool.now[0])
        local, (packed, n_leaves, n_gen, overflowed, q_lo, q_hi) = base(
            local, cam_hi, cam_lo, view_proj, r_lo, r_hi, r_ch, r_cl, r_d)

        packed = lax.pmin(packed, axis)            # distributed z-composite
        image, depth = coverage.decode_packed(packed)
        frame = device_step.DeviceFrame(
            image=image, depth=depth,
            n_leaves=lax.psum(n_leaves, axis),
            n_generated=lax.psum(n_gen, axis),
            overflowed=lax.psum(overflowed.astype(_I32), axis) > 0)
        pool = local._replace(now=local.now[None])
        return pool, frame, (q_lo, q_hi, n_leaves[None], n_gen[None])

    pool_spec = dp.PoolState(
        keys_lo=P(axis), keys_hi=P(axis), tick=P(axis),
        tiles=P(axis, None, None), now=P(axis))
    frame_spec = device_step.DeviceFrame(
        image=P(None, None), depth=P(None, None),
        n_leaves=P(), n_generated=P(), overflowed=P())
    mapped = shard_map(
        step, mesh=mesh,
        in_specs=(pool_spec, P(), P(), P(None, None),
                  P(axis), P(axis), P(axis, None, None),
                  P(axis, None, None), P(axis)),
        out_specs=(pool_spec, frame_spec,
                   (P(axis), P(axis), P(axis), P(axis))),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=0)
