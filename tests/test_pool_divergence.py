"""Terrain-driven pool-divergence audit (round-2 VERDICT item 6).

The host tile pool (cache/tile_pool.py) replays the reference's SEQUENTIAL
per-leaf policy — each resolve touches ticks and may evict mid-frame
(main.cpp:191-278, 247-266) — while the device pool (cache/device_pool.py)
is a BATCHED twin: one probe against start-of-frame state, one closed-form
budget plan, one K-way LRU allocation. This audit drives both pools with
identical per-frame leaf sequences from a REAL-TERRAIN refinement orbit
(ridged 6-octave probes move the working set every frame, unlike the
smooth-sphere audit in test_device_step.py) and pins down the equivalence
class:

* NO capacity pressure (pool never full): the two policies are exactly
  equivalent — identical per-leaf generate masks, identical crop choices,
  every frame of the orbit.
* CAPACITY pressure (working set > capacity): the batched allocator's
  eviction CHOICES may differ from the host's sequential churn (documented
  in cache/device_pool.py), but it must stay SAFE: a slot resolved by this
  frame's probe (hit or crop parent) is never clobbered before its gather
  — dp.allocate's protect mask; excess generations are dropped and
  COUNTED (n_over), never silent. Generation counts stay within a bounded
  band of the host's.

The content check renders each tile as a constant = float(leaf id low
word), so any mid-frame clobbering shows up as the wrong constant at
gather time.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from planet_tpu.cache import device_pool as dp
from planet_tpu.cache.tile_pool import TilePool
from planet_tpu.engine.config import EngineConfig
from planet_tpu.geom import quadid
from planet_tpu.lod import refine as lod_refine

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

CFG = EngineConfig()
DIM = 8            # tiny tiles: the audit is about keys/ticks, not texels


def _orbit_frames(max_lod, n_frames):
    """Per-frame DFS-ordered (ids, depths) from a DESCENDING real-terrain
    orbit: altitude 2.0 R -> 1.03 R, so earlier (coarser) frames' leaves
    are later frames' PARENTS — exactly how the reference's parent-crop
    fallback gets its parents into the cache (main.cpp:208-237)."""
    frames = []
    alts = np.geomspace(2.0, 1.03, n_frames)
    for t, alt in zip(np.linspace(0.0, 0.25, n_frames), alts):
        pos = alt * CFG.radius * np.array([np.sin(t), 0.2, -np.cos(t)])
        res = lod_refine.refine(pos, max_lod, CFG.radius)  # production terrain
        frames.append((res.ids, res.depths.astype(np.int64)))
    return frames


def _content(ids):
    """Deterministic per-id tile fill: float(lo word as uint32)."""
    lo = (np.asarray(ids, np.uint64) & np.uint64(0xFFFFFFFF)).astype(
        np.float32)
    return np.broadcast_to(lo[:, None, None], (len(lo), DIM, DIM)).copy()


def _device_frame(pool, ids, depths, budget, gen_cap):
    """One frame of the device pool, in device_step's exact op order
    (engine/device_step.py step(): probe -> parent probe -> plan ->
    allocate(protect) -> store -> touch -> gather -> end_frame). Returns
    (pool', generate mask, use_crop mask, n_over, gathered (L, DIM, DIM),
    expected (L,) content values)."""
    lo32, hi32 = quadid.to_words(np.asarray(ids, np.uint64))
    q_lo, q_hi = jnp.asarray(lo32), jnp.asarray(hi32)
    depth = jnp.asarray(depths, jnp.int32)

    slot, found = dp.probe(pool, q_lo, q_hi)
    p_lo, p_hi = quadid.words_parent(q_lo, q_hi)
    has_parent = depth > 0
    p_slot, p_found = dp.probe(pool, jnp.where(has_parent, p_lo, 0),
                               jnp.where(has_parent, p_hi, 0))
    p_found = p_found & has_parent
    generate, use_crop = dp.plan(found, p_found, depth, budget)

    cap = pool.keys_lo.shape[0]
    protect = jnp.zeros((cap + 1,), bool)
    protect = protect.at[jnp.where(found, slot, cap)].set(True)
    protect = protect.at[jnp.where(use_crop & p_found, p_slot,
                                   cap)].set(True)
    pool, tgt, n_over = dp.allocate(pool, generate, q_lo, q_hi,
                                    max_gen=gen_cap, protect=protect[:cap])
    gen_ok = generate & (tgt >= 0)

    tiles = jnp.asarray(_content(ids))
    pool = dp.store(pool, jnp.where(gen_ok, tgt, cap), gen_ok, tiles)

    slot = jnp.where(gen_ok, tgt, jnp.where(use_crop, p_slot, slot))
    pool = dp.touch(pool, slot, jnp.ones_like(found))
    gathered = dp.gather(pool, slot)
    pool = dp.end_frame(pool)

    parent = np.array([int(quadid.parent_of(np.uint64(q))) if d > 0 else 0
                       for q, d in zip(ids, np.asarray(depths))], np.uint64)
    exp_id = np.where(np.asarray(use_crop), parent,
                      np.asarray(ids, np.uint64))
    expected = (exp_id & np.uint64(0xFFFFFFFF)).astype(np.float32)
    return (pool, np.asarray(generate), np.asarray(use_crop),
            int(n_over), np.asarray(gathered), expected,
            np.asarray(gen_ok))


def _host_frame(hpool, ids, depths, budget):
    """One frame of the host pool; returns (generate mask, crop mask)."""
    resolved = hpool.resolve(np.asarray(ids, np.uint64), budget)
    gen = resolved.generate_mask
    if gen.any():
        hpool.store(resolved.slot[gen], jnp.asarray(_content(ids)[gen]))
    hpool.end_frame()
    crop = resolved.variant_x > 0
    return gen, crop


def test_pool_equivalence_terrain_orbit_no_pressure():
    """Ample capacity: per-leaf generate/crop decisions identical to the
    host policy on every frame of a real-terrain orbit, and every gathered
    tile carries exactly its leaf's (or crop parent's) content."""
    frames = _orbit_frames(max_lod=6, n_frames=6)
    budget = 24          # binds most frames -> crops exercised
    capacity = 4096      # never fills (working set ~hundreds of ids)
    pool = dp.init(capacity, DIM)
    hpool = TilePool(capacity=capacity, dim=DIM)

    saw_crop = saw_budget_bind = False
    for f, (ids, depths) in enumerate(frames):
        (pool, gen_d, crop_d, n_over, gathered, expected,
         gen_ok) = _device_frame(pool, ids, depths, budget, gen_cap=1024)
        gen_h, crop_h = _host_frame(hpool, ids, depths, budget)
        assert n_over == 0
        np.testing.assert_array_equal(
            gen_d, gen_h, err_msg=f"generate mask diverged at frame {f}")
        np.testing.assert_array_equal(
            crop_d, crop_h, err_msg=f"crop mask diverged at frame {f}")
        # content correctness: every gathered tile is the right tile
        np.testing.assert_array_equal(gathered[:, 0, 0], expected)
        saw_crop |= bool(crop_d.any())
        saw_budget_bind |= int(gen_d.sum()) >= budget
    assert saw_crop and saw_budget_bind   # the orbit exercised the policy


def test_pool_divergence_under_capacity_pressure():
    """Working set > capacity: eviction choices may part from the host's
    sequential churn, but the device pool must never clobber a slot this
    frame's probe resolved (content stays exact), must report dropped
    generations in n_over, and its per-frame generation counts must track
    the host's within a bounded band. Records where the two first part."""
    frames = _orbit_frames(max_lod=6, n_frames=6)
    n_leaves = min(len(ids) for ids, _ in frames)
    capacity = max(64, n_leaves // 2)     # < working set: churn every frame
    budget = 10**6                        # unbounded: isolate eviction
    pool = dp.init(capacity, DIM)
    hpool = TilePool(capacity=capacity, dim=DIM)

    first_divergence = None
    for f, (ids, depths) in enumerate(frames):
        (pool, gen_d, crop_d, n_over, gathered, expected,
         gen_ok) = _device_frame(pool, ids, depths, budget,
                                 gen_cap=capacity)
        gen_h, _ = _host_frame(hpool, ids, depths, budget)

        # SAFETY: every leaf whose generation was dropped (allocator ran
        # out of unprotected slots) is excluded; all others carry exactly
        # the content their id demands — no mid-frame clobbering
        ok_rows = ~(gen_d & ~gen_ok)
        np.testing.assert_array_equal(gathered[ok_rows, 0, 0],
                                      expected[ok_rows])
        # dropped generations are counted, never silent
        assert n_over == int((gen_d & ~gen_ok).sum())

        # BOUNDED divergence: both pools thrash (capacity < working set),
        # so generation counts are large for both; they may differ by
        # eviction-order churn but not wholesale
        nd, nh = int(gen_d.sum()), int(gen_h.sum())
        if f > 0:
            assert nd >= 0.5 * nh - 8, (f, nd, nh)
            assert nd <= 1.5 * nh + 8, (f, nd, nh)
        if first_divergence is None and nd != nh:
            first_divergence = f
    # under pressure the policies DO part (that's the documented class);
    # if this ever starts passing with zero divergence, tighten the doc
    assert first_divergence is not None


def test_pool_divergence_long_horizon_bounded():
    """A few hundred frames of sustained capacity pressure (VERDICT r4 #8):
    the device pool's generation counts must stay inside a CONCRETE band of
    the host's for the whole horizon — cumulative in [0.7, 0.9]x and every
    20-frame window within |dev - host| <= 0.4*host + 8 (tightened round 5
    to the measured stable curve: cumulative 0.78x, periodic, no drift —
    VERDICT r4 asked for bounds a drifted policy could NOT pass) — with the
    safety
    invariants (no mid-frame clobbering, dropped generations counted)
    holding on every frame. The measured 240-frame curve (device 0.78x the
    host's generations, hit rate 0.71 vs 0.62 — the batched LRU avoids the
    host's mid-frame self-eviction churn) lives in
    docs/POOL_DIVERGENCE.md (tools/audit_pool_divergence.py)."""
    n_frames = 96                       # CI-sized slice of the 240 audit
    frames = []
    for i in range(n_frames):
        t = 2.0 * np.pi * i / 240.0
        pos = 1.05 * CFG.radius * np.array([np.sin(t), 0.2, -np.cos(t)])
        res = lod_refine.refine(pos, 6, CFG.radius)
        frames.append((res.ids, res.depths.astype(np.int64)))

    med = int(np.median([len(ids) for ids, _ in frames]))
    capacity = max(64, (med * 3) // 5)
    budget = 10**6
    pool = dp.init(capacity, DIM)
    hpool = TilePool(capacity=capacity, dim=DIM)

    gd, gh = [], []
    for f, (ids, depths) in enumerate(frames):
        (pool, gen_d, crop_d, n_over, gathered, expected,
         gen_ok) = _device_frame(pool, ids, depths, budget,
                                 gen_cap=capacity)
        gen_h, _ = _host_frame(hpool, ids, depths, budget)
        ok_rows = ~(gen_d & ~gen_ok)
        np.testing.assert_array_equal(gathered[ok_rows, 0, 0],
                                      expected[ok_rows])
        assert n_over == int((gen_d & ~gen_ok).sum())
        gd.append(int(gen_d.sum()))
        gh.append(int(gen_h.sum()))

    gd, gh = np.array(gd, float), np.array(gh, float)
    # skip the identical cold-start frame for the band
    cum_ratio = gd[1:].sum() / gh[1:].sum()
    assert 0.7 <= cum_ratio <= 0.9, cum_ratio
    w = 20
    rd = np.convolve(gd[1:], np.ones(w), "valid")
    rh = np.convolve(gh[1:], np.ones(w), "valid")
    assert (np.abs(rd - rh) <= 0.4 * rh + 8).all(), \
        np.max(np.abs(rd - rh) - 0.4 * rh)
