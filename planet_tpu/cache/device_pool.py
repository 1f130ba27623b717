"""Fully device-resident tile cache — the jit-able twin of cache.tile_pool.

The reference's open-addressed CPU hash (MapFind linear probe over 1499
slots, LRU eviction by stalest render tick, main.cpp:75-104, 247-266)
becomes fixed-shape array ops that live entirely under jit for the
streaming/sharded path (SURVEY.md section 2 "HeightMapCache" row):

* probe     — (L, CAP) vectorized key compare + argmax (no hash chains: the
              whole table is one VPU sweep, which at CAP=1024 is cheaper
              than emulating the probe sequence)
* plan      — the per-frame budget policy as a lax.scan over leaves in
              order (the running generation count is a sequential carry —
              exactly the reference's `generations_per_frame_left`)
* allocate  — K slots for K generations in one shot: free slots first, then
              stalest occupied (sort by (occupied, tick)), the batched
              equivalent of K successive LRU evictions
* touch/store/gather — tick refresh, tile scatter, tile gather

State is a NamedTuple pytree; every op returns a new state (functional, so
it flows through jit/shard_map/donate).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_I32 = jnp.int32


class PoolState(NamedTuple):
    keys_lo: jnp.ndarray    # (CAP,) int32 (0, 0) = empty
    keys_hi: jnp.ndarray    # (CAP,) int32 — valid ids have bit 63 (sign) set
    tick: jnp.ndarray       # (CAP,) int32 last-used render tick
    tiles: jnp.ndarray      # (CAP, dim, dim) f32
    now: jnp.ndarray        # () int32 render tick


def init(capacity: int, dim: int) -> PoolState:
    return PoolState(
        keys_lo=jnp.zeros((capacity,), _I32),
        keys_hi=jnp.zeros((capacity,), _I32),
        tick=jnp.zeros((capacity,), _I32),
        tiles=jnp.zeros((capacity, dim, dim), jnp.float32),
        now=jnp.int32(0),
    )


def probe(state: PoolState, q_lo, q_hi) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L,) id words -> (slot, found). Empty-key queries return found=False."""
    eq = (q_lo[:, None] == state.keys_lo[None, :]) \
        & (q_hi[:, None] == state.keys_hi[None, :])       # (L, CAP)
    found = eq.any(axis=1) & (q_hi < 0)                   # valid bit = sign
    slot = jnp.argmax(eq, axis=1).astype(_I32)
    return slot, found


def plan(found, parent_found, depth, budget: int):
    """The reference GetHeightMapForQuad policy over one frame's leaves in
    order (main.cpp:191-278): returns (generate, use_crop) masks.

    The sequential recurrence (each generation decrements the budget for
    later leaves; misses without a cached parent generate even over budget)
    has a closed form, because the generation count is nondecreasing: until
    the count first reaches the budget EVERY miss generates, so the count
    equals the running miss count; after that, every croppable miss is
    rejected forever. Hence

        generate_i = miss_i & (no_parent_i | misses_before_i < budget)

    — one exclusive cumsum instead of a lax.scan (which measured ~0.45 ms
    per element on TPU and made the device frame step O(cap) sequential).
    """
    miss = ~found
    can_crop = parent_found & (depth > 0)
    misses_before = jnp.cumsum(miss.astype(_I32)) - miss.astype(_I32)
    generate = miss & (~can_crop | (misses_before < budget))
    use_crop = miss & ~generate
    return generate, use_crop


def allocate(state: PoolState, generate, q_lo, q_hi, max_gen: int,
             protect=None):
    """Assign slots to the first max_gen generating leaves: free slots
    first, then stalest occupied (batched LRU). Returns (state', slots (L,),
    n_over) where leaves beyond max_gen keep slot -1 (caller must mask).

    protect: optional (CAP,) bool — slots this frame's probe already
    resolved (hits and crop-parents). The host pool touches a slot's tick
    the moment its leaf resolves, so a later same-frame eviction can never
    reuse it; this batched allocator evicts against START-of-frame ticks,
    so under capacity pressure (working set > capacity, every tick equal)
    it would otherwise evict — and clobber — a slot a hit leaf is about to
    gather from (verified by tests/test_pool_divergence.py). Protected
    slots sort after every other slot; if generations exceed the free +
    unprotected supply the excess is dropped and counted in n_over (never
    silent), exactly like gen_cap overflow."""
    cap = state.keys_lo.shape[0]
    occupied = state.keys_hi < 0
    # eviction priority: free slots (key 0) before occupied by staleness
    order_key = jnp.where(occupied, state.tick, jnp.int32(-2**31))
    if protect is not None:
        order_key = jnp.where(protect, jnp.int32(2**31 - 1), order_key)
    slot_order = jnp.argsort(order_key).astype(_I32)       # (CAP,)

    gen_rank = jnp.cumsum(generate.astype(_I32)) - 1       # rank among gens
    n_alloc = (cap if protect is None
               else cap - jnp.sum(protect.astype(_I32)))
    ok = generate & (gen_rank < max_gen) & (gen_rank < n_alloc)
    tgt = jnp.where(ok, slot_order[jnp.clip(gen_rank, 0, cap - 1)], -1)

    # write new keys/ticks at allocated slots (dump row for unused)
    w = jnp.where(ok, tgt, cap)
    keys_lo = jnp.zeros((cap + 1,), _I32).at[:cap].set(state.keys_lo)
    keys_hi = jnp.zeros((cap + 1,), _I32).at[:cap].set(state.keys_hi)
    tick = jnp.zeros((cap + 1,), _I32).at[:cap].set(state.tick)
    keys_lo = keys_lo.at[w].set(q_lo)
    keys_hi = keys_hi.at[w].set(q_hi)
    tick = tick.at[w].set(state.now)
    n_over = jnp.sum((generate & ~ok).astype(_I32))
    return state._replace(keys_lo=keys_lo[:cap], keys_hi=keys_hi[:cap],
                          tick=tick[:cap]), tgt, n_over


def touch(state: PoolState, slots, mask) -> PoolState:
    cap = state.tick.shape[0]
    w = jnp.where(mask, slots, cap)
    tick = jnp.zeros((cap + 1,), _I32).at[:cap].set(state.tick)
    tick = tick.at[w].set(state.now)
    return state._replace(tick=tick[:cap])


def store(state: PoolState, slots, mask, new_tiles) -> PoolState:
    cap = state.tiles.shape[0]
    w = jnp.where(mask, slots, cap)
    pad = jnp.zeros((cap + 1,) + state.tiles.shape[1:], state.tiles.dtype)
    tiles = pad.at[:cap].set(state.tiles).at[w].set(new_tiles)[:cap]
    return state._replace(tiles=tiles)


def gather(state: PoolState, slots) -> jnp.ndarray:
    return jnp.take(state.tiles, jnp.clip(slots, 0, None), axis=0)


def end_frame(state: PoolState) -> PoolState:
    return state._replace(now=state.now + 1)
