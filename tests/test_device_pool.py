"""Device pool vs the host TilePool on randomized frame workloads: the same
hit/generate/crop decisions and LRU survivors must emerge."""

import numpy as np
import jax.numpy as jnp

from planet_tpu.cache import device_pool as dp
from planet_tpu.cache.tile_pool import TilePool
from planet_tpu.geom import quadid


def _words(ids):
    lo, hi = quadid.to_words(np.asarray(ids, np.uint64))
    return jnp.asarray(lo), jnp.asarray(hi)


def _is_ancestor(a, q):
    """True iff a is a strict ancestor of q."""
    a, q = np.uint64(a), np.uint64(q)
    da, dq = int(quadid.depth_of(a)), int(quadid.depth_of(q))
    if da >= dq:
        return False
    while dq > da:
        q = quadid.parent_of(q)
        dq -= 1
    return int(q) == int(a)


def _parents(ids):
    out = []
    for q in ids:
        q = np.uint64(q)
        out.append(quadid.parent_of(q) if quadid.depth_of(q) > 0 else np.uint64(0))
    return np.array(out, np.uint64)


def test_device_pool_matches_host_policy():
    """Policy equivalence in the no-eviction regime (cap > universe): the
    batched device plan must reproduce the host's hit/generate/crop masks
    exactly. (Under mid-frame eviction pressure the two legitimately
    diverge: the sequential host — like the reference — may evict an id
    early in a frame and regenerate it later the same frame, while the
    batched plan keeps the cached tile; see test_device_pool_lru_eviction
    for eviction-order semantics.)"""
    rng = np.random.default_rng(7)
    cap, dim, budget = 64, 8, 4

    host = TilePool(capacity=cap, dim=dim)
    dev = dp.init(cap, dim)

    # a pool of candidate ids at mixed depths
    universe = []
    for f in range(6):
        universe.append(quadid.from_path(f, []))
        for c in range(4):
            universe.append(quadid.from_path(f, [c]))
            universe.append(quadid.from_path(f, [c, (c + 1) % 4]))
    universe = np.array(universe, np.uint64)

    for frame in range(12):
        k = int(rng.integers(4, 20))
        ids = rng.choice(universe, size=k, replace=False)
        # real frames are quadtree LEAF sets: no id is an ancestor of
        # another (the host pool resolves parents inserted earlier in the
        # same frame, which cannot happen for a proper leaf list)
        ids = np.array([q for q in ids
                        if not any(_is_ancestor(a, q) for a in ids)],
                       np.uint64)
        k = len(ids)
        depths = np.array([int(quadid.depth_of(q)) for q in ids])

        # --- host
        res = host.resolve(ids, budget)

        # --- device
        q_lo, q_hi = _words(ids)
        p_lo, p_hi = _words(_parents(ids))
        slot, found = dp.probe(dev, q_lo, q_hi)
        _, p_found = dp.probe(dev, p_lo, p_hi)
        gen, crop = dp.plan(found, p_found, jnp.asarray(depths), budget)

        np.testing.assert_array_equal(np.asarray(gen), res.generate_mask)
        # crop exactly where host used parent rects (pixel_size crop value)
        crop_host = np.isclose(res.pixel_size[:, 0],
                               ((dim / 2 - 1) / (dim - 3)) / dim)
        np.testing.assert_array_equal(np.asarray(crop), crop_host)

        dev, tgt, n_over = dp.allocate(dev, gen, q_lo, q_hi, max_gen=cap)
        assert int(n_over) == 0
        # store dummy tiles = id lows broadcast
        tiles = jnp.broadcast_to(
            q_lo[:, None, None].astype(jnp.float32), (k, dim, dim))
        dev = dp.store(dev, tgt, gen, tiles)
        # touch hits and crop-parents
        dev = dp.touch(dev, slot, found)
        p_slot, _ = dp.probe(dev, p_lo, p_hi)
        dev = dp.touch(dev, p_slot, crop)

        host.end_frame()
        dev = dp.end_frame(dev)

        # same cached id set after every frame
        host_ids = set(host.slot_of.keys())
        occ = np.asarray(dev.keys_hi) < 0
        dev_ids = set(int(q) for q in quadid.from_words(
            np.asarray(dev.keys_lo)[occ], np.asarray(dev.keys_hi)[occ]))
        assert dev_ids == host_ids, frame

    # --- gathered tiles carry the right contents for hits
    ids = rng.choice(np.array(sorted(host.slot_of.keys()), np.uint64), 5,
                     replace=False)
    q_lo, q_hi = _words(ids)
    slot, found = dp.probe(dev, q_lo, q_hi)
    assert bool(found.all())
    got = np.asarray(dp.gather(dev, slot))[:, 0, 0]
    np.testing.assert_array_equal(got, np.asarray(q_lo, np.float32))


def test_device_pool_lru_eviction():
    cap, dim = 4, 8
    dev = dp.init(cap, dim)
    ids = [quadid.from_path(0, [c]) for c in range(4)] \
        + [quadid.from_path(1, [0]), quadid.from_path(1, [1])]

    def insert(dev, subset):
        q_lo, q_hi = _words(np.array(subset, np.uint64))
        slot, found = dp.probe(dev, q_lo, q_hi)
        gen = ~found
        dev, tgt, _ = dp.allocate(dev, gen, q_lo, q_hi, max_gen=cap)
        dev = dp.touch(dev, slot, found)
        return dp.end_frame(dev)

    dev = insert(dev, ids[:4])      # fill
    dev = insert(dev, ids[2:4])     # refresh 2, 3
    dev = insert(dev, ids[4:6])     # must evict 0, 1 (stalest)
    occ = np.asarray(dev.keys_hi) < 0
    live = set(int(q) for q in quadid.from_words(
        np.asarray(dev.keys_lo)[occ], np.asarray(dev.keys_hi)[occ]))
    assert live == {int(ids[2]), int(ids[3]), int(ids[4]), int(ids[5])}
