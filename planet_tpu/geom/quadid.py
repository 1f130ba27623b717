"""Quadtree node addressing (reference QuadID, main.cpp:19-65).

The canonical encoding is a uint64 with the reference's exact bit layout —
it keys the tile cache and orders refinement deterministically:

    bit  63     valid flag (zero id is invalid)
    bits 60-62  root face (0-5)
    bits 55-59  depth (5 bits)
    bits 0-54   child path, 2 bits per level; the child taken at depth d
                is stored at bits 2*(d-1)

Host-side we use numpy uint64 directly. Device-side TPU has no native int64
(x64 changes global dtypes and s64 is emulated), so ids travel as two int32
words (lo = bits 0-31, hi = bits 32-63) and all manipulations are vectorized
32-bit shifts/masks — see the *_words functions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

VALID_BIT = np.uint64(1) << np.uint64(63)
_DEPTH_SHIFT = np.uint64(55)
_ROOT_SHIFT = np.uint64(60)
_DEPTH_UNIT = np.uint64(1) << _DEPTH_SHIFT

MAX_DEPTH_REPRESENTABLE = 27  # 54 path bits / 2


# ------------------------------------------------------------- host (numpy)


def make_root(face) -> np.uint64:
    face = np.uint64(face)
    return VALID_BIT | (face << _ROOT_SHIFT)


def depth_of(qid) -> np.uint64:
    return (np.uint64(qid) >> _DEPTH_SHIFT) & np.uint64(31)


def root_of(qid) -> np.uint64:
    return (np.uint64(qid) >> _ROOT_SHIFT) & np.uint64(7)


def make_child(qid, child_index) -> np.uint64:
    qid = np.uint64(qid)
    d = depth_of(qid)
    return (qid + _DEPTH_UNIT) | (np.uint64(child_index) << (np.uint64(2) * d))


def child_index_of(qid) -> np.uint64:
    qid = np.uint64(qid)
    d = depth_of(qid)
    return (qid >> (np.uint64(2) * (d - np.uint64(1)))) & np.uint64(3)


def parent_of(qid) -> np.uint64:
    qid = np.uint64(qid)
    d = depth_of(qid)
    mask = ~(np.uint64(3) << (np.uint64(2) * (d - np.uint64(1))))
    return (qid - _DEPTH_UNIT) & mask


def path_digits(qid):
    """Child indices along the path, root-first: list of ints, len == depth."""
    qid = np.uint64(qid)
    d = int(depth_of(qid))
    return [int((qid >> np.uint64(2 * i)) & np.uint64(3)) for i in range(d)]


def from_path(face, digits) -> np.uint64:
    q = make_root(face)
    for c in digits:
        q = make_child(q, c)
    return q


def dfs_key(qid) -> np.uint64:
    """Sort key reproducing the reference's DFS leaf emission order
    (ProcessQuad recurses children 0,1,2,3 — main.cpp:591-594): pad the path
    with zeros to full depth and compare lexicographically, most-significant
    digit first. Leaves of a proper quadtree are never ancestors of each
    other, so plain integer order on the padded path is the DFS order."""
    qid = np.uint64(qid)
    d = int(depth_of(qid))
    key = np.uint64(root_of(qid)) << np.uint64(2 * MAX_DEPTH_REPRESENTABLE)
    for i, c in enumerate(path_digits(qid)):
        key |= np.uint64(c) << np.uint64(2 * (MAX_DEPTH_REPRESENTABLE - 1 - i))
    return key


# ----------------------------------------------------------- device (int32)


def to_words(qid):
    """uint64 (array ok) -> (lo, hi) int32 words for device residency."""
    qid = np.asarray(qid, np.uint64)
    lo = (qid & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    hi = (qid >> np.uint64(32)).astype(np.uint32).view(np.int32)
    return lo, hi


def from_words(lo, hi):
    lo = np.asarray(lo, np.int32).view(np.uint32).astype(np.uint64)
    hi = np.asarray(hi, np.int32).view(np.uint32).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


_HI_DEPTH_SHIFT = 55 - 32   # depth field within the hi word
_HI_ROOT_SHIFT = 60 - 32
_HI_DEPTH_UNIT = np.int32(1 << _HI_DEPTH_SHIFT)


def words_depth(hi):
    return (jnp.right_shift(hi, _HI_DEPTH_SHIFT)) & 31


def words_root(hi):
    return (jnp.right_shift(hi, _HI_ROOT_SHIFT)) & 7


def words_valid(lo, hi):
    # bit 31 of hi is the valid flag -> hi is negative when valid
    return hi < 0


def words_equal(lo_a, hi_a, lo_b, hi_b):
    return (lo_a == lo_b) & (hi_a == hi_b)


def words_make_child(lo, hi, child):
    """Vectorized MakeChildID on word pairs. child: int32 in 0..3."""
    d = words_depth(hi)
    hi = hi + _HI_DEPTH_UNIT
    pos = 2 * d
    in_lo = pos < 32
    lo_bits = jnp.where(in_lo, jnp.left_shift(child, jnp.where(in_lo, pos, 0)), 0)
    hi_bits = jnp.where(in_lo, 0, jnp.left_shift(child, jnp.where(in_lo, 0, pos - 32)))
    return lo | lo_bits, hi | hi_bits


def words_child_index(lo, hi):
    d = words_depth(hi)
    pos = 2 * (d - 1)
    in_lo = pos < 32
    from_lo = jnp.right_shift(lo, jnp.where(in_lo, pos, 0)) & 3
    from_hi = jnp.right_shift(hi, jnp.where(in_lo, 0, pos - 32)) & 3
    return jnp.where(in_lo, from_lo, from_hi)


def words_parent(lo, hi):
    d = words_depth(hi)
    pos = 2 * (d - 1)
    in_lo = pos < 32
    lo_mask = jnp.where(in_lo, jnp.left_shift(jnp.int32(3), jnp.where(in_lo, pos, 0)), 0)
    hi_mask = jnp.where(in_lo, 0, jnp.left_shift(jnp.int32(3), jnp.where(in_lo, 0, pos - 32)))
    return lo & ~lo_mask, (hi - _HI_DEPTH_UNIT) & ~hi_mask


def words_path_digit(lo, hi, level):
    """Child index taken at depth `level` (1-based), i.e. bits 2*(level-1)."""
    pos = 2 * (level - 1)
    in_lo = pos < 32
    from_lo = jnp.right_shift(lo, jnp.where(in_lo, pos, 0)) & 3
    from_hi = jnp.right_shift(hi, jnp.where(in_lo, 0, pos - 32)) & 3
    return jnp.where(in_lo, from_lo, from_hi)


def words_dfs_key(lo, hi):
    """Device twin of dfs_key: two NON-NEGATIVE int32 sort keys (khi, klo)
    whose lexicographic order is the reference's DFS leaf-emission order
    (root, then path digits MSB-first, zero-padded to depth 27).

    Bit layout of the 57-bit conceptual key: root at bits 54-56, digit for
    level i (1-based) at bits (55-2i, 54-2i). khi = bits 26-56 (31 bits),
    klo = bits 0-25 (26 bits) — both fit positive int32.
    """
    depth = words_depth(hi)
    khi = jnp.left_shift(words_root(hi), 28)          # bits 54-56 -> 28-30
    klo = jnp.zeros_like(lo)
    for i in range(1, MAX_DEPTH_REPRESENTABLE + 1):
        d = jnp.where(i <= depth, words_path_digit(lo, hi, i), 0)
        bitpos = 54 - 2 * i                            # in the 57-bit key
        if bitpos >= 26:
            khi = khi | jnp.left_shift(d, bitpos - 26)
        else:
            klo = klo | jnp.left_shift(d, bitpos)
    return khi, klo
