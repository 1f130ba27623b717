"""Device-side LOD refinement — the fully-jitted quadtree frontier loop.

The host refiner (lod.refine) is the parity reference; this variant keeps
the whole refinement on device for the streaming/sharded path (BASELINE
config 5), where host round-trips per level would dominate. The recursion
becomes a `lax.while_loop` over fixed-capacity padded buffers:

    state = (frontier ids/corners/depth + count, leaf ids/corners/depth + count)
    body  = probe heights for every active slot -> split mask ->
            compact leaves into the leaf buffer, expand splits x4 into the
            next frontier (sort-compaction + lane gathers; no scatters)

Fixed shapes are mandatory under jit (SURVEY.md section 7); overflow beyond
the static capacities is detected and reported via the returned flags (the
engine treats it as a failure-detection event and falls back to more
conservative max_lod).

Layout: corner buffers are LANE-MAJOR (12, N) f32 — row = corner*3 + axis,
lane = quad slot. The natural (N, 4, 3) form tiles as T(4,128) on TPU: 12
useful elements per 512-element tile, which made every while-state copy and
leaf-append window run at ~1 GB/s effective (trace: 0.3-0.4 ms per level of
pure state movement). (12, N) tiles as (16, 128) sublane-padded — 1.3x
bloat instead of 42x — and turns the compaction gathers into cheap
lane-axis takes. All arithmetic is elementwise in the slot index, so
results are bit-identical to the row-major formulation.

Double-float corners: subdivision re-projects midpoints to the sphere
(main.cpp:581-594) with DF normalize (~1e-13 relative), keeping split
decisions effectively exact at planet scale.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from planet_tpu.geom import quadid
from planet_tpu.nums import df as dfm

_F32 = jnp.float32
_I32 = jnp.int32


class DeviceRefineResult(NamedTuple):
    leaf_lo: jnp.ndarray       # (CAP,) int32 id words
    leaf_hi: jnp.ndarray
    leaf_corners_hi: jnp.ndarray   # (CAP, 4, 3) f32 — or (12, CAP) if transposed
    leaf_corners_lo: jnp.ndarray
    leaf_depth: jnp.ndarray    # (CAP,) int32
    n_leaves: jnp.ndarray      # () int32
    overflowed: jnp.ndarray    # () bool


def _df_normalize3(xh, xl, yh, yl, zh, zl, radius_hi, radius_lo):
    """normalize(p) * radius in double-float, vectorized."""
    def sq(h, l):
        return dfm.mul(dfm.DF(h, l), dfm.DF(h, l))
    s = dfm.add(dfm.add(sq(xh, xl), sq(yh, yl)), sq(zh, zl))
    ln = dfm.sqrt(s)
    scale = dfm.div(dfm.DF(radius_hi, radius_lo), ln)
    ox = dfm.mul(dfm.DF(xh, xl), scale)
    oy = dfm.mul(dfm.DF(yh, yl), scale)
    oz = dfm.mul(dfm.DF(zh, zl), scale)
    return ox, oy, oz


def _subdivide(ch, cl, radius):
    """(N, 4, 3) DF corners -> (N, 4, 4, 3) children (reference VERT rule)."""
    rh = np.float32(radius)
    rl = np.float32(np.float64(radius) - np.float64(rh))

    def mid2(i, j):
        s = dfm.add(dfm.DF(ch[:, i], cl[:, i]), dfm.DF(ch[:, j], cl[:, j]))
        return s                                     # (N, 3) DF

    def proj(p):
        ox, oy, oz = _df_normalize3(
            p.hi[:, 0], p.lo[:, 0], p.hi[:, 1], p.lo[:, 1],
            p.hi[:, 2], p.lo[:, 2], rh, rl)
        hi = jnp.stack([ox.hi, oy.hi, oz.hi], axis=1)
        lo = jnp.stack([ox.lo, oy.lo, oz.lo], axis=1)
        return dfm.DF(hi, lo)

    e01 = proj(mid2(0, 1))
    e02 = proj(mid2(0, 2))
    e13 = proj(mid2(1, 3))
    e23 = proj(mid2(2, 3))
    m = proj(dfm.add(mid2(0, 1), mid2(2, 3)))

    def g(k):
        items = [dfm.DF(ch[:, 0], cl[:, 0]), e01, dfm.DF(ch[:, 1], cl[:, 1]),
                 e02, m, e13,
                 dfm.DF(ch[:, 2], cl[:, 2]), e23, dfm.DF(ch[:, 3], cl[:, 3])]
        return items[k]

    sel = [[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7], [4, 5, 7, 8]]
    kids_hi = jnp.stack(
        [jnp.stack([g(k).hi for k in row], axis=1) for row in sel], axis=1)
    kids_lo = jnp.stack(
        [jnp.stack([g(k).lo for k in row], axis=1) for row in sel], axis=1)
    return kids_hi, kids_lo       # (N, 4child, 4corner, 3)


def _subdivide_t(ch, cl, radius):
    """Lane-major twin of _subdivide: (12, W) DF corners -> (12, 4*W)
    children in CHILD-BLOCKED lane order (child c of slot p at lane
    c*W + p). Same DF op sequence per element as _subdivide."""
    W = ch.shape[1]
    rh = np.float32(radius)
    rl = np.float32(np.float64(radius) - np.float64(rh))

    def corner(c):
        # [(x), (y), (z)] DF rows of corner c
        return [dfm.DF(ch[3 * c + a], cl[3 * c + a]) for a in range(3)]

    def mid2(i, j):
        ci, cj = corner(i), corner(j)
        return [dfm.add(ci[a], cj[a]) for a in range(3)]

    def proj(p):
        ox, oy, oz = _df_normalize3(
            p[0].hi, p[0].lo, p[1].hi, p[1].lo, p[2].hi, p[2].lo, rh, rl)
        return [ox, oy, oz]

    e01 = proj(mid2(0, 1))
    e02 = proj(mid2(0, 2))
    e13 = proj(mid2(1, 3))
    e23 = proj(mid2(2, 3))
    s01 = mid2(0, 1)
    s23 = mid2(2, 3)
    m = proj([dfm.add(s01[a], s23[a]) for a in range(3)])

    items = [corner(0), e01, corner(1), e02, m, e13, corner(2), e23,
             corner(3)]
    sel = [[0, 1, 3, 4], [1, 2, 4, 5], [3, 4, 6, 7], [4, 5, 7, 8]]
    rows_hi, rows_lo = [], []
    for k in range(4):                      # corner index of the child
        for a in range(3):                  # axis
            rows_hi.append(jnp.concatenate(
                [items[sel[c][k]][a].hi for c in range(4)]))
            rows_lo.append(jnp.concatenate(
                [items[sel[c][k]][a].lo for c in range(4)]))
    return jnp.stack(rows_hi), jnp.stack(rows_lo)     # (12, 4W)


@functools.partial(jax.jit, static_argnames=(
    "max_lod", "cap", "radius", "probe_fn_name", "tight", "transposed",
    "quality"))
def refine_device(cam_hi, cam_lo, root_lo, root_hi, root_ch, root_cl,
                  *, max_lod: int, cap: int, radius: float,
                  probe_fn_name: str = "zero", root_depth=None,
                  tight=(128, 512, 2048), transposed: bool = False,
                  quality: float = 1.0):
    """Full-device refinement. Roots: (R,) id words + (R, 4, 3) DF corners
    — the 6 cube faces by default, or any frontier of same-tree quads (the
    sharded engine refines per-chip SUBTREES from depth-1 roots,
    parallel/sharded_lod.py). root_depth: (R,) i32 quad depths (default 0);
    the split threshold's lod term is per-quad max_lod - depth
    (main.cpp:560-571).

    probe_fn_name selects the probe-height model: "zero" (smooth sphere,
    ConstantZero generator, main.cpp:836-841) — the noisy probe variant is
    composed at the engine level where the Pallas kernel is available.

    tight: ladder of static frontier widths (int or tuple) — a level runs
    at the narrowest ladder width that holds its frontier, falling back to
    the full cap (bit-identical results; only dead-slot work is skipped —
    product cameras keep frontiers at a few hundred slots while cap covers
    adversarial scenes).

    transposed=True returns leaf_corners_hi/lo in the internal lane-major
    (12, cap) layout (row = corner*3 + axis) — the fused engine consumes
    this directly so the post-sort permutation is a lane gather; the
    default converts back to (cap, 4, 3).

    quality: split-threshold multiplier (EngineConfig.lod_quality, static);
    1.0 compiles to bit-exactly the reference rule, other values multiply
    the threshold d in double-float to match the host refiner's f64
    `d * quality`.
    """
    n0 = root_lo.shape[0]
    if isinstance(tight, int):
        tight = (tight,)
    ladder = sorted({max(min(int(w), cap), 4) for w in tight if w < cap})

    def pad1(a, n, dtype):
        out = jnp.zeros((n,), dtype)
        return out.at[:a.shape[0]].set(a)

    def pad_t(a, n):
        # (R, 4, 3) -> (12, n) lane-major
        t = jnp.transpose(jnp.asarray(a, _F32), (1, 2, 0)).reshape(
            12, a.shape[0])
        out = jnp.zeros((12, n), _F32)
        return out.at[:, :a.shape[0]].set(t)

    f_lo = pad1(root_lo, cap, _I32)
    f_hi = pad1(root_hi, cap, _I32)
    f_ch = pad_t(root_ch, cap)
    f_cl = pad_t(root_cl, cap)
    if root_depth is None:
        f_depth = jnp.zeros((cap,), _I32)
    else:
        f_depth = pad1(jnp.asarray(root_depth, _I32), cap, _I32)
    f_n = jnp.int32(n0)

    # leaf buffers are exactly cap slots: the append window start is
    # clamped to cap - W and the gathered leaves shifted to their true
    # offset inside it (see append1) — the former 2*cap buffers cost
    # ~0.4 ms of while-state copies per frame at cap 8192
    l_lo = jnp.zeros((cap,), _I32)
    l_hi = jnp.zeros((cap,), _I32)
    l_ch = jnp.zeros((12, cap), _F32)
    l_cl = jnp.zeros((12, cap), _F32)
    l_depth = jnp.zeros((cap,), _I32)
    l_n = jnp.int32(0)
    overflow = jnp.bool_(False)

    cam = dfm.DF(jnp.asarray(cam_hi, _F32), jnp.asarray(cam_lo, _F32))

    def probe_heights(ph, pl):
        """(5, W) DF probe positions per axis -> (5, W) f32 heights."""
        if probe_fn_name == "zero":
            return jnp.zeros(ph[0].hi.shape[:1] + ph[0].hi.shape[1:], _F32) \
                if False else jnp.zeros(ph[0].hi.shape, _F32)
        if probe_fn_name == "ridged6":
            # the production terrain at (depth=0, max_depth=1): 6 octaves
            # (reference ProcessQuad probes, main.cpp:552-556 / 823-832)
            from planet_tpu.ops.kernels import perlin_pallas as pk
            sh = np.float32(1e-5)
            sl = np.float32(np.float64(1e-5) - np.float64(sh))
            xh, xl = pk._df_scale(ph[0].hi, ph[0].lo, sh, sl)
            yh, yl = pk._df_scale(ph[1].hi, ph[1].lo, sh, sl)
            zh, zl = pk._df_scale(ph[2].hi, ph[2].lo, sh, sl)
            h = pk.noise_df("ridged", xh, xl, yh, yl, zh, zl,
                            octaves=6, gain=np.float32(0.55))
            return h * np.float32(8848.0)
        raise ValueError(probe_fn_name)

    def level_step(W, state):
        """One refinement level at static frontier width W <= cap: every
        frontier-wide tensor is a [:, :W] lane slice. The per-level
        arithmetic is elementwise in the slot index, so results are
        bit-identical to the full-width body — only dead-slot work is
        skipped. The engine's standing frontier buffers stay (·, cap);
        children are padded back."""
        (f_lo, f_hi, f_ch, f_cl, f_depth, f_n,
         l_lo, l_hi, l_ch, l_cl, l_depth, l_n, overflow, level) = state
        f_lo_w, f_hi_w = f_lo[:W], f_hi[:W]
        f_ch_w, f_cl_w = f_ch[:, :W], f_cl[:, :W]
        f_depth_w = f_depth[:W]

        active = jnp.arange(W) < f_n
        lodv = jnp.int32(max_lod) - f_depth_w          # (W,) per-quad lod

        # --- probes: 4 corners + sphere midpoint, displaced by heights
        rh = np.float32(radius)
        rl = np.float32(np.float64(radius) - np.float64(rh))
        # corner sum per axis, sequential corner order (0+1)+2)+3 — the
        # value only feeds the DF normalize (midpoint), same as before
        csum_h = [((f_ch_w[a] + f_ch_w[3 + a]) + f_ch_w[6 + a])
                  + f_ch_w[9 + a] for a in range(3)]
        csum_l = [((f_cl_w[a] + f_cl_w[3 + a]) + f_cl_w[6 + a])
                  + f_cl_w[9 + a] for a in range(3)]
        mx, my, mz = _df_normalize3(
            csum_h[0], csum_l[0], csum_h[1], csum_l[1],
            csum_h[2], csum_l[2], rh, rl)
        mid = [mx, my, mz]

        # probe positions per axis: (5, W) = 4 corners + midpoint
        probes = []
        for a in range(3):
            hi = jnp.stack([f_ch_w[0 + a], f_ch_w[3 + a], f_ch_w[6 + a],
                            f_ch_w[9 + a], mid[a].hi])
            lo = jnp.stack([f_cl_w[0 + a], f_cl_w[3 + a], f_cl_w[6 + a],
                            f_cl_w[9 + a], mid[a].lo])
            probes.append(dfm.DF(hi, lo))
        hts = probe_heights(probes, None)                    # (5, W)

        # Split decision entirely in double-float so device leaf sets are
        # bit-stable vs the f64 host refiner (the reference evaluates
        # ProcessQuad in double, main.cpp:546-571): displacement
        # p * (1 + h/|p|), diagonals, camera-relative distances, and the
        # lod-scaled threshold all carry ~1e-14 relative error, so a
        # decision can only differ from the host's within that margin.
        px, py, pz = probes
        plen = dfm.sqrt(dfm.dot3(px, py, pz, px, py, pz))
        one = dfm.from_f32(jnp.float32(1.0))
        scale = dfm.add(one, dfm.div(dfm.from_f32(hts), plen))
        dx = dfm.mul(px, scale)
        dy = dfm.mul(py, scale)
        dz = dfm.mul(pz, scale)

        def at(c, i):
            return dfm.DF(c.hi[i], c.lo[i])

        d30 = [dfm.sub(at(c, 3), at(c, 0)) for c in (dx, dy, dz)]
        d21 = [dfm.sub(at(c, 2), at(c, 1)) for c in (dx, dy, dz)]
        diag = dfm.add(dfm.dot3(*d30, *d30), dfm.dot3(*d21, *d21))
        lodf = lodv.astype(_F32)
        denom = dfm.add(one, dfm.div(
            dfm.mul(dfm.from_f32(jnp.float32(2.5)), dfm.from_f32(lodf)),
            dfm.from_f32(jnp.float32(max_lod))))
        d = dfm.div(diag, denom)                             # (W,) DF
        if quality != 1.0:
            qh = np.float32(quality)
            ql = np.float32(np.float64(quality) - np.float64(qh))
            d = dfm.mul(d, dfm.DF(jnp.float32(qh), jnp.float32(ql)))

        relx = dfm.sub(dx, dfm.DF(cam.hi[0], cam.lo[0]))
        rely = dfm.sub(dy, dfm.DF(cam.hi[1], cam.lo[1]))
        relz = dfm.sub(dz, dfm.DF(cam.hi[2], cam.lo[2]))
        dist2 = dfm.dot3(relx, rely, relz, relx, rely, relz)  # (5, W) DF
        lhs = dfm.mul_pow2(dist2, jnp.float32(2.0))
        # lexicographic DF compare (canonical (hi, lo) pairs)
        closer = (lhs.hi < d.hi[None, :]) | (
            (lhs.hi == d.hi[None, :]) & (lhs.lo < d.lo[None, :]))
        split = active & (lodv > 0) & closer.any(axis=0)
        leaf = active & ~split

        # --- append compacted leaves at offset l_n (scatter-free: sort the
        # leaf mask for source positions, lane-gather, then merge a W-lane
        # window with dynamic slice/update — XLA scatters cost ~7 ns/
        # element on TPU). The leaf buffers are exactly cap lanes: the
        # window START clamps to cap - W and the gathered leaves shift to
        # offset d = l_n - start within it, so leaves still land at
        # absolute [l_n, l_n + n_leaf). Identical results whenever
        # l_n + n_leaf <= cap (the no-overflow invariant: d + n_leaf <= W
        # follows); on overflow the flag fires exactly as before.
        n_leaf = jnp.sum(leaf.astype(_I32))
        lkeys = jnp.where(leaf, jnp.arange(W, dtype=_I32), jnp.int32(W))
        src = jax.lax.sort(lkeys)                      # (W,) pad = W
        start = jnp.minimum(l_n, jnp.int32(cap - W))
        d = l_n - start                                # in [0, W]
        j = jnp.arange(W, dtype=_I32)
        src_s = jnp.pad(src, (0, 1), constant_values=W)[
            jnp.clip(j - d, 0, W)]                     # shifted sources
        fresh = (j >= d) & (j < d + n_leaf)

        def append1(buf, val):
            gathered = jnp.pad(val, (0, 1))[src_s]
            old = jax.lax.dynamic_slice(buf, (start,), (W,))
            return jax.lax.dynamic_update_slice(
                buf, jnp.where(fresh, gathered, old), (start,))

        def append_t(buf, val):
            gathered = jnp.pad(val, ((0, 0), (0, 1)))[:, src_s]
            old = jax.lax.dynamic_slice(buf, (jnp.int32(0), start), (12, W))
            return jax.lax.dynamic_update_slice(
                buf, jnp.where(fresh[None, :], gathered, old),
                (jnp.int32(0), start))

        l_lo = append1(l_lo, f_lo_w)
        l_hi = append1(l_hi, f_hi_w)
        l_ch = append_t(l_ch, f_ch_w)
        l_cl = append_t(l_cl, f_cl_w)
        l_depth = append1(l_depth, f_depth_w)
        new_l_n = (l_n + n_leaf).astype(_I32)
        overflow = overflow | (new_l_n > cap)
        l_n = jnp.minimum(new_l_n, cap).astype(_I32)

        # --- expand splits (gather formulation: XLA lowers scatters to
        # ~7 ns/element loops on TPU; one small sort + lane gathers
        # produce the identical child ordering)
        kids_h, kids_l = _subdivide_t(f_ch_w, f_cl_w, radius)  # (12, 4W)
        child_lo = jnp.concatenate(
            [quadid.words_make_child(f_lo_w, f_hi_w, jnp.int32(c))[0]
             for c in range(4)])                               # (4W,) blocked
        child_hi = jnp.concatenate(
            [quadid.words_make_child(f_lo_w, f_hi_w, jnp.int32(c))[1]
             for c in range(4)])

        wc = min(4 * W, cap)                   # children live in [:wc]
        n_split = jnp.sum(split.astype(_I32))
        overflow = overflow | ((n_split * 4) > cap)
        keys = jnp.where(split, jnp.arange(W, dtype=_I32), jnp.int32(W))
        spad = jax.lax.sort(keys)[:max(wc // 4, 1)]   # split rank -> slot
        j = jnp.arange(wc)
        pr = j // 4
        cidx = j % 4
        ok_child = pr < jnp.minimum(n_split, wc // 4)
        # child-blocked lane index into the (·, 4W) children (4W for dead)
        psel = jnp.where(ok_child, cidx * W + spad[pr], jnp.int32(4 * W))
        pslot = jnp.where(ok_child, spad[pr], jnp.int32(W))

        def cpad1(a):
            return jnp.pad(a, (0, cap - wc))

        def cpad_t(a):
            return jnp.pad(a, ((0, 0), (0, cap - wc)))

        nf_lo = cpad1(jnp.pad(child_lo, (0, 1))[psel])
        nf_hi = cpad1(jnp.pad(child_hi, (0, 1))[psel])
        nf_ch = cpad_t(jnp.pad(kids_h, ((0, 0), (0, 1)))[:, psel])
        nf_cl = cpad_t(jnp.pad(kids_l, ((0, 0), (0, 1)))[:, psel])
        nf_depth = cpad1(jnp.where(
            ok_child, jnp.pad(f_depth_w, (0, 1))[pslot] + 1, 0))
        f_n = jnp.minimum(n_split * 4, cap).astype(_I32)

        return (nf_lo, nf_hi, nf_ch, nf_cl,
                nf_depth, f_n,
                l_lo, l_hi, l_ch, l_cl, l_depth, l_n, overflow, level + 1)

    def body(state):
        """A level runs at the narrowest ladder width that holds its
        frontier (product cameras keep frontiers at a few hundred slots
        while cap covers adversarial scenes) — the (·, 5)-point DF terrain
        probes were ~60% of the refine stage when frontiers were ~200 of
        4096 slots."""
        fn = functools.partial(level_step, cap)
        for w in reversed(ladder):
            fn = (lambda w, inner: lambda s: jax.lax.cond(
                s[5] <= w, functools.partial(level_step, w), inner, s))(
                    w, fn)
        return fn(state)

    def cond(state):
        f_n, level = state[5], state[13]
        return (f_n > 0) & (level <= max_lod)

    state = (f_lo, f_hi, f_ch, f_cl, f_depth, f_n,
             l_lo, l_hi, l_ch, l_cl, l_depth, l_n, overflow, jnp.int32(0))
    state = jax.lax.while_loop(cond, body, state)
    (_, _, _, _, _, _,
     l_lo, l_hi, l_ch, l_cl, l_depth, l_n, overflow, _) = state
    c_hi, c_lo = l_ch[:, :cap], l_cl[:, :cap]
    if not transposed:
        c_hi = jnp.transpose(c_hi.reshape(4, 3, cap), (2, 0, 1))
        c_lo = jnp.transpose(c_lo.reshape(4, 3, cap), (2, 0, 1))
    return DeviceRefineResult(l_lo[:cap], l_hi[:cap], c_hi, c_lo,
                              l_depth[:cap], l_n, overflow)
