"""Cube-face adjacency and halo-exchange topology.

The reference avoids inter-tile communication by overscanning each 32x32
tile by one texel (u = (x-1)/(dim-3), main.cpp:135-148) so normals never
need a neighbor's data. When faces (or blocks of faces) are sharded across
TPU chips, the same border texels can either be (a) locally over-generated
— heights are pure functions of position, so this is usually cheapest — or
(b) exchanged over ICI with `lax.ppermute` using the static cube topology
below. Both modes exist; (b) is the general mechanism for data that is NOT
recomputable (e.g. cached/streamed tiles, config 5).

Face numbering and windings follow the reference's root quads
(main.cpp:604-624, see geom.cubesphere): face corners (p0, p1, p2, p3) with
u along p0->p1 and v along p0->p2.

Edge naming: 0 = v=0 row (u increasing), 1 = u=1 column (v increasing),
2 = v=1 row (u increasing), 3 = u=0 column (v increasing).
"""

from __future__ import annotations

import functools

import numpy as np

from planet_tpu.geom import cubesphere

N_FACES = 6
EDGE_V0, EDGE_U1, EDGE_V1, EDGE_U0 = 0, 1, 2, 3


@functools.lru_cache()
def edge_adjacency():
    """(6, 4) arrays: neighbor face, neighbor edge, and orientation flag
    (True = the shared edge runs in opposite parameter direction on the two
    faces). Derived numerically from the root corner geometry so it is
    correct by construction against geom.cubesphere."""
    corners = cubesphere.root_corners(1.0)    # (6, 4, 3)

    # endpoints of each edge in corner indices (p0,p1,p2,p3 layout)
    edge_ends = {
        EDGE_V0: (0, 1),
        EDGE_U1: (1, 3),
        EDGE_V1: (2, 3),
        EDGE_U0: (0, 2),
    }

    nbr_face = np.full((N_FACES, 4), -1, np.int32)
    nbr_edge = np.full((N_FACES, 4), -1, np.int32)
    reversed_ = np.zeros((N_FACES, 4), bool)

    def key(p):
        return tuple(np.round(p, 9))

    for f in range(N_FACES):
        for e, (a, b) in edge_ends.items():
            pa, pb = corners[f, a], corners[f, b]
            for g in range(N_FACES):
                if g == f:
                    continue
                for e2, (c, d) in edge_ends.items():
                    pc, pd = corners[g, c], corners[g, d]
                    if key(pa) == key(pc) and key(pb) == key(pd):
                        nbr_face[f, e], nbr_edge[f, e] = g, e2
                        reversed_[f, e] = False
                    elif key(pa) == key(pd) and key(pb) == key(pc):
                        nbr_face[f, e], nbr_edge[f, e] = g, e2
                        reversed_[f, e] = True
    assert (nbr_face >= 0).all()
    return nbr_face, nbr_edge, reversed_


def face_grid_points_df(n: int, radius: float, overscan: int = 0,
                        row0=None, rows: int = None):
    """Device-side double-float twin of face_grid_points for all 6 faces.

    Returns (px, py, pz) as nums.df.DF, each (6, R, n+2o) — computed
    entirely on device from the 6x4x3 corner constants, so planet-scale
    point grids never cross the host boundary (at 6x2048^2 the host f64
    grids would be ~600 MB of transfer). Precision: bilinear weights are
    built in DF (exact u = (i+0.5)/n division), positions normalized with
    DF sqrt/div — matches the host f64 path to ~1e-13 relative.

    row0/rows select a horizontal strip: R = rows (static) grid rows
    starting at global row row0 (traced — the streaming 6x8192^2 path
    launches one strip at a time with only a scalar crossing the host
    boundary, benchmarks/bench_configs.py config 5). Default: all rows
    (R = n + 2o).
    """
    import jax.numpy as jnp

    from planet_tpu.nums import df as dfm

    o = int(overscan)
    g = n + 2 * o
    corners = cubesphere.root_corners(1.0)            # (6, 4, 3) f64
    ch, cl = dfm.from_f64_np(corners)
    ch = jnp.asarray(ch)
    cl = jnp.asarray(cl)

    def param(idx_f32):
        """Edge parameter (i + 0.5)/n in DF for f32 grid indices."""
        return dfm.div(dfm.DF(idx_f32, jnp.zeros_like(idx_f32)),
                       dfm.from_f32(jnp.float32(n)))

    ci = jnp.arange(-o, n + o, dtype=jnp.float32) + jnp.float32(0.5)
    u1 = param(ci)                                    # (g,) columns
    if rows is None:
        v1 = u1
        gr = g
    else:
        gr = int(rows)
        ri = (jnp.arange(gr, dtype=jnp.float32) + jnp.float32(0.5)
              + jnp.asarray(row0, jnp.float32) - jnp.float32(o))
        v1 = param(ri)                                # (gr,) strip rows
    one = dfm.from_f32(jnp.float32(1.0))
    w1 = dfm.sub(one, u1)
    wv1 = dfm.sub(one, v1)

    def bcast(d, row):
        # rows (gr,) -> (gr, g) down rows; cols (g,) -> (gr, g) across
        f = (lambda a: jnp.broadcast_to(a[:, None], (gr, g))) if row \
            else (lambda a: jnp.broadcast_to(a[None, :], (gr, g)))
        return dfm.DF(f(d.hi), f(d.lo))

    u = bcast(u1, False)       # x along columns (meshgrid indexing="xy")
    v = bcast(v1, True)
    nu = bcast(w1, False)
    nv = bcast(wv1, True)

    w00 = dfm.mul(nu, nv)
    w10 = dfm.mul(u, nv)
    w01 = dfm.mul(nu, v)
    w11 = dfm.mul(u, v)

    rad = dfm.from_f64(np.float64(radius))
    out = []
    for k in range(3):
        comps = []
        for f in range(6):
            c = lambda j: dfm.DF(ch[f, j, k], cl[f, j, k])
            p = dfm.add(dfm.add(dfm.mul(w00, c(0)), dfm.mul(w10, c(1))),
                        dfm.add(dfm.mul(w01, c(2)), dfm.mul(w11, c(3))))
            comps.append(p)
        out.append(dfm.DF(jnp.stack([p.hi for p in comps]),
                          jnp.stack([p.lo for p in comps])))
    px, py, pz = out
    n2 = dfm.dot3(px, py, pz, px, py, pz)
    inv_len = dfm.div(rad, dfm.sqrt(n2))
    return (dfm.mul(px, inv_len), dfm.mul(py, inv_len),
            dfm.mul(pz, inv_len))


def face_grid_points(face: int, n: int, radius: float,
                     overscan: int = 0) -> np.ndarray:
    """(n+2o, n+2o, 3) f64 sphere points of face `face` sampled at texel
    centers u = (i + 0.5)/n, optionally extended `overscan` texels past the
    face edge (the reference's locally-generated halo, generalized).

    Cube-sphere parameterization: bilinear on the face quad in cube space,
    then normalized to the sphere — the n -> infinity limit of tile
    sampling on root quads."""
    o = int(overscan)
    idx = (np.arange(-o, n + o, dtype=np.float64) + 0.5) / n
    u, v = np.meshgrid(idx, idx, indexing="xy")
    c = cubesphere.root_corners(1.0)[int(face)]
    p = (c[0] * ((1 - u) * (1 - v))[..., None]
         + c[1] * (u * (1 - v))[..., None]
         + c[2] * ((1 - u) * v)[..., None]
         + c[3] * (u * v)[..., None])
    return cubesphere.normalize(p) * np.float64(radius)
