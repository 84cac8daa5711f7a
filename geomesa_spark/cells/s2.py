"""Vectorized S2-style spherical cell ids (cube-face Hilbert curve).

The north-star index family is "H3/S2 cell encoding over Arrow batches";
`zcurve.py` provides the reference-parity Z2/Z3 keys (GeoMesa's own curve,
`geomesa-z3/.../curve/Z3.scala`), and this module adds a true spherical
cell scheme with the same engine contract: every kernel is numpy over
int64/uint64 arrays so encode/decode run inside Arrow-batched pandas UDFs,
and a cell covers a CONTIGUOUS leaf-id range so a K-cell cover prunes a
sorted int64 column with K BETWEEN predicates — the exact plan shape the
Z3 prefix ranges already use, but with no prefix-tree decomposition needed
(containment ranges are exact by construction on the Hilbert curve).

Implemented from scratch against the published S2 cell-id scheme
(s2geometry.io/devguide/s2cell_hierarchy and the public Apache-2.0
s2geometry sources' documented algorithm): lat/lng -> unit XYZ -> cube face
+ gnomonic (u,v) -> quadratic (s,t) -> 30-bit (i,j) -> Hilbert position,
packed as face(3 bits) | 2*level position bits | trailing-1 marker.
Ids are kept as SIGNED int64 (Spark LongType): faces 4-5 land in the
negative half, but the unsigned->signed map is monotonic within a face, so
per-cell BETWEEN ranges stay correct; only cross-face total order differs,
which no consumer relies on.

The rectangle cover is driver-side BFS refinement over (face, i, j, size)
quadrants with a provably-outer lat/lng bound per cell (corner box expanded
by the max edge arc length; pole and antimeridian cells handled explicitly)
— a cell is pruned only when its outer bound misses the query, so the cover
is always a superset and the engine's exact residual filter keeps results
exact, mirroring how the Z3 cover + residual pair works in plans/compiler.
"""

from __future__ import annotations

import math

import numpy as np

_U = np.uint64
MAX_LEVEL = 30
_FACE_SHIFT = _U(61)  # 3 face bits above 60 position bits + 1 marker bit

# Hilbert sub-cell order tables (the published S2 tables).
# kPosToIJ[r][pos] = ij quadrant visited at step `pos` under orientation r;
# kIJtoPos is its per-orientation inverse; kPosToOrientation is the child
# orientation delta (swap=1, invert=2).
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.uint64
)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.uint64)


# ---------------------------------------------------------------------------
# sphere <-> cube-face (s, t) projection
# ---------------------------------------------------------------------------


def _xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(az >= np.maximum(ax, ay), 2, np.where(ay >= ax, 1, 0))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp < 0, axis + 3, axis).astype(np.int64)
    # per-face gnomonic projection (standard S2 face table)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(
            face, [y / x, -x / y, -x / z, z / x, z / y, -y / z]
        )
        v = np.choose(
            face, [z / x, z / y, -y / z, y / x, -x / y, -x / z]
        )
    return face, u, v


def _face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    one = np.ones_like(u)
    x = np.choose(face, [one, -u, -u, -one, v, v])
    y = np.choose(face, [u, one, -v, -v, -one, u])
    z = np.choose(face, [v, v, one, -u, -u, -one])
    return x, y, z


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2_QUADRATIC_PROJECTION default)."""
    with np.errstate(invalid="ignore"):  # np.where evaluates the dead branch
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _lonlat_to_xyz(lon_deg: np.ndarray, lat_deg: np.ndarray):
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.clip(np.asarray(lat_deg, dtype=np.float64), -90.0, 90.0))
    cl = np.cos(lat)
    return cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)


# ---------------------------------------------------------------------------
# (face, i, j) <-> Hilbert position <-> cell id
# ---------------------------------------------------------------------------


def _ij_to_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """60-bit Hilbert position of leaf (i, j) on `face` (vectorized).

    One 2-bit step per level, msb first — the unrolled form of the S2
    4-bit lookup-table walk; orientation starts at `face & 1` (kSwapMask)
    and advances by kPosToOrientation, exactly the published recurrence.
    """
    i = i.astype(np.uint64)
    j = j.astype(np.uint64)
    pos = np.zeros(i.shape, dtype=np.uint64)
    orient = face.astype(np.uint64) & _U(1)
    flat_ij2pos = _IJ_TO_POS.reshape(-1)
    for k in range(MAX_LEVEL - 1, -1, -1):
        bi = (i >> _U(k)) & _U(1)
        bj = (j >> _U(k)) & _U(1)
        p = flat_ij2pos[(orient << _U(2)) | (bi << _U(1)) | bj]
        pos = (pos << _U(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def _pos_to_ij(face: np.ndarray, pos: np.ndarray):
    pos = pos.astype(np.uint64)
    i = np.zeros(pos.shape, dtype=np.uint64)
    j = np.zeros(pos.shape, dtype=np.uint64)
    orient = face.astype(np.uint64) & _U(1)
    flat_pos2ij = _POS_TO_IJ.reshape(-1)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p = (pos >> _U(2 * k)) & _U(3)
        ij = flat_pos2ij[(orient << _U(2)) | p]
        i = (i << _U(1)) | (ij >> _U(1))
        j = (j << _U(1)) | (ij & _U(1))
        orient = orient ^ _POS_TO_ORIENT[p]
    return i, j


def _leaf_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    n = (face.astype(np.uint64) << _FACE_SHIFT) | (
        _ij_to_pos(face, i, j) << _U(1)
    ) | _U(1)
    return n.view(np.int64) if n.dtype == np.uint64 else n.astype(np.int64)


def lonlat_to_leaf(lon_deg, lat_deg) -> np.ndarray:
    """Leaf (level-30) S2 cell ids for lon/lat arrays, as signed int64."""
    x, y, z = _lonlat_to_xyz(lon_deg, lat_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    scale = float(1 << MAX_LEVEL)
    i = np.clip((_uv_to_st(u) * scale).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)
    j = np.clip((_uv_to_st(v) * scale).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)
    return _leaf_from_face_ij(face, i, j).astype(np.int64)


def lonlat_to_cellid(lon_deg, lat_deg, level: int) -> np.ndarray:
    """S2 cell ids at `level` for lon/lat arrays (signed int64)."""
    return parent(lonlat_to_leaf(lon_deg, lat_deg), level)


def _lsb(ids: np.ndarray) -> np.ndarray:
    u = ids.astype(np.int64).view(np.uint64)
    return u & (~u + _U(1))


def level_of(ids: np.ndarray) -> np.ndarray:
    """Level of each cell id (30 = leaf)."""
    lsb = _lsb(np.asarray(ids))
    # trailing-zero count via float64 exponent is unsafe past 2^52; count
    # with a de-Bruijn-free loop over the 31 possible marker positions
    out = np.full(lsb.shape, -1, dtype=np.int64)
    for lvl in range(MAX_LEVEL + 1):
        out[lsb == _U(1) << _U(2 * (MAX_LEVEL - lvl))] = lvl
    return out


def parent(ids: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell id at `level` (vectorized; level <= each id's level)."""
    u = np.asarray(ids).astype(np.int64).view(np.uint64)
    new_lsb = _U(1) << _U(2 * (MAX_LEVEL - level))
    return ((u & ~(new_lsb - _U(1))) | new_lsb).view(np.int64)


def cell_range(ids: np.ndarray):
    """(range_min, range_max) of leaf ids contained in each cell —
    contiguous by Hilbert construction, both ends inclusive, int64."""
    u = np.asarray(ids).astype(np.int64).view(np.uint64)
    lsb = u & (~u + _U(1))
    return ((u - (lsb - _U(1))).view(np.int64), (u + (lsb - _U(1))).view(np.int64))


def cell_center_lonlat(ids: np.ndarray):
    """(lon_deg, lat_deg) of each cell id's center leaf."""
    u = np.asarray(ids).astype(np.int64).view(np.uint64)
    face = (u >> _FACE_SHIFT).astype(np.int64)
    pos = (u >> _U(1)) & ((_U(1) << _U(60)) - _U(1))
    i, j = _pos_to_ij(face, pos)
    scale = 1.0 / float(1 << (MAX_LEVEL + 1))
    u_ = _st_to_uv((2.0 * i.astype(np.float64) + 1.0) * scale)
    v_ = _st_to_uv((2.0 * j.astype(np.float64) + 1.0) * scale)
    x, y, z = _face_uv_to_xyz(face, u_, v_)
    n = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(np.clip(z / n, -1.0, 1.0)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat


# ---------------------------------------------------------------------------
# rectangle cover (driver-side; cells are few, rows are many)
# ---------------------------------------------------------------------------


def _cell_outer_bound(face: int, i0: int, j0: int, size: int):
    """A lat/lng box GUARANTEED to contain the cell (may be larger).

    Corners' lat/lng expanded by the max edge arc length E: any point of
    the cell lies within arc E of the corner box (moving distance s along
    the sphere changes lat by <= s and lng by <= s/cos(|lat|)). Cells
    containing a pole get the full lng range. Returns
    (lat_min, lat_max, lng_lo, lng_width) with lng as a wrapped interval
    starting at lng_lo spanning lng_width radians (<= 2*pi).
    """
    n = float(1 << MAX_LEVEL)
    # Boundary samples: 4 points per edge (the cell's lat/lng extremes are
    # attained on the boundary for any pole-free geodesically-convex cell,
    # so bounding sampled boundary points + the max gap arc bounds the cell).
    k = 8
    frac = np.arange(k) / k
    s_lo, s_hi = i0 / n, (i0 + size) / n
    t_lo, t_hi = j0 / n, (j0 + size) / n
    ss = np.concatenate([
        s_lo + (s_hi - s_lo) * frac,            # bottom edge, left->right
        np.full(k, s_hi),                        # right edge
        s_hi - (s_hi - s_lo) * frac,             # top edge, right->left
        np.full(k, s_lo),                        # left edge
    ])
    tt = np.concatenate([
        np.full(k, t_lo),
        t_lo + (t_hi - t_lo) * frac,
        np.full(k, t_hi),
        t_hi - (t_hi - t_lo) * frac,
    ])
    fa = np.full(ss.shape, face, dtype=np.int64)
    x, y, z = _face_uv_to_xyz(fa, _st_to_uv(ss), _st_to_uv(tt))
    norm = np.sqrt(x * x + y * y + z * z)
    x, y, z = x / norm, y / norm, z / norm
    lat = np.arcsin(np.clip(z, -1.0, 1.0))
    lng = np.arctan2(y, x)
    # max arc between consecutive boundary samples (closed ring): any
    # boundary point is within half this arc of a sample; st-space edges
    # are NOT geodesics but are smooth curves on the unit sphere, so the
    # gap arc bounds the deviation. Expand by the full gap for margin.
    xs = np.stack([x, y, z], axis=1)
    dots = np.clip(np.sum(xs * np.roll(xs, -1, axis=0), axis=1), -1.0, 1.0)
    edge = float(np.arccos(dots).max())
    half = 1 << (MAX_LEVEL - 1)
    has_north = face == 2 and i0 <= half <= i0 + size and j0 <= half <= j0 + size
    has_south = face == 5 and i0 <= half <= i0 + size and j0 <= half <= j0 + size
    lat_min = max(-math.pi / 2, float(lat.min()) - edge)
    lat_max = min(math.pi / 2, float(lat.max()) + edge)
    if has_north:
        lat_max = math.pi / 2
    if has_south:
        lat_min = -math.pi / 2
    # wrapped lng interval containing the 4 corner lngs: complement of the
    # largest gap between consecutive (sorted) corner longitudes
    ls = np.sort(lng)
    gaps = np.diff(np.concatenate([ls, [ls[0] + 2 * math.pi]]))
    g = int(np.argmax(gaps))
    lng_lo = float(ls[(g + 1) % len(ls)])
    width = 2 * math.pi - float(gaps[g])
    # meridian convergence expansion, capped to the full circle near poles
    max_abs_lat = min(math.pi / 2 - 1e-9, max(abs(lat_min), abs(lat_max)))
    expand = edge / max(math.cos(max_abs_lat), 1e-9)
    if has_north or has_south or width + 2 * expand >= 2 * math.pi:
        return lat_min, lat_max, -math.pi, 2 * math.pi
    return lat_min, lat_max, lng_lo - expand, width + 2 * expand


def _wrapped_intersects(lo1: float, w1: float, lo2: float, w2: float) -> bool:
    """Do two wrapped longitude intervals (start, width) intersect?"""
    two_pi = 2 * math.pi
    d = (lo2 - lo1) % two_pi
    return d <= w1 or (two_pi - d) <= w2


def cover_rect(
    lon_min: float,
    lat_min: float,
    lon_max: float,
    lat_max: float,
    level: int,
    max_cells: int = 256,
) -> list[tuple[int, int]]:
    """Merged, sorted leaf-id BETWEEN ranges covering the lat/lng rect.

    Superset guarantee: a quadrant is pruned only when its OUTER bound
    (see `_cell_outer_bound`) misses the rect, so every level-`level` cell
    intersecting the rect contributes a range. `lon_min > lon_max` is the
    antimeridian-crossing rect (same convention as the CQL BBOX handling).
    If refinement would exceed `max_cells`, remaining quadrants are emitted
    at their current (coarser) level — still a superset, just less tight.
    """
    qlat_lo, qlat_hi = math.radians(lat_min), math.radians(lat_max)
    qlng_lo = math.radians(lon_min)
    qwidth = math.radians(
        (lon_max - lon_min) if lon_max >= lon_min else (360.0 + lon_max - lon_min)
    )

    def hits(face, i0, j0, size) -> bool:
        blat_lo, blat_hi, blng_lo, bwidth = _cell_outer_bound(face, i0, j0, size)
        if blat_hi < qlat_lo or blat_lo > qlat_hi:
            return False
        return _wrapped_intersects(blng_lo, bwidth, qlng_lo, qwidth)

    frontier = [
        (f, 0, 0, 1 << MAX_LEVEL)
        for f in range(6)
        if hits(f, 0, 0, 1 << MAX_LEVEL)
    ]
    emitted: list[tuple[int, int, int, int]] = []
    for _ in range(level):
        nxt = []
        for f, i0, j0, size in frontier:
            h = size // 2
            for di, dj in ((0, 0), (h, 0), (0, h), (h, h)):
                child = (f, i0 + di, j0 + dj, h)
                if hits(*child):
                    nxt.append(child)
        if len(nxt) > max_cells:
            # stop refining: the (hit-filtered) parent generation is a
            # coarser superset and, having passed last iteration's check,
            # respects max_cells (faces: at most 6)
            emitted.extend(frontier)
            frontier = []
            break
        frontier = nxt
    emitted.extend(frontier)

    if not emitted:
        return []
    fa = np.array([c[0] for c in emitted], dtype=np.int64)
    ii = np.array([c[1] for c in emitted], dtype=np.uint64)
    jj = np.array([c[2] for c in emitted], dtype=np.uint64)
    lv = np.array(
        [MAX_LEVEL - int(math.log2(c[3])) for c in emitted], dtype=np.int64
    )
    leafs = _leaf_from_face_ij(fa, ii, jj)
    cells = np.empty(len(emitted), dtype=np.int64)
    for l in np.unique(lv):
        m = lv == l
        cells[m] = parent(leafs[m], int(l))
    lo, hi = cell_range(cells)
    order = np.argsort(lo)
    merged: list[list[int]] = []
    for a, b in zip(lo[order].tolist(), hi[order].tolist()):
        # leaf ids are odd (center-of-leaf convention), so two ADJACENT
        # inclusive ranges differ by exactly 2 at the seam
        if merged and a <= merged[-1][1] + 2:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    return [(a, b) for a, b in merged]
