"""H3-style hexagonal cell binning, expressed as pure Catalyst codegen.

The north-star index family is "H3/S2 cell encoding"; `s2.py` supplies
the spherical quad-tree half and this module the HEXAGONAL half: hex
bins are the standard aggregation cell for density/heat surfaces
because every neighbor shares an edge at the same center distance (a
square grid's diagonal neighbors are sqrt(2) farther — hex binning
removes that anisotropy from kNN rings and density kernels). This is
an H3-STYLE grid, not the H3 spec: axial (pointy-top) hexagons on the
equirectangular lon/lat plane with an aperture-7-like resolution
ladder (cell edge shrinks by sqrt(7) per level, matching H3's area
ratio), NOT Uber's icosahedral gnomonic projection — at web-crawl
geoparse precision the flat grid is the same binning tool, and unlike
the icosahedral spec every kernel below is closed-form enough to run
as WHOLE-STAGE CODEGEN Spark expressions (zero Python, zero shuffle)
AND be mirrored operation-for-operation in the DuckDB oracle.

Determinism contract (what makes the oracle row possible): all
constants are written as 17-significant-digit literals (never computed
via sqrt), and rounding is ``floor(x + 0.5)`` — identical IEEE-754
semantics in Spark and DuckDB, where each engine's native ``round``
differs on half-way ties. Same doubles + same operation order =>
bit-identical cell assignment in both engines.

Cell coordinates are axial ``(q, r)`` at a resolution; ``hex_cell``
packs them with the resolution into one int64 for layout/sort use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 17-digit literals, shared verbatim with the SQL twin
SQRT3_OVER_3 = 0.57735026918962576
ONE_THIRD = 0.33333333333333333
TWO_THIRDS = 0.66666666666666667
SQRT7 = 2.6457513110645906

BASE_EDGE_DEG = 10.0  # res-0 hex edge in degrees
_COORD_OFF = 1 << 27  # axial offset so packed q/r are non-negative
_AXIAL_NEIGHBORS = ((1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def edge_deg(res: int) -> float:
    """Hex edge length in degrees at a resolution (sqrt(7) ladder)."""
    e = BASE_EDGE_DEG
    for _ in range(res):
        e /= SQRT7
    return e


def hex_qr(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """Axial hex coordinates of a point — pure codegen expressions.

    Pointy-top axial transform then cube rounding. The cube round picks
    the axis with the largest rounding error and rederives it from the
    other two, so the point lands in the hexagon whose center is
    nearest (in cube distance) — the textbook algorithm, written with
    ``floor(x + 0.5)`` so both engines round identically.
    """
    s = F.lit(edge_deg(res))
    fq = (F.lit(SQRT3_OVER_3) * lon - F.lit(ONE_THIRD) * lat) / s
    fr = (F.lit(TWO_THIRDS) * lat) / s
    fx, fz = fq, fr
    fy = -fx - fz
    rx = F.floor(fx + F.lit(0.5)).cast("double")
    ry = F.floor(fy + F.lit(0.5)).cast("double")
    rz = F.floor(fz + F.lit(0.5)).cast("double")
    dx = F.abs(rx - fx)
    dy = F.abs(ry - fy)
    dz = F.abs(rz - fz)
    q = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    r = F.when(~((dx > dy) & (dx > dz)) & ~(dy > dz), -rx - ry).otherwise(rz)
    return q.cast("long"), r.cast("long")


def hex_cell(lon: Column, lat: Column, res: int) -> Column:
    """Packed int64 cell id: res(7 bits) | q+off(28 bits) | r+off(28).

    Monotone in (q, r) within a resolution, so a sorted cell column
    prunes q-contiguous covers with BETWEEN ranges, the same plan shape
    the z2/s2 layouts use. ``res`` is capped at 16: at res 17 an
    in-world |q| reaches ~2.0e8 > 2^27 (edge 10/sqrt(7)^17 ~ 6.6e-7
    deg; res 16 peaks at ~7.7e7, inside the 28-bit field) and the
    shifted value would bleed into the res bits — two cells packing to
    colliding or order-inverted ids, silently.
    """
    if not 0 <= res <= 16:
        raise ValueError(f"res {res} out of packable range [0, 16]")
    q, r = hex_qr(lon, lat, res)
    return (
        F.shiftleft(F.lit(res).cast("long"), 56)
        .bitwiseOR(F.shiftleft(q + F.lit(_COORD_OFF), 28))
        .bitwiseOR(r + F.lit(_COORD_OFF))
    )


def point_qr(lon: float, lat: float, res: int) -> tuple[int, int]:
    """Driver-side twin of :func:`hex_qr` (python floats, same floor-based
    cube round, IEEE-identical to the codegen path) — used to place query
    points for ring expansion and by tests as the row-wise reference."""
    import math

    s = edge_deg(res)
    fx = (SQRT3_OVER_3 * lon - ONE_THIRD * lat) / s
    fz = (TWO_THIRDS * lat) / s
    fy = -fx - fz
    rx, ry, rz = (math.floor(v + 0.5) for v in (fx, fy, fz))
    dx, dy, dz = abs(rx - fx), abs(ry - fy), abs(rz - fz)
    if dx > dy and dx > dz:
        rx = -ry - rz
    elif dy > dz:
        ry = -rx - rz
    else:
        rz = -rx - ry
    return int(rx), int(rz)


def cell_center(q: int, r: int, res: int) -> tuple[float, float]:
    """(lon, lat) center of an axial cell — driver-side inverse, used by
    covers and tests (python floats, same formulas inverted)."""
    s = edge_deg(res)
    lat = r * s / TWO_THIRDS
    lon = (q * s + ONE_THIRD * lat) / SQRT3_OVER_3
    return lon, lat


def neighbors(q: int, r: int) -> list[tuple[int, int]]:
    """The 6 edge-adjacent cells (axial offsets)."""
    return [(q + dq, r + dr) for dq, dr in _AXIAL_NEIGHBORS]


def ring(q: int, r: int, k: int) -> list[tuple[int, int]]:
    """Hex ring at exact distance k (6k cells; [(q, r)] for k=0) — the
    kNN expansion frontier: ring(k) cells all sit at the same center
    distance, the property square grids lack."""
    if k == 0:
        return [(q, r)]
    out = []
    cq, cr = q + _AXIAL_NEIGHBORS[4][0] * k, r + _AXIAL_NEIGHBORS[4][1] * k
    for side in range(6):
        dq, dr = _AXIAL_NEIGHBORS[side]
        for _ in range(k):
            out.append((cq, cr))
            cq, cr = cq + dq, cr + dr
    return out


def disk(q: int, r: int, k: int) -> list[tuple[int, int]]:
    """All cells within hex distance k (1 + 3k(k+1) cells)."""
    out = []
    for i in range(k + 1):
        out.extend(ring(q, r, i))
    return out


def hex_distance(q1: int, r1: int, q2: int, r2: int) -> int:
    """Axial hex distance (cube metric)."""
    dq, dr = q1 - q2, r1 - r2
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2
