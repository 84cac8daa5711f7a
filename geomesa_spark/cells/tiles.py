"""XYZ (slippy-map style) tile grid kernels.

Tile assignment mirrors the reference's raster-index chunk keying
(``geomesa-raster/.../index/RasterEntry.scala:58-86``:
``lexiEncode(resolution) ~ geohash``) re-expressed on the standard public XYZ
tile pyramid: at resolution level ``r`` the world is a ``2^r x 2^r`` grid in
plate-carree; a tile id packs (level, x, y) into one sortable int64 so tiles
are a single partition/cluster column.

Pure-arithmetic definition so an ANSI-SQL oracle can reproduce assignments:
    x = floor((lon + 180) / 360 * 2^r)   clamped to [0, 2^r - 1]
    y = floor((90 - lat) / 180 * 2^r)    clamped to [0, 2^r - 1]
    tile_id = r * 2^52 + x * 2^26 + y
"""

from __future__ import annotations

import numpy as np


def tile_xy(lon, lat, level: int) -> tuple[np.ndarray, np.ndarray]:
    if not 0 <= level <= 26:
        # x*2^26 must stay below the 2^52 level field: level 27+ would
        # silently collide ids across pyramid levels
        raise ValueError(f"tile level must be in [0, 26], got {level}")
    n = 1 << level
    x = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor((90.0 - np.asarray(lat, np.float64)) / 180.0 * n).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def tile_id(lon, lat, level: int) -> np.ndarray:
    x, y = tile_xy(lon, lat, level)
    return np.int64(level) * np.int64(1 << 52) + x * np.int64(1 << 26) + y


def tile_bbox(level: int, x: int, y: int) -> tuple[float, float, float, float]:
    n = 1 << level
    lon0 = -180.0 + 360.0 * x / n
    lat1 = 90.0 - 180.0 * y / n
    return (lon0, lat1 - 180.0 / n, lon0 + 360.0 / n, lat1)


def tiles_for_bbox(lon_min, lat_min, lon_max, lat_max, level: int,
                   expand: int = 0) -> list[int]:
    """All tile ids at `level` intersecting a bbox (query-side enumeration).

    ``lon_min > lon_max`` means an antimeridian-crossing box: the two
    disjoint lon ranges enumerate separately (a naive range would be
    empty and silently prune everything). ``expand`` grows the tile range
    by that many neighbor cells on each side (clamped to the grid) — the
    raster planner's bbox-plus-neighbors enumeration.
    """
    if lon_min > lon_max:
        west = tiles_for_bbox(lon_min, lat_min, 180.0, lat_max, level, expand)
        east = tiles_for_bbox(-180.0, lat_min, lon_max, lat_max, level, expand)
        return sorted(set(west) | set(east))
    n = 1 << level
    x0, y1 = tile_xy(np.array([lon_min]), np.array([lat_min]), level)
    x1, y0 = tile_xy(np.array([lon_max]), np.array([lat_max]), level)
    xs = np.arange(max(0, x0[0] - expand), min(n - 1, x1[0] + expand) + 1)
    ys = np.arange(max(0, y0[0] - expand), min(n - 1, y1[0] + expand) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return list((np.int64(level) * np.int64(1 << 52) + gx.ravel() * np.int64(1 << 26) + gy.ravel()))
