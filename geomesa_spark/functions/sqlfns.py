"""SQL-callable spatial function surface: ``st_*`` functions registered on
the SparkSession, so `spark.sql` users query geometry without touching the
Python DataFrame API.

The reference exposes its geometry predicates to query languages through
GeoTools/(E)CQL filter functions (``geomesa-filter/.../function/``,
e.g. ``Convert2ViewerFunction.scala``) and the WPS/process surface; the
Spark-native equivalent is session-registered SQL functions. All
functions are **Arrow-batched pandas UDFs over the engine's own numpy
kernels** (``geom/kernels.py``, ``cells/geohash.py``, ``cells/tiles.py``)
— vectorized per batch, never row-at-a-time Python. Geometry literals
(the overwhelmingly common case: a constant polygon tested against
millions of point rows) parse once per distinct WKT per batch via a
small cache, so the per-row cost is the numpy kernel only.

Semantics follow the engine's query compiler (``plans/compiler.py``
OGC point-row rules): ``st_contains`` excludes the boundary,
``st_intersects`` includes it; ``st_distance_sphere`` is the haversine
kernel (``geom/kernels.py::haversine_m``) on the IUGG mean radius.

Note for planner-aware users: these functions are black boxes to
Catalyst — no predicate pushdown or partition pruning happens through
them. For engine-optimized scans, use ``plans.compiler.query`` (which
compiles the same predicates into prune + residual); the SQL surface is
the interop path, matching how the reference's WPS/filter functions sit
above its own query planner.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_POINT_RE = re.compile(r"POINT\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)\s*\)")


def _parse_points(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    ext = s.str.extract(_POINT_RE)
    return (
        ext[0].astype(np.float64).to_numpy(),
        ext[1].astype(np.float64).to_numpy(),
    )


def _geom_cache(series: pd.Series) -> dict:
    from geomesa_spark.geom.wkt import parse_wkt

    return {w: parse_wkt(w) for w in series.dropna().unique()}


def _pip_grouped(wkts: pd.Series, lon: np.ndarray, lat: np.ndarray,
                 include_boundary: bool) -> np.ndarray:
    """Point-in-polygon for (possibly varying) left-hand WKTs: group rows
    by distinct WKT, run the vectorized kernel once per group."""
    from geomesa_spark.geom.kernels import points_in_polygon, points_on_boundary

    cache = _geom_cache(wkts)
    out = np.zeros(len(wkts), dtype=bool)
    codes, uniques = pd.factorize(wkts)
    for i, w in enumerate(uniques):
        sel = codes == i
        g = cache[w]
        inside = points_in_polygon(lon[sel], lat[sel], g)
        if include_boundary:
            inside = inside | points_on_boundary(lon[sel], lat[sel], g)
        else:
            inside = inside & ~points_on_boundary(lon[sel], lat[sel], g)
        out[sel] = inside
    return out


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the ``st_*`` family on this session; returns the names."""
    from geomesa_spark.cells.geohash import geohash_encode
    from geomesa_spark.cells.tiles import tile_id
    from geomesa_spark.geom.kernels import (
        geometry_intersects_polygon,
        haversine_m,
    )

    @pandas_udf("string")
    def st_point(lon: pd.Series, lat: pd.Series) -> pd.Series:
        # SQL decimal literals arrive as Decimal objects; normalize so the
        # repr-based WKT always round-trips the double exactly
        return pd.Series(
            [
                f"POINT ({x!r} {y!r})"
                for x, y in zip(lon.astype(np.float64), lat.astype(np.float64))
            ],
            dtype=object,
        )

    @pandas_udf("double")
    def st_x(wkt: pd.Series) -> pd.Series:
        return wkt.str.extract(_POINT_RE)[0].astype(np.float64)

    @pandas_udf("double")
    def st_y(wkt: pd.Series) -> pd.Series:
        return wkt.str.extract(_POINT_RE)[1].astype(np.float64)

    @pandas_udf("string")
    def st_makebbox(lon_min: pd.Series, lat_min: pd.Series,
                    lon_max: pd.Series, lat_max: pd.Series) -> pd.Series:
        return pd.Series(
            [
                f"POLYGON (({x0!r} {y0!r}, {x1!r} {y0!r}, {x1!r} {y1!r}, "
                f"{x0!r} {y1!r}, {x0!r} {y0!r}))"
                for x0, y0, x1, y1 in zip(
                    lon_min.astype(np.float64), lat_min.astype(np.float64),
                    lon_max.astype(np.float64), lat_max.astype(np.float64),
                )
            ],
            dtype=object,
        )

    @pandas_udf("boolean")
    def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
        lon, lat = _parse_points(b)
        if np.isnan(lon).any():
            raise NotImplementedError(
                "st_contains supports POINT right-hand sides; decompose "
                "geometry rows via sources.geom_layout for geom-vs-geom"
            )
        return pd.Series(_pip_grouped(a, lon, lat, include_boundary=False))

    @pandas_udf("boolean")
    def st_within(a: pd.Series, b: pd.Series) -> pd.Series:
        lon, lat = _parse_points(a)
        if np.isnan(lon).any():
            raise NotImplementedError("st_within supports POINT left-hand sides")
        return pd.Series(_pip_grouped(b, lon, lat, include_boundary=False))

    @pandas_udf("boolean")
    def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
        lon, lat = _parse_points(b)
        if not np.isnan(lon).any():
            return pd.Series(_pip_grouped(a, lon, lat, include_boundary=True))
        # general geometry rhs: per-distinct-pair kernel
        ca, cb = _geom_cache(a), _geom_cache(b)
        out = [
            bool(geometry_intersects_polygon(cb[bw], ca[aw]))
            for aw, bw in zip(a, b)
        ]
        return pd.Series(out)

    @pandas_udf("double")
    def st_distance_sphere(a: pd.Series, b: pd.Series) -> pd.Series:
        lon1, lat1 = _parse_points(a)
        lon2, lat2 = _parse_points(b)
        return pd.Series(haversine_m(lon1, lat1, lon2, lat2))

    @pandas_udf("boolean")
    def st_dwithin(a: pd.Series, b: pd.Series, meters: pd.Series) -> pd.Series:
        lon1, lat1 = _parse_points(a)
        lon2, lat2 = _parse_points(b)
        return pd.Series(
            haversine_m(lon1, lat1, lon2, lat2) <= meters.to_numpy(np.float64)
        )

    @pandas_udf("string")
    def st_geohash(lon: pd.Series, lat: pd.Series, precision: pd.Series) -> pd.Series:
        return pd.Series(
            geohash_encode(lon.to_numpy(np.float64), lat.to_numpy(np.float64),
                           int(precision.iloc[0]))
        )

    @pandas_udf("long")
    def st_tile_id(lon: pd.Series, lat: pd.Series, level: pd.Series) -> pd.Series:
        return pd.Series(
            tile_id(lon.to_numpy(np.float64), lat.to_numpy(np.float64),
                    int(level.iloc[0]))
        )

    fns = {
        "st_point": st_point,
        "st_x": st_x,
        "st_y": st_y,
        "st_makebbox": st_makebbox,
        "st_contains": st_contains,
        "st_within": st_within,
        "st_intersects": st_intersects,
        "st_distance_sphere": st_distance_sphere,
        "st_dwithin": st_dwithin,
        "st_geohash": st_geohash,
        "st_tile_id": st_tile_id,
    }
    for name, fn in fns.items():
        spark.udf.register(name, fn)
    return list(fns)
