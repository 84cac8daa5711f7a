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
NULL inputs propagate to NULL outputs (SQL semantics), never errors;
unsupported geometry *combinations* (e.g. contains with a non-point
right side) raise, because silently returning NULL would corrupt query
results.

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


def _parse_points(s) -> tuple[np.ndarray, np.ndarray]:
    ext = pd.Series(s, dtype=object).str.extract(_POINT_RE)
    return (
        ext[0].astype(np.float64).to_numpy(),
        ext[1].astype(np.float64).to_numpy(),
    )


def _geom_cache(values) -> dict:
    from geomesa_spark.geom.wkt import parse_wkt

    return {w: parse_wkt(w) for w in set(v for v in values if v is not None)}


def _pip_grouped(wkts, lon: np.ndarray, lat: np.ndarray,
                 include_boundary: bool) -> np.ndarray:
    """Point-in-polygon for (possibly varying) left-hand WKTs: group rows
    by distinct WKT, run the vectorized kernel once per group."""
    from geomesa_spark.geom.kernels import points_in_polygon, points_on_boundary

    wkts = pd.Series(list(wkts), dtype=object)
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


def _valid_mask(*series) -> np.ndarray:
    m = np.ones(len(series[0]), dtype=bool)
    for s in series:
        m &= s.notna().to_numpy()
    return m


def _with_nulls(valid: np.ndarray, values) -> pd.Series:
    """Assemble an output Series: computed values on valid rows, None
    elsewhere (NULL in, NULL out)."""
    out = np.full(len(valid), None, dtype=object)
    out[valid] = [bool(v) if isinstance(v, np.bool_) else v for v in values]
    return pd.Series(out, dtype=object)


def _require_constant(s: pd.Series, what: str) -> int:
    vals = s.to_numpy()
    if len(vals) and not (vals == vals[0]).all():
        raise ValueError(
            f"{what} must be a literal (same value for every row); "
            f"got varying values in one batch"
        )
    return int(vals[0])


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the ``st_*`` family on this session; returns the names."""
    from geomesa_spark.cells.geohash import geohash_encode
    from geomesa_spark.cells.tiles import tile_id
    from geomesa_spark.geom.kernels import (
        geometry_intersects_polygon,
        haversine_m,
    )

    def _fmt_point(x, y) -> str:
        return f"POINT ({float(x)!r} {float(y)!r})"  # numpy-2-safe repr

    @pandas_udf("string")
    def st_point(lon: pd.Series, lat: pd.Series) -> pd.Series:
        valid = _valid_mask(lon, lat)
        xs = lon[valid].astype(np.float64)
        ys = lat[valid].astype(np.float64)
        return _with_nulls(valid, [_fmt_point(x, y) for x, y in zip(xs, ys)])

    @pandas_udf("double")
    def st_x(wkt: pd.Series) -> pd.Series:
        x, _ = _parse_points(wkt)
        return pd.Series([None if np.isnan(v) else float(v) for v in x],
                         dtype=object)

    @pandas_udf("double")
    def st_y(wkt: pd.Series) -> pd.Series:
        _, y = _parse_points(wkt)
        return pd.Series([None if np.isnan(v) else float(v) for v in y],
                         dtype=object)

    @pandas_udf("string")
    def st_makebbox(lon_min: pd.Series, lat_min: pd.Series,
                    lon_max: pd.Series, lat_max: pd.Series) -> pd.Series:
        valid = _valid_mask(lon_min, lat_min, lon_max, lat_max)
        vals = [
            (
                f"POLYGON (({float(x0)!r} {float(y0)!r}, "
                f"{float(x1)!r} {float(y0)!r}, {float(x1)!r} {float(y1)!r}, "
                f"{float(x0)!r} {float(y1)!r}, {float(x0)!r} {float(y0)!r}))"
            )
            for x0, y0, x1, y1 in zip(
                lon_min[valid].astype(np.float64),
                lat_min[valid].astype(np.float64),
                lon_max[valid].astype(np.float64),
                lat_max[valid].astype(np.float64),
            )
        ]
        return _with_nulls(valid, vals)

    def _pip_directional(geoms: pd.Series, pts: pd.Series, what: str) -> pd.Series:
        """contains/within core: point side vs geometry side, boundary
        excluded; NULLs propagate; a non-point on the point side raises."""
        valid = _valid_mask(geoms, pts)
        g = geoms[valid].reset_index(drop=True)
        p = pts[valid].reset_index(drop=True)
        lon, lat = _parse_points(p)
        if np.isnan(lon).any():
            raise NotImplementedError(
                f"{what} supports POINT geometries on the contained side; "
                "decompose geometry rows via sources.geom_layout for "
                "geom-vs-geom"
            )
        return _with_nulls(valid, _pip_grouped(g, lon, lat, include_boundary=False))

    @pandas_udf("boolean")
    def st_contains(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pip_directional(a, b, "st_contains")

    @pandas_udf("boolean")
    def st_within(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pip_directional(b, a, "st_within")

    @pandas_udf("boolean")
    def st_intersects(a: pd.Series, b: pd.Series) -> pd.Series:
        valid = _valid_mask(a, b)
        av = a[valid].reset_index(drop=True)
        bv = b[valid].reset_index(drop=True)
        alon, alat = _parse_points(av)
        blon, blat = _parse_points(bv)
        a_pt, b_pt = ~np.isnan(alon), ~np.isnan(blon)
        res = np.zeros(len(av), dtype=object)
        pp = a_pt & b_pt  # point-point: coordinate equality
        res[pp] = list((alon[pp] == blon[pp]) & (alat[pp] == blat[pp]))
        m = b_pt & ~a_pt  # point rhs vs geometry lhs
        if m.any():
            res[m] = list(_pip_grouped(av[m], blon[m], blat[m], True))
        m = a_pt & ~b_pt  # point lhs vs geometry rhs (symmetric)
        if m.any():
            res[m] = list(_pip_grouped(bv[m], alon[m], alat[m], True))
        gg = ~a_pt & ~b_pt
        if gg.any():
            ca, cb = _geom_cache(av[gg]), _geom_cache(bv[gg])
            vals = []
            for aw, bw in zip(av[gg], bv[gg]):
                ga, gb = ca[aw], cb[bw]
                if ga.kind in ("POLYGON", "MULTIPOLYGON"):
                    vals.append(bool(geometry_intersects_polygon(gb, ga)))
                elif gb.kind in ("POLYGON", "MULTIPOLYGON"):
                    vals.append(bool(geometry_intersects_polygon(ga, gb)))
                else:
                    raise NotImplementedError(
                        "st_intersects needs a POINT or polygonal side; "
                        f"got {ga.kind} vs {gb.kind}"
                    )
            res[gg] = vals
        return _with_nulls(valid, res)

    def _point_pair(a: pd.Series, b: pd.Series, what: str):
        valid = _valid_mask(a, b)
        lon1, lat1 = _parse_points(a[valid].reset_index(drop=True))
        lon2, lat2 = _parse_points(b[valid].reset_index(drop=True))
        if np.isnan(lon1).any() or np.isnan(lon2).any():
            raise NotImplementedError(f"{what} requires POINT arguments")
        return valid, haversine_m(lon1, lat1, lon2, lat2)

    @pandas_udf("double")
    def st_distance_sphere(a: pd.Series, b: pd.Series) -> pd.Series:
        valid, d = _point_pair(a, b, "st_distance_sphere")
        return _with_nulls(valid, [float(v) for v in d])

    @pandas_udf("boolean")
    def st_dwithin(a: pd.Series, b: pd.Series, meters: pd.Series) -> pd.Series:
        valid = _valid_mask(a, b, meters)
        lon1, lat1 = _parse_points(a[valid].reset_index(drop=True))
        lon2, lat2 = _parse_points(b[valid].reset_index(drop=True))
        if np.isnan(lon1).any() or np.isnan(lon2).any():
            raise NotImplementedError("st_dwithin requires POINT arguments")
        d = haversine_m(lon1, lat1, lon2, lat2)
        return _with_nulls(
            valid, d <= meters[valid].astype(np.float64).to_numpy()
        )

    @pandas_udf("string")
    def st_geohash(lon: pd.Series, lat: pd.Series, precision: pd.Series) -> pd.Series:
        prec = _require_constant(precision, "st_geohash precision")
        valid = _valid_mask(lon, lat)
        enc = geohash_encode(
            lon[valid].astype(np.float64).to_numpy(),
            lat[valid].astype(np.float64).to_numpy(), prec,
        )
        return _with_nulls(valid, [str(v) for v in enc])

    @pandas_udf("long")
    def st_tile_id(lon: pd.Series, lat: pd.Series, level: pd.Series) -> pd.Series:
        lvl = _require_constant(level, "st_tile_id level")
        valid = _valid_mask(lon, lat)
        tid = tile_id(
            lon[valid].astype(np.float64).to_numpy(),
            lat[valid].astype(np.float64).to_numpy(), lvl,
        )
        return _with_nulls(valid, [int(v) for v in tid])

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
