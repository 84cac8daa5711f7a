"""Aggregation operators: density grids, temporal density, unique/histogram,
map aggregation, bounds, surfaces.

The reference runs these as partial-aggregate Accumulo iterators with a
client-side final reduce (``ACC/iterators/Z3DensityIterator.scala``,
``TemporalDensityIterator.scala``, ``MapAggregatingIterator.scala``,
``UniqueProcess``/``UniqueAttributeIterator``, ``BBOXCombiner``,
``SurfaceAggregatingIterator``). Spark's hash aggregation is the exact same
partial+final shape, so every operator here is a plain ``groupBy().agg()``
over pure-arithmetic keys — whole-stage codegen, map-side combine, no UDFs.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import epoch_seconds
from geomesa_spark.plans.compiler import GeoTable


def density(
    table: GeoTable,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    weight_col: str | None = None,
) -> DataFrame:
    """W x H grid heatmap over ``bbox``: (i, j, weight) per non-empty cell.

    Mirrors ``Z3DensityIterator``/``DensityIterator`` + ``GridSnap``
    (``UTL/geotools/GridSnap.scala``): snap each point to the grid, sum
    weights. Spark's partial/final hash agg replaces the per-tablet partials.
    """
    lon, lat = F.col(table.lon), F.col(table.lat)
    lon_min, lat_min, lon_max, lat_max = (float(v) for v in bbox)
    i = F.floor((lon - lon_min) / (lon_max - lon_min) * width).cast("int")
    j = F.floor((lat - lat_min) / (lat_max - lat_min) * height).cast("int")
    i = F.least(F.lit(width - 1), F.greatest(F.lit(0), i))
    j = F.least(F.lit(height - 1), F.greatest(F.lit(0), j))
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    return (
        table.df.filter(
            lon.between(lon_min, lon_max) & lat.between(lat_min, lat_max)
        )
        .groupBy(i.alias("i"), j.alias("j"))
        .agg(F.sum(w).alias("weight"))
    )


def density_geometries(
    df: DataFrame,
    wkt_col: str,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Density grid over arbitrary WKT geometries (points, lines, polygons).

    Mirrors the non-point rasterization of ``ACC/iterators/DensityIterator
    .scala:36-140``: a LineString walks the grid cells its segments cross
    (GridSnap's Bresenham walk), a Polygon covers the grid cells of its bbox
    that test inside; each geometry's weight is split evenly over its
    covered cells, so in-bbox mass is conserved — a geometry whose cover
    test hits no cell (e.g. a polygon smaller than one grid cell) falls
    back to snapping its bbox center to a single cell. Geometries whose
    bbox lies entirely OUTSIDE the density bbox contribute nothing (the
    same clip semantics as :func:`density`'s point filter — without it
    the edge rows/columns would accumulate spurious snapped mass from
    every off-grid geometry).

    Execution shape: simple ``POINT (x y)`` rows — the overwhelming
    majority of a geoparsed web corpus — take a pure whole-stage-codegen
    path (regexp coordinate extract + the same snap/clip arithmetic as
    :func:`density`; a single point contributes its full weight to one
    cell, which is exactly the kernel's ``wt * 1.0 / 1.0``), so Python
    never sees them. Only non-point geometries (and any WKT the strict
    point pattern doesn't match, e.g. ``POINT EMPTY`` or multipoints)
    reach the Arrow-batched numpy rasterizer. Both branches emit partial
    (i, j, w) rows into ONE union + hash agg — still a single shuffle.
    """
    from geomesa_spark.geom.kernels import points_in_polygon
    from geomesa_spark.geom.wkt import parse_wkt

    lon_min, lat_min, lon_max, lat_max = (float(v) for v in bbox)
    dx = (lon_max - lon_min) / width
    dy = (lat_max - lat_min) / height

    def snap(xs, ys):
        i = np.clip(((xs - lon_min) / dx).astype(np.int64), 0, width - 1)
        j = np.clip(((ys - lat_min) / dy).astype(np.int64), 0, height - 1)
        return i, j

    @F.pandas_udf("array<struct<i:int,j:int,w:double>>")
    def rasterize(wkts: pd.Series, weights: pd.Series) -> pd.Series:
        out = []
        for wkt, wt in zip(wkts, weights):
            g = parse_wkt(wkt)
            wt = 1.0 if wt is None else float(wt)
            gb = g.bbox()
            if gb[2] < lon_min or gb[0] > lon_max or gb[3] < lat_min or gb[1] > lat_max:
                out.append([])  # entirely off-grid: clipped, not snapped
                continue
            cells: dict[tuple[int, int], float] = {}
            if g.kind in ("POINT", "MULTIPOINT"):
                pts = g.rings[0]
                i, j = snap(pts[:, 0], pts[:, 1])
                for a, b in zip(i, j):
                    cells[(int(a), int(b))] = cells.get((int(a), int(b)), 0.0) + 1.0
            elif g.kind in ("LINESTRING", "MULTILINESTRING"):
                for ring in g.rings:
                    for (x0, y0), (x1, y1) in zip(ring[:-1], ring[1:]):
                        n = max(
                            2,
                            int(abs(x1 - x0) / max(dx, 1e-12))
                            + int(abs(y1 - y0) / max(dy, 1e-12))
                            + 2,
                        )
                        t = np.linspace(0.0, 1.0, n)
                        i, j = snap(x0 + (x1 - x0) * t, y0 + (y1 - y0) * t)
                        for a, b in set(zip(i.tolist(), j.tolist())):
                            cells[(a, b)] = cells.get((a, b), 0.0) + 1.0
            else:  # POLYGON / MULTIPOLYGON: grid-cover test on cell centers
                b0, b1, b2, b3 = g.bbox()
                i0, j0 = snap(np.array([b0]), np.array([b1]))
                i1, j1 = snap(np.array([b2]), np.array([b3]))
                gi, gj = np.meshgrid(
                    np.arange(i0[0], i1[0] + 1), np.arange(j0[0], j1[0] + 1)
                )
                gi, gj = gi.ravel(), gj.ravel()
                cx = lon_min + (gi + 0.5) * dx
                cy = lat_min + (gj + 0.5) * dy
                inside = points_in_polygon(cx, cy, g)
                for a, b in zip(gi[inside].tolist(), gj[inside].tolist()):
                    cells[(a, b)] = cells.get((a, b), 0.0) + 1.0
            if not cells:
                # mass conservation: snap the bbox center to one cell
                b0, b1, b2, b3 = g.bbox()
                i, j = snap(np.array([(b0 + b2) / 2.0]), np.array([(b1 + b3) / 2.0]))
                cells[(int(i[0]), int(j[0]))] = 1.0
            total = sum(cells.values())
            out.append(
                [
                    {"i": int(a), "j": int(b), "w": wt * c / total}
                    for (a, b), c in cells.items()
                ]
            )
        return pd.Series(out)

    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0))
        if weight_col
        else F.lit(1.0)
    )
    # strict single-point pattern: anything else (MULTIPOINT, POINT EMPTY,
    # lines, polygons, malformed WKT) falls through to the python kernel,
    # which preserves the exact legacy semantics for every geometry kind
    num = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
    pt_re = rf"^\s*POINT\s*\(\s*({num})\s+({num})\s*\)\s*$"
    is_pt = F.col(wkt_col).rlike(pt_re)

    plon = F.regexp_extract(F.col(wkt_col), pt_re, 1).cast("double")
    plat = F.regexp_extract(F.col(wkt_col), pt_re, 2).cast("double")
    pi = F.least(
        F.lit(width - 1),
        F.greatest(F.lit(0), ((plon - lon_min) / dx).cast("int")),
    )
    pj = F.least(
        F.lit(height - 1),
        F.greatest(F.lit(0), ((plat - lat_min) / dy).cast("int")),
    )
    point_cells = (
        df.filter(is_pt)
        .filter(plon.between(lon_min, lon_max) & plat.between(lat_min, lat_max))
        .select(pi.alias("i"), pj.alias("j"), w.alias("w"))
    )
    other_cells = (
        df.filter(~is_pt)
        .select(rasterize(F.col(wkt_col), w).alias("cells"))
        .select(F.explode("cells").alias("c"))
        .select(F.col("c.i").alias("i"), F.col("c.j").alias("j"), F.col("c.w").alias("w"))
    )
    return (
        point_cells.unionByName(other_cells)
        .groupBy("i", "j")
        .agg(F.sum("w").alias("weight"))
    )


def temporal_density(
    table: GeoTable,
    start: datetime,
    end: datetime,
    buckets: int,
) -> DataFrame:
    """Counts per equal time bucket over [start, end) — the TimeSnap grid
    (``ACC/iterators/TemporalDensityIterator.scala:40-194``)."""
    secs = epoch_seconds(F.col(table.dtg))
    s0, s1 = int(start.timestamp()), int(end.timestamp())
    width = max(1, (s1 - s0)) / buckets
    b = F.floor((secs - F.lit(s0)) / F.lit(width)).cast("int")
    b = F.least(F.lit(buckets - 1), b)
    return (
        table.df.filter((secs >= s0) & (secs < s1))
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def unique_histogram(
    table: GeoTable,
    attr: str,
    sort_by: str = "value",
    descending: bool = False,
) -> DataFrame:
    """Distinct values + counts of an attribute
    (``ACC/process/unique/UniqueProcess.scala:34-262``). The reference's
    index skip-scan becomes a hash aggregate (strictly more general)."""
    out = table.df.groupBy(F.col(attr).alias("value")).agg(F.count("*").alias("count"))
    key = F.col("value") if sort_by == "value" else F.col("count")
    return out.orderBy(key.desc() if descending else key.asc())


def map_aggregate(table: GeoTable, map_col: str) -> DataFrame:
    """Merge a map-valued attribute across rows, summing values per key
    (``ACC/iterators/MapAggregatingIterator.scala:32-108``)."""
    return (
        table.df.select(F.explode(F.col(map_col)).alias("key", "value"))
        .groupBy("key")
        .agg(F.sum("value").alias("total"))
    )


def bounds(table: GeoTable) -> DataFrame:
    """Running bbox union (``ACC/iterators/BBOXCombiner.scala``)."""
    return table.df.agg(
        F.min(table.lon).alias("lon_min"),
        F.min(table.lat).alias("lat_min"),
        F.max(table.lon).alias("lon_max"),
        F.max(table.lat).alias("lat_max"),
    )


def count_by_day(table: GeoTable) -> DataFrame:
    """Per-day counts (the reference's Spark demo,
    ``CMP/GeoMesaSpark.scala:144-154``: rdd.groupBy(yyyyMMdd).map(size))."""
    return (
        table.df.groupBy(F.date_format(F.col(table.dtg), "yyyyMMdd").alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("day")
    )


def surface(table, cell_col: str, value_col: str) -> DataFrame:
    """Per-cell max surface (``ACC/iterators/SurfaceAggregatingIterator``).

    Accepts a GeoTable or a plain cellized DataFrame — the aggregation
    needs only (cell, value), no geometry roles.
    """
    df = table.df if isinstance(table, GeoTable) else table
    return df.groupBy(cell_col).agg(F.max(value_col).alias("vmax"))
