"""Spatial join: point-in-polygon / intersects via cell-cover prefilter + exact test.

This is the engine's core deliverable, rebuilding the reference's implicit
spatial-join machinery — polygon decomposition into geohash covers
(``UTL/geohash/GeohashUtils.scala:638-702,915-1063``), coarse cell prefilter +
exact JTS residual inside iterators, and ``QueryProcess``
(``ACC/process/query/QueryProcess.scala:28-86``) — as an idiomatic Spark plan:

1. each polygon is decomposed driver-side into XYZ-tile cells at a
   per-polygon adaptive level (bounded cover size, like the reference's
   <=maxSize geohash decomposition);
2. the cover table (poly_id, cell) is **broadcast** (build sides are small:
   reference polygon sets, admin boundaries, ...);
3. points compute their cell id per cover level with pure-arithmetic JVM
   expressions and equi-join on cell — a map-side join, no shuffle of the
   100 TB probe side, no skew (hot cells fan out to at most #levels rows);
4. exact residual: axis-aligned boxes verify with plain column arithmetic
   (whole-stage codegen); general polygons verify in one Arrow-batched
   pandas UDF that groups each batch by polygon and runs the vectorized
   numpy point-in-ring kernel.

A point matches a polygon through exactly one cell per level, so no
dedup pass is needed (the reference's geohash-duplicate dedupe,
``ACC/iterators/DeDuplicatingIterator.scala``, is designed away).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.cells.tiles import tiles_for_bbox
from geomesa_spark.functions.zexpr import tile_id_expr
from geomesa_spark.geom.kernels import points_in_polygon
from geomesa_spark.geom.wkt import Geometry, parse_wkt
from geomesa_spark.plans.compiler import GeoTable, _is_axis_aligned_box


def _cover_level(bbox: tuple, max_cells: int = 64, max_level: int = 18) -> int:
    """Finest level whose tile grid covers the bbox with <= max_cells tiles."""
    dlon = max(1e-9, bbox[2] - bbox[0])
    dlat = max(1e-9, bbox[3] - bbox[1])
    for level in range(max_level, -1, -1):
        nx = dlon / (360.0 / (1 << level)) + 2
        ny = dlat / (180.0 / (1 << level)) + 2
        if nx * ny <= max_cells:
            return level
    return 0


def _cell_xy(level: int, cell: int) -> tuple[int, int]:
    rest = cell - level * (1 << 52)
    return rest >> 26, rest & ((1 << 26) - 1)


def adaptive_polygon_cover(
    g: Geometry, max_cells: int = 64, refine_levels: int = 2
) -> list[tuple[int, int, bool]]:
    """Geometry-shaped cover: (level, cell, interior) tuples.

    The reference's worst-candidate-first geohash decomposition
    (``GeohashUtils.scala:638-702,915-1063``) as quadtree refinement on the
    XYZ grid: start from the coarse bbox cover, DROP cells that miss the
    geometry (a concave/sprawling polygon no longer admits its whole bbox),
    classify cells wholly inside as ``interior`` (their points skip the
    exact PIP residual), and split boundary cells up to ``refine_levels``
    deeper while the cover stays within ``max_cells``.
    """
    from geomesa_spark.cells.tiles import tile_bbox
    from geomesa_spark.geom.kernels import box_within_polygon, geometry_intersects_box

    b = g.bbox()
    level0 = _cover_level(b, max_cells=max(8, max_cells // 4))
    out: list[tuple[int, int, bool]] = []
    frontier: list[tuple[int, int]] = []

    def classify(level: int, cell: int):
        x, y = _cell_xy(level, cell)
        cb = tile_bbox(level, x, y)
        if not geometry_intersects_box(g, cb):
            return
        if box_within_polygon(cb, g):
            out.append((level, cell, True))
        else:
            frontier.append((level, cell))

    for cell in tiles_for_bbox(b[0], b[1], b[2], b[3], level0):
        classify(level0, int(cell))
    for _ in range(refine_levels):
        if len(out) + 4 * len(frontier) > max_cells:
            break
        work, frontier = frontier, []
        for lv, cell in work:
            x, y = _cell_xy(lv, cell)
            for dx in (0, 1):
                for dy in (0, 1):
                    child = (lv + 1) * (1 << 52) + (2 * x + dx) * (1 << 26) + (2 * y + dy)
                    classify(lv + 1, child)
    out.extend((lv, c, False) for lv, c in frontier)
    return out


def polygon_covers(polys: list[tuple[str, str]], max_cells: int = 64) -> pd.DataFrame:
    """Decompose (poly_id, wkt) -> cover rows (poly_id, level, cell, is_box, ...).

    Boxes enumerate their bbox tiles (their residual is already exact
    arithmetic). General polygons get the adaptive geometry-shaped cover;
    interior cells carry wkt = NULL, which downstream means "no exact test
    needed" — only boundary-cell candidates reach the PIP kernel.
    """
    rows = []
    for pid, wkt in polys:
        g = parse_wkt(wkt)
        if g.kind not in ("POLYGON", "MULTIPOLYGON"):
            # the exact residual is a PIP kernel; a LINESTRING/POINT build
            # side would crash it inside an executor — fail at plan time
            raise ValueError(
                f"spatial_join build side must be polygonal; {pid!r} is "
                f"{g.kind} (use operators.knn/proximity for point build "
                "sides, sources.geom_layout for geometry rows)"
            )
        b = g.bbox()
        is_box = _is_axis_aligned_box(g)
        if is_box:
            level = _cover_level(b, max_cells=max_cells)
            for cell in tiles_for_bbox(b[0], b[1], b[2], b[3], level):
                rows.append((pid, level, int(cell), is_box,
                             b[0], b[1], b[2], b[3], wkt))
        else:
            for level, cell, interior in adaptive_polygon_cover(g, max_cells=max_cells):
                rows.append((pid, level, int(cell), is_box,
                             b[0], b[1], b[2], b[3], None if interior else wkt))
    return pd.DataFrame(
        rows,
        columns=["poly_id", "level", "cell", "is_box",
                 "p_lon_min", "p_lat_min", "p_lon_max", "p_lat_max", "wkt"],
    )


def spatial_join(
    points: GeoTable,
    polys: list[tuple[str, str]] | DataFrame,
    max_cells: int = 64,
    keep_wkt: bool = False,
) -> DataFrame:
    """Inner join: point rows x polygons containing them (boundary inclusive).

    ``polys``: list of (poly_id, wkt) or a DataFrame with those columns
    (collected to the driver — the build side is small by design; for huge
    polygon sets, shard the call).
    Returns the point columns + ``poly_id``.
    """
    spark = points.df.sparkSession
    if isinstance(polys, DataFrame):
        polys = [(r["poly_id"], r["wkt"]) for r in polys.collect()]

    cover_pdf = polygon_covers(polys, max_cells=max_cells)
    if cover_pdf.empty:
        return points.df.limit(0).withColumn("poly_id", F.lit("")).drop("__never__")
    covers = spark.createDataFrame(cover_pdf)

    levels = sorted(cover_pdf["level"].unique())
    lon, lat = F.col(points.lon), F.col(points.lat)

    # one arithmetic cell id per distinct cover level; explode to (level, cell)
    cells = F.array(*[
        F.struct(F.lit(int(l)).alias("level"), tile_id_expr(lon, lat, int(l)).alias("cell"))
        for l in levels
    ])
    pts = points.df.withColumn("__lc", F.explode(cells)).withColumn(
        "cell", F.col("__lc.cell")
    ).drop("__lc")

    # One broadcast join for all polygon classes (a single pass over the
    # probe side — it may be 100 TB). Axis-aligned boxes carry wkt = NULL,
    # so their residual is the pure-codegen bbox test; only rows that passed
    # the coarse bbox AND belong to a general polygon reach the Arrow/python
    # PIP kernel (Spark extracts python UDFs into an ArrowEvalPython stage,
    # so the coarse filter is a separate .filter *below* it — never fold the
    # UDF into a CASE WHEN, it would evaluate for every joined row).
    covers = covers.withColumn(
        "wkt", F.when(F.col("is_box"), F.lit(None).cast("string")).otherwise(F.col("wkt"))
    )
    joined = pts.join(F.broadcast(covers), on="cell", how="inner")
    in_bbox = lon.between(F.col("p_lon_min"), F.col("p_lon_max")) & lat.between(
        F.col("p_lat_min"), F.col("p_lat_max")
    )
    out = joined.filter(in_bbox)
    if not bool(cover_pdf["is_box"].all()):
        pip = _pip_by_poly_udf()
        out = out.filter(F.col("wkt").isNull() | pip(lon, lat, F.col("wkt")))
    drop = ["cell", "level", "is_box", "p_lon_min", "p_lat_min", "p_lon_max", "p_lat_max"]
    if not keep_wkt:
        drop.append("wkt")
    return out.drop(*drop)


def _pip_by_poly_udf():
    """Batch PIP: group each Arrow batch by polygon WKT, test vectorized."""

    @F.pandas_udf("boolean")
    def pip(lon: pd.Series, lat: pd.Series, wkt: pd.Series) -> pd.Series:
        import numpy as np

        # null wkt = axis-aligned box already verified by the codegen bbox
        # filter (and pandas groupby skips NaN groups anyway) -> True
        out = pd.Series(wkt.isna().to_numpy(), index=lon.index)
        lons = lon.to_numpy()
        lats = lat.to_numpy()
        for w, idx in wkt.groupby(wkt).groups.items():
            g = parse_wkt(w)
            pos = wkt.index.get_indexer(idx)
            out.iloc[pos] = points_in_polygon(lons[pos], lats[pos], g)
        return out

    return pip


def proximity_join(
    points: GeoTable,
    sites: list[tuple[str, float, float]],
    distance_m: float,
) -> DataFrame:
    """Features within ``distance_m`` meters of any site (site_id attached).

    Rebuilds ``ProximitySearchProcess`` (``ACC/process/proximity/
    ProximitySearchProcess.scala:31-119``): each input feature is buffered and
    the union of DWITHIN filters evaluated — here as a broadcast join against
    buffered-bbox covers + exact haversine residual (codegen arithmetic).
    """
    from geomesa_spark.geom.kernels import meters_to_degrees

    spark = points.df.sparkSession
    rows = []
    for sid, slon, slat in sites:
        d = meters_to_degrees(distance_m, slat)
        rows.append((sid, float(slon), float(slat),
                     slon - d, slat - d, slon + d, slat + d))
    sites_df = spark.createDataFrame(
        rows, "site_id string, s_lon double, s_lat double, "
              "b_lon_min double, b_lat_min double, b_lon_max double, b_lat_max double"
    )
    lon, lat = F.col(points.lon), F.col(points.lat)
    joined = points.df.join(
        F.broadcast(sites_df),
        lon.between(F.col("b_lon_min"), F.col("b_lon_max"))
        & lat.between(F.col("b_lat_min"), F.col("b_lat_max")),
        "inner",
    )
    from geomesa_spark.geom.distance import haversine_expr

    dist = haversine_expr(lon, lat, F.col("s_lon"), F.col("s_lat"))
    return (
        joined.withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= F.lit(float(distance_m)))
        .drop("b_lon_min", "b_lat_min", "b_lon_max", "b_lat_max")
    )
