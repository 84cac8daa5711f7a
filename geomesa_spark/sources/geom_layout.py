"""Geometry-typed rows (WKT column) end-to-end.

The reference stores every JTS geometry type by decomposing a non-point
geometry into its covering index cells and writing one key per cell
(``ACC/index/STIndexEntry.scala:43-61`` ``encode``: geohashes of the
geometry, ``UTL/geohash/GeohashUtils.scala:638-702`` decomposition), then
deduplicates query results because a geometry can match from several cells
(dedupe trigger ``ACC/index/IndexSchema.scala:298-307``).

Rebuilt Spark-first:

* :func:`enrich_geoms` — one Arrow pass: WKT -> (bbox cols, cover cells).
  The bbox lands as four plain double columns so the coarse query filter is
  whole-stage codegen; the cover is an ``array<long>`` of XYZ tile cells.
* :func:`write_geom_layout` — explode one row per cover cell,
  range-partition + sort by cell: a query's cell ranges prune files and row
  groups exactly like the point layout's z-ranges.
* :func:`query_geom_bbox` — cell-range prune -> codegen bbox-overlap coarse
  filter -> exact kernel ONLY on boundary-straddling rows (a geometry whose
  bbox lies fully inside the query box is inside by containment — no UDF),
  then the conditional id dedupe.

Scale: no joins; the prune is a sorted-column range scan; the Python kernel
touches only rows whose bbox straddles the query boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_spark.cells.tiles import tile_xy, tiles_for_bbox
from geomesa_spark.geom.kernels import (
    geometry_intersects_box,
    geometry_intersects_polygon,
)
from geomesa_spark.geom.wkt import parse_wkt

DEFAULT_LEVEL = 6


def _meta_udf(level: int):
    @F.pandas_udf("struct<gx0:double,gy0:double,gx1:double,gy1:double,cells:array<long>>")
    def meta(wkts: pd.Series) -> pd.DataFrame:
        gx0, gy0, gx1, gy1, cells = [], [], [], [], []
        for w in wkts:
            g = parse_wkt(w)
            b = g.bbox()
            gx0.append(b[0]); gy0.append(b[1]); gx1.append(b[2]); gy1.append(b[3])
            cells.append(np.array(tiles_for_bbox(b[0], b[1], b[2], b[3], level),
                                  dtype=np.int64))
        return pd.DataFrame(
            {"gx0": gx0, "gy0": gy0, "gx1": gx1, "gy1": gy1, "cells": cells}
        )

    return meta


def enrich_geoms(
    df: DataFrame, wkt_col: str = "wkt", level: int = DEFAULT_LEVEL
) -> DataFrame:
    """Add (gx0, gy0, gx1, gy1, cells) columns from the WKT column."""
    m = _meta_udf(level)(F.col(wkt_col))
    return df.withColumn("__m", m).select(
        *df.columns,
        F.col("__m.gx0").alias("gx0"), F.col("__m.gy0").alias("gy0"),
        F.col("__m.gx1").alias("gx1"), F.col("__m.gy1").alias("gy1"),
        F.col("__m.cells").alias("cells"),
    )


def write_geom_layout(
    df: DataFrame,
    path: str,
    wkt_col: str = "wkt",
    level: int = DEFAULT_LEVEL,
    target_partitions: int | None = None,
) -> None:
    """Cell-decomposed, cell-sorted layout for geometry rows."""
    e = enrich_geoms(df, wkt_col, level)
    exploded = e.withColumn("cell", F.explode("cells")).drop("cells")
    parts = target_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = exploded.repartitionByRange(parts, F.col("cell"))
    out.sortWithinPartitions("cell").write.mode("overwrite").parquet(path)


def read_geom_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _cell_ranges(box, level: int) -> list[tuple[int, int]]:
    """Query-cover cells as contiguous (lo, hi) id ranges (one per x column
    — y is the low-order field, so each x stripe is one BETWEEN)."""
    x0, _ = tile_xy(np.array([box[0]]), np.array([box[1]]), level)
    x1, _ = tile_xy(np.array([box[2]]), np.array([box[3]]), level)
    _, y1 = tile_xy(np.array([box[0]]), np.array([box[1]]), level)
    _, y0 = tile_xy(np.array([box[2]]), np.array([box[3]]), level)
    base = np.int64(level) * np.int64(1 << 52)
    out = []
    for x in range(int(x0[0]), int(x1[0]) + 1):
        lo = int(base + np.int64(x) * np.int64(1 << 26) + y0[0])
        hi = int(base + np.int64(x) * np.int64(1 << 26) + y1[0])
        out.append((lo, hi))
    return out


def _exact_box_udf(box):
    bx = tuple(float(v) for v in box)

    @F.pandas_udf("boolean")
    def exact(wkts: pd.Series) -> pd.Series:
        return pd.Series([geometry_intersects_box(parse_wkt(w), bx) for w in wkts])

    return exact


def query_geom_bbox(
    layout: DataFrame,
    box: tuple[float, float, float, float],
    fid: str,
    wkt_col: str = "wkt",
    level: int = DEFAULT_LEVEL,
) -> DataFrame:
    """BBOX query over a written geometry layout (or any enriched+exploded
    frame with a ``cell`` column).

    cell-range prune (sorted column -> row-group skip) -> codegen bbox
    overlap -> exact kernel only where the bbox straddles the query
    boundary -> dedupe on ``fid`` (one geometry may arrive from several
    cells)."""
    x0, y0, x1, y1 = (float(v) for v in box)
    prune = None
    for lo, hi in _cell_ranges(box, level):
        c = F.col("cell").between(lo, hi)
        prune = c if prune is None else (prune | c)
    pruned = layout.filter(prune) if prune is not None else layout
    coarse = (
        (F.col("gx0") <= x1) & (F.col("gx1") >= x0)
        & (F.col("gy0") <= y1) & (F.col("gy1") >= y0)
    )
    fully_inside = (
        (F.col("gx0") >= x0) & (F.col("gx1") <= x1)
        & (F.col("gy0") >= y0) & (F.col("gy1") <= y1)
    )
    # two-branch union keeps the Python kernel OFF the fully-inside rows
    # (a UDF inside a boolean OR is extracted to an ArrowEvalPython stage
    # that would run on every row — the CASE WHEN trap)
    easy = pruned.filter(coarse & fully_inside)
    hard = pruned.filter(coarse & ~fully_inside).filter(
        _exact_box_udf(box)(F.col(wkt_col))
    )
    return easy.unionByName(hard).dropDuplicates([fid])


def geom_spatial_join(
    layout: DataFrame,
    polys: list[tuple[str, str]],
    fid: str,
    wkt_col: str = "wkt",
    level: int = DEFAULT_LEVEL,
) -> DataFrame:
    """Spatial join of GEOMETRY rows against a polygon set (the non-point
    counterpart of ``operators.spatial_join``): each polygon enumerates the
    layout-level cells its shape intersects (geometry-shaped cover — a
    concave polygon does not admit its bbox), the broadcast
    (poly_id, cell) table equi-joins the layout's cell column, a codegen
    bbox-overlap filter cuts candidates, the exact geometry-vs-polygon
    kernel verifies, and (row, poly) pairs dedupe (a geometry can meet a
    polygon through several cells).
    """
    from geomesa_spark.geom.kernels import geometry_intersects_box

    # canonical tile-id unpack + bbox — one packing implementation repo-wide
    from geomesa_spark.cells.tiles import tile_bbox
    from geomesa_spark.operators.spatial_join import _cell_xy

    spark = layout.sparkSession
    rows = []
    for pid, wkt in polys:
        g = parse_wkt(wkt)
        b = g.bbox()
        for lo, hi in _cell_ranges(b, level):
            for cell in range(lo, hi + 1):
                x, y = _cell_xy(level, cell)
                cb = tile_bbox(level, x, y)
                if geometry_intersects_box(g, cb):
                    rows.append((pid, int(cell), b[0], b[1], b[2], b[3], wkt))
    cover = spark.createDataFrame(
        rows,
        "poly_id string, cell long, px0 double, py0 double, "
        "px1 double, py1 double, p_wkt string",
    )
    cand = layout.join(F.broadcast(cover), "cell")
    coarse = (
        (F.col("gx0") <= F.col("px1")) & (F.col("gx1") >= F.col("px0"))
        & (F.col("gy0") <= F.col("py1")) & (F.col("gy1") >= F.col("py0"))
    )

    @F.pandas_udf("boolean")
    def exact(wkts: pd.Series, pwkts: pd.Series) -> pd.Series:
        out = np.zeros(len(wkts), dtype=bool)
        for pw, idx in pwkts.groupby(pwkts).groups.items():
            p = parse_wkt(pw)
            pos = pwkts.index.get_indexer(idx)
            out[pos] = [
                geometry_intersects_polygon(parse_wkt(wkts.iloc[i]), p) for i in pos
            ]
        return pd.Series(out)

    return (
        cand.filter(coarse)
        .filter(exact(F.col(wkt_col), F.col("p_wkt")))
        .dropDuplicates([fid, "poly_id"])
        .drop("px0", "py0", "px1", "py1", "p_wkt")
    )


def query_geom_intersects(
    layout: DataFrame,
    poly_wkt: str,
    fid: str,
    wkt_col: str = "wkt",
    level: int = DEFAULT_LEVEL,
) -> DataFrame:
    """General INTERSECTS(row_geometry, polygon) over a geometry layout:
    cell-range prune on the polygon's bbox, codegen bbox-overlap coarse
    filter, exact geometry-vs-polygon kernel on survivors, id dedupe."""
    poly = parse_wkt(poly_wkt)
    b = poly.bbox()
    prune = None
    for lo, hi in _cell_ranges(b, level):
        c = F.col("cell").between(lo, hi)
        prune = c if prune is None else (prune | c)
    pruned = layout.filter(prune) if prune is not None else layout
    coarse = (
        (F.col("gx0") <= b[2]) & (F.col("gx1") >= b[0])
        & (F.col("gy0") <= b[3]) & (F.col("gy1") >= b[1])
    )

    @F.pandas_udf("boolean")
    def exact(wkts: pd.Series) -> pd.Series:
        p = parse_wkt(poly_wkt)
        return pd.Series([geometry_intersects_polygon(parse_wkt(w), p) for w in wkts])

    return (
        pruned.filter(coarse)
        .filter(exact(F.col(wkt_col)))
        .dropDuplicates([fid])
    )
