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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import epoch_seconds
from geomesa_spark.plans.compiler import GeoTable, _ts_lit


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


def surface(table: GeoTable, cell_col: str, value_col: str) -> DataFrame:
    """Per-cell max surface (``ACC/iterators/SurfaceAggregatingIterator``)."""
    return table.df.groupBy(cell_col).agg(F.max(value_col).alias("vmax"))
