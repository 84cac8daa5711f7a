"""Tube select: spatio-temporal band join around a moving track.

Rebuilds ``TubeSelectProcess`` (``ACC/process/tube/TubeSelectProcess.scala:
36-190``, ``TubeBuilder.scala:30-185``): given an ordered track of (time,
position) samples, buffer each sample in space (fixed meters or
maxSpeed*maxTime) and bin in time, then return features falling inside the
moving tube (position within the bin's buffer during the bin's interval).

Spark shape: the tube is tiny (driver-built bins) -> broadcast join with a
pure-arithmetic time+bbox prefilter and exact haversine residual; this is the
interval-join + spatial-predicate composition the reference issues as
repeated per-bin queries, collapsed into one distributed join.
``gap_fill`` linearly interpolates extra bins between samples
(``TubeBuilder``'s interpolated gap-fill).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import epoch_seconds
from geomesa_spark.geom.kernels import meters_to_degrees
from geomesa_spark.plans.compiler import GeoTable


def build_tube_bins(
    track: list[tuple[datetime, float, float]],
    buffer_m: float,
    bin_seconds: float,
    gap_fill: bool = False,
) -> list[tuple[int, int, int, float, float, float]]:
    """-> [(bin_id, t_lo_s, t_hi_s, c_lon, c_lat, radius_m)]"""
    samples = sorted((int(t.timestamp()), lon, lat) for t, lon, lat in track)
    if gap_fill and len(samples) > 1:
        filled = []
        for (t0, x0, y0), (t1, x1, y1) in zip(samples, samples[1:]):
            filled.append((t0, x0, y0))
            steps = int((t1 - t0) // bin_seconds)
            for s in range(1, steps):
                f = s * bin_seconds / (t1 - t0)
                filled.append((int(t0 + s * bin_seconds), x0 + f * (x1 - x0), y0 + f * (y1 - y0)))
        filled.append(samples[-1])
        samples = filled

    bins = []
    for i, (ts, lon, lat) in enumerate(samples):
        bins.append((
            i,
            int(ts - bin_seconds / 2),
            int(ts + bin_seconds / 2),
            float(lon),
            float(lat),
            float(buffer_m),
        ))
    return bins


def tube_select(
    points: GeoTable,
    track: list[tuple[datetime, float, float]],
    buffer_m: float,
    bin_seconds: float,
    gap_fill: bool = False,
) -> DataFrame:
    """Features inside the moving tube; attaches ``tube_bin`` and ``dist_m``."""
    spark = points.df.sparkSession
    bins = build_tube_bins(track, buffer_m, bin_seconds, gap_fill)
    rows = []
    for b, t_lo, t_hi, c_lon, c_lat, r in bins:
        d = meters_to_degrees(r, c_lat)
        rows.append((b, t_lo, t_hi, c_lon, c_lat, r,
                     c_lon - d, c_lat - d, c_lon + d, c_lat + d))
    bins_df = spark.createDataFrame(
        rows,
        "tube_bin int, t_lo long, t_hi long, c_lon double, c_lat double, radius_m double, "
        "b_lon_min double, b_lat_min double, b_lon_max double, b_lat_max double",
    )
    lon, lat = F.col(points.lon), F.col(points.lat)
    secs = epoch_seconds(F.col(points.dtg))
    joined = points.df.join(
        F.broadcast(bins_df),
        secs.between(F.col("t_lo"), F.col("t_hi"))
        & lon.between(F.col("b_lon_min"), F.col("b_lon_max"))
        & lat.between(F.col("b_lat_min"), F.col("b_lat_max")),
        "inner",
    )
    from geomesa_spark.geom.distance import haversine_expr

    dist = haversine_expr(lon, lat, F.col("c_lon"), F.col("c_lat"))
    out = (
        joined.withColumn("dist_m", dist)
        .filter(F.col("dist_m") <= F.col("radius_m"))
        .drop("t_lo", "t_hi", "c_lon", "c_lat", "radius_m",
              "b_lon_min", "b_lat_min", "b_lon_max", "b_lat_max")
    )
    # a feature may fall in several overlapping bins: keep the closest bin
    if points.fid:
        from pyspark.sql import Window

        w = Window.partitionBy(points.fid).orderBy(F.col("dist_m").asc(), F.col("tube_bin").asc())
        out = out.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    return out
