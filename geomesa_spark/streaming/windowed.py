"""Watermarked windowed aggregations over geo streams.

The streaming face of the density/tile operators: event-time tumbling (or
sliding) windows with a watermark bounding late data, grouped on the same
pure-arithmetic cell keys the batch operators use — Spark's streaming
state store handles partial aggregation and late-row reconciliation, so
the operator is a plain ``groupBy(window(...), cell)`` (no custom state).

Complements ``streaming/live.py`` (point-in-time upsert view): the live
view answers "where is everything NOW", these answer "how much happened
per cell per window" with late-arrival correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import tile_id_expr


def streaming_tile_density(
    stream: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    ts: str = "ts",
    level: int = 6,
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Per-(window, tile) event counts with an event-time watermark.

    Late rows within the watermark update their window's counts; rows later
    than the watermark are dropped (bounded state — at 10^12-row streams
    the watermark is what keeps the state store finite). Output mode:
    ``update`` (or ``append`` after the watermark closes a window).
    """
    win = (
        F.window(F.col(ts), window_duration, slide)
        if slide
        else F.window(F.col(ts), window_duration)
    )
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(
            win.alias("win"),
            tile_id_expr(F.col(lon), F.col(lat), level).alias("tile_id"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "tile_id",
            "n",
        )
    )
