"""Streaming sessionization: the batch gap-session operator
(``operators/sessions.py``) re-expressed over an event stream.

Spark-first: instead of a custom stateful operator, this uses the
built-in ``session_window`` — a watermark-driven gap window whose state
merging, late-data handling, and spill behavior are implemented inside
the engine (the same reasoning that maps the reference's live-view
iterators onto built-in streaming state in ``streaming/live.py``,
``KFK/LiveKafkaConsumerFeatureSource.scala:28-191``).

Boundary semantics: ``session_window`` starts a new session when the
inter-event gap is **>= gap**, while the batch operator breaks on
**> gap_s** (the reference-style closed bound). The streaming twin
therefore matches the batch rollup exactly for any corpus with no gap
equal to the boundary; the equivalence test uses gaps strictly on either
side.

Scale shape: state is keyed by (entity, open session); the watermark
bounds it — sessions idle past ``watermark + gap`` finalize and leave
state. Throughput is one shuffle on the entity key per micro-batch, the
same key the batch operator shuffles on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_rollup(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark: str = "1 hour",
    type_col: str | None = "event_type",
) -> DataFrame:
    """Per-session rollup over a stream: one output row per closed session
    ``(entity, start_sec, end_sec, duration_s, n_events[, n_types])``.

    Emits in append mode once the watermark passes a session's close —
    exactly-once per session given a replayable source. ``approx_count_
    distinct`` keeps the per-type count one-pass and mergeable (streaming
    state cannot hold exact distinct sets without unbounded growth).
    """
    win = F.session_window(F.col(ts_col), f"{gap_s} seconds")
    aggs = [
        F.min(F.col(ts_col)).alias("start_ts"),
        F.max(F.col(ts_col)).alias("end_ts"),
        F.count("*").alias("n_events"),
    ]
    if type_col is not None:
        aggs.append(F.approx_count_distinct(F.col(type_col)).alias("n_types"))
    g = (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, F.col(entity_col).alias("entity"))
        .agg(*aggs)
    )
    start = F.col("start_ts").cast("timestamp").cast("long")
    end = F.col("end_ts").cast("timestamp").cast("long")
    cols = [
        F.col("entity"),
        start.alias("start_sec"),
        end.alias("end_sec"),
        (end - start).alias("duration_s"),
        F.col("n_events"),
    ]
    if type_col is not None:
        cols.append(F.col("n_types"))
    return g.select(*cols)
