"""Gap-based sessionization over event streams.

Web-scale analog of the reference's per-track grouping: the BIN export
sorts features into per-track time-ordered chunks
(``ACC/iterators/BinAggregatingIterator.scala`` track/label keying,
``FLT/function/Convert2ViewerFunction.scala`` record layout); here the
same per-entity time ordering carries one step further into sessions — a
new session starts whenever an entity goes quiet for longer than
``gap_s``. This is the standard curation step for interaction/click logs
before they become training trajectories.

Scale shape: one shuffle on the entity key, then a per-entity ordered
window (lag + running sum of boundary flags). The sort is bounded by the
per-entity event count — web entities run 10^2..10^6 events, which fits a
single task comfortably; pathological hot keys (bots, scrapers) are the
real risk at 10^12 rows, so ``cap_hot_entities`` drops entities above a
count threshold via a count-aggregate + broadcast semi-join BEFORE the
window sort ever sees them (same discipline as the dedup family's
``bucket_cap`` star-linking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import epoch_seconds


def cap_hot_entities(
    df: DataFrame, entity_col: str, max_events: int
) -> DataFrame:
    """Drop entities with more than ``max_events`` rows (bot guard).

    The over-cap entity list is tiny (it's the pathological tail), so it
    broadcasts; the filter is an equi-anti-join, no sort.
    """
    hot = (
        df.groupBy(entity_col)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > max_events)
        .select(entity_col)
    )
    return df.join(F.broadcast(hot), entity_col, "left_anti")


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
    max_events_per_entity: int | None = None,
) -> DataFrame:
    """Attach ``session_idx`` (1-based per entity) and ``ts_sec`` to every
    event: a session break happens where the gap to the previous event of
    the same entity exceeds ``gap_s`` seconds.

    Ordering is (ts_sec, id) so ties are deterministic. One window pass
    computes both the lag and the running boundary count.
    """
    if max_events_per_entity is not None:
        df = cap_hot_entities(df, entity_col, max_events_per_entity)
    sec = epoch_seconds(F.col(ts_col))
    w = Window.partitionBy(entity_col).orderBy("ts_sec", id_col)
    out = df.withColumn("ts_sec", sec)
    gap = F.col("ts_sec") - F.lag("ts_sec").over(w)
    boundary = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    return out.withColumn(
        "session_idx",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_rollup(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
    type_col: str | None = "event_type",
    max_events_per_entity: int | None = None,
) -> DataFrame:
    """One row per session: bounds, length, event count, distinct types.

    The rollup after :func:`sessionize` is a plain hash aggregate on
    (entity, session_idx) — already co-partitioned with the window's
    shuffle, so Catalyst reuses the exchange and the rollup adds no new
    shuffle.

    Returns ``(entity, session_idx, start_sec, end_sec, duration_s,
    n_events[, n_types])``.
    """
    s = sessionize(df, entity_col, ts_col, id_col, gap_s, max_events_per_entity)
    aggs = [
        F.min("ts_sec").alias("start_sec"),
        F.max("ts_sec").alias("end_sec"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("duration_s"),
        F.count("*").alias("n_events"),
    ]
    if type_col is not None:
        aggs.append(F.count_distinct(F.col(type_col)).alias("n_types"))
    return s.groupBy(F.col(entity_col).alias("entity"), "session_idx").agg(*aggs)
