"""Streaming view semantics: live upsert cache with TTL, and replay.

Rebuilds the reference's Kafka feature-store consumers:

* Live view (``KFK/LiveKafkaConsumerFeatureSource.scala:28-191``): consume
  ``GeoMessage``s — CreateOrUpdate(id, feature) | Delete(id) | Clear — into a
  keyed upsert cache with expire-after-write TTL. Here:
  ``readStream -> applyInPandasWithState`` keyed by feature id with a
  processing-time timeout implementing the TTL eviction.
* Replay / time travel (``KFK/ReplayKafkaConsumerFeatureSource.scala:32-123``):
  a query at time T sees the state reconstructed from messages in
  ``[T - read_behind, T]``. Here a *batch* reconstruction over the message
  log: window-limited last-update-per-id minus deletes/clears —
  the snapshot is a plain DataFrame (and SQL-oracle-checkable).

Message schema (FIXTURES.md F6):
``offset long, kind string (create|delete|clear), id string,
lon double, lat double, ts timestamp``.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def replay_snapshot(messages: DataFrame, at: datetime, read_behind_s: float | None = None) -> DataFrame:
    """State at time ``at``: last create/update per id wins; deletes remove;
    a ``clear`` discards everything at or before it (``ReplayConfig`` and the
    snapshot reconstruction at ``ReplayKafkaConsumerFeatureSource.scala:111-123``).
    """
    ts_at = F.lit(at.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp")
    win = messages.filter(F.col("ts") <= ts_at)
    if read_behind_s is not None:
        lo = at - timedelta(seconds=read_behind_s)
        win = win.filter(F.col("ts") >= F.lit(lo.strftime("%Y-%m-%d %H:%M:%S.%f")).cast("timestamp"))

    last_clear = win.filter(F.col("kind") == "clear").agg(
        F.max("offset").alias("clear_offset")
    )
    with_clear = win.crossJoin(F.broadcast(last_clear)).filter(
        F.col("clear_offset").isNull() | (F.col("offset") > F.col("clear_offset"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.col("offset").desc())
    latest = (
        with_clear.filter(F.col("kind").isin("create", "delete"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "clear_offset")
    )
    return latest.filter(F.col("kind") == "create").select("id", "lon", "lat", "ts")


CLEAR_MARKER = "__clear__"

MESSAGE_SCHEMA = (
    "offset long, kind string, id string, lon double, lat double, ts timestamp"
)


def kafka_reader_options(
    brokers: str, topic: str, starting_offsets: str = "latest"
) -> dict[str, str]:
    """The exact ``readStream.format("kafka")`` options a broker deployment
    uses (``KFK/LiveKafkaConsumerFeatureSource.scala:28-191`` consumer
    config: bootstrap servers, topic subscription, offset reset). Pure data,
    so the contract is testable without a broker or the connector jar."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        # at-least-once + idempotent upsert keyed on feature id replaces the
        # reference's consumer-group offset management
        "failOnDataLoss": "false",
    }


def kafka_message_stream(
    spark, brokers: str, topic: str, starting_offsets: str = "latest"
) -> DataFrame:
    """GeoMessage stream from a Kafka topic: ``readStream.format("kafka")``
    + JSON value parse into :data:`MESSAGE_SCHEMA`, ready for
    :func:`live_view`.

    ENV GATE: needs the ``spark-sql-kafka-0-10`` connector on the session
    classpath (``spark-submit --packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``) and a
    reachable broker. In this sandbox neither exists, so the call raises a
    documented EnvironmentError; the file-stream twin
    (``convert_stream.file_message_stream``) drives the identical downstream
    topology in tests.
    """
    opts = kafka_reader_options(brokers, topic, starting_offsets)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent -> AnalysisException
        raise EnvironmentError(
            "kafka connector not on the classpath; deploy with "
            "spark-submit --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            f"and a reachable broker ({brokers})"
        ) from e
    parsed = raw.select(
        F.col("offset").cast("long").alias("offset"),
        F.from_json(F.col("value").cast("string"), MESSAGE_SCHEMA.replace("offset long, ", "")).alias("m"),
    )
    return parsed.select(
        "offset", "m.kind", "m.id", "m.lon", "m.lat", "m.ts"
    )


def live_snapshot(spark, table: str) -> DataFrame:
    """Current live state from a sink table fed by :func:`live_view`.

    Latest row per id wins; ids whose last update predates the newest global
    clear marker (or that are dead/expired) are dropped. This is where the
    reference's cache-wide ``Clear`` semantics are applied — scalably, as a
    broadcast of one scalar against the keyed state output.
    """
    df = spark.table(table)
    clears = df.filter(F.col("id") == CLEAR_MARKER).agg(
        F.max("ts").alias("clear_ts")
    )
    from pyspark.sql import Window

    # ties on ts prefer the tombstone (alive=False first): a delete/expiry
    # emitted with the same event time as the create it supersedes must win
    w = Window.partitionBy("id").orderBy(
        F.col("ts").desc_nulls_last(), F.col("alive").asc()
    )
    latest = (
        df.filter(F.col("id") != CLEAR_MARKER)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        latest.crossJoin(F.broadcast(clears))
        .filter(
            F.col("alive")
            & (F.col("clear_ts").isNull() | (F.col("ts") > F.col("clear_ts")))
        )
        .drop("clear_ts")
    )


def live_view(message_stream: DataFrame, ttl_seconds: float = 300.0) -> DataFrame:
    """Streaming keyed upsert with TTL over a message stream.

    Input: a *streaming* DataFrame with the message schema above. Output: a
    streaming DataFrame of (id, lon, lat, ts, alive) state changes; downstream
    sinks (memory table / parquet) hold the live snapshot. TTL is enforced
    with ``GroupStateTimeout.ProcessingTimeTimeout`` — the expire-after-write
    cache eviction of the reference's live view.
    """

    out_schema = "id string, lon double, lat double, ts timestamp, alive boolean"
    state_schema = "lon double, lat double, ts timestamp"

    def update(key, batches, state: GroupState):
        if state.hasTimedOut:
            # carry the expired entry's event time on the tombstone: a
            # ts=None tombstone sorts LAST under the snapshot's ts-desc
            # window and the stale create row would resurrect
            old = state.get if state.exists else None
            state.remove()
            yield pd.DataFrame(
                {"id": [key[0]], "lon": [None], "lat": [None],
                 "ts": [old[2] if old else None], "alive": [False]}
            )
            return
        if key[0] is None:
            # Global `clear` control messages arrive keyed on id=None: emit a
            # marker row carrying the clear's event time; live_snapshot()
            # applies it across all keys. Keyed state stays shard-parallel —
            # a truly global wipe inside a keyed operator would serialize on
            # one key at 100 TB.
            clear_ts = None
            for pdf in batches:
                c = pdf[pdf["kind"] == "clear"]
                if len(c):
                    t = c["ts"].max()
                    clear_ts = t if clear_ts is None else max(clear_ts, t)
            if clear_ts is not None:
                yield pd.DataFrame(
                    {"id": [CLEAR_MARKER], "lon": [None], "lat": [None],
                     "ts": [clear_ts], "alive": [False]}
                )
            return
        last = None
        deleted = False
        del_ts = None
        for pdf in batches:
            pdf = pdf.sort_values("offset")
            for _, row in pdf.iterrows():
                if row["kind"] in ("delete", "clear"):
                    deleted = True
                    last = None
                    del_ts = row["ts"]
                elif row["kind"] == "create":
                    deleted = False
                    last = (row["lon"], row["lat"], row["ts"])
        if deleted and last is None:
            state.remove()
            # tombstone carries the delete's event time so it outranks the
            # earlier create in the snapshot window (cross-batch deletes)
            yield pd.DataFrame(
                {"id": [key[0]], "lon": [None], "lat": [None],
                 "ts": [del_ts], "alive": [False]}
            )
        elif last is not None:
            state.update(last)
            state.setTimeoutDuration(int(ttl_seconds * 1000))
            yield pd.DataFrame(
                {"id": [key[0]], "lon": [last[0]], "lat": [last[1]],
                 "ts": [last[2]], "alive": [True]}
            )

    return message_stream.groupBy("id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
