"""SparkSession helpers tuned for the engine.

Scale stance: these settings are chosen for a multi-executor cluster reading
100 TB (AQE on, skew-join on, sane shuffle partitioning) and merely *also*
work on local[N] where the tests run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(app: str = "geomesa-spark", master: str | None = None,
                shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = b.getOrCreate()
    return spark


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session
    (the driver hands us its own SparkSession in ``__spark_entry__``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    return spark
