"""Physical layout: index-key enrichment + partitioned, z-sorted writes.

Rebuilds the reference's write path (``ACC/data/AccumuloFeatureWriter.scala``
fanning a feature out to record/Z3/ST/attr tables with engineered keys, plus
pre-split sharding ``ACC/index/QueryPlanners.scala:399-407``) as ONE columnar
table carrying computed key columns:

* ``week``  — epoch-week partition column (the Z3 table's 2-byte week prefix)
* ``z3``    — 21/21/20-bit Morton key, the sort column inside each partition
* ``z2``    — spatial-only Morton key (for time-unbounded queries)
* ``shard`` — hash salt, bounded write/read parallelism per week
  (the ST schema's ``%999#r`` random-shard analog, explicit skew mitigation)

At 100 TB the layout is what makes queries cheap: partition pruning on
``week``, Parquet row-group min/max skipping on the z-sorted ``z3`` column,
and the shard salt keeping any single (week, cell-prefix) hot spot spread
over ``n_shards`` files. All key computation is built-in Column expressions
(whole-stage codegen), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import epoch_seconds, week_expr
from geomesa_spark.functions.zudf import z2_udf, z3_udf
from geomesa_spark.plans.compiler import GeoTable


def enrich_geo(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str | None = "dtg",
    fid: str | None = "id",
    n_shards: int = 16,
    engine: str = "udf",
) -> DataFrame:
    """Add (week, z3, z2, shard) index-key columns.

    ``engine="udf"``: Arrow-batched numpy encoders. Used for in-memory
    GeoTables that will be *queried directly* — a python UDF is a
    materialization barrier, so Catalyst cannot inline the Morton bit-spread
    tree into each of a query prune's ~50 BETWEEN predicates (which explodes
    generated code; see ``functions/zudf.py``).

    ``engine="expr"``: pure JVM Column expressions (whole-stage codegen, no
    Arrow round-trip). Used by the layout *writer* — the keys land as real
    parquet columns, so the inlining hazard never arises and the write
    pipeline stays entirely JVM-side (measured ~25% faster end-to-end and
    required for ingest-throughput scaling).
    """
    if engine == "expr":
        from geomesa_spark.functions.zexpr import z2_expr, z3_expr

        out = df.withColumn("z2", z2_expr(F.col(lon), F.col(lat)))
        if dtg is not None:
            out = out.withColumn("week", week_expr(F.col(dtg))).withColumn(
                "z3", z3_expr(F.col(lon), F.col(lat), F.col(dtg))
            )
    else:
        out = df.withColumn("z2", z2_udf(F.col(lon), F.col(lat)))
        if dtg is not None:
            out = out.withColumn("week", week_expr(F.col(dtg))).withColumn(
                "z3", z3_udf(F.col(lon), F.col(lat), epoch_seconds(F.col(dtg)))
            )
    salt_src = F.col(fid).cast("string") if fid else F.concat_ws(",", F.col(lon), F.col(lat))
    out = out.withColumn("shard", F.pmod(F.xxhash64(salt_src), F.lit(n_shards)).cast("int"))
    return out


def write_layout(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str | None = "dtg",
    fid: str | None = "id",
    n_shards: int = 16,
    target_partitions: int | None = None,
    attr_indexes: list[str] | None = None,
    st_copy: bool = False,
) -> None:
    """Write the engine's physical layout to parquet.

    Range-repartition by (week, shard, z3) then sort within partitions by z3
    so every output file covers a tight z interval -> row-group min/max
    skipping approximates the reference's key-range scans. Directory
    partitioning on week gives partition pruning for bounded-time queries.

    ``attr_indexes``: per-column secondary copies under ``path/_attr/<col>/``
    (underscore-prefixed so the main reader ignores them), range-partitioned
    and sorted by that column — the reference's lexicoded attribute index
    (``ACC/data/tables/AttributeTable.scala:83-115``) as sorted parquet:
    a predicate on the column reaches the scan as a PushedFilter and
    row-group min/max stats skip everything else.
    """
    enriched = enrich_geo(df, lon, lat, dtg, fid, n_shards, engine="expr")
    parts = target_partitions or max(df.sparkSession.sparkContext.defaultParallelism, n_shards)
    if dtg is not None:
        main = enriched.repartitionByRange(parts, F.col("week"), F.col("shard"), F.col("z3"))
        main = main.sortWithinPartitions("week", "z3")
        main.write.mode("overwrite").partitionBy("week").parquet(path)
    else:
        main = enriched.repartitionByRange(parts, F.col("shard"), F.col("z2"))
        main = main.sortWithinPartitions("z2")
        main.write.mode("overwrite").parquet(path)
    for col in attr_indexes or []:
        # secondary sort key z3/z2 keeps rows for one attribute value
        # spatially clustered (AttributeTable rows carry the z-index suffix)
        zsec = "z3" if dtg is not None else "z2"
        sec = enriched.repartitionByRange(parts, F.col(col), F.col(zsec))
        sec = sec.sortWithinPartitions(col, zsec)
        sec.write.mode("overwrite").parquet(f"{path}/_attr/{col}")
    if st_copy and dtg is not None:
        # ST (z2-sorted) copy: the main table's z3 sort interleaves time
        # bits, scrambling spatial locality — time-unbounded bbox queries
        # need files sorted by the spatial-only key to skip row groups
        # (the 4-table fanout's ST table, AccumuloFeatureWriter.scala)
        st = enriched.repartitionByRange(parts, F.col("z2"))
        st = st.sortWithinPartitions("z2")
        st.write.mode("overwrite").parquet(f"{path}/_st")
    # whole-layout completion marker, written only after EVERY sub-table:
    # the main table's _SUCCESS lands before the _attr/_st copies, so a
    # crash in between would leave a cache that passes a main-only check
    # but that read_layout(..., st_copy/attr_indexes) cannot open. Readers
    # gate on this marker (on an object store this is a marker object).
    import os

    with open(os.path.join(path, "_LAYOUT_SUCCESS"), "w") as fh:
        fh.write("ok\n")


def compact_layout(
    spark: SparkSession,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str | None = "dtg",
    fid: str | None = "id",
    n_shards: int = 16,
    target_partitions: int | None = None,
    attr_indexes: list[str] | None = None,
    st_copy: bool = False,
) -> None:
    """Rewrite a layout at a new file granularity (merge small files,
    restore the z-sort) — the maintenance pass every long-lived layout
    needs after incremental ingests.

    Mirrors Accumulo's background major compaction (the reference's tables
    rely on it to merge minor-compaction files and keep key-ranges
    scannable; ``TLS/commands/TableConfCommand.scala`` exposes the knobs).
    Implementation: re-run the layout writer on the current rows into a
    sibling directory, then swap directories — readers gating on
    ``_LAYOUT_SUCCESS`` never observe a half-written layout. On an object
    store with a table format the swap is the metadata commit
    (rewrite-files); on a filesystem it's two renames.

    All derived key columns are recomputed (deterministic expressions), so
    a compaction is also an upgrade path when the key derivation gains
    columns.
    """
    import os
    import shutil

    tmp = path.rstrip("/") + "__compacting"
    old = path.rstrip("/") + "__old"
    # crash recovery, covering every window of the two-rename swap below:
    # - crashed between the renames: path is gone, __old holds the intact
    #   previous layout -> restore it and redo the compaction
    # - crashed before rmtree(__old): path is the new layout -> just
    #   discard the leftover
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)
    if not os.path.exists(os.path.join(path, "_LAYOUT_SUCCESS")):
        raise ValueError(f"not a complete layout: {path}")
    df = spark.read.parquet(path)
    base = [c for c in df.columns if c not in ("week", "z3", "z2", "shard")]
    if os.path.exists(tmp):
        shutil.rmtree(tmp)  # leftover from a crashed compaction; rebuild
    write_layout(
        df.select(*base),
        tmp,
        lon=lon,
        lat=lat,
        dtg=dtg,
        fid=fid,
        n_shards=n_shards,
        target_partitions=target_partitions,
        attr_indexes=attr_indexes,
        st_copy=st_copy,
    )
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def read_layout(
    spark: SparkSession,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str | None = "dtg",
    fid: str | None = "id",
    attr_indexes: list[str] | None = None,
    cardinality: dict[str, str] | None = None,
    st_copy: bool = False,
) -> GeoTable:
    """Open a written layout. ``attr_indexes`` lists the secondary copies to
    attach (written by :func:`write_layout`); ``cardinality`` passes the
    per-attribute cost hints through to the planner; ``st_copy`` attaches
    the z2-sorted ST copy for time-unbounded spatial queries."""
    df = spark.read.parquet(path)
    cols = set(df.columns)
    attr_tables = {
        col: spark.read.parquet(f"{path}/_attr/{col}") for col in attr_indexes or []
    }
    st_table = spark.read.parquet(f"{path}/_st") if st_copy else None
    return GeoTable(
        df=df,
        lon=lon,
        lat=lat,
        dtg=dtg,
        fid=fid,
        week_col="week" if "week" in cols else None,
        z3_col="z3" if "z3" in cols else None,
        z2_col="z2" if "z2" in cols else None,
        attr_tables=attr_tables,
        cardinality=cardinality or {},
        st_table=st_table,
    )


def as_geotable(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    dtg: str | None = "dtg",
    fid: str | None = "id",
    n_shards: int = 16,
) -> GeoTable:
    """Enrich an in-memory DataFrame and wrap it as a queryable GeoTable."""
    enriched = enrich_geo(df, lon, lat, dtg, fid, n_shards)
    return GeoTable(
        df=enriched,
        lon=lon,
        lat=lat,
        dtg=dtg,
        fid=fid,
        week_col="week" if dtg else None,
        z3_col="z3" if dtg else None,
        z2_col="z2",
    )
