"""Crawl-snapshot delta: classify every url across two crawl snapshots.

Continuous web crawls (Common Crawl's monthly dumps, any refresh crawl)
need the per-url diff between snapshots before anything downstream runs:
newly discovered pages go to the ingest pipeline, vanished pages are
tombstoned, content-changed pages re-enter dedup/quality scoring, and
unchanged pages keep their cached curation verdicts.  This is the
web-corpus analog of the reference's age-off + versioned-writer pair
(GeoMesa expires by dtg and lets a second write of the same feature id
replace the row — ``AgeOffIterator``/feature-id upsert semantics); here
the comparison is explicit so each class can route to a different
downstream stage.

Scale shape: ONE full-outer equi-join on the url key.  Urls are unique
per side (snapshot = one row per url after url_dedup), so there is no
key skew; both sides hash-partition on the same key, and at 10^12 rows a
bucketed/Iceberg layout on the url hash makes the join exchange-free.
The content comparison is a fingerprint equality — never the payload —
so only (url, fingerprint) pairs shuffle, not page bytes.  Pure codegen,
no Python, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Diff two crawl snapshots by ``key_col`` (one row per key per side).

    Returns ``(key, status, old_fp, new_fp)`` with status one of
    ``added`` (key only in ``new``), ``removed`` (only in ``old``),
    ``changed`` (both sides, fingerprints differ), ``unchanged``.
    """
    # presence is tested with explicit side markers, NOT fingerprint
    # nullness — a url present in both snapshots with a NULL fp on one
    # side is 'changed', never 'added'/'removed'
    o = old.select(
        F.col(key_col).alias("__k"),
        F.col(fp_col).alias("old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key_col).alias("__k"),
        F.col(fp_col).alias("new_fp"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, "__k", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("__k").alias(key_col),
        status.alias("status"),
        "old_fp",
        "new_fp",
    )


def delta_counts(delta: DataFrame) -> DataFrame:
    """Per-status row counts — the one-line crawl health summary
    (added/removed/changed/unchanged). One tiny hash aggregate."""
    return delta.groupBy("status").agg(F.count("*").alias("n"))
