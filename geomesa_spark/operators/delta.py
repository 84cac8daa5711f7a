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


def crawl_frontier(
    delta: DataFrame,
    host_ranks: DataFrame,
    n_per_host: int,
    key_col: str = "url",
    weights: dict[str, int] | None = None,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Priority-ranked re-crawl frontier from a snapshot delta and host
    authority ranks — the crawl-scheduling step that closes the loop the
    delta opens: which urls to fetch next, budgeted per host (politeness
    + per-host fetch quotas are how every production crawler schedules).

    ``delta`` is :func:`crawl_delta` output; ``host_ranks`` is
    ``webgraph.pagerank`` output (``host``, ``rank_micro``) or any
    (host, int64-authority) table. ``removed`` urls are dropped (nothing
    to fetch); each survivor gets

        ``priority = weight(status) * (rank_micro + 1)``

    — all int64, so the ordering is bit-stable across engines and
    parallelism (the ``+1`` keeps status ordering meaningful for hosts
    missing from the rank table, whose rank coalesces to 0). Default
    weights: changed=3, added=2, unchanged=1 (a content change is the
    strongest refresh signal; Common Crawl's own refresh policy
    prioritizes churn); statuses missing from a custom ``weights`` get
    weight 1, they are never dropped. The per-host budget is the exact skew-aware
    top-n of :func:`~geomesa_spark.operators.corpus.cap_per_group`
    (broadcast pass-through for within-budget hosts, WindowGroupLimit
    partial top-n for the over-budget slice).

    Returns ``(key, host, status, priority bigint)``, at most
    ``n_per_host`` rows per host.

    Scale shape (10^12 urls): the rank join broadcasts (10^5-10^8 hosts
    fit; pass ``broadcast_ranks=False`` beyond that for a shuffle join
    keyed on host), so the only corpus-sized exchange is the one inside
    cap_per_group's over-budget slice — and that ships at most
    ``n_per_host`` rows per (host, partition).
    """
    from geomesa_spark.functions.urls import url_host
    from geomesa_spark.operators.corpus import cap_per_group

    w = weights or {"changed": 3, "added": 2, "unchanged": 1}
    # statuses missing from a custom weights dict default to 1 — only
    # 'removed' is ever dropped (the docstring contract); a partial
    # weights override must not silently discard fetchable urls
    weight = F.lit(1).cast("long")
    for status, mult in w.items():
        weight = F.when(F.col("status") == status, F.lit(int(mult))).otherwise(weight)

    ranks = host_ranks.select("host", "rank_micro")
    if broadcast_ranks:
        ranks = F.broadcast(ranks)
    scored = (
        delta.filter(F.col("status") != "removed")
        .select(F.col(key_col), url_host(F.col(key_col)).alias("host"), "status")
        .join(ranks, "host", "left")
        .select(
            key_col,
            "host",
            "status",
            (
                weight * (F.coalesce(F.col("rank_micro"), F.lit(0)) + F.lit(1))
            ).cast("long").alias("priority"),
        )
    )
    return cap_per_group(scored, "host", "priority", key_col, n_per_host)
