"""URL canonicalization and web-table operators (pure codegen).

A Common-Crawl-scale training pipeline dedupes pages by *canonical* URL
before any content-level pass: the same page is crawled under dozens of
surface forms (mixed-case hosts, default ports, tracking parameters,
fragments, param order, trailing slashes). The reference's ingest
pipeline normalizes record keys the same way before Accumulo keying
(``CNV/geomesa-convert-text/.../DelimitedTextConverter.scala`` id-field
transform chain); here the whole normalization is a single whole-stage-
codegen expression tree — no Python in the hot path, so it runs at
parquet-decode speed over 10^12 urls and the dedup is one map-side-
combined hash aggregate on the canonical key.

Canonical form produced by :func:`canonicalize_url`:

* scheme and host lowercased;
* default ports dropped (``http:80``, ``https:443``), others kept;
* fragment removed;
* tracking query params removed (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``ref``), empty params removed;
* remaining query params sorted bytewise (crawlers emit them in
  arbitrary order); ``?`` dropped when nothing survives;
* trailing ``/`` stripped from non-root paths, empty path -> ``/``.

Every step has an exact DuckDB twin (regexp_extract + list_filter +
list_sort), so the driver oracle hash-verifies the whole chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped by the canonicalizer; anchored key= match
TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def url_scheme(url: Column) -> Column:
    """Lowercased scheme (``https``); empty string when absent."""
    return F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))


def url_hostport(url: Column) -> Column:
    """Raw ``host[:port]`` between ``://`` and the first ``/``, ``?`` or ``#``."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)


def url_host(url: Column) -> Column:
    """Lowercased host with any ``:port`` suffix removed."""
    return F.lower(F.substring_index(url_hostport(url), ":", 1))


def url_path(url: Column) -> Column:
    """Path component (may be empty), fragment and query excluded."""
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def url_query(url: Column) -> Column:
    """Query string after the first pre-fragment ``?``; empty when absent.

    The ``^[^#?]*`` anchor pins the FIRST ``?`` occurring before any
    ``#`` — a bare ``\\?`` would also match a ``?`` inside the fragment
    (``/p#frag?x=1``) and leak fragment text into the query.
    """
    return F.regexp_extract(url, r"^[^#?]*\?([^#]*)", 1)


def canonicalize_url(url: Column) -> Column:
    """Canonical URL as one codegen expression tree (contract above)."""
    scheme = url_scheme(url)
    hostport = url_hostport(url)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).otherwise(F.lit(""))
    # default ports vanish; any other survives
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))

    # strip one trailing slash; "" and "/" both normalize to "/"
    stripped = F.regexp_replace(url_path(url), "/$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)

    params = F.filter(
        F.split(url_query(url), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    query_part = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))

    return F.concat(scheme, F.lit("://"), host, port_part, path, query_part)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """One survivor per canonical URL: the latest crawl wins (max ``ts``,
    max ``id`` tiebreak).

    Scale shape: canonicalization is codegen on the scan, then ONE hash
    aggregate on the canonical key with map-side ``max_by`` partials —
    no window, no sort, no second shuffle. Canonical-url keys are
    high-cardinality and near-uniform (host+path), so no salting needed.

    Returns ``(canonical_url, doc_id, warc_ts, n_dups)``.
    """
    c = df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))
    pick = F.struct(F.col(ts_col), F.col(id_col))
    return c.groupBy("canonical_url").agg(
        F.max_by(F.col(id_col), pick).alias(id_col),
        F.max(F.col(ts_col)).alias(ts_col),
        F.count("*").alias("n_dups"),
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    size_col: str | None = None,
    approx: bool = False,
) -> DataFrame:
    """Per-host corpus profile: page count, distinct canonical pages, and
    (optionally) total payload bytes — the per-domain quota/robots table a
    crawl pipeline joins against. One hash aggregate on host. At 10^12
    rows pass ``approx=True``: ``approx_count_distinct`` (HLL) keeps the
    canonical-page count one-pass and mergeable, where exact
    ``count_distinct`` expands to a second aggregate over every distinct
    (host, canonical) pair. Exact is the default so the driver oracle can
    hash-verify the values.

    Returns ``(host, n_pages, n_canonical[, total_bytes])``.
    """
    c = df.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__canon", canonicalize_url(F.col(url_col))
    )
    cd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [
        F.count("*").alias("n_pages"),
        cd(F.col("__canon")).alias("n_canonical"),
    ]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col)).cast("long").alias("total_bytes"))
    return c.groupBy(F.col("__host").alias("host")).agg(*aggs)


def host_suffixes(host: Column) -> Column:
    """All dot-boundary suffixes of a host: ``a.b.c -> [a.b.c, b.c, c]``
    (the match set for domain-blocklist semantics, where an entry blocks
    itself and every subdomain)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(parts, i, n)),
    )


def blocklist_filter(
    df: DataFrame,
    blocked,
    url_col: str = "url",
    mode: str = "clean",
    max_entry_labels: int = 8,
) -> DataFrame:
    """Domain-blocklist filtering (the UT1/adult-blocklist stage of a
    crawl pipeline): a blocked domain removes its own pages and every
    subdomain's (dot-boundary suffix match, never substring).

    ``blocked`` is a DataFrame with a ``domain`` column or a plain list of
    domains. Scale shape at 10^12 rows: ZERO corpus shuffle — the verdict
    is a per-row function, computed by ``max_entry_labels`` successive
    broadcast equi-joins, one per candidate suffix depth (the j shortest
    dot-suffixes of the host; blocklist entries are overwhelmingly 2-3
    labels, so entries deeper than ``max_entry_labels`` labels are the
    documented out-of-scope tail). An explode + join-back would re-key the
    whole corpus by id; this stays a single map-side pass.

    ``mode='clean'`` returns the surviving rows unchanged;
    ``mode='flag'`` returns df + ``blocked_domain`` (NULL when clean; the
    lexicographically-smallest matching entry otherwise, deterministic).
    """
    spark = df.sparkSession
    if isinstance(blocked, (list, tuple)):
        blocked = spark.createDataFrame(
            [(d,) for d in blocked], "domain string"
        )
    bl = blocked.select(F.lower(F.col("domain")).alias("__bd")).distinct()
    url = F.col(url_col)
    out = df.withColumn("__sufs", host_suffixes(url_host(url)))
    match_cols = []
    for j in range(1, max_entry_labels + 1):
        # j-th SHORTEST suffix (TLD side): a.b.c -> j=1: c, j=2: b.c, ...
        blj = bl.withColumnRenamed("__bd", f"__bd{j}")
        out = out.join(
            F.broadcast(blj),
            F.get(F.col("__sufs"), F.size("__sufs") - j) == F.col(f"__bd{j}"),
            "left",
        )
        match_cols.append(F.col(f"__bd{j}"))
    verdict = (match_cols[0] if len(match_cols) == 1
               else F.least(*match_cols))  # least() skips NULLs
    out = out.withColumn("blocked_domain", verdict).drop(
        "__sufs", *[f"__bd{j}" for j in range(1, max_entry_labels + 1)]
    )
    if mode == "clean":
        return out.filter(F.col("blocked_domain").isNull()).drop(
            "blocked_domain"
        )
    if mode == "flag":
        return out
    raise ValueError(f"mode must be clean|flag, got {mode!r}")
