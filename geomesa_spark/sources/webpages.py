"""Common-Crawl-style web-pages table: synthesis, ingest, geoparse.

The engine's primary input per BASELINE.json input_hint:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

* :func:`webpages_from_documents` derives the table deterministically from
  the driver-provided ``documents.parquet`` (no external data): url/warc_ts
  are arithmetic on ``doc_id``, html is a templated page embedding ``text``.
* :func:`extract_text` is the ingest/convert pipeline (the reference's
  converter chain, ``CNV/geomesa-convert-text/.../DelimitedTextConverter``,
  re-expressed as pure column transforms). **Invariant**: byte-identical
  extracted text per url — ``extract_text(html) == text`` exactly (tested).
* :func:`geoparse` is the deterministic url/text -> point derivation
  (FIXTURES.md F1): pure integer arithmetic so an ANSI-SQL oracle reproduces
  it bit-for-bit.
* :func:`synth_webpages` generates arbitrarily large page tables from
  ``spark.range`` (for benchmarks; fully distributed generation, no driver
  materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_EPOCH = "2010-05-07 00:00:00"

_WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "batch", "stream", "spark", "dup",
]
_LANGS = ["en", "de", "fr", "es", "pt", "ru", "zh", "ar", "hi", "ja"]


def _url_expr(doc_id: Column, lang: Column) -> Column:
    return F.format_string(
        "https://site%d.example/%s/page/%d", doc_id % 1000, lang, doc_id
    )


def _warc_ts_expr(doc_id: Column) -> Column:
    # crawl window bounded to one year (52 epoch-weeks) regardless of table
    # size, so the week-partitioned layout never fans into thousands of
    # directories at large doc counts
    return F.timestamp_seconds(
        F.unix_timestamp(F.lit(WARC_EPOCH), "yyyy-MM-dd HH:mm:ss")
        + (doc_id * 97) % 31_536_000
    )


def raw_url_expr(doc_id: Column) -> Column:
    """Crawl-surface url for a doc: the SAME page (group ``doc_id // 3``)
    appears under deterministic surface variants — mixed-case scheme/host,
    explicit default port, trailing slash, fragment, tracking params, and
    shuffled param order. ``functions.urls.canonicalize_url`` maps all
    three members of a group to one canonical form; every branch below is
    integer arithmetic on ``doc_id`` so a DuckDB oracle rebuilds the urls
    bit-for-bit (FIXTURES.md F1 style).

    Canonical target: ``https://site{g%997}.example/page/{g}?a={g%2}&b={g%4}``
    for ``g = doc_id // 3``.
    """
    d = doc_id
    g = F.floor(d / 3).cast("long")
    h = g % 997
    scheme = F.when(d % 3 == 0, F.lit("HTTPS://")).otherwise(F.lit("https://"))
    host = F.when(d % 2 == 0, F.format_string("Site%d.Example", h)).otherwise(
        F.format_string("site%d.example", h)
    )
    port = F.when(d % 5 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(
        F.format_string("/page/%d", g),
        F.when(d % 2 == 1, F.lit("/")).otherwise(F.lit("")),
    )
    query = F.when(
        d % 2 == 0,
        F.format_string("?b=%d&utm_campaign=c%d&a=%d", g % 4, d % 7, g % 2),
    ).otherwise(F.format_string("?a=%d&b=%d&fbclid=f%d", g % 2, g % 4, d))
    frag = F.when(d % 4 == 1, F.format_string("#sec%d", d)).otherwise(F.lit(""))
    return F.concat(scheme, host, port, path, query, frag)


def _html_expr(doc_id: Column, text: Column) -> Column:
    page = F.concat(
        F.lit("<html><head><title>doc"),
        doc_id.cast("string"),
        F.lit("</title></head><body><p>"),
        text,
        F.lit("</p></body></html>"),
    )
    return F.encode(page, "UTF-8")


def webpages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> (url, warc_ts, html, text, lang) + doc_id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    return docs.select(
        did,
        _url_expr(did, F.col("lang")).alias("url"),
        _warc_ts_expr(did).alias("warc_ts"),
        _html_expr(did, F.col("text")).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def extract_text(html: Column) -> Column:
    """The deterministic ingest transform: html bytes -> extracted text.

    Byte-identical-per-url invariant: for pages built by ``_html_expr``,
    ``extract_text(html) == text`` exactly.
    """
    # binary -> string via cast (zero-copy UTF8String wrap), NOT F.decode
    # (which round-trips through java.lang.String / UTF-16 and allocates 3x;
    # measured ~19% slower over 100M docs and worse GC-bound thread scaling)
    s = html.cast("string")
    body = F.substring_index(F.substring_index(s, "<p>", -1), "</p>", 1)
    return body


def extract_outlinks(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """href extraction from raw page bytes — the WAT step of a crawl
    pipeline (Common Crawl's WAT files are exactly this: per-page link
    metadata pulled from the WARC html), and the real upstream of the
    web-graph family (outlinks → ``webgraph.host_graph`` → pagerank →
    ``delta.crawl_frontier``).

    Emits one row per absolute http(s) href: ``(url, outlink)``. Both
    double- and single-quoted attributes are matched with two separate
    patterns rather than a ``(["'])...\\1`` backreference — RE2-class
    engines (and therefore the DuckDB twin) don't support backrefs, and
    staying inside the Java-regex/RE2 common subset is what keeps the
    operator oracle-checkable. Relative links are deliberately ignored
    (resolving them needs per-page base-url logic; CC's WAT extractor
    records absolutes as-is). Pages with no matches emit no rows.

    Scale shape (10^12 pages): pure whole-stage codegen — a zero-copy
    binary→string cast (see :func:`extract_text`), two
    ``regexp_extract_all`` calls, one explode. Zero exchanges; the
    explode fanout is the true outlink count (inherent output, ~50/page
    on real crawl data), and downstream ``host_graph`` collapses it
    map-side before anything shuffles.
    """
    s = F.col(html_col).cast("string")
    dq = F.regexp_extract_all(s, F.lit(r'href="(https?://[^"]+)"'), 1)
    sq = F.regexp_extract_all(s, F.lit(r"href='(https?://[^']+)'"), 1)
    return df.select(
        F.col(url_col).alias("url"),
        F.explode(F.concat(dq, sq)).alias("outlink"),
    )


def parse_sitemaps(
    df: DataFrame, xml_col: str = "xml", url_col: str = "url"
) -> DataFrame:
    """Sitemap / sitemap-index parsing — the crawl-DISCOVERY half of the
    politeness surface (``robots.py`` is the permission half; a crawler
    reads both before scheduling a host). Emits one row per entry:
    ``(url, kind, loc, lastmod)`` where ``kind`` is ``url`` for
    ``<urlset>`` page entries and ``sitemap`` for ``<sitemapindex>``
    child references (the nested-index case a 10^12-url frontier feeds
    back into its fetch queue), ``loc`` is the whitespace-trimmed
    ``<loc>`` target, and ``lastmod`` is the raw ``<lastmod>`` string or
    NULL — left unparsed because real-world lastmod values mix W3C
    dates, datetimes, and garbage; downstream ``delta.crawl_frontier``
    treats it as a refresh hint, not a timestamp.

    Like :func:`extract_outlinks`, every pattern stays in the
    Java-regex/RE2 common subset (``(?s)`` + non-greedy, no backrefs)
    so the DuckDB twin runs the SAME regexes — regex-semantics parity,
    not just row parity. Blocks without a ``<loc>`` emit no row.

    Scale shape (10^8 sitemaps/snapshot): pure whole-stage codegen —
    two ``regexp_extract_all`` calls, one explode, two per-block
    ``regexp_extract``; zero exchanges. The explode fanout is the
    sitemap's true entry count (capped at 50k by the protocol spec).
    """
    s = F.col(xml_col).cast("string")
    blocks = F.concat(
        F.transform(
            F.regexp_extract_all(s, F.lit(r"(?s)<url>(.*?)</url>"), 1),
            lambda b: F.struct(F.lit("url").alias("kind"), b.alias("block")),
        ),
        F.transform(
            F.regexp_extract_all(s, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1),
            lambda b: F.struct(F.lit("sitemap").alias("kind"), b.alias("block")),
        ),
    )
    e = df.select(
        F.col(url_col).alias("url"), F.explode(blocks).alias("e")
    ).select(
        "url",
        F.col("e.kind").alias("kind"),
        F.trim(F.regexp_extract(F.col("e.block"), r"<loc>([^<]*)</loc>", 1)).alias(
            "loc"
        ),
        F.nullif(
            F.regexp_extract(F.col("e.block"), r"<lastmod>([^<]*)</lastmod>", 1),
            F.lit(""),
        ).alias("lastmod"),
    )
    return e.filter(F.col("loc") != "")


def geoparse(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic geoparse: doc -> point (lon, lat).

    FIXTURES.md F1 rule, pure integer arithmetic (SQL-oracle-replicable):
        lon = -180 + (id*7919  % 36000)/100
        lat =  -90 + (id*104729 % 18000)/100
    """
    i = F.col(id_col).cast("long")
    return df.withColumn(
        "lon", (F.lit(-180.0) + ((i * 7919) % 36000) / 100.0).cast("double")
    ).withColumn(
        "lat", (F.lit(-90.0) + ((i * 104729) % 18000) / 100.0).cast("double")
    )


def synth_webpages(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Deterministic large-scale page generator (seedless arithmetic — the
    whole table is a pure function of the row id, so it is reproducible,
    resumable, and generated fully distributed)."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    lang = F.element_at(
        F.array(*[F.lit(l) for l in _LANGS]), (i % 10 + 1).cast("int")
    )
    words = F.array(*[F.lit(w) for w in _WORDS])
    text = F.concat_ws(
        " ",
        *[F.element_at(words, ((i * (j + 7) + j * j) % len(_WORDS) + 1).cast("int"))
          for j in range(24)],
    )
    return df.select(
        i.alias("doc_id"),
        _url_expr(i, lang).alias("url"),
        _warc_ts_expr(i).alias("warc_ts"),
        _html_expr(i, text).alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
