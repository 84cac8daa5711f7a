"""URL canonicalization / dedup / domain-stats (functions/urls.py).

The canonicalizer is a single codegen expression tree; these tests pin its
contract on literal edge cases, prove idempotence, and check the two
operators built on it. The driver oracle (`url_canonicalize`, `url_dedup`,
`domain_stats`) hash-verifies the same chain against an independent DuckDB
implementation; here we also cover inputs the deterministic generator
never produces (weird ports, ref params, root paths).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from geomesa_spark.functions.urls import (
    canonicalize_url,
    domain_stats,
    url_dedup,
    url_host,
)

CASES = [
    # (raw, canonical)
    ("https://Example.COM/path/", "https://example.com/path"),
    ("HTTP://example.com:80/a?x=1", "http://example.com/a?x=1"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8080/a", "https://example.com:8080/a"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("https://example.com/a?utm_source=x&b=2&a=1#frag", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?fbclid=z", "https://example.com/a"),
    ("https://example.com/a?gclid=1&msclkid=2&ref=hn", "https://example.com/a"),
    ("https://example.com/a?b=2&&a=1", "https://example.com/a?a=1&b=2"),
    # "ref=" is tracking but "referrer=" (different key) is not
    ("https://example.com/a?referrer=x", "https://example.com/a?referrer=x"),
    # deep path keeps interior slashes, loses only the trailing one
    ("https://example.com/a/b/c/", "https://example.com/a/b/c"),
]


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in
            df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_canonicalize_literal_cases(spark):
    got = _canon(spark, [raw for raw, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r}: got {g!r}, want {want!r}"


def test_canonicalize_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the form is a fixpoint."""
    once = _canon(spark, [raw for raw, _ in CASES])
    twice = _canon(spark, once)
    assert twice == once


def test_canonicalize_is_codegen_only(spark):
    """No python/pandas stage: the plan must not contain any UDF eval."""
    df = spark.range(100).select(
        canonicalize_url(F.format_string("https://S%d.Ex/p/%d/?utm_a=1&z=%d", F.col("id") % 7, F.col("id"), F.col("id") % 3)).alias("c")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_raw_url_groups_collapse(spark):
    """All three surface variants of a page group canonicalize to the same
    url, and distinct groups never collide."""
    from geomesa_spark.sources.webpages import raw_url_expr

    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        raw_url_expr(F.col("id")).alias("url"),
    )
    c = df.select(
        F.floor(F.col("doc_id") / 3).alias("g"),
        canonicalize_url(F.col("url")).alias("c"),
    )
    per_group = c.groupBy("g").agg(F.count_distinct("c").alias("n")).collect()
    assert all(r["n"] == 1 for r in per_group)
    assert c.select("c").distinct().count() == 100


def test_url_dedup_latest_crawl_wins(spark):
    rows = [
        (1, "https://a.com/x?utm_source=m", 100),
        (2, "https://A.com/x/", 300),          # same page, later crawl
        (3, "https://a.com:443/x", 200),       # same page, middle crawl
        (4, "https://a.com/y", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts long")
    out = {r["canonical_url"]: (r["doc_id"], r["ts"], r["n_dups"])
           for r in url_dedup(df, "url", "ts", "doc_id").collect()}
    assert out == {
        "https://a.com/x": (2, 300, 3),
        "https://a.com/y": (4, 50, 1),
    }


def test_url_dedup_ts_tie_breaks_by_id(spark):
    rows = [(7, "https://a.com/x", 100), (9, "https://a.com/x#f", 100)]
    df = spark.createDataFrame(rows, "doc_id long, url string, ts long")
    [r] = url_dedup(df, "url", "ts", "doc_id").collect()
    assert (r["doc_id"], r["n_dups"]) == (9, 2)


def test_domain_stats_counts_and_bytes(spark):
    rows = [
        (1, "https://a.com/x?utm_source=1", 10),
        (2, "https://A.COM/x/", 20),            # same canonical as 1
        (3, "https://a.com/y", 30),
        (4, "https://b.org/z", 5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, nb long")
    out = {r["host"]: (r["n_pages"], r["n_canonical"], r["total_bytes"])
           for r in domain_stats(df, "url", size_col="nb").collect()}
    assert out == {"a.com": (3, 2, 60), "b.org": (1, 1, 5)}


def test_domain_stats_approx_mode_close(spark):
    """approx=True (the 10^12-row path) uses HLL; on 200 distinct pages it
    must land within the standard ~5% error of exact."""
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.format_string("https://h%d.example/p/%d", F.col("id") % 4, F.col("id")).alias("url"),
    )
    exact = {r["host"]: r["n_canonical"]
             for r in domain_stats(df, "url").collect()}
    approx = {r["host"]: r["n_canonical"]
              for r in domain_stats(df, "url", approx=True).collect()}
    assert set(exact) == set(approx)
    for h, n in exact.items():
        assert abs(approx[h] - n) <= max(2, int(0.1 * n))


def test_url_host_on_bare_hostport(spark):
    df = spark.createDataFrame(
        [("https://A.com:8080/p",), ("http://b.com/q",)], "url string")
    got = [r["h"] for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    assert got == ["a.com", "b.com"]


# ---------------------------------------------------------------------------
# property-based: arbitrary component-built urls (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_label = st.text(alphabet="abcDEfgH01", min_size=1, max_size=6)
_key = st.sampled_from(["a", "b", "zz", "utm_source", "utm_campaign",
                        "fbclid", "gclid", "ref", "referrer", "q1"])
_val = st.text(alphabet="xy9", min_size=0, max_size=3)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS", "hTtPs"]))
    host = ".".join(draw(st.lists(_label, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_label, min_size=0, max_size=3))
    path = ("/" + "/".join(segs)) if segs else ""
    if draw(st.booleans()) and path:
        path += "/"
    params = draw(st.lists(st.tuples(_key, _val), min_size=0, max_size=4))
    query = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#x", "#sec1"]))
    return f"{scheme}://{host}{port}{path}" + (f"?{query}" if query else "") + frag


@settings(max_examples=12, deadline=None)
@given(urls=st.lists(_urls(), min_size=1, max_size=24))
def test_canonicalize_properties(spark, urls):
    got = _canon(spark, urls)
    # idempotence: the canonical form is a fixpoint
    assert _canon(spark, got) == got
    for raw, c in zip(urls, got):
        scheme, rest = c.split("://", 1)
        # scheme/host lowercased; fragment gone; tracking params gone
        assert scheme == scheme.lower()
        hostport = rest.split("/", 1)[0].split("?", 1)[0]
        assert hostport == hostport.lower()
        assert "#" not in c
        for bad in ("utm_source=", "utm_campaign=", "fbclid=", "gclid="):
            assert bad not in c
        # "referrer" (not a tracking key) survives whenever raw had it
        # with a non-empty pair, unless it was only in the fragment
        # default ports never survive
        assert not (scheme == "http" and hostport.endswith(":80"))
        assert not (scheme == "https" and hostport.endswith(":443"))
        # surviving params are sorted
        if "?" in c:
            ps = c.split("?", 1)[1].split("&")
            assert ps == sorted(ps) and all(p for p in ps)


def test_fragment_question_mark_does_not_leak(spark):
    """A '?' inside the fragment must not be parsed as a query: two crawls
    differing only in fragment text canonicalize identically."""
    got = _canon(spark, [
        "https://h.example/p#frag?x=1",
        "https://h.example/p",
        "https://h.example/p?a=1#frag?b=2",
    ])
    assert got[0] == "https://h.example/p"
    assert got[1] == "https://h.example/p"
    assert got[2] == "https://h.example/p?a=1"


# ---------------------------------------------------------------------------
# round 4: domain blocklist
# ---------------------------------------------------------------------------


def test_host_suffixes(spark):
    from geomesa_spark.functions.urls import host_suffixes
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a.b.example.com",)], "h string")
    got = df.select(host_suffixes(F.col("h")).alias("s")).first()["s"]
    assert got == ["a.b.example.com", "b.example.com", "example.com", "com"]


def test_blocklist_filter_suffix_semantics(spark):
    from geomesa_spark.functions.urls import blocklist_filter

    rows = [
        (1, "https://Ads.Tracker.example/x"),     # subdomain of blocked
        (2, "https://tracker.example/x"),         # exactly blocked
        (3, "https://nottracker.example/x"),      # substring, NOT suffix
        (4, "https://fine.example:443/ok"),       # clean (port stripped)
        (5, "https://sub.bad.org/p?q=1"),         # second entry
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    blocked = ["Tracker.example", "bad.org"]      # case-insensitive entries

    clean = blocklist_filter(df, blocked, mode="clean")
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4]
    assert clean.columns == ["doc_id", "url"]     # schema unchanged

    flag = {r["doc_id"]: r["blocked_domain"]
            for r in blocklist_filter(df, blocked, mode="flag").collect()}
    assert flag == {1: "tracker.example", 2: "tracker.example",
                    3: None, 4: None, 5: "bad.org"}


def test_blocklist_filter_plan_broadcasts(spark):
    from geomesa_spark.functions.urls import blocklist_filter

    df = spark.createDataFrame([(i, f"https://h{i}.x/p") for i in range(50)],
                               "doc_id long, url string")
    plan = blocklist_filter(df, ["h3.x"], mode="clean")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_extract_outlinks_quotes_relatives_and_composition(spark):
    from geomesa_spark.operators.webgraph import host_graph
    from geomesa_spark.functions.urls import url_host
    from geomesa_spark.sources.webpages import extract_outlinks

    pages = spark.createDataFrame(
        [
            (
                "https://src.example/1",
                '<a href="https://a.example/x">A</a>'
                "<a href='http://b.example/y'>B</a>"
                '<a href="/relative">rel</a>'
                '<a href="ftp://c.example/z">ftp</a>',
            ),
            ("https://src.example/2", "<p>no links at all</p>"),
            ("https://src.example/3", '<a href="https://a.example/x2">A2</a>'),
        ],
        "url string, html string",
    )
    pages = pages.select("url", F.encode("html", "UTF-8").alias("html"))
    out = extract_outlinks(pages).collect()
    got = {(r.url, r.outlink) for r in out}
    # absolute http/https from either quote style; relative + ftp ignored;
    # link-free pages emit nothing
    assert got == {
        ("https://src.example/1", "https://a.example/x"),
        ("https://src.example/1", "http://b.example/y"),
        ("https://src.example/3", "https://a.example/x2"),
    }
    # the real pipeline seam: outlinks -> host edges
    links = extract_outlinks(pages).select(
        url_host(F.col("url")).alias("src"), url_host(F.col("outlink")).alias("dst")
    )
    edges = {(r.src, r.dst): r.n_links for r in host_graph(links).collect()}
    assert edges == {
        ("src.example", "a.example"): 2,
        ("src.example", "b.example"): 1,
    }
