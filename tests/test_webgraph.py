"""Web-graph family: host_graph / degree_stats / pagerank, plus the
round-5 mixture + bucketing additions (domain_mixture, ppl_buckets,
bucket_by_thresholds)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from geomesa_spark.operators.corpus import domain_mixture
from geomesa_spark.operators.scoring import bucket_by_thresholds, ppl_buckets
from geomesa_spark.operators.webgraph import (
    SCALE,
    anchor_terms,
    degree_stats,
    host_graph,
    pagerank,
)


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, n_links long")


def test_host_graph_aggregates_and_drops_self_loops(spark):
    links = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c")],
        "src string, dst string",
    )
    got = {(r.src, r.dst): r.n_links for r in host_graph(links).collect()}
    assert got == {("a", "b"): 2, ("b", "c"): 1}


def test_degree_stats_single_agg(spark):
    e = _edges(spark, [("a", "b", 3), ("a", "c", 1), ("b", "a", 2)])
    got = {r.host: r for r in degree_stats(e).collect()}
    assert (got["a"].out_deg, got["a"].in_deg) == (2, 1)
    assert (got["a"].out_links, got["a"].in_links) == (4, 2)
    assert (got["c"].out_deg, got["c"].in_deg) == (0, 1)


def test_pagerank_one_iteration_exact_fixed_point(spark):
    # A -> {B, C}, B -> {A}, C dangling.  n=3, r0 = SCALE // 3.
    # Hand-rolled int64 update (see webgraph.pagerank docstring):
    #   dang = 333333333333, dang // 3 = 111111111111
    #   base = ((15 * SCALE) // 100) // 3 = 50000000000
    #   r1(A) = base + (85 * (333333333333 + 111111111111)) // 100
    #   r1(B) = r1(C) = base + (85 * (166666666666 + 111111111111)) // 100
    e = _edges(spark, [("A", "B", 1), ("A", "C", 1), ("B", "A", 1)])
    got = {r.host: r.rank_micro for r in pagerank(e, iterations=1).collect()}
    assert got == {"A": 427777777777, "B": 286111111110, "C": 286111111110}


def test_pagerank_mass_conserved_and_deterministic(spark):
    e = _edges(
        spark,
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("d", "a", 1), ("a", "d", 1)],
    )
    r4 = pagerank(e, iterations=4)
    total = r4.agg(F.sum("rank_micro")).collect()[0][0]
    # integer truncation only loses mass, never invents it; losses are
    # bounded by (iterations * n * (1 + damping rounding)) micro-units
    assert total <= SCALE
    assert total >= SCALE - 4 * 4 * 200
    # bit-identical across parallelism (the associativity claim)
    a = sorted(map(tuple, r4.collect()))
    b = sorted(map(tuple, pagerank(e.repartition(7), iterations=4).collect()))
    assert a == b


def test_pagerank_empty_graph(spark):
    e = _edges(spark, []).filter("1=0")
    assert pagerank(e, iterations=2).count() == 0


def test_domain_mixture_sqrt_flattening(spark):
    df = spark.createDataFrame(
        [("big",)] * 16 + [("small",)] * 4, "host string"
    )
    got = {r.host: r for r in domain_mixture(df, "host", alpha=0.5).collect()}
    assert got["big"].n_docs == 16 and got["small"].n_docs == 4
    # sqrt weights: 4e6 and 2e6 micro-units -> weights 2/3 and 1/3
    assert got["big"].weight_micro == 4_000_000
    assert got["small"].weight_micro == 2_000_000
    assert abs(got["big"].weight - 2 / 3) < 1e-12
    # flattening: big's boost < 1 < small's boost
    assert got["big"].boost < 1.0 < got["small"].boost
    # alpha=1 keeps raw shares (boost == 1 everywhere)
    raw = domain_mixture(df, "host", alpha=1.0).collect()
    assert all(abs(r.boost - 1.0) < 1e-12 for r in raw)


def test_domain_mixture_rejects_non_dyadic_alpha(spark):
    df = spark.createDataFrame([("x",)], "host string")
    with pytest.raises(ValueError, match="dyadic"):
        domain_mixture(df, "host", alpha=0.3).collect()


def test_ppl_buckets_equal_depth_and_labels(spark):
    rows = [Row(doc_id=i, lang="en", mean_logprob=-float(i)) for i in range(9)]
    rows += [Row(doc_id=100 + i, lang="fr", mean_logprob=-float(i)) for i in range(4)]
    got = ppl_buckets(spark.createDataFrame(rows)).collect()
    en = {r.doc_id: r.label for r in got if r.lang == "en"}
    # scores descend with doc_id: best 3 head, worst 3 tail
    assert [en[i] for i in range(9)] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    fr = {r.doc_id: r.label for r in got if r.lang == "fr"}
    # ntile(3) over 4 rows: first bucket takes the remainder
    assert [fr[100 + i] for i in range(4)] == ["head", "head", "middle", "tail"]


def test_bucket_by_thresholds_matches_cuts(spark):
    scored = spark.createDataFrame(
        [Row(doc_id=i, lang="en", mean_logprob=s)
         for i, s in enumerate([-1.0, -2.0, -3.0, -4.0])]
    )
    th = spark.createDataFrame(
        [Row(lang="en", head_min=-1.5, middle_min=-3.5)]
    )
    got = {r.doc_id: r.label for r in bucket_by_thresholds(scored, th).collect()}
    assert got == {0: "head", 1: "middle", 2: "middle", 3: "tail"}


def test_crawl_delta_classification(spark):
    from geomesa_spark.operators.delta import crawl_delta, delta_counts

    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "B"), ("u4", "d")], "url string, fingerprint string"
    )
    d = crawl_delta(old, new)
    got = {r.url: r.status for r in d.collect()}
    assert got == {"u1": "unchanged", "u2": "changed", "u3": "removed", "u4": "added"}
    counts = {r.status: r.n for r in delta_counts(d).collect()}
    assert counts == {"unchanged": 1, "changed": 1, "removed": 1, "added": 1}


def test_normalize_text_nfc_controls_whitespace(spark):
    import unicodedata

    from geomesa_spark.operators.textclean import normalize_text

    rows = [
        (0, "caf" + "é"),          # NFD -> precomposed é
        (1, "a\x07b\x00c"),               # control chars stripped
        (2, "  x \t\n y  "),              # runs collapsed + trimmed
        (3, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(df).collect()}
    assert got[0].norm_text == "café" == unicodedata.normalize("NFC", rows[0][1])
    assert got[0].changed
    assert got[1].norm_text == "abc" and got[1].changed
    assert got[2].norm_text == "x y" and got[2].changed
    assert got[3].norm_text == "plain" and not got[3].changed


def test_badwords_filter_distinct_word_boundary(spark):
    from geomesa_spark.operators.textclean import badwords_filter

    df = spark.createDataFrame(
        [
            (0, "a bad word bad twice"),     # dup lexicon word counts once
            (1, "badge scraper clean"),      # substring must NOT match
            (2, "bad worse"),                # two distinct hits
            (3, "spotless"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_bad, r.flagged)
           for r in badwords_filter(df, ["bad", "worse"]).collect()}
    assert got == {0: (1, True), 1: (0, False), 2: (2, True), 3: (0, False)}
    kept = {r.doc_id for r in badwords_filter(df, ["bad", "worse"], mode="drop").collect()}
    assert kept == {1, 3}


def test_crawl_delta_null_fingerprints(spark):
    from geomesa_spark.operators.delta import crawl_delta

    old = spark.createDataFrame(
        [("u1", None), ("u2", None), ("u3", "c")], "url string, fingerprint string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", None)], "url string, fingerprint string"
    )
    got = {r.url: r.status for r in crawl_delta(old, new).collect()}
    # presence comes from the side markers, never fp nullness
    assert got == {"u1": "changed", "u2": "unchanged", "u3": "removed"}


def test_bucket_by_thresholds_missing_group_falls_to_tail(spark):
    from pyspark.sql import Row

    from geomesa_spark.operators.scoring import bucket_by_thresholds

    scored = spark.createDataFrame(
        [Row(doc_id=0, lang="en", mean_logprob=-1.0),
         Row(doc_id=1, lang="xx", mean_logprob=-1.0)]
    )
    th = spark.createDataFrame([Row(lang="en", head_min=-2.0, middle_min=-3.0)])
    got = {r.doc_id: r.label for r in bucket_by_thresholds(scored, th).collect()}
    assert got == {0: "head", 1: "tail"}  # xx kept, not silently dropped


def test_anchor_terms_counts_case_fold_and_tiebreak(spark):
    links = spark.createDataFrame(
        [("h", "Big cat"), ("h", "big dog"), ("h", "   "), ("g", "Solo")],
        "dst string, anchor string",
    )
    got = {(r.host, r.rnk): (r.term, r.n) for r in anchor_terms(links, k=3).collect()}
    # counts fold case; ties (cat=dog=1) break term-ASC; blanks emit nothing
    assert got == {
        ("h", 1): ("big", 2),
        ("h", 2): ("cat", 1),
        ("h", 3): ("dog", 1),
        ("g", 1): ("solo", 1),
    }


def test_anchor_terms_k_cut_is_exact(spark):
    links = spark.createDataFrame(
        [("h", "a a a b b c")], "dst string, anchor string"
    )
    rows = anchor_terms(links, k=2).collect()
    assert [(r.term, r.n, r.rnk) for r in sorted(rows, key=lambda r: r.rnk)] == [
        ("a", 3, 1), ("b", 2, 2)
    ]


def test_anchor_terms_plan_partial_topk_before_exchange(spark):
    links = spark.createDataFrame(
        [("h", "a b")], "dst string, anchor string"
    )
    plan = (
        anchor_terms(links, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the top-k must run as WindowGroupLimit (partial per-partition cut
    # before the window exchange) over the already-aggregated
    # (host, term, n) rows — a hot target with millions of distinct
    # anchor terms ships at most k rows per input partition
    assert "WindowGroupLimit" in plan
    assert plan.count("Window [row_number()") == 1


def test_crawl_frontier_priority_cap_and_removed_drop(spark):
    from geomesa_spark.operators.delta import crawl_frontier

    delta = spark.createDataFrame(
        [
            ("https://a.example/1", "changed"),
            ("https://a.example/2", "added"),
            ("https://a.example/3", "unchanged"),
            ("https://a.example/4", "removed"),   # never fetched
            ("https://a.example/5", "unchanged"),
            ("https://b.example/1", "added"),     # host missing from ranks
        ],
        "url string, status string",
    )
    ranks = spark.createDataFrame([("a.example", 1000)], "host string, rank_micro long")
    got = {r.url: r for r in crawl_frontier(delta, ranks, n_per_host=3).collect()}
    # removed dropped; a.example over budget -> exact top-3 of 4
    assert set(got) == {
        "https://a.example/1", "https://a.example/2", "https://a.example/3",
        "https://b.example/1",
    }
    # priority = weight * (rank + 1); missing host coalesces rank to 0
    assert got["https://a.example/1"].priority == 3 * 1001
    assert got["https://a.example/2"].priority == 2 * 1001
    assert got["https://b.example/1"].priority == 2 * 1
    # the losing within-host row is the tie-broken unchanged url
    # (/3 beats /5 on url ASC at equal priority 1001)
    assert got["https://a.example/3"].priority == 1001


def test_crawl_frontier_partial_weights_keep_unlisted_statuses(spark):
    from geomesa_spark.operators.delta import crawl_frontier

    delta = spark.createDataFrame(
        [
            ("https://a.example/1", "changed"),
            ("https://a.example/2", "added"),      # unlisted -> weight 1
            ("https://a.example/3", "removed"),    # always dropped
        ],
        "url string, status string",
    )
    ranks = spark.createDataFrame([("a.example", 9)], "host string, rank_micro long")
    got = {r.url: r.priority
           for r in crawl_frontier(delta, ranks, n_per_host=5,
                                    weights={"changed": 5}).collect()}
    assert got == {"https://a.example/1": 5 * 10, "https://a.example/2": 1 * 10}


# --- sitemap parsing (sources/webpages.parse_sitemaps) ---------------------


def _sm(spark, xml: str):
    from geomesa_spark.sources.webpages import parse_sitemaps

    df = spark.createDataFrame(
        [("https://h.example/sitemap.xml", xml.encode())], "url string, xml binary"
    )
    return parse_sitemaps(df).collect()


def test_sitemap_urlset_multiline_trim_and_lastmod_null(spark):
    rows = _sm(
        spark,
        "<urlset>\n<url>\n  <loc>  https://h.example/a  </loc>\n</url>"
        "<url><loc>https://h.example/b</loc>"
        "<lastmod>2025-03-04</lastmod></url>\n</urlset>",
    )
    got = {(r.kind, r.loc, r.lastmod) for r in rows}
    assert got == {
        ("url", "https://h.example/a", None),  # trimmed, no lastmod -> NULL
        ("url", "https://h.example/b", "2025-03-04"),
    }


def test_sitemap_index_children(spark):
    rows = _sm(
        spark,
        "<sitemapindex><sitemap><loc>https://h.example/s1.xml</loc></sitemap>\n"
        "<sitemap>\n<loc>https://h.example/s2.xml</loc>"
        "<lastmod>2025-01-02</lastmod></sitemap></sitemapindex>",
    )
    assert [(r.kind, r.loc) for r in rows] == [
        ("sitemap", "https://h.example/s1.xml"),
        ("sitemap", "https://h.example/s2.xml"),
    ]


def test_sitemap_blocks_without_loc_drop(spark):
    rows = _sm(
        spark,
        "<urlset><url><lastmod>2025-01-01</lastmod></url>"
        "<url><loc></loc></url>"
        "<url><loc>https://h.example/ok</loc></url></urlset>",
    )
    assert [r.loc for r in rows] == ["https://h.example/ok"]


def test_sitemap_empty_and_garbage_inputs(spark):
    assert _sm(spark, "") == []
    assert _sm(spark, "not xml at all <loc>orphan</loc>") == []


# --- redirect-chain resolution (webgraph.resolve_redirects) ----------------


def _redir(spark, pairs, **kw):
    from geomesa_spark.operators.webgraph import resolve_redirects

    df = spark.createDataFrame(pairs, "url string, target string")
    return {r.url: (r.final_url, r.hops, r.unresolved)
            for r in resolve_redirects(df, **kw).collect()}


def test_redirects_chain_exact_hops(spark):
    got = _redir(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert got == {
        "a": ("e", 4, False), "b": ("e", 3, False),
        "c": ("e", 2, False), "d": ("e", 1, False),
    }


def test_redirects_cycle_and_rho_tail_unresolved(spark):
    # x -> c1 -> c2 -> c3 -> c1: the pure cycle AND the tail leading
    # into it are both unresolved (no terminal is ever reached)
    got = _redir(spark, [("x", "c1"), ("c1", "c2"), ("c2", "c3"), ("c3", "c1")])
    assert all(v == (None, None, True) for v in got.values())
    assert set(got) == {"x", "c1", "c2", "c3"}


def test_redirects_self_loop(spark):
    got = _redir(spark, [("s", "s"), ("a", "b")])
    assert got["s"] == (None, None, True)
    assert got["a"] == ("b", 1, False)


def test_redirects_over_cap_chain_flagged(spark):
    # 9-hop chain with max_chain=8: resolvable by the doubling rounds
    # but past the contract cap -> unresolved, like a capped walker
    pairs = [(f"u{i}", f"u{i+1}") for i in range(9)]
    got = _redir(spark, pairs, max_chain=8)
    assert got["u0"] == (None, None, True)       # 9 hops > 8
    assert got["u1"] == ("u9", 8, False)          # exactly at cap


def test_redirects_duplicate_source_guard(spark):
    from geomesa_spark.operators.webgraph import resolve_redirects

    df = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d")], "url string, target string"
    )
    with pytest.raises(Exception, match="functional"):
        resolve_redirects(df).collect()
    got = {r.url: (r.final_url, r.hops, r.unresolved)
           for r in resolve_redirects(df, on_duplicate="min").collect()}
    # min target for a is b; b -> d terminal
    assert got == {"a": ("d", 2, False), "b": ("d", 1, False)}
