"""robots.txt compliance (functions/robots.py): parser semantics (agent
groups, empty Disallow, wildcards, comments), longest-prefix-match with
allow-wins ties, missing-host default-allow, and the codegen-only /
broadcast plan shape. The driver oracle (`robots_filter`) hash-verifies
the filter end-to-end at sf0.01."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions.robots import (
    parse_robots_text,
    robots_filter,
    robots_rules,
)


def test_parse_agent_groups_and_precedence():
    text = """
# global group
User-agent: *
Disallow: /private/
Allow: /private/ok

User-agent: special
User-agent: other
Disallow: /only-special/
"""
    star = parse_robots_text("h.com", text, agent="*")
    assert ("h.com", "disallow", "/private/", 9) in star
    assert ("h.com", "allow", "/private/ok", 11) in star
    # exact agent match wins over *
    spec = parse_robots_text("h.com", text, agent="Special")
    assert spec == [("h.com", "disallow", "/only-special/", 14)]
    # agent with no group falls back to *
    assert parse_robots_text("h.com", text, agent="nobody") == star


def test_parse_empty_disallow_and_wildcards():
    text = """
User-agent: *
Disallow:
Allow:
Disallow: /a*b
Disallow: /end$
Disallow: /real/
"""
    rules = parse_robots_text("h.com", text)
    # empty Disallow = no rule; empty Allow -> allow all ('/');
    # wildcard/anchor rules skipped; the plain prefix survives
    assert rules == [
        ("h.com", "allow", "/", 1),
        ("h.com", "disallow", "/real/", 6),
    ]


def _pages(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def test_filter_longest_match_allow_wins(spark):
    body = "User-agent: *\nDisallow: /p/\nAllow: /p/good\nDisallow: /p/good\n"
    rules = robots_rules(spark, [("h.com", body)])
    pages = _pages(spark, [
        "https://h.com/p/bad",          # disallowed by /p/
        "https://h.com/p/good/page",    # allow /p/good ties disallow -> allow
        "https://h.com/other",          # no matching rule -> allowed
        "https://H.COM:443/p/bad2",     # host normalization still applies
        "https://nobody.org/p/bad",     # host without robots -> allowed
        "https://h.com",                # empty path treated as '/'
    ])
    kept = {r["doc_id"] for r in robots_filter(pages, rules).collect()}
    assert kept == {1, 2, 4, 5}
    dropped = {r["doc_id"] for r in
               robots_filter(pages, rules, keep="disallowed").collect()}
    assert dropped == {0, 3}


def test_filter_is_codegen_broadcast(spark):
    rules = robots_rules(spark, [("h.com", "User-agent: *\nDisallow: /x/\n")])
    pages = _pages(spark, ["https://h.com/x/1", "https://h.com/y"])
    out = robots_filter(pages, rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_filter_bad_keep_raises(spark):
    rules = robots_rules(spark, [])
    with pytest.raises(ValueError, match="allowed"):
        robots_filter(_pages(spark, ["https://a.com/x"]), rules, keep="nope")


def test_duplicate_rows_pass_through(spark):
    """The filter is row-wise: duplicate page rows survive unchanged (no
    aggregate collapses them)."""
    rules = robots_rules(spark, [("h.com", "User-agent: *\nDisallow: /x/\n")])
    pages = spark.createDataFrame(
        [(1, "https://h.com/y")] * 3, "doc_id long, url string")
    assert robots_filter(pages, rules).count() == 3
