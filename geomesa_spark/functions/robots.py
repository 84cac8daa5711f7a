"""robots.txt compliance: parse per-host rule files, filter a URL table.

A crawl-derived corpus must be filterable by the robots rules in force
(takedowns, re-crawls, compliance audits). This implements the public
robots.txt semantics (REP, RFC 9309) the way a Spark pipeline needs
them: rules become a small DataFrame joined against the 10^12-row page
table, not a per-row Python matcher.

Semantics implemented (RFC 9309 core):

* rules grouped by user-agent group; :func:`parse_robots` extracts ONE
  agent's effective group per host (exact agent match if present, else
  the ``*`` group — the standard precedence);
* longest-prefix match wins across allow/disallow; on equal length,
  ``allow`` wins;
* no matching rule (or no rules for the host) -> allowed;
* empty ``Disallow:`` line -> allow-all (per spec);
* only prefix rules (no ``*``/``$`` wildcards) — wildcard support is a
  documented extension point; rules using them are ignored.

Scale shape: rules aggregate to ONE row per host (host -> rule array)
and broadcast; each page row resolves its verdict with a single codegen
array expression (filter prefixes that match, array_max by
(length, allow-wins) rank) — no aggregate over pages, no second
shuffle, and duplicate page rows pass through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions.urls import url_host, url_path, url_query

RULE_SCHEMA = "host string, rule string, prefix string, prefix_len int"


def parse_robots_text(host: str, text: str, agent: str = "*") -> list[tuple]:
    """One robots.txt body -> [(host, 'allow'|'disallow', prefix, len)].

    Picks the best-matching user-agent group (exact ``agent`` match wins
    over ``*``); drops wildcard rules (documented limitation).
    """
    groups: dict[str, list[tuple[str, str]]] = {}
    current: list[str] = []
    last_was_agent = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not last_was_agent:
                current = []
            current.append(val.lower())
            for a in current:
                groups.setdefault(a, [])
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            for a in current:
                groups.setdefault(a, []).append((key, val))
        else:
            last_was_agent = False
    chosen = groups.get(agent.lower(), groups.get("*", []))
    out = []
    for kind, prefix in chosen:
        if prefix == "":
            if kind == "disallow":
                continue  # empty Disallow = allow all = no rule
            prefix = "/"
        if "*" in prefix or prefix.endswith("$"):
            continue  # wildcard rules: documented unsupported, skipped
        out.append((host, kind, prefix, len(prefix)))
    return out


def robots_rules(spark, robots: list[tuple[str, str]], agent: str = "*") -> DataFrame:
    """[(host, robots_txt_body)] -> broadcastable rules DataFrame."""
    rows = []
    for host, text in robots:
        rows.extend(parse_robots_text(host.lower(), text, agent))
    return spark.createDataFrame(rows, RULE_SCHEMA)


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    keep: str = "allowed",
) -> DataFrame:
    """Filter a page table by robots rules.

    ``keep='allowed'`` returns compliant pages; ``'disallowed'`` returns
    the pages a takedown pass must drop. Hosts absent from ``rules`` are
    allowed (no robots.txt -> no restriction).
    """
    if keep not in ("allowed", "disallowed"):
        raise ValueError(f"keep must be allowed|disallowed, got {keep!r}")
    url = F.col(url_col)
    # REP matching is against path-PLUS-query ('Disallow: /search?q=' is a
    # legal prefix rule), so the match target keeps the query string
    path = F.when(url_path(url) == "", F.lit("/")).otherwise(url_path(url))
    q = url_query(url)
    target = F.when(q == "", path).otherwise(F.concat(path, F.lit("?"), q))
    keyed = pages.withColumn("__robots_host", url_host(url)).withColumn(
        "__robots_target", target
    )
    # one row per host: the rule array (tiny — broadcasts); allow ranks
    # above disallow so the struct max resolves equal-length ties per
    # spec. Columns carry a __robots_ prefix so a page table that already
    # has 'host'/'rules' columns never collides or binds ambiguously.
    per_host = rules.groupBy(F.col("host").alias("__robots_rhost")).agg(
        F.collect_list(
            F.struct(
                F.col("prefix_len").alias("len"),
                F.when(F.col("rule") == "allow", 1).otherwise(0).alias("rank"),
                F.col("prefix").alias("prefix"),
            )
        ).alias("__robots_rules")
    )
    j = keyed.join(
        F.broadcast(per_host),
        F.col("__robots_host") == F.col("__robots_rhost"),
        "left",
    )
    matches = F.filter(
        F.col("__robots_rules"),
        lambda r: F.col("__robots_target").startswith(r["prefix"]),
    )
    best = F.array_max(matches)
    allowed = (
        F.col("__robots_rules").isNull()
        | (F.size(matches) == 0)
        | (best["rank"] == 1)
    )
    cond = allowed if keep == "allowed" else ~allowed
    return j.filter(cond).select(*pages.columns)
