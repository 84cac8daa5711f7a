"""Corpus curation (operators/corpus.py) and sessionization
(operators/sessions.py).

The driver oracle hash-verifies both against DuckDB twins at sf0.01
(`sessionize`, `sample_stratified`, `descriptive_stats`, `topk_tokens`);
here we pin semantics on hand-built inputs the generator never produces
(exact gap boundaries, hot entities, singleton groups, negative values)
and check the scale-shape claims (determinism, no python stages).
"""

from __future__ import annotations

import collections
import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from geomesa_spark.operators.corpus import (
    descriptive_stats,
    hash_frac,
    sample_uniform,
    stratified_sample,
    topk_tokens,
)
from geomesa_spark.operators.sessions import (
    cap_hot_entities,
    session_rollup,
    sessionize,
)


def _no_python_stage(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_hash_frac_deterministic_and_uniform(spark):
    df = spark.range(20_000).select(hash_frac(F.col("id")).alias("h"))
    a = [r["h"] for r in df.collect()]
    b = [r["h"] for r in df.collect()]
    assert a == b
    assert all(0.0 <= h < 1.0 for h in a)
    # rough uniformity: decile occupancy within 20% of expected
    hist, _ = np.histogram(a, bins=10, range=(0, 1))
    assert hist.min() > 2000 * 0.8 and hist.max() < 2000 * 1.2


def test_sample_uniform_rate_and_stability(spark):
    df = spark.range(10_000)
    kept = sample_uniform(df, "id", 0.2)
    n = kept.count()
    assert abs(n - 2000) < 150
    # the kept SET is a function of the id, not of partitioning
    ids1 = {r["id"] for r in kept.collect()}
    ids2 = {r["id"] for r in sample_uniform(df.repartition(7), "id", 0.2).collect()}
    assert ids1 == ids2
    # a different salt draws a different set
    ids3 = {r["id"] for r in sample_uniform(df, "id", 0.2, salt=1).collect()}
    assert ids1 != ids3
    assert _no_python_stage(kept)


def test_stratified_sample_quota_per_stratum(spark):
    df = spark.range(9_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("s")
    )
    out = stratified_sample(df, "s", quota=100, id_col="id")
    sizes = {r["s"]: r["n"] for r in
             out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {"0", "1", "2"}
    for v in sizes.values():
        assert abs(v - 100) <= 40  # binomial noise around the quota
    # quota above the stratum size keeps everything (p capped at 1)
    small = spark.range(50).select(F.col("id"), F.lit("x").alias("s"))
    assert stratified_sample(small, "s", quota=1000, id_col="id").count() == 50


# ---------------------------------------------------------------------------
# descriptive stats
# ---------------------------------------------------------------------------

def test_descriptive_stats_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(5.0, 2.0, 400).tolist() + rng.normal(-3.0, 0.5, 300).tolist()
    grps = ["a"] * 400 + ["b"] * 300
    df = spark.createDataFrame(list(zip(grps, vals)), "grp0 string, v double")
    out = {r["grp"]: r for r in descriptive_stats(df, "grp0", "v").collect()}
    for g in ("a", "b"):
        arr = np.array([v for gg, v in zip(grps, vals) if gg == g])
        # fixed-point quantization: the op computes stats of floor(v*1000)/1000
        q = np.floor(arr * 1000) / 1000
        assert out[g]["n"] == len(arr)
        assert out[g]["vmin"] == arr.min() and out[g]["vmax"] == arr.max()
        assert math.isclose(out[g]["mean"], q.mean(), rel_tol=0, abs_tol=1e-9)
        assert math.isclose(out[g]["std"], q.std(ddof=1), rel_tol=1e-9)


def test_descriptive_stats_singleton_and_negative(spark):
    df = spark.createDataFrame(
        [("a", -2.5), ("b", 1.0), ("b", -1.0)], "g string, v double"
    )
    out = {r["grp"]: r for r in descriptive_stats(df, "g", "v").collect()}
    assert out["a"]["std"] is None and out["a"]["mean"] == -2.5
    assert out["b"]["mean"] == 0.0
    assert math.isclose(out["b"]["std"], math.sqrt(2.0), rel_tol=1e-12)
    assert _no_python_stage(descriptive_stats(df, "g", "v"))


# ---------------------------------------------------------------------------
# top-k tokens
# ---------------------------------------------------------------------------

def test_topk_tokens_matches_counter(spark):
    texts = [
        "the cat sat on the mat",
        "the dog\tate  the cat",
        "A a THE b",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["token"], r["n"]) for r in topk_tokens(df, "text", k=3).collect()]
    cnt = collections.Counter(
        tok for t in texts for tok in t.lower().split() if tok
    )
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == want


def test_topk_tokens_uses_take_ordered(spark):
    """The limit must compile to per-partition top-k + driver merge, not a
    global sort-shuffle."""
    df = spark.createDataFrame([("x y z",)] * 10, "text string")
    plan = topk_tokens(df, "text", k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u, t)
         for i, (s, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_sessionize_gap_boundaries(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # user 1: gaps 10, exactly 1800 (same session), 1801 (new session)
    rows = [(0, 1, "a"), (10, 1, "a"), (1810, 1, "b"), (3611, 1, "a"),
            (5, 2, "c")]
    out = sessionize(_ev(spark, rows), gap_s=1800).orderBy("event_id").collect()
    assert [r["session_idx"] for r in out] == [1, 1, 1, 2, 1]


def test_session_rollup_values(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [(0, 1, "a"), (100, 1, "b"), (5000, 1, "a"), (0, 2, "c")]
    out = {(r["entity"], r["session_idx"]): r
           for r in session_rollup(_ev(spark, rows), gap_s=1800).collect()}
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    s1 = out[(1, 1)]
    assert (s1["start_sec"], s1["end_sec"], s1["duration_s"]) == (base, base + 100, 100)
    assert s1["n_events"] == 2 and s1["n_types"] == 2
    s2 = out[(1, 2)]
    assert s2["n_events"] == 1 and s2["duration_s"] == 0
    assert out[(2, 1)]["n_events"] == 1


def test_cap_hot_entities_drops_only_hot(spark):
    rows = [(i, 1, "a") for i in range(50)] + [(i, 2, "b") for i in range(3)]
    df = _ev(spark, rows)
    out = cap_hot_entities(df, "user_id", max_events=10)
    assert {r["user_id"] for r in out.select("user_id").distinct().collect()} == {2}
    # wired through sessionize
    s = sessionize(df, max_events_per_entity=10)
    assert {r["user_id"] for r in s.select("user_id").distinct().collect()} == {2}


def test_session_rollup_reuses_window_exchange(spark):
    """The rollup groupBy is co-partitioned with the window shuffle: the
    plan must contain exactly one exchange on the entity key."""
    df = _ev(spark, [(0, 1, "a"), (10, 1, "b"), (0, 2, "c")])
    plan = session_rollup(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_hash_frac_int_column_no_ansi_overflow(spark):
    """An INT (32-bit) id column must not overflow at id*48271 under ANSI
    mode — hash_frac widens to long first, and the fraction matches the
    bigint computation exactly."""
    ints = spark.range(44_000, 50_000).select(F.col("id").cast("int").alias("i"))
    longs = spark.range(44_000, 50_000).select(F.col("id").alias("i"))
    a = [r["h"] for r in ints.select(hash_frac(F.col("i")).alias("h")).collect()]
    b = [r["h"] for r in longs.select(hash_frac(F.col("i")).alias("h")).collect()]
    assert a == b


def test_group_percentiles_exact_and_approx(spark):
    from geomesa_spark.operators.corpus import group_percentiles

    vals = [(g, float(v)) for g in ("a", "b") for v in range(1, 101)]
    df = spark.createDataFrame(vals, "g string, v double")
    out = {r["grp"]: r for r in
           group_percentiles(df, "g", "v", (0.5, 0.9)).collect()}
    # percentile_disc on 1..100: p50 -> 50.0, p90 -> 90.0 (actual members)
    for g in ("a", "b"):
        assert out[g]["p50"] == 50.0 and out[g]["p90"] == 90.0
    apx = {r["grp"]: r for r in
           group_percentiles(df, "g", "v", (0.5, 0.9), approx=True).collect()}
    for g in ("a", "b"):
        assert abs(apx[g]["p50"] - 50.0) <= 2 and abs(apx[g]["p90"] - 90.0) <= 2
