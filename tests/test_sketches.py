"""Mergeable HLL distinct-count panel (operators/sketches.py).

Pins the properties the oracle row relies on: lossless union (merged
sketch state == single-pass state), partitioning independence, parquet
round-trip of the sketch binary, sparse-regime exactness at fixture
cardinalities, and dense-regime accuracy at cardinalities the exact
twin could no longer verify.
"""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.sketches import (
    distinct_sketches,
    merge_sketch_tables,
    sketch_estimates,
)


@pytest.fixture(scope="module")
def panel(spark):
    # 20 groups x 40 distinct keys, every key seen 3 times
    return spark.range(0, 2400, 1, 8).select(
        (F.col("id") % 20).alias("g"),
        F.format_string("k%d", (F.col("id") % 800)).alias("k"),
    )


def _est(table):
    return {r.g: r.n_distinct for r in sketch_estimates(table).collect()}


def test_union_equals_single_pass(spark, panel):
    whole = distinct_sketches(panel, "k", ["g"])
    deltas = [
        distinct_sketches(
            panel.filter(F.pmod(F.xxhash64("k"), F.lit(3)) == i), "k", ["g"]
        )
        for i in range(3)
    ]
    assert _est(merge_sketch_tables(*deltas)) == _est(whole)


def test_partitioning_independence(spark, panel):
    a = distinct_sketches(panel.repartition(1), "k", ["g"])
    b = distinct_sketches(panel.repartition(16, "k"), "k", ["g"])
    assert _est(a) == _est(b)


def test_sparse_regime_exact(spark, panel):
    # 40 distinct keys/group with lgk=12 registers: coupon-list regime,
    # estimate == exact count (the property the driver oracle leans on)
    exact = {
        r.g: r.n
        for r in panel.groupBy("g").agg(F.count_distinct("k").alias("n")).collect()
    }
    assert _est(distinct_sketches(panel, "k", ["g"])) == exact


def test_parquet_roundtrip(spark, panel, tmp_path):
    t = distinct_sketches(panel, "k", ["g"])
    p = str(tmp_path / "panel.parquet")
    t.write.parquet(p)
    stored = spark.read.parquet(p)
    assert _est(stored) == _est(t)
    # and a stored panel merges with a fresh delta losslessly
    fresh = spark.range(2400, 2600).select(
        (F.col("id") % 20).alias("g"), F.format_string("k%d", "id").alias("k")
    )
    merged = merge_sketch_tables(stored, distinct_sketches(fresh, "k", ["g"]))
    whole = distinct_sketches(panel.unionByName(fresh), "k", ["g"])
    assert _est(merged) == _est(whole)


def test_dense_regime_accuracy(spark):
    # 200k distinct keys, one group: far past the sparse regime; the
    # estimate must land within the HLL lgk=12 error envelope (~1.6% rse,
    # assert 5% so the test can't flake)
    big = spark.range(200_000).select(
        F.lit(0).alias("g"), F.format_string("u%d", "id").alias("k")
    )
    est = _est(distinct_sketches(big, "k", ["g"]))[0]
    assert abs(est - 200_000) / 200_000 < 0.05


def test_merge_requires_tables():
    with pytest.raises(ValueError):
        merge_sketch_tables()


def test_hll_domains_sparse_exact_per_sf(spark, sf_dir):
    # the pin the driver oracle leans on: at fixture scales every host's
    # canonical-page cardinality sits in the HLL sparse coupon regime,
    # so the merged-sketch estimate equals the exact COUNT(DISTINCT)
    # domain_stats computes over the same crawl-url fixture
    import __spark_entry__ as entry

    est = {
        r.host: r.n_canonical
        for r in entry._q_hll_domains(spark, sf_dir).collect()
    }
    p = entry._url_pages(entry._utc(spark), sf_dir)
    from geomesa_spark.functions.urls import domain_stats

    exact = {
        r.host: r.n_canonical
        for r in domain_stats(p, url_col="url").collect()
    }
    assert est == exact
