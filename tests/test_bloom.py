"""Bloom seen-set prefilter (operators/bloom.py).

Pins the three properties the oracle row cannot see: zero false
negatives by construction, the FP rate of a correctly-sized filter, and
that the prefilter actually shrinks the verify-join input (the whole
point of the operator at 10^12 scale).
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.bloom import (
    bloom_build,
    bloom_new_keys,
    bloom_probe_udf,
)


@pytest.fixture(scope="module")
def urls(spark):
    # 2000 corpus urls + 2000 disjoint probe urls, several partitions so
    # the partial-bitset + OR-merge tree actually fans in
    df = spark.range(0, 4000, 1, 8).select(
        F.col("id"),
        F.format_string("https://h%d.example/p/%d", F.col("id") % 53, F.col("id")).alias("url"),
    )
    return df.filter("id < 2000"), df.filter("id >= 2000")


def test_no_false_negatives(spark, urls):
    corpus, _ = urls
    bits = bloom_build(corpus, "url", log2_m=16, k=5)
    probe = bloom_probe_udf(spark.sparkContext.broadcast(bits), log2_m=16, k=5)
    hits = corpus.withColumn("m", probe(F.xxhash64("url"))).filter("NOT m")
    assert hits.count() == 0  # every inserted key must probe positive


def test_fp_rate_sized_filter(spark, urls):
    corpus, fresh = urls
    # m/n = 2^16/2000 ≈ 33 bits/key, k=5 → theoretical FP ~1e-4; assert a
    # loose bound so hash-family jitter can't flake the test
    bits = bloom_build(corpus, "url", log2_m=16, k=5)
    probe = bloom_probe_udf(spark.sparkContext.broadcast(bits), log2_m=16, k=5)
    fp = fresh.withColumn("m", probe(F.xxhash64("url"))).filter("m").count()
    assert fp / 2000 < 0.02


def test_undersized_filter_saturates_but_stays_exact(spark, urls):
    # a 2^10-bit filter over 2000 keys is mostly-full: FPs abound, but
    # bloom_new_keys' verify join keeps the result exact anyway
    corpus, fresh = urls
    out = bloom_new_keys(fresh, corpus, "url", log2_m=10, k=3)
    expect = fresh.join(corpus.select("url"), "url", "left_anti")
    assert sorted(r.id for r in out.collect()) == sorted(
        r.id for r in expect.collect()
    )


def test_new_keys_exactness_with_overlap(spark, urls):
    corpus, fresh = urls
    # snapshot = half seen urls + all fresh urls
    snap = corpus.filter("id % 2 = 0").unionByName(fresh)
    out = bloom_new_keys(snap, corpus, "url", log2_m=16, k=5)
    got = sorted(r.id for r in out.collect())
    assert got == list(range(2000, 4000))  # seen half filtered exactly


def test_prefilter_shrinks_verify_input(spark, urls):
    # the candidate slice (maybe-seen rows that reach the anti-join) must
    # be ≈ the truly-seen rows, not the whole snapshot — this is the
    # scale claim: FP-rate × |snapshot| + |seen| rows shuffle, not 10^9
    corpus, fresh = urls
    snap = corpus.filter("id % 4 = 0").unionByName(fresh)  # 500 seen + 2000 new
    bits = bloom_build(corpus, "url", log2_m=16, k=5)
    probe = bloom_probe_udf(spark.sparkContext.broadcast(bits), log2_m=16, k=5)
    cand = snap.withColumn("m", probe(F.xxhash64("url"))).filter("m").count()
    assert 500 <= cand <= 500 + 40  # seen rows + a handful of FPs


def test_build_merge_tree_matches_single_partition(spark):
    # OR-merge associativity: an 8-partition build with fanin=2 must
    # produce the identical bitset as a 1-partition build
    df8 = spark.range(0, 300, 1, 8).select(F.format_string("k%d", "id").alias("u"))
    df1 = spark.range(0, 300, 1, 1).select(F.format_string("k%d", "id").alias("u"))
    assert bloom_build(df8, "u", log2_m=12, k=4, fanin=2) == bloom_build(
        df1, "u", log2_m=12, k=4, fanin=2
    )


def test_probe_vectorization_matches_reference(spark):
    # the numpy multiply-shift probe positions, recomputed row-at-a-time
    # with python ints, must agree with the vectorized path
    from geomesa_spark.operators.bloom import _positions, _probe_params

    a, b = _probe_params(4, seed=42)
    keys = np.array([0, 1, -1, 2**63 - 1, -(2**63)], dtype=np.int64).astype(np.uint64)
    vec = _positions(keys, a, b, 12)
    for i, ai in enumerate(a):
        for j, kj in enumerate(keys):
            ref = ((int(kj) * int(ai) + int(b[i])) % (1 << 64)) >> (64 - 12)
            assert vec[i, j] == ref


def test_log2m_bounds():
    with pytest.raises(ValueError):
        bloom_build(None, "u", log2_m=8)


def test_bloom_merge_delta_equals_full_build(spark):
    from geomesa_spark.operators.bloom import bloom_merge

    a = spark.range(0, 150, 1, 4).select(F.format_string("k%d", "id").alias("u"))
    b = spark.range(150, 400, 1, 4).select(F.format_string("k%d", "id").alias("u"))
    merged = bloom_merge(
        bloom_build(a, "u", log2_m=13, k=4), bloom_build(b, "u", log2_m=13, k=4)
    )
    assert merged == bloom_build(a.unionByName(b), "u", log2_m=13, k=4)


def test_bloom_merge_rejects_mixed_sizes(spark):
    from geomesa_spark.operators.bloom import bloom_merge

    a = spark.range(0, 10).select(F.format_string("k%d", "id").alias("u"))
    with pytest.raises(ValueError):
        bloom_merge(bloom_build(a, "u", log2_m=12), bloom_build(a, "u", log2_m=13))
    with pytest.raises(ValueError):
        bloom_merge()


def test_source_fingerprint_tracks_data_changes(tmp_path):
    # the cache key for input-derived cached tables must change when the
    # source parquet does (file count, size, or mtime)
    import os
    import __spark_entry__ as entry

    d = tmp_path / "sfX"
    (d / "documents.parquet").mkdir(parents=True)
    f = d / "documents.parquet" / "part-0.parquet"
    f.write_bytes(b"x" * 100)
    fp1 = entry._source_fingerprint(str(d), "documents")
    assert fp1.startswith("1_100_")
    f.write_bytes(b"x" * 120)  # size change
    fp2 = entry._source_fingerprint(str(d), "documents")
    assert fp1 != fp2
    f2 = d / "documents.parquet" / "part-1.parquet"
    f2.write_bytes(b"y")  # new file
    assert entry._source_fingerprint(str(d), "documents") != fp2
    # mtime-only change, same sizes (pin BOTH files so the max moves)
    os.utime(f, ns=(1, 1))
    os.utime(f2, ns=(1, 1))
    fp3 = entry._source_fingerprint(str(d), "documents")
    os.utime(f2, ns=(2, 2))
    assert entry._source_fingerprint(str(d), "documents") != fp3
    assert entry._source_fingerprint(str(d), "missing") == "nosrc"
