"""Incremental dedup: a new crawl snapshot checked against an existing
corpus fingerprint table (dedup.corpus_fingerprints / incremental_dedup)
without re-clustering the corpus.

Verdict semantics pinned here: exact (content-hash match, min corpus id)
takes precedence over near (band match + signature-estimate verify, best
match by estimate then min id); everything else is 'new' with NULL
match_id. The hot-bucket hub path is exercised with bucket_cap=1.
"""

from pyspark.sql import functions as F

from geomesa_spark.operators.dedup import (
    corpus_fingerprints,
    incremental_dedup,
    synth_dedup_corpus,
)


def _fp(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return corpus_fingerprints(df, "text", "doc_id")


def test_verdicts_exact_near_new(spark):
    corpus = synth_dedup_corpus(spark, 6, mutate=2).filter(F.col("doc_id") % 3 == 0)
    fp = corpus_fingerprints(corpus, "text", "doc_id")
    full = synth_dedup_corpus(spark, 8, mutate=2)
    g = F.floor(F.col("doc_id") / 3)
    role = F.col("doc_id") % 3
    snapshot = (
        # exact copies of bases 0 and 3 (mutate=0 role-1 == base text)
        synth_dedup_corpus(spark, 2, mutate=0).filter(role == 1)
        # near-dups of bases 9 and 12 (mutate=2 role-1, J ~ 0.87)
        .unionByName(full.filter((role == 1) & g.isin(3, 4)))
        # novel: bases of groups 6,7 (not in corpus, vocab disjoint)
        .unionByName(full.filter((role == 0) & g.isin(6, 7)))
    )
    got = {
        r.doc_id: (r.verdict, r.match_id)
        for r in incremental_dedup(snapshot, fp, "text", "doc_id").collect()
    }
    assert got == {
        1: ("exact", 0), 4: ("exact", 3),
        10: ("near", 9), 13: ("near", 12),
        18: ("new", None), 21: ("new", None),
    }


def test_exact_takes_precedence_and_min_id_wins(spark):
    # two corpus docs share the identical text: match_id is the smaller id
    fp = _fp(spark, [(7, "x y z " * 20), (3, "x y z " * 20)])
    snap = spark.createDataFrame([(100, "x y z " * 20)], "doc_id long, text string")
    rows = incremental_dedup(snap, fp, "text", "doc_id").collect()
    assert [(r.doc_id, r.verdict, r.match_id) for r in rows] == [(100, "exact", 3)]


def test_near_threshold_drops_weak_matches(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"zzz{i}" for i in range(40))
    fp = _fp(spark, [(0, base)])
    snap = spark.createDataFrame([(1, other)], "doc_id long, text string")
    got = incremental_dedup(snap, fp, "text", "doc_id", threshold=0.5).collect()
    assert [(r.verdict, r.match_id) for r in got] == [("new", None)]


def test_hot_bucket_hub_path_still_matches(spark):
    # two byte-identical corpus docs put EVERY bucket at size 2, and
    # bucket_cap=1 forces them all through the min-id hub branch; a
    # near-dup snapshot doc must still resolve, and to the hub (the
    # template family's smallest corpus id)
    base = " ".join(f"w{i}" for i in range(60))
    fp = _fp(spark, [(9, base), (5, base)])
    snap = spark.createDataFrame([(42, base + " tail")], "doc_id long, text string")
    got = incremental_dedup(snap, fp, "text", "doc_id", bucket_cap=1).collect()
    assert [(r.doc_id, r.verdict, r.match_id) for r in got] == [(42, "near", 5)]


def test_schema_and_null_match_id_type(spark):
    fp = _fp(spark, [(0, "a b c " * 20)])
    snap = spark.createDataFrame([(1, "q r s " * 20)], "doc_id long, text string")
    out = incremental_dedup(snap, fp, "text", "doc_id")
    assert [f.name for f in out.schema.fields] == ["doc_id", "verdict", "match_id"]
    assert dict(out.dtypes)["match_id"] == "bigint"


def test_streaming_incremental_dedup_stream_static(spark, tmp_path):
    import json
    import os

    from geomesa_spark.streaming.dedup_stream import streaming_incremental_dedup

    corpus = spark.createDataFrame(
        [(3, "seen before " * 10), (7, "seen before " * 10), (9, "other doc " * 10)],
        "doc_id long, text string",
    )
    fp = corpus_fingerprints(corpus, "text", "doc_id")

    src = tmp_path / "incr_src"
    os.makedirs(src)
    rows = [
        {"doc_id": 100, "text": "seen before " * 10},  # exact dup of 3 (min id)
        {"doc_id": 101, "text": "brand new page"},
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))

    out = streaming_incremental_dedup(stream, fp, "text", "doc_id")
    q = (
        out.writeStream.format("memory").queryName("incr_stream")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = {
        r.doc_id: (r.verdict, r.match_id)
        for r in spark.sql("SELECT * FROM incr_stream").collect()
    }
    assert got == {100: ("exact", 3), 101: ("new", None)}


def test_randomized_invariants_vs_python_reference(spark):
    # deterministic randomized corpus over a 5-token vocab so exact
    # collisions and near-misses both occur; the exact stage is checked
    # against a pure-python reference, the near stage against invariants
    import hashlib

    import numpy as np

    rng = np.random.default_rng(7)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "eps"])

    def mk():
        return " ".join(rng.choice(vocab, size=int(rng.integers(5, 12))))

    corpus_rows = [(i, mk()) for i in range(30)]
    snap_rows = [(100 + i, mk()) for i in range(30)]

    fp = corpus_fingerprints(
        spark.createDataFrame(corpus_rows, "doc_id long, text string"),
        "text", "doc_id",
    )
    out = incremental_dedup(
        spark.createDataFrame(snap_rows, "doc_id long, text string"),
        fp, "text", "doc_id",
    ).collect()

    # exactly one verdict row per snapshot doc
    assert sorted(r.doc_id for r in out) == [100 + i for i in range(30)]

    by_hash = {}
    for i, t in corpus_rows:
        h = hashlib.md5(t.encode()).hexdigest()
        by_hash[h] = min(by_hash.get(h, i), i)
    corpus_ids = {i for i, _ in corpus_rows}
    expect_exact = {
        d: by_hash[hashlib.md5(t.encode()).hexdigest()]
        for d, t in snap_rows
        if hashlib.md5(t.encode()).hexdigest() in by_hash
    }
    got_exact = {r.doc_id: r.match_id for r in out if r.verdict == "exact"}
    assert got_exact == expect_exact

    for r in out:
        if r.verdict == "near":
            # near never fires where exact should have, and always points
            # at a real corpus doc
            assert r.doc_id not in expect_exact
            assert r.match_id in corpus_ids
        if r.verdict == "new":
            assert r.match_id is None
