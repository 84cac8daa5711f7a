"""Tests for the training-data-pipeline operators: dedup, ANN, text stats,
streaming replay, checkpoint/resume, multimodal plumbing.

Mirrors the reference's test strategy (SURVEY.md §5): small deterministic
fixtures with exact expected results, plus brute-force cross-checks for the
approximate operators.
"""

from __future__ import annotations

import itertools
from datetime import datetime, timedelta, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    """60 docs: 20 bases, each with an exact dup and a near-dup (one word
    changed), plus distinct filler."""
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    rows = []
    i = 0
    for b in range(20):
        base = f"doc{b} " + " ".join(words[(b + j) % len(words)] for j in range(30))
        near = base.replace(words[b % len(words)], "CHANGED", 1)
        rows.append((i, base)); i += 1
        rows.append((i, base)); i += 1      # exact dup
        rows.append((i, near)); i += 1      # near dup
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    """200 vectors in 4 tight clusters (dim 16)."""
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(200):
        v = centers[i % 4] + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.cache().count()
    return df


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup_keeps_min_id(spark, docs):
    from geomesa_spark.operators.dedup import exact_dedup

    keep = exact_dedup(docs, "text", "doc_id").collect()
    # 20 bases (each a pair of identical texts) + 20 near-dups = 40 distinct
    assert len(keep) == 40
    kept_ids = {r["doc_id"] for r in keep}
    # of each identical pair (3b, 3b+1) only the smaller id survives
    for b in range(20):
        assert 3 * b in kept_ids and 3 * b + 1 not in kept_ids


def test_span_dedup_removal_list(spark):
    from geomesa_spark.operators.dedup import span_dedup

    para = "x" * 25  # >= min_len
    uniq = lambda i: f"unique paragraph number {i} padded out to len"
    rows = [
        (5, f"{para}\n\n{uniq(5)}"),          # dup span, NOT the keeper
        (1, f"{uniq(1)}\n\n{para}"),          # keeper: min (id, span_idx)
        (7, f"{para}\n\n{para}"),             # within-doc repeat: both removed
        (9, "short\n\ntiny"),                 # all spans under min_len: ignored
        (3, None),                            # null text: no spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_dedup(df, "text", "doc_id", min_len=20).collect()
    removed = {(r["doc_id"], r["span_idx"]) for r in out}
    # keeper is (1, 1): first occurrence in (id, idx) order survives
    assert removed == {(5, 0), (7, 0), (7, 1)}
    assert all(r["n_occurrences"] == 4 for r in out)
    # md5 audit column rides along
    import hashlib

    want = hashlib.md5(para.encode()).hexdigest()
    assert all(r["span_md5"] == want for r in out)


def test_span_dedup_no_dups_is_empty(spark):
    from geomesa_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(i, f"totally distinct paragraph contents {i}") for i in range(5)],
        "doc_id long, text string",
    )
    assert span_dedup(df, "text", "doc_id", min_len=10).count() == 0


def test_minhash_lsh_finds_planted_near_dups(spark, docs):
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    # every exact pair must be found; near-dup pairs (jaccard ~0.8) too
    found_exact = sum((3 * b, 3 * b + 1) in pairs for b in range(20))
    found_near = sum(
        (3 * b, 3 * b + 2) in pairs or (3 * b + 1, 3 * b + 2) in pairs
        for b in range(20)
    )
    assert found_exact == 20
    assert found_near >= 18  # probabilistic but seeded -> deterministic


def test_minhash_estimates_jaccard(spark, docs):
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    rows = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3).collect()
    exact = {(3 * b, 3 * b + 1) for b in range(20)}
    for r in rows:
        if (r["id_a"], r["id_b"]) in exact:
            assert r["est_jaccard"] == 1.0


def test_simhash_near_pairs(spark, docs):
    from geomesa_spark.operators.dedup import simhash_near_pairs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).collect()}
    for b in range(20):
        assert pairs.get((3 * b, 3 * b + 1)) == 0  # identical text -> distance 0


def test_ngram_jaccard_verifies(spark, docs):
    from geomesa_spark.operators.dedup import ngram_jaccard_pairs

    rows = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}
    for b in range(20):
        assert got.get((3 * b, 3 * b + 1)) == 1.0


# ---------------------------------------------------------------------------
# ANN
# ---------------------------------------------------------------------------


def test_cosine_topk_matches_numpy(spark, emb):
    from geomesa_spark.operators.ann import cosine_topk

    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist())
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    queries = [("q0", list(mat[0])), ("q1", list(mat[1]))]
    got = cosine_topk(emb, queries, k=5).collect()
    for qid, qvec in queries:
        sims = matn @ (np.array(qvec) / np.linalg.norm(qvec))
        order = np.lexsort((pdf["vec_id"].to_numpy(), -sims))
        expect = [int(pdf["vec_id"].iloc[j]) for j in order[:5]]
        mine = [r["vec_id"] for r in sorted(
            (g for g in got if g["query_id"] == qid), key=lambda r: r["rank"])]
        assert mine == expect


def test_lsh_recall_vs_brute(spark, emb):
    from geomesa_spark.operators.ann import cosine_topk, lsh_cosine_topk

    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist())
    queries = [(f"q{i}", list(mat[i])) for i in range(4)]
    brute = cosine_topk(emb, queries, k=10).collect()
    approx = lsh_cosine_topk(emb, queries, k=10).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    a = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(a & b) / len(b)
    assert recall >= 0.9  # clustered data, seeded planes


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------


def test_text_quality_metrics(spark):
    from geomesa_spark.operators.textstats import text_quality

    df = spark.createDataFrame(
        [(1, "Hello, World 42!"), (2, ""), (3, "the and of to")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_quality(df, "text", "doc_id").collect()}
    r1 = rows[1]
    assert r1["n_chars"] == 16 and r1["n_tokens"] == 3
    assert r1["punct_ratio"] == round(2 / 16, 6)
    assert r1["digit_ratio"] == round(2 / 16, 6)
    assert rows[2]["n_tokens"] == 0
    assert rows[3]["stopword_ratio"] == 1.0


def test_language_id(spark):
    from geomesa_spark.operators.textstats import language_id

    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house"),
         (2, "der hund und die katze ist nicht da"),
         (3, "xyzzy plugh")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df, "text", "doc_id").collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_fingerprint_whitespace_case_invariant(spark):
    from geomesa_spark.operators.textstats import fingerprint

    df = spark.createDataFrame(
        [(1, "Hello  World   Foo"), (2, "hello world foo"), (3, "different text here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "text", "doc_id").collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert all(v >= 0 for v in got.values())


# ---------------------------------------------------------------------------
# streaming replay + live view semantics
# ---------------------------------------------------------------------------


def _msgs(spark):
    rows = [
        # (offset, kind, id, lon, lat, ts)
        (0, "create", "a", 1.0, 1.0, datetime(2024, 1, 1, 0, 0)),
        (1, "create", "b", 2.0, 2.0, datetime(2024, 1, 1, 0, 10)),
        (2, "create", "a", 3.0, 3.0, datetime(2024, 1, 1, 0, 20)),  # update a
        (3, "delete", "b", None, None, datetime(2024, 1, 1, 0, 30)),
        (4, "clear", None, None, None, datetime(2024, 1, 1, 0, 40)),
        (5, "create", "c", 5.0, 5.0, datetime(2024, 1, 1, 0, 50)),
    ]
    return spark.createDataFrame(
        rows, "offset long, kind string, id string, lon double, lat double, ts timestamp"
    )


def test_replay_snapshot_points_in_time(spark):
    from geomesa_spark.streaming.live import replay_snapshot

    m = _msgs(spark)

    def snap(minute):
        at = datetime(2024, 1, 1, 0, minute, tzinfo=timezone.utc)
        return {r["id"]: (r["lon"], r["lat"]) for r in replay_snapshot(m, at).collect()}

    assert snap(5) == {"a": (1.0, 1.0)}
    assert snap(15) == {"a": (1.0, 1.0), "b": (2.0, 2.0)}
    assert snap(25) == {"a": (3.0, 3.0), "b": (2.0, 2.0)}   # update wins
    assert snap(35) == {"a": (3.0, 3.0)}                     # b deleted
    assert snap(45) == {}                                    # clear wipes
    assert snap(55) == {"c": (5.0, 5.0)}                     # post-clear create


def test_replay_read_behind_window(spark):
    from geomesa_spark.streaming.live import replay_snapshot

    m = _msgs(spark)
    at = datetime(2024, 1, 1, 0, 25, tzinfo=timezone.utc)
    # only messages within the last 10 minutes are visible
    got = {r["id"] for r in replay_snapshot(m, at, read_behind_s=600).collect()}
    assert got == {"a"}


def test_live_view_streaming_upsert(spark, tmp_path):
    """Drive the structured-streaming live view end-to-end with a rate-less
    file source and check the final state table."""
    import time as _time

    from geomesa_spark.streaming.live import live_view

    src = str(tmp_path / "msgs")
    _msgs(spark).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "offset long, kind string, id string, lon double, lat double, ts timestamp"
    ).parquet(src)
    q = (
        live_view(stream, ttl_seconds=3600)
        .writeStream.format("memory")
        .queryName("live_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    from geomesa_spark.streaming.live import live_snapshot

    state = {r["id"]: r for r in live_snapshot(spark, "live_state").collect()}
    assert set(state) == {"c"}  # after the global clear, only c is alive
    assert state["c"]["lon"] == 5.0


def test_live_view_ttl_evicts_state_across_batches(spark, tmp_path):
    """TTL actually BOUNDS the state store (the expire-after-write cache of
    KFK/LiveKafkaConsumerFeatureSource.scala:136-191): drive multiple
    micro-batches on a processing-time trigger, let 9 of 10 keys pass their
    TTL while one is kept alive by an update, and assert via the state
    operator metrics that the store shrinks to the live-key count — plus
    tombstones make the evicted keys invisible to the snapshot."""
    import time as _time

    from geomesa_spark.streaming.live import live_snapshot, live_view

    src = tmp_path / "ttl_msgs"
    src.mkdir()
    schema = "offset long, kind string, id string, lon double, lat double, ts timestamp"
    base_ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    batch1 = spark.createDataFrame(
        [(i, "create", f"k{i}", float(i), float(i), base_ts) for i in range(10)],
        schema,
    )
    batch1.coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "8"
    ).parquet(str(src) + "/*")
    q = (
        live_view(stream, ttl_seconds=8.0)
        .writeStream.format("memory")
        .queryName("ttl_state")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def state_rows():
            p = q.lastProgress
            if not p or not p.get("stateOperators"):
                return None
            return p["stateOperators"][0]["numRowsTotal"]

        deadline = _time.time() + 60
        while _time.time() < deadline and state_rows() != 10:
            _time.sleep(0.3)
        assert state_rows() == 10, f"initial state never reached 10: {state_rows()}"

        # keep k0 alive: an update inside the TTL window resets its timer
        spark.createDataFrame(
            [(100, "create", "k0", 9.5, 9.5, base_ts + timedelta(minutes=1))],
            schema,
        ).coalesce(1).write.parquet(str(src / "b2"))

        # k1..k9 expire after ~8s of processing time; no-data micro-batches
        # keep firing on the 500ms trigger, so eviction needs no new input
        deadline = _time.time() + 90
        while _time.time() < deadline and state_rows() != 1:
            _time.sleep(0.5)
        assert state_rows() == 1, (
            f"state not bounded after TTL: {state_rows()} rows still stored"
        )

        alive = {r["id"]: r for r in live_snapshot(spark, "ttl_state").collect()}
        assert set(alive) == {"k0"} and alive["k0"]["lon"] == 9.5
        # eviction emitted explicit tombstones (alive=False, null coords)
        dead = {
            r["id"]
            for r in spark.table("ttl_state")
            .filter(~F.col("alive") & F.col("lon").isNull())
            .collect()
        }
        assert dead >= {f"k{i}" for i in range(1, 10)}
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------


def test_checkpoint_stage_resumes(spark, tmp_path):
    import json
    import os

    from geomesa_spark.runtime.metrics import checkpoint_stage

    base = str(tmp_path / "ckpt")
    df = spark.range(0, 1000, 1, 4).withColumn("v", F.col("id") * 2)
    out1 = checkpoint_stage(df, base, "stage1")
    assert out1.count() == 1000
    m = json.load(open(os.path.join(base, "stage1.metrics.json")))
    assert m["rows"] == 1000 and m["partitions"] >= 1
    assert sum(m["extra"]["per_partition_rows"].values()) == 1000

    # resume: a poisoned recompute would fail -> must read the checkpoint
    @F.udf("long")
    def boom(x):
        raise RuntimeError("recomputed instead of resuming")

    poisoned = spark.range(0, 1000, 1, 4).withColumn("v", boom(F.col("id")))
    out2 = checkpoint_stage(poisoned, base, "stage1")
    assert out2.count() == 1000


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_media_features_shape(spark):
    from geomesa_spark.operators.multimodal import FEATURE_DIM, media_features, synth_media

    media = synth_media(spark, 300, partitions=4)
    rows = media_features(media).collect()
    assert len(rows) == 300
    assert all(len(r["feat"]) == FEATURE_DIM for r in rows)
    # deterministic: same id -> same features across runs
    again = {r["media_id"]: r["feat"] for r in media_features(media).collect()}
    assert again[0] == next(r["feat"] for r in rows if r["media_id"] == 0)


def test_resize_images_only_touches_images(spark):
    from geomesa_spark.operators.multimodal import resize_images, synth_media

    media = synth_media(spark, 90, partitions=2)
    out = resize_images(media, 32, 24)
    rows = out.collect()
    assert len(rows) == 90
    for r in rows:
        if r["kind"] == "image":
            assert r["width"] == 32 and r["height"] == 24
            assert len(r["payload"]) == 32 * 24
        else:
            assert len(r["payload"]) > 0 and r["width"] != 32 or r["kind"] != "image"


def test_sample_frames_counts(spark):
    from geomesa_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, 60, partitions=2)
    vids = {r["media_id"]: r["n_frames"] for r in media.filter(F.col("kind") == "video").collect()}
    got = sample_frames(media, every_n=10).collect()
    per_vid = {}
    for r in got:
        per_vid.setdefault(r["media_id"], 0)
        per_vid[r["media_id"]] += 1
    for mid, nf in vids.items():
        assert per_vid.get(mid, 0) == len(range(0, nf, 10))


def test_decode_real_codec_is_gated():
    from geomesa_spark.operators.multimodal import decode_payload

    with pytest.raises(NotImplementedError):
        decode_payload(b"abc", "image", fake=False)


def test_ivf_recall_vs_brute(spark, emb):
    from geomesa_spark.operators.ann import cosine_topk, ivf_cosine_topk

    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist())
    queries = [(f"q{i}", list(mat[i])) for i in range(4)]
    brute = cosine_topk(emb, queries, k=10).collect()
    approx = ivf_cosine_topk(emb, queries, k=10, n_cells=8, nprobe=3).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    a = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(a & b) / len(b) >= 0.9  # clustered data, nprobe=3 of 8 cells


def test_embedding_near_pairs_planted(spark):
    from geomesa_spark.operators.ann import embedding_near_pairs

    rng = np.random.RandomState(0)
    base = rng.standard_normal((30, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in v * 4.0]))  # exact-direction dup
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_pairs(emb, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, 1000 + i) for i in range(30)} <= got
    # no wildly-dissimilar pair sneaks past the exact verify
    for r in pairs.collect():
        assert r["sim"] >= 0.999


def test_embedding_near_pairs_hot_bucket_star(spark):
    from geomesa_spark.operators.ann import embedding_near_pairs

    v = [1.0] * 8
    rows = [(i, v) for i in range(30)]  # 30 identical vectors, one bucket
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_pairs(emb, threshold=0.999, bucket_cap=5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(0, i) for i in range(1, 30)}
