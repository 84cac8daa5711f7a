"""Round-3 regression tests: skew guards on the dedup family, vincenty kNN
ring routing, visibility robustness, randomized (non-planted) recall floors
for the LSH families.

The planted analytic oracles in __spark_entry__.py are exact but by
construction insensitive to approximation quality; the randomized corpora
here (seeded, deterministic) are the quality gate that fails if bands/
rounds/caps are trimmed too far.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# dedup skew guards
# ---------------------------------------------------------------------------


def test_simhash_hot_bucket_star(spark):
    """A degenerate bucket of B identical docs must emit O(B) star pairs,
    not O(B^2) — same guard as the MinHash/embedding paths."""
    from geomesa_spark.operators.dedup import simhash_near_pairs

    rows = [(i, "same words repeated here for everyone") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_pairs(docs, "text", "doc_id", max_hamming=3, bucket_cap=5)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    # star shape: every member links to the bucket's minimum id only
    assert set(got) == {(0, i) for i in range(1, 30)}
    assert all(h == 0 for h in got.values())


def test_simhash_small_buckets_unaffected_by_cap(spark):
    """Below the cap the banding is exhaustive (pigeonhole): the capped
    operator returns exactly the numpy all-pairs hamming<=3 set."""
    from geomesa_spark.operators.dedup import (
        simhash_near_pairs,
        simhash_signatures,
    )

    rng = np.random.RandomState(11)
    vocab = [f"w{v}" for v in rng.randint(0, 50_000, size=600)]
    rows = []
    for i in range(40):
        toks = [vocab[(i * 13 + j) % len(vocab)] for j in range(50)]
        rows.append((i, " ".join(toks)))
        near = list(toks)
        near[7] = "MUT"  # one-token change -> small hamming, usually <= 3
        rows.append((100 + i, " ".join(near)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = {r["doc_id"]: r["simhash"] for r in
            simhash_signatures(docs, "text", "doc_id").collect()}
    ids = sorted(sigs)
    want = set()
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3:
                want.add((a, b))
    got = {(r["id_a"], r["id_b"]) for r in
           simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).collect()}
    assert got == want
    assert len(want) >= 10  # the fixture actually plants close pairs


def test_ngram_hot_gram_cap_bounds_join(spark):
    """One stopword shingle shared by all B docs must not emit B^2 rows:
    with the DF cap the hot gram is dropped before the self-join."""
    from geomesa_spark.operators.dedup import ngram_jaccard_exact

    rows = []
    for i in range(20):
        # every doc starts with the same 3 tokens (one hot gram, df=20),
        # then a unique tail -> no discriminating overlap
        rows.append((i, "the quick brown " + " ".join(f"u{i}_{j}" for j in range(10))))
    # plus one genuinely-near pair sharing a full unique tail
    rows.append((100, "aa bb cc dd ee ff gg hh"))
    rows.append((101, "aa bb cc dd ee ff gg zz"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_exact(docs, "text", "doc_id", n=3,
                                 threshold=0.01, max_gram_df=5).collect()
    # the hot-gram-only pairs vanish; the genuine pair survives via its
    # unique shared grams
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert (100, 101) in got
    assert all(a >= 100 for a, _ in got)

    uncapped = ngram_jaccard_exact(docs, "text", "doc_id", n=3,
                                   threshold=0.01, max_gram_df=None).collect()
    # without the cap the hot gram links all C(20,2) low-jaccard pairs
    assert len(uncapped) >= 190


def test_ngram_cap_keeps_denominator_exact(spark):
    """na/nb come from the pre-filter gram table: dropping a hot gram
    lowers the intersection only, so J is a documented underestimate."""
    from geomesa_spark.operators.dedup import ngram_jaccard_exact

    rows = [(i, "the quick brown fox " + f"tail{i}") for i in range(10)]
    rows.append((50, "x1 x2 x3 x4 x5"))
    rows.append((51, "x1 x2 x3 x4 x5"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_exact(docs, "text", "doc_id", n=3,
                               threshold=0.5, max_gram_df=5).collect()}
    # identical docs share only non-hot grams -> exact J = 1.0 preserved
    assert got.get((50, 51)) == 1.0


# ---------------------------------------------------------------------------
# randomized recall floors (non-planted; fail if bands/rounds are trimmed)
# ---------------------------------------------------------------------------


def test_minhash_randomized_recall_floor(spark):
    """Seeded random corpus with ~5% token mutation (true 3-shingle Jaccard
    ~0.7): banded LSH must recover >= 90% of the planted near pairs."""
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    rng = np.random.RandomState(23)
    rows = []
    for b in range(40):
        toks = [f"t{v}" for v in rng.randint(0, 1_000_000, size=60)]
        near = list(toks)
        for pos in (5, 25, 45):  # 3 of 60 tokens mutated
            near[pos] = f"m{rng.randint(0, 1_000_000)}"
        rows.append((2 * b, " ".join(toks)))
        rows.append((2 * b + 1, " ".join(near)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).collect()}
    planted = {(2 * b, 2 * b + 1) for b in range(40)}
    recall = len(pairs & planted) / len(planted)
    assert recall >= 0.9
    # and no cross-group pair of independent random docs sneaks through
    assert not (pairs - planted)


# ---------------------------------------------------------------------------
# visibility robustness
# ---------------------------------------------------------------------------


def test_visibility_malformed_label_filtered_not_raised(spark):
    """Accumulo semantics: a malformed marking anywhere in the table makes
    THOSE rows invisible; it must not abort the query."""
    from geomesa_spark.runtime.security import visibility_filter

    df = spark.createDataFrame(
        [(1, "ops"), (2, "a&&b("), (3, "admin&ops"), (4, None), (5, "")],
        "id int, vis string",
    )
    got = sorted(r["id"] for r in visibility_filter(df, "vis", {"ops"}).collect())
    assert got == [1, 4, 5]


def test_visibility_high_cardinality_fallback(spark):
    """Beyond the vocabulary cap the operator must still answer (arrow-UDF
    over the distinct table + semi-join), with identical semantics."""
    from geomesa_spark.runtime.security import visibility_filter

    rows = [(i, "ops" if i % 3 == 0 else f"team{i}") for i in range(60)]
    rows.append((1000, None))
    df = spark.createDataFrame(rows, "id int, vis string")
    got = sorted(
        r["id"]
        for r in visibility_filter(df, "vis", {"ops"}, max_vocabulary=10).collect()
    )
    want = sorted([i for i in range(60) if i % 3 == 0] + [1000])
    assert got == want


# ---------------------------------------------------------------------------
# vincenty kNN without a radius bound: ring expansion, not whole-earth pass
# ---------------------------------------------------------------------------


def test_knn_vincenty_no_radius_ring_routes_and_matches_brute(spark):
    from datetime import datetime, timezone

    from geomesa_spark.geom.kernels import vincenty_m
    from geomesa_spark.operators.knn import knn_join
    from geomesa_spark.plans.compiler import GeoTable

    rows = []
    for i in range(400):
        lon = -20.0 + (i * 7919 % 4000) / 100.0
        lat = -20.0 + (i * 104729 % 4000) / 100.0
        rows.append((str(i), lon, lat,
                     datetime(2020, 3, 1 + i % 4, i % 24, tzinfo=timezone.utc)))
    df = spark.createDataFrame(rows, "id string, lon double, lat double, dtg timestamp")
    pts = GeoTable(df=df, lon="lon", lat="lat", dtg="dtg", fid="id")

    queries = [("q0", 3.3, -4.4), ("q1", -19.5, 19.5)]
    got = knn_join(pts, queries, k=6, metric="vincenty", max_radius_m=None)
    res = got.select("query_id", "id", "dist").collect()

    lons = np.array([r[1] for r in rows]); lats = np.array([r[2] for r in rows])
    for qid, qlon, qlat in queries:
        dist = vincenty_m(lons, lats, np.full(len(rows), qlon),
                          np.full(len(rows), qlat))
        order = sorted(range(len(rows)), key=lambda i: (dist[i], rows[i][0]))
        want = [rows[i][0] for i in order[:6]]
        mine = [r["id"] for r in sorted(
            (r for r in res if r["query_id"] == qid), key=lambda r: r["dist"])]
        assert mine == want


# ---------------------------------------------------------------------------
# IVF: sampled training + persisted cell column
# ---------------------------------------------------------------------------


def test_ivf_sampled_training_recall(spark):
    """Training on a 30% sample must not sink recall on clustered data —
    the scale contract says training never needs the corpus."""
    from geomesa_spark.operators.ann import cosine_topk, ivf_cosine_topk

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(200):
        v = centers[i % 4] + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mat = np.array([r[1] for r in rows])
    queries = [(f"q{i}", list(mat[i])) for i in range(4)]
    brute = cosine_topk(emb, queries, k=10).collect()
    approx = ivf_cosine_topk(emb, queries, k=10, n_cells=8, nprobe=3,
                             sample_fraction=0.3).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    a = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(a & b) / len(b) >= 0.9


def test_ivf_precomputed_cell_column(spark):
    """The layout path: assign cells once (assign_ivf_cells), query with
    cell_col= so no re-assignment pass runs — results identical."""
    from geomesa_spark.operators.ann import (
        assign_ivf_cells,
        ivf_cosine_topk,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(200):
        v = centers[i % 4] + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    mat = np.array([r[1] for r in rows])
    queries = [(f"q{i}", list(mat[i])) for i in range(3)]

    cents = train_ivf_centroids(emb, n_cells=8, iters=2, sample_fraction=0.5)
    assigned = assign_ivf_cells(emb, cents)
    via_layout = ivf_cosine_topk(
        assigned, queries, k=5, n_cells=8, nprobe=3,
        centroids=cents, cell_col="__cell",
    ).collect()
    direct = ivf_cosine_topk(
        emb, queries, k=5, n_cells=8, nprobe=3, centroids=cents
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted([(r["query_id"], r["vec_id"], r["rank"]) for r in via_layout]) == \
        sorted([(r["query_id"], r["vec_id"], r["rank"]) for r in direct])


# ---------------------------------------------------------------------------
# layout completion marker
# ---------------------------------------------------------------------------


def test_layout_success_marker_written_last(spark, tmp_path):
    """_LAYOUT_SUCCESS exists only after main + _attr + _st all landed —
    the cache-validity gate for crash-mid-fanout."""
    import os
    from datetime import datetime, timezone

    from geomesa_spark.sources.layout import write_layout

    rows = [(str(i), float(i % 30), float(i % 20),
             datetime(2020, 3, 1, i % 24, tzinfo=timezone.utc), f"k{i % 3}")
            for i in range(100)]
    df = spark.createDataFrame(
        rows, "id string, lon double, lat double, dtg timestamp, kind string")
    path = str(tmp_path / "lay")
    write_layout(df, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                 attr_indexes=["kind"], st_copy=True)
    assert os.path.exists(os.path.join(path, "_LAYOUT_SUCCESS"))
    assert os.path.exists(os.path.join(path, "_attr/kind/_SUCCESS"))
    assert os.path.exists(os.path.join(path, "_st/_SUCCESS"))


# ---------------------------------------------------------------------------
# geo-positioned mosaic (pixel PLACEMENT, not just folding)
# ---------------------------------------------------------------------------


def _chunk_row(tile_id, bbox, w, h, pixel_bytes):
    x0, y0, x1, y1 = bbox
    return (tile_id, float(x0), float(y0), float(x1), float(y1), w, h,
            bytes(pixel_bytes))


_CHUNK_SCHEMA = ("tile_id long, c_lon_min double, c_lat_min double, "
                 "c_lon_max double, c_lat_max double, c_width int, "
                 "c_height int, payload binary")


def test_mosaic_geo_places_chunks_at_bbox_offsets(spark):
    """Two 2x2 chunks side by side land at their geographic offsets in the
    canvas; row 0 is the NORTH edge."""
    from geomesa_spark.operators.tiling import mosaic_geo

    rows = [
        _chunk_row(1, (0, 0, 2, 2), 2, 2, [1, 2, 3, 4]),       # west
        _chunk_row(2, (2, 0, 4, 2), 2, 2, [201, 202, 203, 204]),  # east
    ]
    chunks = spark.createDataFrame(rows, _CHUNK_SCHEMA)
    out = mosaic_geo(chunks, (0, 0, 4, 2), 4, 2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["mosaic_width"], r["mosaic_height"], r["n_chunks"]) == (4, 2, 2)
    assert list(r["mosaic"]) == [1, 2, 201, 202, 3, 4, 203, 204]


def test_mosaic_geo_overlap_last_tile_wins(spark):
    """Overlapping chunks paint in ascending tile_id order (the reference's
    scan order): the higher key overwrites."""
    from geomesa_spark.operators.tiling import mosaic_geo

    rows = [
        _chunk_row(1, (0, 0, 2, 2), 2, 2, [1, 2, 3, 4]),
        _chunk_row(9, (0, 0, 2, 2), 2, 2, [9, 9, 9, 9]),
    ]
    chunks = spark.createDataFrame(rows, _CHUNK_SCHEMA)
    r = mosaic_geo(chunks, (0, 0, 2, 2), 2, 2).collect()[0]
    assert list(r["mosaic"]) == [9, 9, 9, 9]


def test_mosaic_geo_crops_to_query_env(spark):
    """A query env covering only the east half of a chunk gets exactly that
    half's pixel column, at canvas origin 0."""
    from geomesa_spark.operators.tiling import mosaic_geo

    rows = [_chunk_row(1, (0, 0, 2, 2), 2, 2, [1, 2, 3, 4])]
    chunks = spark.createDataFrame(rows, _CHUNK_SCHEMA)
    r = mosaic_geo(chunks, (1, 0, 2, 2), 1, 2).collect()[0]
    assert (r["mosaic_width"], r["mosaic_height"]) == (1, 2)
    assert list(r["mosaic"]) == [2, 4]


def test_mosaic_geo_scales_nearest_neighbor(spark):
    """Native 2x2 canvas upscaled to 4x4: each source pixel becomes a 2x2
    block (nearest-neighbor)."""
    from geomesa_spark.operators.tiling import mosaic_geo

    rows = [_chunk_row(1, (0, 0, 2, 2), 2, 2, [1, 2, 3, 4])]
    chunks = spark.createDataFrame(rows, _CHUNK_SCHEMA)
    r = mosaic_geo(chunks, (0, 0, 2, 2), 4, 4).collect()[0]
    assert (r["mosaic_width"], r["mosaic_height"]) == (4, 4)
    assert list(r["mosaic"]) == [1, 1, 2, 2,
                                 1, 1, 2, 2,
                                 3, 3, 4, 4,
                                 3, 3, 4, 4]


# ---------------------------------------------------------------------------
# Kafka live path: env-gated builder contract
# ---------------------------------------------------------------------------


def test_kafka_reader_options_contract():
    """The exact consumer config a broker deployment must flip on —
    documented as pure data so it's testable without the connector."""
    from geomesa_spark.streaming.live import kafka_reader_options

    opts = kafka_reader_options("broker1:9092,broker2:9092", "geomesa-live",
                                starting_offsets="earliest")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "geomesa-live",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }


def test_kafka_message_stream_gated_or_streams(spark):
    """Without the spark-sql-kafka connector the builder raises the
    documented gate error naming the --packages coordinate; with it, the
    returned stream is the parsed GeoMessage schema."""
    from geomesa_spark.streaming.live import kafka_message_stream

    try:
        stream = kafka_message_stream(spark, "localhost:9092", "geomesa-live")
    except EnvironmentError as e:
        assert "spark-sql-kafka-0-10" in str(e)
    else:  # connector present in this deployment: verify the topology
        assert stream.isStreaming
        assert [f.name for f in stream.schema.fields] == [
            "offset", "kind", "id", "lon", "lat", "ts"]


# ---------------------------------------------------------------------------
# Avro container ingest: pure-python OCF fallback (gate closed)
# ---------------------------------------------------------------------------

_AVRO_SCHEMA = {
    "type": "record",
    "name": "Feature",
    "fields": [
        {"name": "fid", "type": "long"},
        {"name": "label", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "position", "type": {
            "type": "record", "name": "Pos",
            "fields": [{"name": "lon", "type": "double"},
                       {"name": "lat", "type": "double"}]}},
        {"name": "kind", "type": {
            "type": "enum", "name": "Kind", "symbols": ["A", "B"]}},
        {"name": "attrs", "type": {"type": "map", "values": "long"}},
    ],
}


def _avro_records(n):
    return [
        {"fid": i, "label": f"l{i}", "score": i / 2.0,
         "maybe": None if i % 2 else f"m{i}",
         "tags": [f"t{i}", "x"],
         "position": {"lon": float(i), "lat": float(-i)},
         "kind": "A" if i % 2 == 0 else "B",
         "attrs": {"n": i, "sq": i * i}}
        for i in range(n)
    ]


def test_avro_codec_roundtrip_pure():
    """Encoder/decoder agree byte-level, both codecs."""
    from geomesa_spark.sources.avro_codec import iter_container, write_container

    recs = _avro_records(7)
    for codec in ("null", "deflate"):
        data = write_container(_AVRO_SCHEMA, recs, codec=codec)
        assert list(iter_container(data)) == recs


def test_avro_ingest_distributed_fallback(spark, tmp_path):
    """avro_ingest reads real container files without spark-avro: binaryFile
    scan + OCF decode on executors, schema from the embedded writer schema."""
    import os

    from geomesa_spark.sources.avro_codec import write_container
    from geomesa_spark.sources.convert import avro_ingest

    d = tmp_path / "avro"
    os.makedirs(d)
    recs = _avro_records(10)
    for i in range(2):  # two container files -> two input tasks
        with open(d / f"part{i}.avro", "wb") as f:
            f.write(write_container(_AVRO_SCHEMA, recs[i * 5:(i + 1) * 5],
                                    codec="deflate" if i else "null"))
    df = avro_ingest(spark, str(d))
    assert [f.name for f in df.schema.fields] == [
        "fid", "label", "score", "maybe", "tags", "position", "kind", "attrs"]
    rows = {r["fid"]: r for r in df.collect()}
    assert len(rows) == 10
    assert rows[3]["label"] == "l3" and rows[3]["maybe"] is None
    assert rows[4]["maybe"] == "m4" and rows[4]["kind"] == "A"
    assert rows[6]["position"]["lat"] == -6.0
    assert rows[7]["tags"] == ["t7", "x"]
    assert rows[8]["attrs"]["sq"] == 64
    assert rows[9]["score"] == 4.5


def test_avro_ingest_avropath_composes(spark, tmp_path):
    """AvroPath field access works on the fallback-decoded records, matching
    the reference's AvroPath-over-decoded-record semantics."""
    import os

    from pyspark.sql import functions as F
    from geomesa_spark.sources.avro_codec import write_container
    from geomesa_spark.sources.convert import avro_ingest, avro_path

    d = tmp_path / "avro2"
    os.makedirs(d)
    with open(d / "f.avro", "wb") as f:
        f.write(write_container(_AVRO_SCHEMA, _avro_records(4)))
    df = avro_ingest(spark, str(d))
    nested = df.select(
        "fid",
        avro_path(F.struct(*[F.col(c) for c in df.columns]), "/position/lat").alias("lat"),
        avro_path(F.struct(*[F.col(c) for c in df.columns]), "/tags[0]").alias("t0"),
    )
    got = {r["fid"]: (r["lat"], r["t0"]) for r in nested.collect()}
    assert got[2] == (-2.0, "t2")


def test_avro_bytes_requires_fast_path():
    from geomesa_spark.sources.avro_codec import schema_to_ddl
    import pytest as _pytest

    with _pytest.raises(ValueError, match="spark-avro"):
        schema_to_ddl({"type": "record", "name": "R",
                       "fields": [{"name": "b", "type": "bytes"}]})


# ---------------------------------------------------------------------------
# BIN whole-result time sort (opt-in total order)
# ---------------------------------------------------------------------------


def test_bin_records_total_sort(spark):
    """total_sort=True yields the merged whole-result time order the
    reference's export client produces; default stays chunk-sorted."""
    from datetime import datetime, timezone

    from geomesa_spark.operators.bin_export import bin_records
    from geomesa_spark.plans.compiler import GeoTable

    rows = [(str(i), float(i % 10), float(-i % 5),
             datetime(2020, 1, 1, tzinfo=timezone.utc).replace(
                 hour=(i * 7) % 24, minute=i % 60), f"trk{i % 3}")
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "id string, lon double, lat double, dtg timestamp, trk string")
    t = GeoTable(df=df.repartition(8), lon="lon", lat="lat", dtg="dtg", fid="id")
    got = bin_records(t, "trk", total_sort=True).collect()
    secs = [r["secs"] for r in got]
    assert secs == sorted(secs)
    assert len(got) == 200


def test_avro_codec_named_type_reuse_and_neg_blocks():
    """Decoder handles a named record referenced by name a second time, and
    the spec's negative-count array block form (count<0 -> |count| items
    preceded by a byte size)."""
    import io

    from geomesa_spark.sources.avro_codec import (
        _decode,
        _register,
        _write_long,
        iter_container,
        write_container,
    )

    schema = {
        "type": "record", "name": "Pair",
        "fields": [
            {"name": "a", "type": {
                "type": "record", "name": "Pt",
                "fields": [{"name": "x", "type": "long"}]}},
            {"name": "b", "type": "Pt"},  # reference by name
        ],
    }
    recs = [{"a": {"x": 1}, "b": {"x": 2}}, {"a": {"x": -3}, "b": {"x": 4}}]
    assert list(iter_container(write_container(schema, recs))) == recs

    # hand-craft a negative-count array block: [-2 items, byte size, 7, 9, 0]
    buf = io.BytesIO()
    _write_long(buf, -2)
    items = io.BytesIO()
    _write_long(items, 7)
    _write_long(items, 9)
    _write_long(buf, len(items.getvalue()))
    buf.write(items.getvalue())
    _write_long(buf, 0)
    buf.seek(0)
    named = {}
    assert _decode(buf, {"type": "array", "items": "long"}, named) == [7, 9]


def test_avro_codec_corrupt_inputs_raise():
    import pytest as _pytest

    from geomesa_spark.sources.avro_codec import iter_container, write_container

    with _pytest.raises(ValueError, match="magic"):
        list(iter_container(b"NOPE" + b"\x00" * 40))
    schema = {"type": "record", "name": "R",
              "fields": [{"name": "x", "type": "long"}]}
    data = bytearray(write_container(schema, [{"x": 1}]))
    data[-1] ^= 0xFF  # corrupt the trailing sync marker
    with _pytest.raises(ValueError, match="sync"):
        list(iter_container(bytes(data)))


# ---------------------------------------------------------------------------
# streaming content dedup (ingest-path at-least-once twin)
# ---------------------------------------------------------------------------


def test_streaming_exact_dedup_first_seen_wins(spark, tmp_path):
    """Duplicate-content rows across micro-batch files are dropped; state is
    keyed on the md5 only."""
    from datetime import datetime, timezone

    from geomesa_spark.streaming.dedup_stream import streaming_exact_dedup

    src = str(tmp_path / "docs_stream")
    rows = []
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    for i in range(30):
        # 10 distinct texts, each delivered 3x (re-crawl duplicates)
        rows.append((i, f"document body number {i % 10}",
                     base.replace(minute=i)))
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    df.coalesce(2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp").parquet(src)
    out = streaming_exact_dedup(stream, "text", "ts", delay="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = spark.table("dedup_stream").collect()
    assert len(got) == 10
    assert len({r["content_hash"] for r in got}) == 10
    assert sorted({r["text"] for r in got}) == sorted(
        {f"document body number {k}" for k in range(10)})


def test_mosaic_geo_tiles_fanout(spark):
    """Per-tile mosaic fanout: chunks land on every output tile they
    overlap, each canvas composited over its own tile envelope."""
    from geomesa_spark.cells.tiles import tile_bbox
    from geomesa_spark.operators.tiling import mosaic_geo_tiles

    # level 1: four 180x90-degree tiles. One chunk per hemisphere quadrant
    # (exact tile bboxes), plus one chunk straddling the antimeridian-free
    # center -> overlaps all 4 tiles.
    rows = [
        _chunk_row(1, (-180, 0, 0, 90), 2, 2, [10, 11, 12, 13]),   # NW tile
        _chunk_row(2, (0, -90, 180, 0), 2, 2, [20, 21, 22, 23]),   # SE tile
        _chunk_row(9, (-90, -45, 90, 45), 2, 2, [91, 92, 93, 94]),  # center
    ]
    chunks = spark.createDataFrame(rows, _CHUNK_SCHEMA)
    out = {r["out_tile"]: r for r in
           mosaic_geo_tiles(chunks, out_level=1, tile_px=4).collect()}
    assert len(out) == 4  # the center chunk touches every level-1 tile

    def tid(x, y):
        return 1 * (1 << 52) + x * (1 << 26) + y

    # NW tile (x=0,y=0): chunk 1 fills it, chunk 9's NW quarter overwrites
    # the SE corner of the canvas (higher key wins)
    nw = out[tid(0, 0)]
    assert nw["n_chunks"] == 2
    assert (nw["mosaic_width"], nw["mosaic_height"]) == (4, 4)
    px = list(nw["mosaic"])
    # chunk 1 is 2x2 over the whole tile -> upscaled 2x; chunk 9's block
    # covers lon [-90,0] x lat [0,45] = east half, south half of this tile
    assert px[0] == 10 and px[3] == 11          # north row from chunk 1
    assert px[12] == 12                           # SW corner from chunk 1
    assert px[15] in (91, 92, 93, 94)             # SE corner overwritten by 9
    # NE tile (x=1,y=0): only chunk 9's NE-quarter block
    ne = out[tid(1, 0)]
    assert ne["n_chunks"] == 1
    ne_px = list(ne["mosaic"])
    assert any(v in (91, 92, 93, 94) for v in ne_px)
    assert ne_px[3] == 0  # east of chunk 9's extent stays empty


# ---------------------------------------------------------------------------
# skew mitigation: shard salt spreads a hot cell
# ---------------------------------------------------------------------------


def test_layout_shard_salt_spreads_hot_cell(spark, tmp_path):
    """Every row at ONE location (one z-cell — the Accumulo hot-tablet
    case): the shard salt must spread the write across ~n_shards partitions
    instead of funneling one hot range (QueryPlanners.scala:399-407
    pre-split sharding analog)."""
    from datetime import datetime, timezone

    from geomesa_spark.sources.layout import enrich_geo

    rows = [(str(i), 12.345, 45.678,
             datetime(2020, 3, 1, 12, tzinfo=timezone.utc))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id string, lon double, lat double, dtg timestamp")
    enriched = enrich_geo(df, lon="lon", lat="lat", dtg="dtg", fid="id",
                          n_shards=16, engine="expr")
    # same z-cell for every row (it IS a hot cell)
    assert enriched.select("z3").distinct().count() == 1
    shard_counts = {r["shard"]: r["n"] for r in
                    enriched.groupBy("shard").count().withColumnRenamed("count", "n").collect()}
    # all 16 shards used, and no shard hoards the hot cell
    assert len(shard_counts) == 16
    assert max(shard_counts.values()) < 2000 * 0.25


# ---------------------------------------------------------------------------
# session-timezone robustness: entries must force UTC themselves
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["bbox_time", "ts_filter", "temporal_density", "replay"])
def test_timestamp_queries_ignore_driver_session_timezone(spark, sf_dir, name):
    """The driver hands entries ITS SparkSession, whose timeZone may be
    anything (Spark defaults to the JVM zone). Parquet timestamps load as
    TIMESTAMP_NTZ in Spark 4, so a non-UTC session silently shifts epoch
    arithmetic unless the entry pins UTC itself (_utc in __spark_entry__).
    Run each timestamp-sensitive query under UTC and under a skewed zone:
    row sets must be identical."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        want = sorted(map(str, q(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = sorted(map(str, q(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert got == want
