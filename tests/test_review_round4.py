"""Round-4 review-fix regression tests (ADVICE.md items):

* avro_ingest must REFUSE a directory whose containers carry different
  writer schemas (previously: records parsed against one probed DDL,
  silently nulling/dropping fields);
* streaming_exact_dedup surrogate keys must be null-POSITION-sensitive
  ((NULL,'x') and ('x',NULL) previously collided via concat_ws null-skip);
* minhash_lsh_pairs must not pin a caller-supplied precomputed_sigs frame
  into executor storage.
"""
import os

import pytest


def test_avro_ingest_rejects_mixed_writer_schemas(spark, tmp_path):
    from geomesa_spark.sources.avro_codec import write_container
    from geomesa_spark.sources.convert import avro_ingest

    schema_a = {"type": "record", "name": "A", "fields": [
        {"name": "fid", "type": "long"}, {"name": "label", "type": "string"},
    ]}
    schema_b = {"type": "record", "name": "A", "fields": [
        {"name": "fid", "type": "long"}, {"name": "label", "type": "double"},
    ]}
    d = tmp_path / "mixed"
    os.makedirs(d)
    with open(d / "a.avro", "wb") as f:
        f.write(write_container(schema_a, [{"fid": 1, "label": "x"}]))
    with open(d / "b.avro", "wb") as f:
        f.write(write_container(schema_b, [{"fid": 2, "label": 0.5}]))
    with pytest.raises(Exception, match="disagree on writer schema"):
        avro_ingest(spark, str(d))


def test_avro_ingest_same_schema_many_files_still_works(spark, tmp_path):
    from geomesa_spark.sources.avro_codec import write_container
    from geomesa_spark.sources.convert import avro_ingest

    schema = {"type": "record", "name": "A", "fields": [
        {"name": "fid", "type": "long"}, {"name": "label", "type": "string"},
    ]}
    d = tmp_path / "same"
    os.makedirs(d)
    for i in range(3):
        with open(d / f"p{i}.avro", "wb") as f:
            f.write(write_container(schema, [{"fid": i, "label": f"l{i}"}]))
    rows = {r["fid"]: r["label"] for r in avro_ingest(spark, str(d)).collect()}
    assert rows == {0: "l0", 1: "l1", 2: "l2"}


def test_streaming_dedup_null_position_distinct(spark, tmp_path):
    """Two fetch-failure rows that differ only in WHICH column is null must
    both survive (distinct surrogate hashes)."""
    from datetime import datetime, timezone

    from geomesa_spark.streaming.dedup_stream import streaming_exact_dedup

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        (None, "x", base),
        ("x", None, base.replace(minute=1)),
        (None, "x", base.replace(minute=2)),  # true duplicate of row 1
    ]
    src = str(tmp_path / "null_stream")
    df = spark.createDataFrame(rows, "url string, text string, ts timestamp")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "url string, text string, ts timestamp").parquet(src)
    out = streaming_exact_dedup(stream, "text", "ts", delay="1 hour")
    q = (out.writeStream.format("memory").queryName("null_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.table("null_dedup").collect()
    # (NULL,'x') survives once, ('x',NULL) survives separately
    assert len(got) == 2
    assert {(r["url"], r["text"]) for r in got} == {(None, "x"), ("x", None)}


def test_minhash_lsh_does_not_persist_caller_sigs(spark):
    from geomesa_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " * 3) for i in range(6)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(df, "text", "doc_id", n_hashes=16,
                              shingle_words=3)
    assert sigs.storageLevel.useMemory is False
    minhash_lsh_pairs(df, "text", "doc_id", n_hashes=16, bands=4,
                      shingle_words=3, precomputed_sigs=sigs).collect()
    # the caller's frame must come back un-pinned
    assert sigs.storageLevel.useMemory is False


# ---------------------------------------------------------------------------
# GEOMETRYCOLLECTION parity (SimpleFeatureTypes.scala:401-425 lists it as a
# first-class type; round-3 wkt model stopped at the Multi* kinds)
# ---------------------------------------------------------------------------


def test_geometrycollection_parse_roundtrip_bbox():
    from geomesa_spark.geom.wkt import parse_wkt

    wkt = ("GEOMETRYCOLLECTION (POINT (4.0 6.0), "
           "LINESTRING (0.0 0.0, 2.0 2.0), "
           "POLYGON ((10.0 10.0, 12.0 10.0, 12.0 12.0, 10.0 10.0)))")
    g = parse_wkt(wkt)
    assert g.kind == "GEOMETRYCOLLECTION" and len(g.parts) == 3
    assert [p.kind for p in g.parts] == ["POINT", "LINESTRING", "POLYGON"]
    assert g.bbox() == (0.0, 0.0, 12.0, 12.0)
    # nested collections parse too
    nested = parse_wkt(f"GEOMETRYCOLLECTION (POINT (1.0 1.0), {wkt})")
    assert nested.parts[1].kind == "GEOMETRYCOLLECTION"
    # normalized round-trip
    from geomesa_spark.geom.wkt import parse_wkt as p2
    assert p2(g.to_wkt()).bbox() == g.bbox()


def test_geometrycollection_kernels_dispatch():
    from geomesa_spark.geom.kernels import (
        geometry_intersects_box,
        geometry_intersects_polygon,
    )
    from geomesa_spark.geom.wkt import parse_wkt

    g = parse_wkt("GEOMETRYCOLLECTION (POINT (4.0 6.0), "
                  "LINESTRING (20.0 20.0, 22.0 22.0))")
    # box hits only the point member
    assert geometry_intersects_box(g, (3.0, 5.0, 5.0, 7.0))
    # box hits only the line member
    assert geometry_intersects_box(g, (19.0, 19.0, 21.0, 21.0))
    # box hits neither
    assert not geometry_intersects_box(g, (-10.0, -10.0, -5.0, -5.0))

    tri = parse_wkt("POLYGON ((3.0 5.0, 5.0 5.0, 4.0 7.0, 3.0 5.0))")
    assert geometry_intersects_polygon(g, tri)
    far = parse_wkt("POLYGON ((-9.0 -9.0, -8.0 -9.0, -8.0 -8.0, -9.0 -9.0))")
    assert not geometry_intersects_polygon(g, far)
