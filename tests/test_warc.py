"""WARC source (sources/warc.py): build -> pack -> parse round-trips,
payloads containing record separators, per-record gzip members, CDX-style
ranged reads, and malformed-input errors.

The driver oracle (`warc_roundtrip`) hash-verifies the full loop against
facts derived independently in DuckDB; these tests cover byte-level edge
cases the deterministic generator never produces.
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources.warc import (
    _gunzip_members,
    iter_warc_records,
    parse_warc,
    read_warc_ranges,
    warc_buffers,
    warc_record_expr,
)


def _record(url: str, date: str, payload: bytes, rid: str = "r1") -> bytes:
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: text/html\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def test_iter_records_payload_with_separators():
    """Content-Length drives the walk: a payload containing CRLFCRLF and a
    fake WARC version line must not split the record."""
    evil = b"a\r\n\r\nWARC/1.0\r\nContent-Length: 99\r\n\r\nb"
    buf = _record("http://a", "2024-01-01T00:00:00Z", evil) + _record(
        "http://b", "2024-01-02T00:00:00Z", b"ok"
    )
    recs = list(iter_warc_records(buf))
    assert len(recs) == 2
    assert recs[0][1] == evil and recs[0][0]["warc-target-uri"] == "http://a"
    assert recs[1][1] == b"ok" and recs[1][0]["warc-target-uri"] == "http://b"


def test_iter_records_gzip_members():
    r1 = _record("http://a", "2024-01-01T00:00:00Z", b"hello")
    r2 = _record("http://b", "2024-01-01T00:00:01Z", b"world")
    buf = gzip.compress(r1) + gzip.compress(r2)
    recs = list(iter_warc_records(buf))
    assert [r[1] for r in recs] == [b"hello", b"world"]
    assert _gunzip_members(gzip.compress(b"x") + gzip.compress(b"y")) == b"xy"


def test_iter_records_errors():
    with pytest.raises(ValueError, match="truncated WARC header"):
        list(iter_warc_records(b"WARC/1.0\r\nContent-Length: 2"))
    with pytest.raises(ValueError, match="bad WARC version"):
        list(iter_warc_records(b"HTTP/1.1 200\r\n\r\n"))
    good = _record("http://a", "2024-01-01T00:00:00Z", b"abc")
    with pytest.raises(ValueError, match="truncated WARC payload"):
        list(iter_warc_records(good[:-5]))  # cut into the payload


def test_spark_build_pack_parse_roundtrip(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.range(20).select(
        F.col("id"),
        F.format_string("https://ex.com/p/%d", F.col("id")).alias("url"),
        F.timestamp_seconds(1700000000 + F.col("id")).alias("ts"),
        # non-ASCII payload: Content-Length must count UTF-8 bytes
        F.format_string("päge %d ☃", F.col("id")).alias("text"),
    )
    rec = warc_record_expr(
        F.col("url"), F.col("ts"), F.col("text"),
        F.format_string("%032x", F.col("id")),
    )
    w = df.select("id", (F.col("id") % 4).alias("bkt"), rec.alias("rec"))
    # builder + packer must stay codegen/agg-only (no python)
    bufs = warc_buffers(w, "rec", "id", "bkt")
    plan = bufs._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    out = parse_warc(bufs).collect()
    assert len(out) == 20
    by_url = {r["target_uri"]: r for r in out}
    for i in range(20):
        r = by_url[f"https://ex.com/p/{i}"]
        assert bytes(r["payload"]).decode() == f"päge {i} ☃"
        assert r["warc_type"] == "response"
        assert r["record_id"] == f"{i:032x}"
    # dates are second-resolution UTC ISO-8601
    assert by_url["https://ex.com/p/0"]["warc_date"] == "2023-11-14T22:13:20Z"


def test_read_warc_ranges(spark, tmp_path):
    recs = [
        _record(f"http://site/{i}", "2024-01-01T00:00:00Z",
                f"body-{i}".encode(), rid=f"id{i}")
        for i in range(6)
    ]
    # two files, three records each; ranges cover single records and pairs
    f1, f2 = tmp_path / "a.warc", tmp_path / "b.warc"
    f1.write_bytes(b"".join(recs[:3]))
    f2.write_bytes(b"".join(recs[3:]))
    lens = [len(r) for r in recs]
    ranges = [
        (str(f1), 0, lens[0]),                      # first record only
        (str(f1), lens[0], lens[1] + lens[2]),      # records 1+2
        (str(f2), 0, sum(lens[3:])),                # whole second file
    ]
    df = spark.createDataFrame(ranges, "path string, offset long, length long")
    out = read_warc_ranges(df).collect()
    assert {r["target_uri"] for r in out} == {f"http://site/{i}" for i in range(6)}
    assert {bytes(r["payload"]).decode() for r in out} == {
        f"body-{i}" for i in range(6)
    }


def test_wet_record_build_and_parse_roundtrip(spark):
    from geomesa_spark.sources.warc import (
        parse_warc,
        warc_buffers,
        wet_record_expr,
    )
    from geomesa_spark.sources.webpages import extract_text

    pages = spark.createDataFrame(
        [
            (0, "https://ex.com/a", "2024-03-01 10:00:00",
             "<html><body><p>hello wet world</p></body></html>"),
            (1, "https://ex.com/b", "2024-03-01 11:00:00",
             "<html><body><p>second page</p></body></html>"),
        ],
        "doc_id long, url string, ts string, html_s string",
    ).withColumn("ts", F.to_timestamp("ts"))
    pages = pages.select(
        "doc_id", "url", "ts", F.encode("html_s", "UTF-8").alias("html")
    )
    rec = wet_record_expr(
        F.col("url"), F.col("ts"), extract_text(F.col("html")),
        F.format_string("%08x-0000-4000-8000-000000000000", F.col("doc_id")),
    )
    w = pages.select("doc_id", F.lit(0).alias("bucket"), rec.alias("rec"))
    parsed = parse_warc(warc_buffers(w, "rec", "doc_id", "bucket")).collect()
    got = {r.target_uri: r for r in parsed}
    assert set(got) == {"https://ex.com/a", "https://ex.com/b"}
    # conversion rectype, text/plain payload == the extracted text
    assert all(r.warc_type == "conversion" for r in parsed)
    assert bytes(got["https://ex.com/a"].payload).decode() == "hello wet world"
    assert bytes(got["https://ex.com/b"].payload).decode() == "second page"
