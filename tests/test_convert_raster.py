"""Tests: converter pipeline (delimited/fixed-width/composite/DMS),
GeoJSON export, IDL-crossing bbox, raster query planner."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_delimited_converter_roundtrip(spark):
    from geomesa_spark.functions.registry import resolve_function
    from geomesa_spark.sources.convert import apply_converter, delimited_text

    lines = spark.createDataFrame(
        [("1|' widget '|2.5",), ("2|'gadget'|7.25",)], "line string"
    )
    raw = delimited_text(lines, "line", "|", ["f0", "f1", "f2"])
    spec = [
        ("id", lambda c: resolve_function("toLong")(c["f0"])),
        ("name", lambda c: resolve_function("trim")(resolve_function("stripQuotes")(c["f1"]))),
        ("price", lambda c: resolve_function("toDouble")(c["f2"])),
    ]
    got = {r["id"]: r for r in apply_converter(raw, spec).collect()}
    assert got[1]["name"] == "widget" and got[1]["price"] == 2.5
    assert got[2]["name"] == "gadget" and got[2]["price"] == 7.25


def test_fixed_width_converter(spark):
    from geomesa_spark.sources.convert import fixed_width

    lines = spark.createDataFrame([("0014200ABC",), ("0029900XYZ",)], "line string")
    out = fixed_width(lines, "line", [("id", 0, 3), ("amount", 3, 7), ("code", 7, 10)])
    rows = {r["id"]: r for r in out.collect()}
    assert rows["001"]["amount"] == "4200" and rows["001"]["code"] == "ABC"
    assert rows["002"]["amount"] == "9900" and rows["002"]["code"] == "XYZ"


def test_composite_converter_dispatch(spark):
    from geomesa_spark.sources.convert import composite

    raw = spark.createDataFrame(
        [("csv", "5", "50"), ("swap", "7", "70")], "fmt string, a string, b string"
    )
    spec_a = [("x", lambda c: c["a"].cast("int")), ("y", lambda c: c["b"].cast("int"))]
    spec_b = [("x", lambda c: c["b"].cast("int")), ("y", lambda c: c["a"].cast("int"))]
    out = composite(raw, [(F.col("fmt") == "csv", spec_a), (F.col("fmt") == "swap", spec_b)])
    rows = sorted([(r["x"], r["y"]) for r in out.collect()])
    assert rows == [(5, 50), (70, 7)]


@pytest.mark.parametrize("dms,expect", [
    ("49:30:36N", 49.51),
    ("49:30:36S", -49.51),
    ("120:15:0E", 120.25),
    ("120:15:0W", -120.25),
    ('49°30\'36"N', 49.51),
    ("49d30m36sN", 49.51),
])
def test_dms_parse(spark, dms, expect):
    from geomesa_spark.sources.convert import dms_to_decimal

    df = spark.createDataFrame([(dms,)], "s string")
    got = df.select(dms_to_decimal(F.col("s")).alias("v")).collect()[0]["v"]
    assert got == pytest.approx(expect, abs=1e-9)


def test_geojson_export_roundtrip(spark):
    import json

    from geomesa_spark.sources.convert import to_geojson

    df = spark.createDataFrame([(7, 12.5, -33.25, "x")], "id long, lon double, lat double, tag string")
    gj = df.select(to_geojson(df, "lon", "lat", id_col="id", props=["tag"]).alias("gj")).collect()[0]["gj"]
    obj = json.loads(gj)
    assert obj["type"] == "Feature"
    assert obj["geometry"] == {"type": "Point", "coordinates": [12.5, -33.25]}
    assert obj["id"] == 7 and obj["properties"] == {"tag": "x"}


def test_bbox_idl_crossing(spark):
    from geomesa_spark.plans.compiler import GeoTable, compile_query

    rows = [("e", 175.0, 0.0), ("w", -175.0, 0.0), ("mid", 0.0, 0.0), ("out", 150.0, 70.0)]
    df = spark.createDataFrame(rows, "id string, lon double, lat double")
    t = GeoTable(df, lon="lon", lat="lat", dtg=None, fid="id")
    q = compile_query(t, "BBOX(geom, 170, -60, -170, 60)")
    got = {r["id"] for r in q.df.collect()}
    assert got == {"e", "w"}


def test_raster_level_selection():
    from geomesa_spark.operators.tiling import select_level

    assert select_level([2, 4, 6], requested=7) == 6
    assert select_level([2, 4, 6], requested=4) == 4
    assert select_level([2, 4, 6], requested=5) == 4
    assert select_level([4, 6], requested=2) == 4  # nothing coarse enough -> coarsest


def test_raster_query_cells_include_neighbors():
    from geomesa_spark.cells.tiles import tile_id
    from geomesa_spark.operators.tiling import raster_query_cells

    import numpy as np

    bbox = (10.0, 10.0, 20.0, 20.0)
    cells = set(raster_query_cells(bbox, 4))
    # every tile containing a bbox corner, and its 8 neighbors, must be in
    inner = int(tile_id(np.array([15.0]), np.array([15.0]), 4)[0])
    assert inner in cells
    x = (inner - 4 * (1 << 52)) // (1 << 26)
    y = inner - 4 * (1 << 52) - x * (1 << 26)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            assert 4 * (1 << 52) + (x + dx) * (1 << 26) + (y + dy) in cells


def test_raster_query_end_to_end(spark):
    from geomesa_spark.operators.tiling import raster_query

    # chunks at two levels; level-6 chunk inside the bbox, one far away
    def chunk(level, x, y):
        n = 1 << level
        lon0 = -180.0 + 360.0 * x / n
        lat1 = 90.0 - 180.0 * y / n
        return (
            level * (1 << 52) + x * (1 << 26) + y,
            lon0, lat1 - 180.0 / n, lon0 + 360.0 / n, lat1,
            bytes([level, x % 256, y % 256]),
        )

    rows = [chunk(6, 33, 30), chunk(6, 2, 2), chunk(4, 8, 7)]
    chunks = spark.createDataFrame(
        rows,
        "tile_id long, c_lon_min double, c_lat_min double, c_lon_max double, c_lat_max double, payload binary",
    )
    # bbox around tile (6, 33, 30): lon [5.625, 11.25], lat [(90-180*31/64)=2.8125, 5.625]
    got = raster_query(chunks, (6.0, 3.0, 10.0, 5.0), requested_level=7,
                       available_levels=[4, 6]).collect()
    assert [r["tile_id"] for r in got] == [6 * (1 << 52) + 33 * (1 << 26) + 30]


def test_query_sort_limit_vis(spark):
    from geomesa_spark.plans.compiler import GeoTable, query

    rows = [("a", 1.0, 1.0, "admin"), ("b", 2.0, 2.0, ""), ("c", 3.0, 3.0, "user"),
            ("d", 4.0, 4.0, None), ("e", 5.0, 5.0, "admin")]
    df = spark.createDataFrame(rows, "id string, lon double, lat double, vis string")
    t = GeoTable(df, lon="lon", lat="lat", dtg=None, fid="id")
    got = query(t, "BBOX(geom, 0, 0, 10, 10)", sort_by=[("id", False)],
                limit=3, auths={"user"})
    assert [r["id"] for r in got.collect()] == ["d", "c", "b"]


def test_timestamp_filters(spark):
    from datetime import datetime, timezone

    from geomesa_spark.plans.compiler import timestamp_range_filter, timestamp_set_filter

    rows = [(i, datetime(2024, 1, 1, i, tzinfo=timezone.utc)) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, ts timestamp")
    r = timestamp_range_filter(df, "ts",
                               datetime(2024, 1, 1, 2, tzinfo=timezone.utc),
                               datetime(2024, 1, 1, 4, tzinfo=timezone.utc))
    assert {x["id"] for x in r.collect()} == {2, 3, 4}
    s = timestamp_set_filter(df, "ts", [datetime(2024, 1, 1, 1, tzinfo=timezone.utc),
                                        datetime(2024, 1, 1, 5, tzinfo=timezone.utc)])
    assert {x["id"] for x in s.collect()} == {1, 5}


def test_shapefile_ingest_native(spark, tmp_path):
    """shapefile_ingest now rides the native reader (no geopandas gate)."""
    from geomesa_spark.sources.convert import shapefile_ingest
    from geomesa_spark.sources.shapefile import write_shapefile_points

    df = spark.createDataFrame([(3.0, 4.0, "a")], "lon double, lat double, tag string")
    base = str(tmp_path / "one")
    write_shapefile_points(df, base + ".shp", attrs=["tag"])
    back = shapefile_ingest(spark, base + ".shp")
    assert back.collect()[0]["wkt"] == "POINT (3.0 4.0)"


def test_kafka_sink_builder(spark):
    from geomesa_spark.sources.convert import kafka_geomessage_sink

    stream = spark.readStream.format("rate").load().selectExpr(
        "CAST(value AS STRING) AS id", "timestamp AS ts"
    )
    writer = kafka_geomessage_sink(stream, "broker:9092", "features")
    assert writer is not None  # configured without needing a broker


def test_avro_path_nested_access(spark):
    from geomesa_spark.sources.convert import avro_path

    df = spark.createDataFrame(
        [(1, {"position": {"lat": 45.0, "lon": -120.0}, "tags": ["a", "b"]})],
        "id int, rec struct<position: struct<lat: double, lon: double>, tags: array<string>>",
    )
    out = df.select(
        avro_path(F.col("rec"), "/position/lat").alias("lat"),
        avro_path(F.col("rec"), "/tags[1]").alias("t1"),
    ).first()
    assert out["lat"] == 45.0 and out["t1"] == "b"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad AvroPath segment"):
        avro_path(F.col("rec"), "/pos ition")


def test_avro_path_via_dsl(spark):
    from geomesa_spark.functions.dsl import parse_spec
    from geomesa_spark.sources.convert import apply_converter

    df = spark.createDataFrame(
        [({"position": {"lat": 45.0}},)], "rec struct<position: struct<lat: double>>"
    )
    spec = parse_spec(["lat = avroPath($rec, '/position/lat')"])
    assert apply_converter(df, spec).first()["lat"] == 45.0


def test_gml_export_roundtrip(spark):
    from geomesa_spark.sources.convert import to_gml

    df = spark.createDataFrame([(7, 10.5, -3.25, "click")],
                               "event_id int, lon double, lat double, kind string")
    gml = df.select(to_gml(df, "lon", "lat", id_col="event_id",
                           props=["kind"]).alias("g")).first()["g"]
    assert '<gml:coordinates>10.5,-3.25</gml:coordinates>' in gml
    assert 'fid="7"' in gml and "<kind>click</kind>" in gml
    assert gml.startswith("<gml:featureMember><feature")


def test_mosaic_per_pixel_max(spark):
    """Mosaic compositing: per-pixel max of weight-scaled decoded chunks —
    order-independent and mass-checked against a numpy reference."""
    import numpy as np

    from geomesa_spark.operators.multimodal import decode_payload
    from geomesa_spark.operators.tiling import mosaic

    rows = [
        (1, b"\x10" * 300, 2.0),
        (1, b"\x40" * 100, 1.0),
        (2, b"\x05" * 50, 3.0),
        (2, None, 9.0),
    ]
    chunks = spark.createDataFrame(rows, "tile_id long, payload binary, weight double")
    got = {r["tile_id"]: (r["n_chunks"], bytes(r["composite"]))
           for r in mosaic(chunks, out_level=4).collect()}

    def expect(items):
        canvas = np.zeros(256)
        for payload, w in items:
            if payload is None:
                continue
            a = decode_payload(payload, "image").astype(np.float64)
            reps = int(np.ceil(256 / len(a)))
            canvas = np.maximum(canvas, np.tile(a, reps)[:256] * w)
        return np.clip(canvas, 0, 255).astype(np.uint8).tobytes()

    assert got[1] == (2, expect([(b"\x10" * 300, 2.0), (b"\x40" * 100, 1.0)]))
    assert got[2] == (2, expect([(b"\x05" * 50, 3.0)]))


def test_shapefile_point_roundtrip(spark, tmp_path):
    """Write points with the native writer, read them back with the native
    reader — and cross-check the .shp bytes against the public spec."""
    import struct

    from geomesa_spark.sources.shapefile import read_shapefile, write_shapefile_points

    df = spark.createDataFrame(
        [(1.5, -2.25, "alpha"), (10.0, 20.0, "beta"), (-170.5, 45.0, "gamma")],
        "lon double, lat double, name string",
    )
    base = str(tmp_path / "pts")
    write_shapefile_points(df, base + ".shp", attrs=["name"])

    raw = open(base + ".shp", "rb").read()
    assert struct.unpack(">i", raw[:4])[0] == 9994          # file code
    assert struct.unpack("<i", raw[32:36])[0] == 1          # point type
    xmin, ymin, xmax, ymax = struct.unpack("<4d", raw[36:68])
    assert (xmin, ymin, xmax, ymax) == (-170.5, -2.25, 10.0, 45.0)

    back = read_shapefile(spark, base + ".shp")
    got = sorted((r["NAME"], r["wkt"]) for r in back.collect())
    assert got == [
        ("alpha", "POINT (1.5 -2.25)"),
        ("beta", "POINT (10.0 20.0)"),
        ("gamma", "POINT (-170.5 45.0)"),
    ]


def test_shapefile_polygon_and_line_read(spark, tmp_path):
    """Hand-build .shp bytes per the public spec for polygon + polyline
    records; the reader must produce the right WKT."""
    import struct

    def rec(num, body):
        return struct.pack(">ii", num, len(body) // 2) + body

    # polygon: one ring, 4 points (closed square)
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    poly = struct.pack("<i4d", 5, 0.0, 0.0, 4.0, 4.0)
    poly += struct.pack("<2i", 1, len(ring)) + struct.pack("<i", 0)
    for x, y in ring:
        poly += struct.pack("<2d", x, y)
    # polyline: one part, 3 points
    line_pts = [(0.0, 1.0), (2.0, 1.0), (2.0, 3.0)]
    line = struct.pack("<i4d", 3, 0.0, 1.0, 2.0, 3.0)
    line += struct.pack("<2i", 1, 3) + struct.pack("<i", 0)
    for x, y in line_pts:
        line += struct.pack("<2d", x, y)
    records = rec(1, poly) + rec(2, line)
    header = (
        struct.pack(">i", 9994) + b"\x00" * 20
        + struct.pack(">i", (100 + len(records)) // 2)
        + struct.pack("<ii", 1000, 5)
        + struct.pack("<8d", 0, 0, 4, 4, 0, 0, 0, 0)
    )
    path = str(tmp_path / "mixed.shp")
    open(path, "wb").write(header + records)

    from geomesa_spark.sources.shapefile import read_shapefile

    wkts = [r["wkt"] for r in read_shapefile(spark, path).collect()]
    assert wkts[0] == "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0))"
    assert wkts[1] == "LINESTRING (0.0 1.0, 2.0 1.0, 2.0 3.0)"
    # and the WKT parses through the engine's geometry model
    from geomesa_spark.geom.wkt import parse_wkt

    assert parse_wkt(wkts[0]).kind == "POLYGON"
    assert parse_wkt(wkts[1]).kind == "LINESTRING"
