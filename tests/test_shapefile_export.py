"""General shapefile export (all geometry kinds), parity with the
reference's FeatureExporter shapefile path (TLS/FeatureExporter.scala:62-96),
which exports arbitrary geometry types — the round-3 writer was Point-only.

Each test round-trips via the native reader AND byte-checks the .shp layout
against the public ESRI spec (the reader's spec tests in reverse).
"""
import struct

import pytest

from geomesa_spark.sources.shapefile import read_shapefile, write_shapefile


def _roundtrip(spark, tmp_path, rows, attrs=("name",), name="shapes"):
    df = spark.createDataFrame(
        rows, "wkt string, " + ", ".join(f"{a} string" for a in attrs)
    )
    base = str(tmp_path / name)
    write_shapefile(df, base + ".shp", wkt="wkt", attrs=list(attrs))
    return base, read_shapefile(spark, base + ".shp")


def test_export_polygon_with_hole(spark, tmp_path):
    wkt = ("POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), "
           "(2.0 2.0, 2.0 4.0, 4.0 4.0, 2.0 2.0))")
    base, back = _roundtrip(spark, tmp_path, [(wkt, "p1")])
    r = back.collect()[0]
    assert r["wkt"] == wkt and r["NAME"] == "p1"

    raw = open(base + ".shp", "rb").read()
    assert struct.unpack("<i", raw[32:36])[0] == 5            # polygon type
    assert struct.unpack("<4d", raw[36:68]) == (0.0, 0.0, 10.0, 10.0)
    body = raw[108:]                                          # first record body
    assert struct.unpack("<i", body[:4])[0] == 5
    n_parts, n_points = struct.unpack("<2i", body[36:44])
    assert (n_parts, n_points) == (2, 9)                      # 5-pt shell + 4-pt hole
    assert struct.unpack("<2i", body[44:52]) == (0, 5)        # part offsets


def test_export_polyline_single_and_multi(spark, tmp_path):
    single = "LINESTRING (0.0 1.0, 2.0 1.0, 2.0 3.0)"
    multi = "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (5.0 5.0, 6.0 5.0, 6.0 7.0))"
    base, back = _roundtrip(spark, tmp_path, [(single, "a"), (multi, "b")])
    got = {r["NAME"]: r["wkt"] for r in back.collect()}
    assert got == {"a": single, "b": multi}
    raw = open(base + ".shp", "rb").read()
    assert struct.unpack("<i", raw[32:36])[0] == 3            # polyline type


def test_export_multipolygon_flattens_to_rings(spark, tmp_path):
    # ESRI polygon records hold many rings; a MULTIPOLYGON's shells land in
    # one record and read back as a multi-ring POLYGON (winding-based
    # regrouping is a GIS-reader concern, not a storage one)
    wkt = ("MULTIPOLYGON (((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0)), "
           "((5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 5.0)))")
    _, back = _roundtrip(spark, tmp_path, [(wkt, "m")])
    assert back.collect()[0]["wkt"] == (
        "POLYGON ((0.0 0.0, 1.0 0.0, 1.0 1.0, 0.0 0.0), "
        "(5.0 5.0, 6.0 5.0, 6.0 6.0, 5.0 5.0))"
    )


def test_export_multipoint(spark, tmp_path):
    wkt = "MULTIPOINT (1.5 2.5, -3.0 4.0)"
    base, back = _roundtrip(spark, tmp_path, [(wkt, "mp")])
    assert back.collect()[0]["wkt"] == wkt
    raw = open(base + ".shp", "rb").read()
    assert struct.unpack("<i", raw[32:36])[0] == 8            # multipoint type
    body = raw[108:]
    assert struct.unpack("<i", body[36:40])[0] == 2           # n_points
    assert struct.unpack("<2d", body[40:56]) == (1.5, 2.5)


def test_export_null_geometry_record(spark, tmp_path):
    rows = [("POINT (1.0 2.0)", "a"), (None, "gone"), ("POINT (3.0 4.0)", "c")]
    _, back = _roundtrip(spark, tmp_path, rows)
    got = sorted((r["NAME"], r["wkt"]) for r in back.collect())
    assert got == [("a", "POINT (1.0 2.0)"), ("c", "POINT (3.0 4.0)"),
                   ("gone", None)]


def test_export_mixed_shape_types_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [("POINT (1.0 2.0)",), ("LINESTRING (0.0 0.0, 1.0 1.0)",)], "wkt string"
    )
    with pytest.raises(ValueError, match="mixed shape types"):
        write_shapefile(df, str(tmp_path / "mix.shp"))


def test_export_shx_index_consistent(spark, tmp_path):
    # variable-length polyline records: .shx (offset, length) pairs must
    # address the .shp records exactly (the spec's random-access contract)
    rows = [("LINESTRING (0.0 0.0, 1.0 1.0)", "a"),
            ("LINESTRING (0.0 0.0, 1.0 1.0, 2.0 0.0, 3.0 1.0)", "b")]
    base, _ = _roundtrip(spark, tmp_path, rows, name="idx")
    shp = open(base + ".shp", "rb").read()
    shx = open(base + ".shx", "rb").read()
    n_recs = (struct.unpack(">i", shx[24:28])[0] * 2 - 100) // 8
    assert n_recs == 2
    for i in range(n_recs):
        off_w, len_w = struct.unpack(">2i", shx[100 + 8 * i:108 + 8 * i])
        rec_num, content_w = struct.unpack(">2i", shp[off_w * 2:off_w * 2 + 8])
        assert rec_num == i + 1 and content_w == len_w
