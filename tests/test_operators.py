"""Operator tests vs brute-force oracles (spatial join, kNN, aggregations,
BIN, tube), mirroring the reference's process tests (FIXTURES.md F5)."""

import struct
from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.geom.kernels import haversine_m, points_in_polygon
from geomesa_spark.geom.wkt import parse_wkt
from geomesa_spark.plans.compiler import GeoTable
from geomesa_spark.operators.spatial_join import spatial_join, proximity_join
from geomesa_spark.operators.knn import knn_join, knn_ring_expansion
from geomesa_spark.operators.aggregations import (
    density, temporal_density, unique_histogram, bounds, count_by_day,
)
from geomesa_spark.operators.bin_export import bin_records, bin_pack
from geomesa_spark.operators.tube import tube_select
from geomesa_spark.operators.tiling import tile_counts, tile_rollup


def _utc(y, mo, d, h=0, mi=0):
    return datetime(y, mo, d, h, mi, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pts(spark):
    """400 deterministic points spread over [-20,20]^2, 4 days."""
    rows = []
    for i in range(400):
        lon = -20.0 + (i * 7919 % 4000) / 100.0
        lat = -20.0 + (i * 104729 % 4000) / 100.0
        rows.append((str(i), lon, lat, _utc(2020, 3, 1 + i % 4, i % 24), f"type{i % 3}"))
    df = spark.createDataFrame(rows, "id string, lon double, lat double, dtg timestamp, kind string")
    return GeoTable(df=df, lon="lon", lat="lat", dtg="dtg", fid="id")


POLYS = [
    ("box1", "POLYGON((-10 -10, 5 -10, 5 5, -10 5, -10 -10))"),
    ("tri", "POLYGON((0 0, 15 0, 7.5 12, 0 0))"),
    ("multi", "MULTIPOLYGON(((-19 -19, -15 -19, -15 -15, -19 -15, -19 -19)), ((10 10, 19 10, 19 19, 10 19, 10 10)))"),
    ("sliver", "POLYGON((-5 14.999, 19 14.999, 19 15.001, -5 15.001, -5 14.999))"),
]


def test_spatial_join_matches_brute_force(pts):
    got = spatial_join(pts, POLYS)
    got_pairs = {(r["id"], r["poly_id"]) for r in got.select("id", "poly_id").collect()}

    rows = pts.df.select("id", "lon", "lat").collect()
    lons = np.array([r["lon"] for r in rows])
    lats = np.array([r["lat"] for r in rows])
    ids = [r["id"] for r in rows]
    expected = set()
    for pid, wkt in POLYS:
        inside = points_in_polygon(lons, lats, parse_wkt(wkt))
        expected |= {(ids[i], pid) for i in np.flatnonzero(inside)}
    assert got_pairs == expected
    assert len(expected) > 20  # sanity: non-trivial join


def test_proximity_join_matches_brute(pts):
    sites = [("s1", 0.0, 0.0), ("s2", -15.0, 12.0)]
    got = proximity_join(pts, sites, 500_000.0)
    got_pairs = {(r["id"], r["site_id"]) for r in got.select("id", "site_id").collect()}

    rows = pts.df.select("id", "lon", "lat").collect()
    expected = set()
    for sid, slon, slat in sites:
        for r in rows:
            if haversine_m(r["lon"], r["lat"], slon, slat) <= 500_000.0:
                expected.add((r["id"], sid))
    assert got_pairs == expected


def test_knn_matches_brute(pts):
    queries = [("q1", 0.0, 0.0), ("q2", -18.0, 18.0)]
    k = 7
    got = knn_join(pts, queries, k)
    rows = pts.df.select("id", "lon", "lat").collect()
    for qid, qlon, qlat in queries:
        dists = sorted(
            (float(haversine_m(r["lon"], r["lat"], qlon, qlat)), r["id"]) for r in rows
        )
        expect_ids = [i for _, i in dists[:k]]
        got_ids = [
            r["id"]
            for r in got.filter(F.col("query_id") == qid).orderBy("dist").collect()
        ]
        assert got_ids == expect_ids


def test_knn_ring_expansion_matches_knn_join(pts):
    queries = [("q1", 0.0, 0.0), ("q2", -18.0, 18.0), ("qfar", 150.0, 80.0)]
    k = 5
    a = knn_join(pts, queries, k)
    b = knn_ring_expansion(pts, queries, k, r0_m=10_000.0, max_radius_m=30_000_000.0)
    pa = {(r["query_id"], r["id"]) for r in a.collect()}
    pb = {(r["query_id"], r["id"]) for r in b.collect()}
    assert pa == pb


def test_density_grid(pts):
    got = {(r["i"], r["j"]): r["weight"] for r in density(pts, (-20, -20, 20, 20), 8, 8).collect()}
    rows = pts.df.select("lon", "lat").collect()
    exp = {}
    for r in rows:
        i = min(7, max(0, int((r["lon"] + 20) / 40 * 8)))
        j = min(7, max(0, int((r["lat"] + 20) / 40 * 8)))
        exp[(i, j)] = exp.get((i, j), 0) + 1.0
    assert got == exp


def test_temporal_density(pts):
    got = {r["bucket"]: r["n"] for r in
           temporal_density(pts, _utc(2020, 3, 1), _utc(2020, 3, 5), 4).collect()}
    assert sum(got.values()) == 400
    assert set(got) == {0, 1, 2, 3}


def test_unique_histogram(pts):
    got = {r["value"]: r["count"] for r in unique_histogram(pts, "kind").collect()}
    assert got == {"type0": 134, "type1": 133, "type2": 133}


def test_bounds(pts):
    b = bounds(pts).collect()[0]
    assert b["lon_min"] >= -20 and b["lon_max"] <= 20


def test_count_by_day(pts):
    rows = count_by_day(pts).collect()
    assert [r["day"] for r in rows] == ["20200301", "20200302", "20200303", "20200304"]
    assert sum(r["n"] for r in rows) == 400


def test_bin_records_and_pack(pts):
    recs = bin_records(pts, "kind").collect()
    assert len(recs) == 400
    packed = {r["track"]: r for r in bin_pack(pts, "kind").collect()}
    assert set(packed) == {"type0", "type1", "type2"}
    blob = packed["type0"]["record_bytes"]
    n = packed["type0"]["n"]
    assert len(blob) == 16 * n
    h, t, la, lo = struct.unpack("<iiff", blob[:16])
    secs = [struct.unpack("<iiff", blob[k * 16:(k + 1) * 16])[1] for k in range(n)]
    assert secs == sorted(secs)  # per-track time sort


def test_tube_select(spark, pts):
    track = [
        (_utc(2020, 3, 1, 0), -10.0, -10.0),
        (_utc(2020, 3, 1, 12), 0.0, 0.0),
        (_utc(2020, 3, 2, 0), 10.0, 10.0),
    ]
    got = tube_select(pts, track, buffer_m=300_000.0, bin_seconds=12 * 3600)
    rows = got.select("id", "tube_bin", "dist_m").collect()
    assert len(rows) > 0
    assert all(r["dist_m"] <= 300_000.0 for r in rows)
    # every returned feature is inside some bin time window
    ids = {r["id"] for r in rows}
    src = {r["id"]: r for r in pts.df.collect()}
    for rid in ids:
        assert src[rid]["dtg"].day in (1, 2)


def test_tile_rollup(pts):
    t8 = tile_counts(pts, 8)
    t6 = tile_rollup(t8, 8, 6)
    direct = tile_counts(pts, 6)
    a = {r["tile_id"]: r["weight"] for r in t6.collect()}
    b = {r["tile_id"]: r["weight"] for r in direct.collect()}
    assert a == b


def test_density_geometries_mass_conserved(spark):
    from geomesa_spark.operators.aggregations import density_geometries

    rows = [
        ("POINT (5.5 5.5)", 2.0),
        ("LINESTRING (0.5 0.5, 9.5 0.5)", 3.0),
        ("POLYGON ((1 1, 9 1, 9 9, 1 9, 1 1))", 5.0),
    ]
    df = spark.createDataFrame(rows, "wkt string, wt double")
    grid = density_geometries(df, "wkt", (0.0, 0.0, 10.0, 10.0), 10, 10, "wt")
    cells = {(r["i"], r["j"]): r["weight"] for r in grid.collect()}
    # total mass conserved
    assert abs(sum(cells.values()) - 10.0) < 1e-9
    # the point lands wholly in its cell (plus shares from line/polygon)
    assert cells[(5, 5)] > 0
    # the horizontal line crosses cells (0..9, 0): each gets an equal share
    line_cells = [cells.get((i, 0), 0.0) for i in range(10)]
    assert all(v > 0 for v in line_cells)


def test_render_density_png(spark, pts):
    """WMS-style heatmap rendering: a real PNG (verified by independent
    decode: signature, IHDR fields, zlib-inflated scanline geometry, and
    hot-cell pixels colored / empty cells transparent)."""
    import struct
    import zlib

    from geomesa_spark.operators.aggregations import density
    from geomesa_spark.operators.render import render_density_png

    grid = density(pts, (-20.0, -20.0, 20.0, 20.0), 16, 16)
    png = render_density_png(grid, 16, 16)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # parse chunks independently
    pos, chunks = 8, {}
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        payload = png[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", png[pos + 8 + ln:pos + 12 + ln])
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF)
        chunks[tag] = payload
        pos += 12 + ln
    w, h, depth, ctype = struct.unpack(">IIBB", chunks[b"IHDR"][:10])
    assert (w, h, depth, ctype) == (16, 16, 8, 6)
    raw = zlib.decompress(chunks[b"IDAT"])
    assert len(raw) == 16 * (1 + 16 * 4)
    # at least one opaque heat pixel and the grid's empty cells transparent
    rows = [raw[y * 65 + 1:(y + 1) * 65] for y in range(16)]
    alphas = [rows[y][x * 4 + 3] for y in range(16) for x in range(16)]
    assert max(alphas) == 255
    n_cells = grid.count()
    assert sum(1 for a in alphas if a > 0) == n_cells
