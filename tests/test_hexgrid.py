"""H3-style hex grid (cells/hexgrid.py).

Pins the grid algebra the oracle row cannot see: center round-trips,
ring/disk combinatorics, the cube metric, packing uniqueness, and
row-wise parity between the codegen cube-round and a python reference.
"""

import math

import pytest
from pyspark.sql import functions as F

from geomesa_spark.cells.hexgrid import (
    ONE_THIRD,
    SQRT3_OVER_3,
    TWO_THIRDS,
    cell_center,
    disk,
    edge_deg,
    hex_cell,
    hex_distance,
    hex_qr,
    neighbors,
    ring,
)


from geomesa_spark.cells.hexgrid import point_qr as _py_qr  # noqa: E402
# (single source of truth: point_qr IS the row-wise python reference; its
# own correctness is pinned independently by the center round-trip and the
# brute-force disk-bound tests below, so Spark-vs-point_qr parity plus
# those pins closes the loop without a third copy of the cube round)


def test_center_round_trips(spark):
    cases = [(q, r, res) for res in (0, 2, 4) for q in (-40, 0, 7) for r in (-3, 0, 11)]
    for q, r, res in cases:
        lon, lat = cell_center(q, r, res)
        if not (-180 <= lon <= 180 and -90 <= lat <= 90):
            continue
        assert _py_qr(lon, lat, res) == (q, r)


def test_ring_disk_combinatorics():
    for k in range(4):
        rg = ring(2, -1, k)
        assert len(rg) == (1 if k == 0 else 6 * k)
        assert all(hex_distance(2, -1, q, r) == k for q, r in rg)
    d = disk(2, -1, 3)
    assert len(d) == 1 + 3 * 3 * 4  # 1 + 3k(k+1)
    assert len(set(d)) == len(d)
    assert set(neighbors(2, -1)) == set(ring(2, -1, 1))


def test_cell_packing_unique_and_monotone():
    ids = {}
    for q in range(-5, 6):
        for r in range(-5, 6):
            for res in (0, 3):
                lon, lat = cell_center(q, r, res)
                if not (-180 <= lon <= 180 and -90 <= lat <= 90):
                    continue
                ids[(res, q, r)] = (q, r, res)
    # distinct (res,q,r) -> distinct packed id, and q-order preserved per res
    import itertools

    packed = {}
    for (res, q, r) in ids:
        packed[(res, q, r)] = (res << 56) | ((q + (1 << 27)) << 28) | (r + (1 << 27))
    assert len(set(packed.values())) == len(packed)
    for (res, q, r), (res2, q2, r2) in itertools.combinations(packed, 2):
        if res == res2 and (q, r) < (q2, r2):
            assert packed[(res, q, r)] < packed[(res2, q2, r2)]


def test_spark_qr_matches_python_reference(spark):
    pts = spark.range(0, 500).select(
        (F.lit(-180.0) + (F.col("id") * 7919 % 36000) / 100.0).alias("lon"),
        (F.lit(-90.0) + (F.col("id") * 104729 % 18000) / 100.0).alias("lat"),
    )
    q, r = hex_qr(F.col("lon"), F.col("lat"), res=3)
    rows = pts.select("lon", "lat", q.alias("q"), r.alias("r")).collect()
    for row in rows:
        assert (row.q, row.r) == _py_qr(row.lon, row.lat, 3)


def test_hex_cell_expression_packs_qr(spark):
    pts = spark.range(0, 50).select(
        (F.col("id") * 3.7 - 90.0).alias("lon"), (F.col("id") * 1.1 - 27.0).alias("lat")
    )
    q, r = hex_qr(F.col("lon"), F.col("lat"), 2)
    got = pts.select(
        hex_cell(F.col("lon"), F.col("lat"), 2).alias("c"), q.alias("q"), r.alias("r")
    ).collect()
    for row in got:
        assert row.c == (2 << 56) | ((row.q + (1 << 27)) << 28) | (row.r + (1 << 27))


def test_disk_guarantee_bound_brute_force():
    # the knn_hex_ring stopping rule: every point OUTSIDE disk(r) of the
    # query's home cell is at least g(r) = 1.5*s*(r+1) - 2s away. Check
    # against brute force on a deterministic point cloud.
    from geomesa_spark.cells.hexgrid import point_qr

    res = 2
    s = edge_deg(res)
    qlon, qlat = 13.7, -42.3
    home = point_qr(qlon, qlat, res)
    for r in (1, 2, 3, 5):
        inside = set(disk(*home, r))
        g = max(0.0, 1.5 * s * (r + 1) - 2.0 * s)
        for i in range(4000):
            lon = -30.0 + (i * 7919 % 6000) / 100.0
            lat = -60.0 + (i * 104729 % 4000) / 100.0
            if point_qr(lon, lat, res) in inside:
                continue
            d = math.hypot(lon - qlon, lat - qlat)
            assert d >= g, (r, lon, lat, d, g)


def test_knn_hex_ring_matches_brute_force(spark):
    from geomesa_spark.operators.knn import knn_hex_ring
    from geomesa_spark.plans.compiler import GeoTable

    pts = spark.range(0, 3000).select(
        F.col("id").alias("fid"),
        (F.lit(-180.0) + (F.col("id") * 7919 % 36000) / 100.0).alias("lon"),
        (F.lit(-90.0) + (F.col("id") * 104729 % 18000) / 100.0).alias("lat"),
    )
    t = GeoTable(pts, lon="lon", lat="lat", fid="fid")
    queries = [("a", 0.0, 0.0), ("b", -170.0, 80.0)]
    got = {
        (r.query_id, r.fid)
        for r in knn_hex_ring(t, queries, k=5, res=2).collect()
    }
    rows = pts.collect()
    expect = set()
    for qid, qx, qy in queries:
        ranked = sorted(rows, key=lambda p: (math.hypot(p.lon - qx, p.lat - qy), p.fid))
        expect |= {(qid, p.fid) for p in ranked[:5]}
    assert got == expect


def test_hex_cell_res_bounds(spark):
    # spark fixture required: F.lit asserts an active SparkContext even
    # though the ValueError fires before any job runs
    with pytest.raises(ValueError):
        hex_cell(F.lit(0.0), F.lit(0.0), 17)
    with pytest.raises(ValueError):
        hex_cell(F.lit(0.0), F.lit(0.0), -1)


def test_knn_hex_rejects_out_of_world_queries(spark):
    from geomesa_spark.operators.knn import knn_hex_ring
    from geomesa_spark.plans.compiler import GeoTable

    pts = spark.range(0, 10).select(
        F.col("id").alias("fid"),
        (F.col("id") * 1.0).alias("lon"),
        (F.col("id") * 1.0).alias("lat"),
    )
    t = GeoTable(pts, lon="lon", lat="lat", fid="fid")
    with pytest.raises(ValueError, match="out of range"):
        knn_hex_ring(t, [("q", 400.0, 0.0)], k=3)


def test_knn_hex_sparse_region_coarsens_and_stays_exact(spark):
    # k larger than the local density supports: the radius must double
    # far past the home region (exercising the per-round resolution
    # coarsening) and the answer must still be the exact global top-k
    from geomesa_spark.operators.knn import knn_hex_ring
    from geomesa_spark.plans.compiler import GeoTable

    pts = spark.range(0, 60).select(
        F.col("id").alias("fid"),
        (F.col("id") * 6.0 - 180.0).alias("lon"),  # one point every 6 deg
        (F.lit(70.0)).alias("lat"),                # far from the query
    )
    t = GeoTable(pts, lon="lon", lat="lat", fid="fid")
    got = {
        (r.query_id, r.fid)
        for r in knn_hex_ring(t, [("q", 10.0, -80.0)], k=7, res=2).collect()
    }
    rows = pts.collect()
    ranked = sorted(rows, key=lambda p: (math.hypot(p.lon - 10.0, p.lat + 80.0), p.fid))
    assert got == {("q", p.fid) for p in ranked[:7]}


def test_knn_hex_out_of_world_points_still_exact(spark):
    # unwrapped longitudes in the POINTS table: the whole-plane final
    # round joins all points, so the result stays the exact top-k under
    # the oracle's metric even though no in-world cell cover holds them
    from geomesa_spark.operators.knn import knn_hex_ring
    from geomesa_spark.plans.compiler import GeoTable

    pts = spark.createDataFrame(
        [(1, 400.0, 80.0), (2, 170.0, -80.0), (3, 0.0, 0.0)],
        "fid long, lon double, lat double",
    )
    t = GeoTable(pts, lon="lon", lat="lat", fid="fid")
    got = {
        (r.query_id, r.fid)
        for r in knn_hex_ring(t, [("q", -180.0, -90.0)], k=2, res=2).collect()
    }
    rows = pts.collect()
    ranked = sorted(rows, key=lambda p: (math.hypot(p.lon + 180.0, p.lat + 90.0), p.fid))
    assert got == {("q", p.fid) for p in ranked[:2]}
