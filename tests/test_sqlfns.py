"""st_* SQL function surface (functions/sqlfns.py).

The driver oracle (`sql_functions`) hash-verifies the surface end-to-end
through spark.sql at sf0.01; these tests pin per-function semantics —
boundary inclusion rules, float round-trips, agreement with the numpy
kernels, and the documented unsupported-combination errors."""

from __future__ import annotations

import math

import numpy as np
import pytest

from geomesa_spark.functions.sqlfns import register_sql_functions


@pytest.fixture()
def sqlspark(spark):
    register_sql_functions(spark)
    return spark


def _one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]


def test_point_xy_roundtrip_exact(sqlspark):
    # repr-based WKT must round-trip doubles bit-exactly
    vals = [0.1, -179.99999999, 1e-12, 12345.6789, -0.0]
    for v in vals:
        assert _one(sqlspark, f"st_x(st_point(CAST({v!r} AS DOUBLE), 1.0))") == v
        assert _one(sqlspark, f"st_y(st_point(1.0, CAST({v!r} AS DOUBLE)))") == v


def test_contains_excludes_boundary_intersects_includes(sqlspark):
    box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    inside, edge, outside = "POINT (5 5)", "POINT (10 5)", "POINT (11 5)"
    assert _one(sqlspark, f"st_contains('{box}', '{inside}')") is True
    assert _one(sqlspark, f"st_contains('{box}', '{edge}')") is False
    assert _one(sqlspark, f"st_contains('{box}', '{outside}')") is False
    assert _one(sqlspark, f"st_intersects('{box}', '{edge}')") is True
    assert _one(sqlspark, f"st_intersects('{box}', '{outside}')") is False
    # within is the transpose of contains
    assert _one(sqlspark, f"st_within('{inside}', '{box}')") is True
    assert _one(sqlspark, f"st_within('{edge}', '{box}')") is False


def test_makebbox_feeds_contains(sqlspark):
    assert _one(
        sqlspark,
        "st_contains(st_makebbox(0.0D, 0.0D, 2.0D, 2.0D), 'POINT (1 1)')",
    ) is True
    assert _one(
        sqlspark,
        "st_contains(st_makebbox(0.0D, 0.0D, 2.0D, 2.0D), 'POINT (3 1)')",
    ) is False


def test_geohash_and_tile_match_kernels(sqlspark):
    from geomesa_spark.cells.geohash import geohash_encode
    from geomesa_spark.cells.tiles import tile_id

    lon, lat = -5.6, 42.6
    want_gh = geohash_encode(np.array([lon]), np.array([lat]), 6)[0]
    got_gh = _one(sqlspark, f"st_geohash({lon}D, {lat}D, 6)")
    assert got_gh == want_gh
    want_tid = int(tile_id(np.array([lon]), np.array([lat]), 8)[0])
    assert _one(sqlspark, f"st_tile_id({lon}D, {lat}D, 8)") == want_tid


def test_distance_and_dwithin(sqlspark):
    # London -> Paris is ~343.5 km on the sphere
    d = _one(sqlspark,
             "st_distance_sphere('POINT (-0.1276 51.5072)', 'POINT (2.3522 48.8566)')")
    assert math.isclose(d, 343_500, rel_tol=0.01)
    assert _one(
        sqlspark,
        "st_dwithin('POINT (-0.1276 51.5072)', 'POINT (2.3522 48.8566)', 400000.0D)",
    ) is True
    assert _one(
        sqlspark,
        "st_dwithin('POINT (-0.1276 51.5072)', 'POINT (2.3522 48.8566)', 300000.0D)",
    ) is False


def test_intersects_polygon_vs_polygon(sqlspark):
    a = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    b = "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"
    c = "POLYGON ((20 20, 30 20, 30 30, 20 30, 20 20))"
    assert _one(sqlspark, f"st_intersects('{a}', '{b}')") is True
    assert _one(sqlspark, f"st_intersects('{a}', '{c}')") is False


def test_contains_nonpoint_rhs_raises(sqlspark):
    a = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    with pytest.raises(Exception, match="contained side"):
        sqlspark.sql(f"SELECT st_contains('{a}', '{a}') AS v").collect()


def test_intersects_point_lhs_symmetric(sqlspark):
    """intersects must accept the point on EITHER side."""
    box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert _one(sqlspark, f"st_intersects('POINT (5 5)', '{box}')") is True
    assert _one(sqlspark, f"st_intersects('POINT (11 5)', '{box}')") is False
    # point-point: coordinate equality
    assert _one(sqlspark, "st_intersects('POINT (1 2)', 'POINT (1 2)')") is True
    assert _one(sqlspark, "st_intersects('POINT (1 2)', 'POINT (1 3)')") is False


def test_null_inputs_propagate_not_crash(sqlspark):
    box = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    df = sqlspark.createDataFrame(
        [("POINT (5 5)",), (None,)], "p string")
    df.createOrReplaceTempView("nulls_t")
    rows = sqlspark.sql(
        f"SELECT st_contains('{box}', p) AS c, st_intersects('{box}', p) AS i, "
        f"st_x(p) AS x, st_dwithin(p, 'POINT (5 5)', 10.0D) AS d, "
        f"st_point(st_x(p), st_y(p)) AS pt FROM nulls_t"
    ).collect()
    good, nul = rows
    assert good["c"] is True and good["i"] is True and good["x"] == 5.0
    assert nul["c"] is None and nul["i"] is None and nul["x"] is None
    assert nul["d"] is None and nul["pt"] is None


def test_geohash_level_must_be_literal(sqlspark):
    df = sqlspark.createDataFrame([(1.0, 1.0, 5), (2.0, 2.0, 6)],
                                  "lon double, lat double, p long").coalesce(1)
    df.createOrReplaceTempView("varp_t")
    with pytest.raises(Exception, match="literal"):
        sqlspark.sql("SELECT st_geohash(lon, lat, p) AS g FROM varp_t").collect()


def test_varying_polygon_column_grouped_kernel(sqlspark):
    """Left-hand WKT can vary per row (the per-batch distinct cache)."""
    df = sqlspark.createDataFrame(
        [("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", 2.0, 2.0),
         ("POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))", 2.0, 2.0),
         ("POLYGON ((10 10, 14 10, 14 14, 10 14, 10 10))", 12.0, 12.0)],
        "poly string, lon double, lat double",
    )
    df.createOrReplaceTempView("vp")
    rows = sqlspark.sql(
        "SELECT st_contains(poly, st_point(lon, lat)) AS v FROM vp"
    ).collect()
    assert [r["v"] for r in rows] == [True, False, True]
