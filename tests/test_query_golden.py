"""Golden query tests reproducing the reference's Z3 strategy fixture.

The 30-feature fixture and expected ID sets come from
``geomesa-accumulo/.../index/Z3IdxStrategyTest.scala:35-150`` (see
FIXTURES.md F3): features 0..29 with hand-placed points/dates, queried with
BBOX + time-interval combinations (including week boundaries, cross-week
intervals, whole-world boxes, and tiny boxes). The engine must return exactly
the same ID sets through the full pipeline: enrich -> z3/z2 prune -> residual.
"""

from datetime import datetime, timezone

import pytest

from geomesa_spark.plans.compiler import GeoTable, compile_query
from geomesa_spark.sources.layout import as_geotable


def _utc(y, mo, d, h=0, mi=0, s=0):
    return datetime(y, mo, d, h, mi, s, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def z3_fixture(spark):
    """The Z3IdxStrategyTest feature set (FIXTURES.md F3)."""
    rows = []
    for i in range(10):
        rows.append((str(i), f"name{i}", _utc(2010, 5, 7, i), 40.0, 60.0 + i))
    for i in range(10, 20):
        rows.append((str(i), f"name{i}", _utc(2010, 5, i, i), 40.0, 60.0 + (i - 10)))
    for i in range(20, 30):
        rows.append((str(i), f"name{i}", _utc(2010, 5, i, i - 10), 40.0, 80.0 + (i - 20)))
    df = spark.createDataFrame(rows, "id string, name string, dtg timestamp, lon double, lat double")
    return as_geotable(df, lon="lon", lat="lat", dtg="dtg", fid="id")


GOLDEN = [
    # (cql, expected id set, expected strategy prefix) — Z3IdxStrategyTest.scala:80-150
    ("BBOX(geom, 35, 55, 45, 75) AND dtg DURING 2010-05-07T00:00:00Z/2010-05-08T00:00:00Z",
     set(range(10)), "z3"),
    ("BBOX(geom, 35, 55, 45, 65) AND dtg DURING 2010-05-07T00:00:00Z/2010-05-08T00:00:00Z",
     set(range(6)), "z3"),
    ("BBOX(geom, 35, 55, 45, 75) AND dtg DURING 2010-05-07T06:00:00Z/2010-05-08T00:00:00Z",
     {6, 7, 8, 9}, "z3"),
    ("BBOX(geom, -180, -90, 180, 90) AND dtg DURING 2010-05-07T05:00:00Z/2010-05-07T08:00:00Z",
     {5, 6, 7, 8}, "z3"),
    ("BBOX(geom, 35, 65, 45, 75) AND dtg DURING 2010-05-07T06:00:00Z/2010-05-21T00:00:00Z",
     {6, 7, 8, 9, 15, 16, 17, 18, 19}, "z3"),
    ("BBOX(geom, 35, 64.5, 45, 70) AND dtg DURING 2010-05-10T00:00:00Z/2010-05-17T23:59:59.999Z",
     {15, 16, 17}, "z3"),
    ("BBOX(geom, -180, -90, 180, 90) AND dtg DURING 2010-05-07T06:00:00Z/2010-05-21T00:00:00Z",
     set(range(6, 21)), "z3"),
    ("BBOX(geom, -180, -90, 180, 90) AND dtg DURING 2010-05-08T06:00:00Z/2010-05-30T00:00:00Z",
     set(range(10, 30)), "z3"),
    ("BBOX(geom, 39.999, 60.999, 40.001, 61.001) AND dtg DURING 2010-05-07T00:59:00Z/2010-05-07T01:01:00Z",
     {1}, "z3"),
]


@pytest.mark.parametrize("cql,expected,strategy", GOLDEN)
def test_z3_golden(z3_fixture, cql, expected, strategy):
    q = compile_query(z3_fixture, cql)
    got = {r["id"] for r in q.df.select("id").collect()}
    assert got == {str(i) for i in expected}
    assert q.stats.strategy.startswith(strategy)


def test_spatial_only_uses_z2(z3_fixture):
    q = compile_query(z3_fixture, "BBOX(geom, 35, 55, 45, 75)")
    assert q.stats.strategy == "z2"
    got = {r["id"] for r in q.df.select("id").collect()}
    assert got == {str(i) for i in range(20)}  # lat 60..69 twice


def test_record_strategy(z3_fixture):
    q = compile_query(z3_fixture, "id IN ('3', '7', '25')")
    assert q.stats.strategy == "record"
    got = {r["id"] for r in q.df.select("id").collect()}
    assert got == {"3", "7", "25"}


def test_or_union_dedupes(z3_fixture):
    q = compile_query(
        z3_fixture,
        "BBOX(geom, 35, 55, 45, 62) OR BBOX(geom, 35, 60, 45, 64)",
    )
    got = {r["id"] for r in q.df.select("id").collect()}
    # lat in [55,62] -> ids 0,1,2 (+10..12); lat in [60,64] -> 0..4 (+10..14)
    assert got == {"0", "1", "2", "3", "4", "10", "11", "12", "13", "14"}


def test_attribute_predicates(z3_fixture):
    q = compile_query(z3_fixture, "name = 'name5'")
    assert {r["id"] for r in q.df.select("id").collect()} == {"5"}
    q2 = compile_query(z3_fixture, "name LIKE 'name2%'")
    assert {r["id"] for r in q2.df.select("id").collect()} == {"2"} | {str(i) for i in range(20, 30)}


def test_intersects_polygon(z3_fixture):
    # triangle covering points with lat 60..63 at lon 40
    cql = "INTERSECTS(geom, POLYGON((38 59, 42 59, 40 63.5, 38 59)))"
    q = compile_query(z3_fixture, cql)
    got = {r["id"] for r in q.df.select("id").collect()}
    assert got == {"0", "1", "2", "3", "10", "11", "12", "13"}


def test_dwithin_meters(z3_fixture):
    # 120 km around (40, 60.5): lat 60 and 61 are ~55km away -> ids 0,1,10,11
    cql = "DWITHIN(geom, POINT(40 60.5), 120000, meters)"
    q = compile_query(z3_fixture, cql)
    got = {r["id"] for r in q.df.select("id").collect()}
    assert got == {"0", "1", "10", "11"}


def test_whole_world_elimination(z3_fixture):
    q = compile_query(z3_fixture, "BBOX(geom, -180, -90, 180, 90)")
    assert q.df.count() == 30


def test_layout_roundtrip(spark, z3_fixture, tmp_path):
    from geomesa_spark.sources.layout import write_layout, read_layout

    base = z3_fixture.df.drop("week", "z3", "z2", "shard")
    path = str(tmp_path / "layout")
    write_layout(base, path, lon="lon", lat="lat", dtg="dtg", fid="id")
    t = read_layout(spark, path, lon="lon", lat="lat", dtg="dtg", fid="id")
    assert t.week_col == "week" and t.z3_col == "z3"
    q = compile_query(t, GOLDEN[0][0])
    got = {r["id"] for r in q.df.select("id").collect()}
    assert got == {str(i) for i in range(10)}


def test_zexpr_matches_numpy(spark):
    """JVM column-expression keys must equal the numpy planner keys."""
    import numpy as np

    from geomesa_spark.cells.zcurve import Z2, Z3, seconds_in_week

    rows = [(float(lon), float(lat), ts) for lon, lat, ts in
            [(-179.9, -89.9, 0), (0.0, 0.0, 1234567), (179.9, 89.9, 999999999),
             (40.0, 60.0, 1273190400), (-0.001, 0.001, 604799)]]
    df = spark.createDataFrame(rows, "lon double, lat double, secs long")
    from pyspark.sql import functions as F
    from geomesa_spark.functions.zexpr import z2_expr, z3_expr

    got = df.select(
        z3_expr(F.col("lon"), F.col("lat"), F.col("secs")).alias("z3"),
        z2_expr(F.col("lon"), F.col("lat")).alias("z2"),
    ).collect()
    lons = np.array([r[0] for r in rows])
    lats = np.array([r[1] for r in rows])
    secs = np.array([r[2] for r in rows])
    exp3 = Z3.encode(lons, lats, seconds_in_week(secs))
    exp2 = Z2.encode(lons, lats)
    assert [int(r["z3"]) for r in got] == [int(v) for v in exp3]
    assert [int(r["z2"]) for r in got] == [int(v) for v in exp2]


# ---------------------------------------------------------------------------
# parser / planner edge cases (FilterHelper + QueryFilterSplitter parity)
# ---------------------------------------------------------------------------


def test_nested_not_and_parens(z3_fixture):
    t = z3_fixture
    inside = {r["id"] for r in compile_query(t, "BBOX(geom, -10, -10, 10, 10)").df.collect()}
    neg = {r["id"] for r in compile_query(t, "NOT (BBOX(geom, -10, -10, 10, 10))").df.collect()}
    allr = {r["id"] for r in t.df.collect()}
    assert inside | neg == allr and inside.isdisjoint(neg)
    # double negation is identity
    dbl = {r["id"] for r in compile_query(
        t, "NOT (NOT (BBOX(geom, -10, -10, 10, 10)))").df.collect()}
    assert dbl == inside


def test_or_precedence_binds_and_tighter(z3_fixture):
    t = z3_fixture
    # A OR B AND C == A OR (B AND C)
    a = {r["id"] for r in compile_query(
        t, "name = 'name3' OR name = 'name5' AND BBOX(geom, 35, 55, 45, 66)"
    ).df.collect()}
    b = {r["id"] for r in compile_query(
        t, "name = 'name3' OR (name = 'name5' AND BBOX(geom, 35, 55, 45, 66))"
    ).df.collect()}
    assert a == b == {"3", "5"}


def test_is_null_and_is_not_null(spark):
    from geomesa_spark.plans.compiler import GeoTable

    df = spark.createDataFrame(
        [(1, 0.0, 0.0, "x"), (2, 1.0, 1.0, None)], "id int, lon double, lat double, tag string"
    )
    t = GeoTable(df=df, lon="lon", lat="lat", dtg=None, fid="id")
    assert [r["id"] for r in compile_query(t, "tag IS NOT NULL").df.collect()] == [1]
    assert [r["id"] for r in compile_query(t, "tag IS NULL").df.collect()] == [2]


def test_in_with_strings_and_like(z3_fixture):
    t = z3_fixture
    got = {r["id"] for r in compile_query(t, "name IN ('name0', 'name22')").df.collect()}
    assert got == {"0", "22"}
    liked = {r["id"] for r in compile_query(t, "name LIKE 'name1%'").df.collect()}
    assert liked == {"1"} | {str(i) for i in range(10, 20)}


def test_bbox_intersection_of_spatial_constraints(z3_fixture):
    """Two ANDed spatial predicates intersect into one prune box and the
    conjunction of residuals (QueryFilterSplitter AND-merge)."""
    t = z3_fixture
    cq = compile_query(
        t, "BBOX(geom, -10, -10, 10, 10) AND BBOX(geom, 0, 0, 20, 20)")
    got = {r["id"] for r in cq.df.collect()}
    want = {
        r["id"] for r in t.df.collect()
        if 0 <= r["lon"] <= 10 and 0 <= r["lat"] <= 10
    }
    assert got == want


def test_unsatisfiable_intersection_returns_empty(z3_fixture):
    t = z3_fixture
    cq = compile_query(
        t, "BBOX(geom, -10, -10, -5, -5) AND BBOX(geom, 5, 5, 10, 10)")
    assert cq.df.count() == 0
