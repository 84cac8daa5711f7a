"""Geometry-typed rows: exact kernels, cell-decomposed layout, predicates.

Mirrors the reference's multi-geometry index tests
(``ACCT/iterators/MultiIteratorTest.scala`` shapes: points, lines, polygons
queried by bbox/polygon) against brute-force python evaluation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_spark.geom.kernels import (
    geometry_intersects_box,
    geometry_intersects_polygon,
    points_on_boundary,
)
from geomesa_spark.geom.wkt import parse_wkt
from geomesa_spark.plans.compiler import GeoTable, compile_query


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("wkt,box,expect", [
    ("POINT (1 1)", (0, 0, 2, 2), True),
    ("POINT (3 1)", (0, 0, 2, 2), False),
    ("POINT (2 2)", (0, 0, 2, 2), True),                       # boundary
    ("LINESTRING (-1 1, 3 1)", (0, 0, 2, 2), True),            # crosses
    ("LINESTRING (-1 -1, -1 3)", (0, 0, 2, 2), False),         # outside
    ("LINESTRING (-1 3, 3 -1)", (0, 0, 2, 2), True),           # diagonal cut
    ("LINESTRING (0.5 0.5, 1.5 1.5)", (0, 0, 2, 2), True),     # inside
    ("POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))", (0, 0, 2, 2), True),
    ("POLYGON ((-1 -1, 3 -1, 3 3, -1 3, -1 -1))", (0, 0, 2, 2), True),  # contains box
    ("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", (0, 0, 2, 2), False),
    ("POLYGON ((-1 0.5, 3 0.5, 3 1.5, -1 1.5, -1 0.5))", (0, 0, 2, 2), True),  # strip
    ("MULTIPOLYGON (((5 5, 6 5, 6 6, 5 6, 5 5)), ((1 1, 1.2 1, 1.2 1.2, 1 1.2, 1 1)))",
     (0, 0, 2, 2), True),
])
def test_geometry_intersects_box(wkt, box, expect):
    assert geometry_intersects_box(parse_wkt(wkt), box) is expect


TRI = "POLYGON ((0 0, 4 0, 2 3, 0 0))"


@pytest.mark.parametrize("wkt,expect", [
    ("POINT (2 1)", True),
    ("POINT (0 3)", False),
    ("LINESTRING (-1 1, 5 1)", True),          # crosses the triangle
    ("LINESTRING (-1 4, 5 4)", False),         # above apex
    ("LINESTRING (1.8 0.5, 2.2 0.5)", True),   # fully inside
    ("POLYGON ((1.5 0.5, 2.5 0.5, 2.5 1.5, 1.5 1.5, 1.5 0.5))", True),   # inside
    ("POLYGON ((-2 -2, 6 -2, 6 5, -2 5, -2 -2))", True),                  # contains tri
    ("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", False),
    ("POLYGON ((3 2, 5 2, 5 4, 3 4, 3 2))", False),                       # above hypotenuse
    # tall sliver passing through: no vertex of either inside the other,
    # only edge crossings detect this one
    ("POLYGON ((2.9 -1, 3.1 -1, 3.1 4, 2.9 4, 2.9 -1))", True),
])
def test_geometry_intersects_polygon(wkt, expect):
    assert geometry_intersects_polygon(parse_wkt(wkt), parse_wkt(TRI)) is expect


def test_points_on_boundary():
    import numpy as np

    g = parse_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    lon = np.array([1.0, 0.0, 1.0, 3.0])
    lat = np.array([0.0, 1.0, 1.0, 3.0])
    assert points_on_boundary(lon, lat, g).tolist() == [True, True, False, False]


# ---------------------------------------------------------------------------
# layout + queries
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def geom_layout(spark, tmp_path_factory):
    from geomesa_spark.sources.geom_layout import read_geom_layout, write_geom_layout

    rows = []
    for i in range(200):
        cx = -30.0 + (i * 7919 % 6000) / 100.0
        cy = -20.0 + (i * 104729 % 4000) / 100.0
        if i % 3 == 0:
            h = 0.5 + (i % 5) * 0.7
            rows.append((i, f"POLYGON (({cx-h} {cy-h}, {cx+h} {cy-h}, {cx+h} {cy+h}, "
                            f"{cx-h} {cy+h}, {cx-h} {cy-h}))"))
        elif i % 3 == 1:
            rows.append((i, f"LINESTRING ({cx-2.0} {cy}, {cx+2.0} {cy+1.5})"))
        else:
            rows.append((i, f"POINT ({cx} {cy})"))
    df = spark.createDataFrame(rows, "id long, wkt string")
    path = str(tmp_path_factory.mktemp("geoms") / "layout")
    write_geom_layout(df, path, wkt_col="wkt", level=6)
    return rows, read_geom_layout(spark, path)


def test_geom_layout_bbox_matches_brute_force(geom_layout):
    from geomesa_spark.sources.geom_layout import query_geom_bbox

    rows, lay = geom_layout
    box = (-10.0, -10.0, 15.0, 12.0)
    got = sorted(r["id"] for r in query_geom_bbox(lay, box, fid="id").select("id").collect())
    want = sorted(i for i, w in rows if geometry_intersects_box(parse_wkt(w), box))
    assert got == want and len(want) > 10


def test_geom_layout_dedupes_multi_cell_rows(geom_layout):
    from geomesa_spark.sources.geom_layout import query_geom_bbox

    rows, lay = geom_layout
    # whole-extent box: every geometry matches exactly once despite the
    # per-cell explode (IndexSchema.scala:298-307 dedupe semantics)
    got = [r["id"] for r in query_geom_bbox(lay, (-60, -60, 60, 60), fid="id").collect()]
    assert sorted(got) == [i for i, _ in rows]
    assert len(got) == len(set(got))


def test_geom_layout_intersects_polygon(geom_layout):
    from geomesa_spark.sources.geom_layout import query_geom_intersects

    rows, lay = geom_layout
    poly = "POLYGON ((-5 -5, 20 -5, 8 14, -5 -5))"
    got = sorted(
        r["id"] for r in query_geom_intersects(lay, poly, fid="id").select("id").collect()
    )
    p = parse_wkt(poly)
    want = sorted(i for i, w in rows if geometry_intersects_polygon(parse_wkt(w), p))
    assert got == want and len(want) > 5


# ---------------------------------------------------------------------------
# new point-row predicates through the compiler
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pt_table(spark):
    rows = [(str(i), -5.0 + (i % 20) * 0.5, -5.0 + (i // 20) * 0.5) for i in range(400)]
    df = spark.createDataFrame(rows, "id string, lon double, lat double")
    return GeoTable(df=df, lon="lon", lat="lat", dtg=None, fid="id")


def test_within_equals_intersects_for_points(pt_table):
    tri = "POLYGON((0.25 0.25, 4.25 0.25, 2.25 3.25, 0.25 0.25))"
    a = {r["id"] for r in compile_query(pt_table, f"WITHIN(geom, {tri})").df.collect()}
    b = {r["id"] for r in compile_query(pt_table, f"INTERSECTS(geom, {tri})").df.collect()}
    assert a == b and len(a) > 0


def test_contains_point_equality(pt_table):
    # lon==0 needs i%20==10, lat==0 needs i//20==10 -> only row 210
    got = [r["id"] for r in compile_query(pt_table, "CONTAINS(geom, POINT(0.0 0.0))").df.collect()]
    assert got == ["210"]
    # a point row cannot contain an areal geometry
    tri = "POLYGON((0.25 0.25, 4.25 0.25, 2.25 3.25, 0.25 0.25))"
    assert compile_query(pt_table, f"CONTAINS(geom, {tri})").df.count() == 0


def test_touches_boundary(pt_table):
    # square whose edge passes exactly through grid points at lat 0.0
    sq = "POLYGON((-5.0 0.0, 5.0 0.0, 5.0 9.0, -5.0 9.0, -5.0 0.0))"
    got = {r["id"] for r in compile_query(pt_table, f"TOUCHES(geom, {sq})").df.collect()}
    import numpy as np

    rows = pt_table.df.collect()
    g = parse_wkt(sq)
    want = {
        r["id"] for r in rows
        if points_on_boundary(np.array([r["lon"]]), np.array([r["lat"]]), g)[0]
    }
    assert got == want and len(want) > 0


def test_crosses_overlaps_false_for_points(pt_table):
    tri = "POLYGON((0.25 0.25, 4.25 0.25, 2.25 3.25, 0.25 0.25))"
    assert compile_query(pt_table, f"CROSSES(geom, {tri})").df.count() == 0
    assert compile_query(pt_table, f"OVERLAPS(geom, {tri})").df.count() == 0


def test_disjoint_complements_intersects(pt_table):
    tri = "POLYGON((0.25 0.25, 4.25 0.25, 2.25 3.25, 0.25 0.25))"
    inside = {r["id"] for r in compile_query(pt_table, f"INTERSECTS(geom, {tri})").df.collect()}
    outside = {r["id"] for r in compile_query(pt_table, f"DISJOINT(geom, {tri})").df.collect()}
    assert inside.isdisjoint(outside)
    assert len(inside) + len(outside) == 400


def test_geom_spatial_join_matches_brute_force(geom_layout):
    from geomesa_spark.sources.geom_layout import geom_spatial_join

    rows, lay = geom_layout
    polys = [
        ("tri", "POLYGON ((-5 -5, 20 -5, 8 14, -5 -5))"),
        ("box", "POLYGON ((-25 -15, -10 -15, -10 0, -25 0, -25 -15))"),
        # concave L: the geometry-shaped cover must not admit the notch
        ("L", "POLYGON ((10 -15, 28 -15, 28 -8, 18 -8, 18 5, 10 5, 10 -15))"),
    ]
    got = {
        (r["id"], r["poly_id"])
        for r in geom_spatial_join(lay, polys, fid="id").select("id", "poly_id").collect()
    }
    want = set()
    for pid, pw in polys:
        p = parse_wkt(pw)
        for i, w in rows:
            if geometry_intersects_polygon(parse_wkt(w), p):
                want.add((i, pid))
    assert got == want and len(want) > 20
