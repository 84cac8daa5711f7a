"""Round-2 additions: attribute secondary index, cell-pruned kNN, DWithin
unit normalization, LSH hot-bucket star linking, composite drop semantics,
sub-cell density fallback."""

from __future__ import annotations

import math
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from geomesa_spark.plans.compiler import GeoTable, compile_query, dwithin_meters


@pytest.fixture(scope="module")
def pts(spark):
    rows = []
    for i in range(400):
        lon = -20.0 + (i * 7919 % 4000) / 100.0
        lat = -20.0 + (i * 104729 % 4000) / 100.0
        rows.append((str(i), lon, lat,
                     datetime(2020, 3, 1 + i % 4, i % 24, tzinfo=timezone.utc),
                     f"type{i % 3}"))
    df = spark.createDataFrame(
        rows, "id string, lon double, lat double, dtg timestamp, kind string"
    )
    return GeoTable(df=df, lon="lon", lat="lat", dtg="dtg", fid="id")


# ---------------------------------------------------------------------------
# attribute secondary index
# ---------------------------------------------------------------------------


def test_attr_index_layout_roundtrip(spark, pts, tmp_path):
    from geomesa_spark.sources.layout import read_layout, write_layout

    path = str(tmp_path / "layout")
    write_layout(pts.df, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                 attr_indexes=["kind"])
    t = read_layout(spark, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                    attr_indexes=["kind"], cardinality={"kind": "high"})
    cq = compile_query(t, "kind = 'type1'")
    assert cq.stats.strategy == "attr-idx(kind)"
    got = sorted(r["id"] for r in cq.df.select("id").collect())
    want = sorted(r["id"] for r in pts.df.filter(F.col("kind") == "type1").collect())
    assert got == want
    # same rows as the main table (the secondary copy is a full copy)
    assert t.attr_tables["kind"].count() == pts.df.count()


def test_attr_index_cost_choice(spark, pts, tmp_path):
    """With a spatial+time predicate present, the z3 strategy wins unless
    the attribute is hinted high-cardinality."""
    from geomesa_spark.sources.layout import read_layout, write_layout

    path = str(tmp_path / "layout2")
    write_layout(pts.df, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                 attr_indexes=["kind"])
    cql = ("BBOX(geom, -10, -10, 10, 10) AND kind = 'type1' AND "
           "dtg DURING 2020-03-01T00:00:00Z/2020-03-03T00:00:00Z")
    t_low = read_layout(spark, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                        attr_indexes=["kind"])
    assert compile_query(t_low, cql).stats.strategy == "z3"
    t_high = read_layout(spark, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                         attr_indexes=["kind"], cardinality={"kind": "high"})
    assert compile_query(t_high, cql).stats.strategy == "attr-idx(kind)"
    a = {r["id"] for r in compile_query(t_low, cql).df.select("id").collect()}
    b = {r["id"] for r in compile_query(t_high, cql).df.select("id").collect()}
    assert a == b  # strategy changes the scan, never the answer


# ---------------------------------------------------------------------------
# cell-pruned kNN
# ---------------------------------------------------------------------------


def test_knn_no_nested_loop_join(pts):
    from geomesa_spark.operators.knn import knn_join

    df = knn_join(pts, [("q0", 0.0, 0.0), ("q1", 10.0, -10.0)], k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_cell_join_matches_brute_force(pts):
    from geomesa_spark.operators.knn import knn_join

    queries = [("q0", 0.0, 0.0), ("q1", 19.0, 19.0), ("q2", -19.9, 3.3)]
    got = {
        (r["query_id"], r["id"])
        for r in knn_join(pts, queries, k=7).select("query_id", "id").collect()
    }
    rows = pts.df.select("id", "lon", "lat").collect()

    def hav(lon1, lat1, lon2, lat2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        a = (math.sin((rl2 - rl1) / 2) ** 2
             + math.cos(rl1) * math.cos(rl2) * math.sin(math.radians(lon2 - lon1) / 2) ** 2)
        return 2 * 6371008.8 * math.asin(math.sqrt(min(1.0, a)))

    want = set()
    for qid, qlon, qlat in queries:
        ranked = sorted(rows, key=lambda r: (hav(r["lon"], r["lat"], qlon, qlat), r["id"]))
        want |= {(qid, r["id"]) for r in ranked[:7]}
    assert got == want


def test_knn_cells_cover_is_superset():
    from geomesa_spark.operators.knn import _cells_for_radius, _level_for_radius

    # high-latitude + antimeridian-wrapping covers stay supersets
    for lon, lat, r in [(179.5, 60.0, 500_000.0), (0.0, 89.0, 300_000.0),
                        (-179.9, -45.0, 1_000_000.0)]:
        level = _level_for_radius(r)
        cells = set(_cells_for_radius(lon, lat, r, level))
        from geomesa_spark.cells.tiles import tile_id
        import numpy as np

        # sample points on the radius circle; their cells must be covered
        for theta in range(0, 360, 15):
            dlat = (r / 111_194.93) * math.sin(math.radians(theta))
            dlon = (r / (111_194.93 * max(0.01, math.cos(math.radians(lat))))) \
                * math.cos(math.radians(theta))
            plon = (lon + dlon + 180.0) % 360.0 - 180.0
            plat = max(-90.0, min(90.0, lat + dlat))
            cid = int(tile_id(np.array([plon]), np.array([plat]), level)[0])
            assert cid in cells, (lon, lat, r, theta)


# ---------------------------------------------------------------------------
# DWithin units
# ---------------------------------------------------------------------------


def test_dwithin_unit_normalization(pts):
    # 100 km in miles vs meters — same circle, same rows
    m = compile_query(pts, "DWITHIN(geom, POINT(0 0), 160934.4, meters)")
    mi = compile_query(pts, "DWITHIN(geom, POINT(0 0), 100, miles)")
    a = sorted(r["id"] for r in m.df.select("id").collect())
    b = sorted(r["id"] for r in mi.df.select("id").collect())
    assert a == b and len(a) > 0


def test_dwithin_unknown_unit_rejected(pts):
    with pytest.raises(ValueError, match="unsupported DWITHIN unit"):
        compile_query(pts, "DWITHIN(geom, POINT(0 0), 100, furlongs)")


def test_dwithin_meters_helper():
    assert dwithin_meters(1.0, "km") == 1000.0
    assert dwithin_meters(1.0, "miles") == 1609.344
    assert dwithin_meters(2.0, "degrees") is None


# ---------------------------------------------------------------------------
# LSH hot-bucket star linking
# ---------------------------------------------------------------------------


def test_minhash_hot_bucket_star_linking(spark):
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    # 40 identical docs -> one giant bucket; cap 10 forces star linking
    rows = [(i, "the quick brown fox jumps over the lazy dog again and again") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.9, bucket_cap=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # star: every doc links to the representative (min id) — components intact
    assert got == {(0, i) for i in range(1, 40)}


def test_minhash_small_buckets_full_pairs(spark):
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta iota kappa") for i in range(4)]
    rows += [(100 + i, f"unique{i} tokens{i} here{i} only{i} once{i} never{i} shared{i} words{i}")
             for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(a, b) for a in range(4) for b in range(4) if a < b}


# ---------------------------------------------------------------------------
# composite converter drop + density fallback
# ---------------------------------------------------------------------------


def test_composite_drops_unclaimed_rows(spark):
    from geomesa_spark.sources.convert import composite

    raw = spark.createDataFrame(
        [("csv", "5"), ("swap", "7"), ("mystery", "9")], "fmt string, a string"
    )
    spec = [("x", lambda c: c["a"].cast("int"))]
    out = composite(raw, [(F.col("fmt") == "csv", spec), (F.col("fmt") == "swap", spec)])
    assert sorted(r["x"] for r in out.collect()) == [5, 7]


def test_density_subcell_polygon_not_dropped(spark):
    from geomesa_spark.operators.aggregations import density_geometries

    # polygon much smaller than one grid cell: weight snaps to its center cell
    df = spark.createDataFrame(
        [("POLYGON ((5.4 5.4, 5.42 5.4, 5.42 5.42, 5.4 5.42, 5.4 5.4))", 3.0)],
        "wkt string, wt double",
    )
    grid = density_geometries(df, "wkt", (0.0, 0.0, 10.0, 10.0), 10, 10, "wt")
    cells = {(r["i"], r["j"]): r["weight"] for r in grid.collect()}
    assert cells == {(5, 5): 3.0}


# ---------------------------------------------------------------------------
# adaptive polygon decomposition
# ---------------------------------------------------------------------------


def test_adaptive_cover_drops_and_classifies(spark):
    from geomesa_spark.cells.tiles import tile_bbox
    from geomesa_spark.geom.kernels import box_within_polygon, geometry_intersects_box
    from geomesa_spark.geom.wkt import parse_wkt
    from geomesa_spark.operators.spatial_join import _cell_xy, adaptive_polygon_cover

    # L-shaped concave polygon: its bbox cover would admit the missing
    # quadrant; the adaptive cover must not
    g = parse_wkt("POLYGON ((0 0, 40 0, 40 20, 20 20, 20 40, 0 40, 0 0))")
    cover = adaptive_polygon_cover(g, max_cells=64)
    assert cover, "cover must not be empty"
    has_interior = any(i for _, _, i in cover)
    assert has_interior  # big polygon -> some wholly-inside cells
    for level, cell, interior in cover:
        x, y = _cell_xy(level, cell)
        cb = tile_bbox(level, x, y)
        assert geometry_intersects_box(g, cb)  # no wasted cells
        if interior:
            assert box_within_polygon(cb, g)
    # the missing quadrant's center must not be covered by any cell
    import numpy as np
    from geomesa_spark.cells.tiles import tile_id as tid
    for level in {lv for lv, _, _ in cover}:
        missing = int(tid(np.array([35.0]), np.array([35.0]), level)[0])
        assert missing not in {c for lv, c, _ in cover if lv == level}


def test_spatial_join_concave_polygon_exact(spark):
    from geomesa_spark.geom.kernels import points_in_polygon
    from geomesa_spark.geom.wkt import parse_wkt
    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.plans.compiler import GeoTable

    wkt = "POLYGON ((0 0, 40 0, 40 20, 20 20, 20 40, 0 40, 0 0))"
    rows = [(str(i), (i * 7919 % 5000) / 100.0 - 5.0, (i * 104729 % 5000) / 100.0 - 5.0)
            for i in range(500)]
    df = spark.createDataFrame(rows, "id string, lon double, lat double")
    t = GeoTable(df=df, lon="lon", lat="lat", dtg=None, fid="id")
    got = {r["id"] for r in spatial_join(t, [("L", wkt)]).select("id").collect()}
    import numpy as np
    g = parse_wkt(wkt)
    lons = np.array([r[1] for r in rows]); lats = np.array([r[2] for r in rows])
    want = {rows[i][0] for i in np.flatnonzero(points_in_polygon(lons, lats, g))}
    assert got == want and len(want) > 50


# ---------------------------------------------------------------------------
# visibility expressions
# ---------------------------------------------------------------------------


def test_visibility_expressions(spark):
    from geomesa_spark.runtime.security import evaluate_visibility, visibility_filter

    assert evaluate_visibility("a&b", {"a", "b"})
    assert not evaluate_visibility("a&b", {"a"})
    assert evaluate_visibility("a|b", {"b"})
    assert evaluate_visibility("(a|b)&c", {"b", "c"})
    assert not evaluate_visibility("(a|b)&c", {"a", "b"})
    assert evaluate_visibility("", {"x"}) and evaluate_visibility(None, set())
    with pytest.raises(ValueError):
        evaluate_visibility("a&b|c", {"a"})  # mixing needs parens

    df = spark.createDataFrame(
        [(1, "admin"), (2, "admin&ops"), (3, "admin|ops"), (4, ""), (5, None)],
        "id int, vis string",
    )
    got = sorted(r["id"] for r in visibility_filter(df, "vis", {"ops"}).collect())
    assert got == [3, 4, 5]
    got = sorted(r["id"] for r in visibility_filter(df, "vis", {"admin", "ops"}).collect())
    assert got == [1, 2, 3, 4, 5]


def test_query_auths_uses_expressions(spark):
    from geomesa_spark.plans.compiler import GeoTable, query

    df = spark.createDataFrame(
        [(1, 0.0, 0.0, "a&b"), (2, 1.0, 1.0, "a"), (3, 2.0, 2.0, None)],
        "id int, lon double, lat double, vis string",
    )
    t = GeoTable(df=df, lon="lon", lat="lat", dtg=None, fid="id")
    got = sorted(r["id"] for r in query(t, "INCLUDE", auths={"a"}).collect())
    assert got == [2, 3]


def test_knn_z2_pruned_matches_unpruned(spark, pts):
    """knn over a z2-enriched table (prune path active) returns the same
    rows as over the plain table, including an IDL-wrapping query."""
    from geomesa_spark.operators.knn import knn_join
    from geomesa_spark.sources.layout import as_geotable

    queries = [("q0", 0.0, 0.0), ("q1", -179.9, 10.0)]
    enriched = as_geotable(pts.df, lon="lon", lat="lat", dtg="dtg", fid="id")
    a = {(r["query_id"], r["id"])
         for r in knn_join(pts, queries, k=6).select("query_id", "id").collect()}
    b = {(r["query_id"], r["id"])
         for r in knn_join(enriched, queries, k=6).select("query_id", "id").collect()}
    assert a == b and len(a) == 12


# ---------------------------------------------------------------------------
# cardinality stats, streaming converter, avro gate
# ---------------------------------------------------------------------------


def test_cardinality_hints(spark):
    from geomesa_spark.plans.stats import cardinality_hints

    rows = [(i, f"u{i}", f"k{i % 3}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, user string, kind string")
    hints = cardinality_hints(df, ["user", "kind"], high_fraction=0.01, high_min=100)
    assert hints == {"user": "high", "kind": "low"}


def test_text_stream_converter(spark, tmp_path):
    import os

    from geomesa_spark.streaming.convert_stream import text_stream_converter

    src = tmp_path / "drop"
    os.makedirs(src)
    (src / "a.txt").write_text("1|'x'|2.5\n2|'y'|3.5\n")
    stream = text_stream_converter(
        spark, str(src), "|", ["f0", "f1", "f2"],
        ["id = toLong($1)", "tag = stripQuotes($2)", "v = toDouble($3)"],
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("conv_stream")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM conv_stream").collect())
    assert got == [(1, "x", 2.5), (2, "y", 3.5)]


def test_avro_ingest_no_longer_gated(spark, tmp_path):
    """Round 3: the pure-python OCF fallback replaced the hard gate — a
    missing path is a data error now, never a missing-module error.
    Round-trip coverage lives in tests/test_round3.py."""
    import pytest as _pytest

    from geomesa_spark.sources.convert import avro_ingest

    with _pytest.raises(Exception) as ei:
        avro_ingest(spark, str(tmp_path / "nothing.avro"))
    assert not isinstance(ei.value, NotImplementedError)


# ---------------------------------------------------------------------------
# plan-shape regression: the physical plans we designed for must survive
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_spatial_join_plan_shape(spark, pts):
    from geomesa_spark.operators.spatial_join import spatial_join

    plan = _plan(spatial_join(pts, [("b", "POLYGON((0 0, 5 0, 5 5, 0 5, 0 0))"),
                                    ("t", "POLYGON((0 0, 8 0, 4 6, 0 0))")]))
    assert "BroadcastHashJoin" in plan        # cover join is a hash join...
    assert "BroadcastNestedLoopJoin" not in plan  # ...never a nested loop
    assert "SortMergeJoin" not in plan        # and never shuffles the probe side


def test_layout_query_plan_pushdown(spark, pts, tmp_path):
    """z3 prune must reach the scan: week as PartitionFilters, z3 ranges as
    PushedFilters (row-group skipping), not post-scan-only filters."""
    from geomesa_spark.sources.layout import read_layout, write_layout

    path = str(tmp_path / "lay")
    write_layout(pts.df, path, lon="lon", lat="lat", dtg="dtg", fid="id")
    t = read_layout(spark, path, lon="lon", lat="lat", dtg="dtg", fid="id")
    cql = ("BBOX(geom, -10, -10, 10, 10) AND "
           "dtg DURING 2020-03-01T00:00:00Z/2020-03-03T00:00:00Z")
    plan = _formatted(compile_query(t, cql).df)
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "week" in pf.group(1)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "z3" in pushed.group(1)


def test_attr_index_plan_pushdown(spark, pts, tmp_path):
    from geomesa_spark.sources.layout import read_layout, write_layout

    path = str(tmp_path / "lay2")
    write_layout(pts.df, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                 attr_indexes=["kind"])
    t = read_layout(spark, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                    attr_indexes=["kind"], cardinality={"kind": "high"})
    plan = _formatted(compile_query(t, "kind = 'type1'").df)
    import re
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "kind" in pushed.group(1)


def test_knn_estimated_r0_matches_fixed(spark, pts):
    from geomesa_spark.operators.knn import knn_ring_expansion

    queries = [("q0", 0.0, 0.0), ("q1", 15.0, -15.0)]
    a = {(r["query_id"], r["id"]) for r in
         knn_ring_expansion(pts, queries, k=5).select("query_id", "id").collect()}
    b = {(r["query_id"], r["id"]) for r in
         knn_ring_expansion(pts, queries, k=5, r0_m=50_000.0)
         .select("query_id", "id").collect()}
    assert a == b and len(a) == 10


def test_st_copy_z2_strategy_and_pushdown(spark, pts, tmp_path):
    from geomesa_spark.sources.layout import read_layout, write_layout

    path = str(tmp_path / "lay_st")
    write_layout(pts.df, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                 st_copy=True)
    t = read_layout(spark, path, lon="lon", lat="lat", dtg="dtg", fid="id",
                    st_copy=True)
    cq = compile_query(t, "BBOX(geom, -10, -10, 10, 10)")
    assert cq.stats.strategy == "z2-st"
    import re
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", _formatted(cq.df))
    assert pushed and "z2" in pushed.group(1)
    got = sorted(r["id"] for r in cq.df.select("id").collect())
    want = sorted(
        r["id"] for r in pts.df.filter(
            F.col("lon").between(-10, 10) & F.col("lat").between(-10, 10)
        ).collect()
    )
    assert got == want


def test_knn_vincenty_metric(spark, pts):
    """Vincenty-metric kNN matches a brute-force ranking with the same
    geodesic kernel (and the kernel matches the canonical test pair)."""
    import numpy as np

    from geomesa_spark.geom.kernels import vincenty_m
    from geomesa_spark.operators.knn import knn_join

    d = vincenty_m(np.array([144.42486788888888]), np.array([-37.95103341666667]),
                   np.array([143.92649552777777]), np.array([-37.65282113888889]))
    assert abs(d[0] - 54972.271) < 0.01  # Flinders Peak -> Buninyong

    queries = [("q0", 3.3, -4.4)]
    got = [r["id"] for r in
           knn_join(pts, queries, k=6, metric="vincenty",
                    max_radius_m=3_000_000.0).orderBy("knn_rank" if False else "dist")
           .select("id", "dist").collect()]
    rows = pts.df.select("id", "lon", "lat").collect()
    lons = np.array([r["lon"] for r in rows]); lats = np.array([r["lat"] for r in rows])
    dist = vincenty_m(lons, lats, np.full(len(rows), 3.3), np.full(len(rows), -4.4))
    order = sorted(range(len(rows)), key=lambda i: (dist[i], rows[i]["id"]))
    want = [rows[i]["id"] for i in order[:6]]
    assert got == want


def test_streaming_tile_density_watermark(spark, tmp_path):
    """Windowed density over a file stream: counts land in the right
    event-time windows and match the equivalent batch aggregation."""
    import json
    import os

    from geomesa_spark.streaming.windowed import streaming_tile_density

    src = tmp_path / "stream_src"
    os.makedirs(src)
    rows = []
    for i in range(60):
        rows.append({"lon": -20.0 + i, "lat": 5.0,
                     "ts": f"2024-01-01T00:{i % 30:02d}:00.000Z"})
    (src / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.schema("lon double, lat double, ts timestamp")
        .json(str(src))
    )
    out = streaming_tile_density(stream, window_duration="10 minutes",
                                 watermark="1 hour", level=4)
    q = (
        out.writeStream.format("memory").queryName("win_density")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["window_start"].minute, r["tile_id"]): r["n"]
        for r in spark.sql("SELECT * FROM win_density").collect()
    }
    # batch twin
    batch = spark.read.schema("lon double, lat double, ts timestamp").json(str(src))
    from geomesa_spark.functions.zexpr import tile_id_expr
    from pyspark.sql import functions as FF
    want = {
        (r["m"], r["tile_id"]): r["n"]
        for r in batch.groupBy(
            FF.window("ts", "10 minutes").alias("w"),
            tile_id_expr(FF.col("lon"), FF.col("lat"), 4).alias("tile_id"),
        ).agg(FF.count("*").alias("n"))
        .select(FF.minute("w.start").alias("m"), "tile_id", "n").collect()
    }
    assert got == want and len(got) > 3
