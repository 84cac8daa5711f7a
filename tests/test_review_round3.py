"""Round-3 review fixes: vincenty cover pad on the bounded kNN path,
Avro named types defined inside null unions, IVF misuse guards and empty
query lists, and streaming-dedup null-content passthrough."""

from __future__ import annotations

import datetime as dt
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.knn import knn_join
from geomesa_spark.sources.layout import as_geotable


def test_knn_vincenty_bounded_cover_includes_edge_neighbor(spark):
    """On the WGS84 equatorial meridian a degree is ~110,574 m, shorter
    than the cover's 111 km sizing — a neighbor at vincenty distance just
    under the bound sits OUTSIDE the unpadded haversine cover box. The
    bounded path must pad the cover like ring expansion does."""
    from geomesa_spark.geom.kernels import vincenty_m

    lat_edge = 0.9030  # vincenty ~99.85 km from (10, 0); > 100000/111000 deg
    d = float(vincenty_m(np.array([10.0]), np.array([0.0]),
                         np.array([10.0]), np.array([lat_edge]))[0])
    assert 99_000 < d < 100_000  # inside the radius bound
    assert lat_edge > 100_000 / 111_000  # outside the unpadded cover

    df = spark.createDataFrame(
        [("near", 10.0, 0.01), ("edge", 10.0, lat_edge), ("far", 10.0, 5.0)],
        "id string, lon double, lat double",
    )
    t = as_geotable(df, dtg=None, fid="id")
    out = knn_join(t, [("q", 10.0, 0.0)], k=5, max_radius_m=100_000,
                   metric="vincenty")
    ids = {r["id"] for r in out.collect()}
    assert ids == {"near", "edge"}


def test_avro_named_type_in_null_union_first_value_null(tmp_path):
    """A record first DEFINED inside a ["null", Sub] union must resolve
    by name later even when the first value takes the null branch."""
    from geomesa_spark.sources.avro_codec import iter_container, write_container

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": ["null", {
                "type": "record", "name": "Sub",
                "fields": [{"name": "x", "type": "long"}],
            }]},
            {"name": "b", "type": "Sub"},
        ],
    }
    records = [
        {"a": None, "b": {"x": 1}},          # first value: null branch
        {"a": {"x": 7}, "b": {"x": 2}},
    ]
    data = write_container(schema, records)
    got = list(iter_container(data))
    assert got == records


def test_ivf_cell_col_requires_centroids(spark):
    from geomesa_spark.operators.ann import ivf_cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    ).withColumn("__cell", F.lit(0))
    with pytest.raises(ValueError, match="centroids"):
        ivf_cosine_topk(emb, [("q", [1.0, 0.0])], k=1, cell_col="__cell")


def test_ann_empty_queries_return_empty(spark):
    from geomesa_spark.operators.ann import cosine_topk, ivf_cosine_topk, lsh_cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    for fn in (cosine_topk, lsh_cosine_topk, ivf_cosine_topk):
        out = fn(emb, [], k=3)
        assert out.count() == 0
        assert set(out.columns) == {"query_id", "vec_id", "sim", "rank"}


def test_hyperplane_n_planes_guard(spark):
    from geomesa_spark.operators.ann import hyperplane_signatures

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="63"):
        hyperplane_signatures(emb, dim=2, n_planes=64)
    assert "lsh_sig" in hyperplane_signatures(emb, dim=2).columns  # default ok


def test_streaming_dedup_null_text_passthrough(spark, tmp_path):
    from geomesa_spark.streaming.dedup_stream import streaming_exact_dedup

    src = tmp_path / "nulls_src"
    os.makedirs(src)
    rows = [
        {"url": "u1", "text": "same body", "ts": "2024-01-01T00:00:00.000Z"},
        {"url": "u2", "text": "same body", "ts": "2024-01-01T00:00:01.000Z"},
        {"url": "u3", "text": None, "ts": "2024-01-01T00:00:02.000Z"},
        {"url": "u4", "text": None, "ts": "2024-01-01T00:00:03.000Z"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("url string, text string, ts timestamp").json(str(src))
    out = streaming_exact_dedup(stream, "text", "ts")
    q = (
        out.writeStream.format("memory").queryName("nulldedup")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = {r["url"] for r in spark.sql("SELECT url FROM nulldedup").collect()}
    # one survivor for the duplicated body; BOTH distinct null-text rows kept
    assert "u3" in got and "u4" in got
    assert len(got & {"u1", "u2"}) == 1


# ---------------------------------------------------------------------------
# third review batch
# ---------------------------------------------------------------------------

def test_contradictory_interval_compiles_to_empty(spark):
    """Two disjoint DURING clauses ANDed: a legal query whose answer is
    empty must compile to an empty scan, not crash the planner."""
    from geomesa_spark.plans.compiler import compile_query

    df = spark.createDataFrame(
        [(1, 0.5, 0.5, dt.datetime(2024, 1, 15))],
        "id long, lon double, lat double, dtg timestamp",
    )
    t = as_geotable(df, fid="id")
    cq = compile_query(
        t,
        "BBOX(geom, 0, 0, 10, 10) AND "
        "dtg DURING 2024-06-01T00:00:00Z/2024-06-30T00:00:00Z AND "
        "dtg DURING 2024-01-01T00:00:00Z/2024-01-31T00:00:00Z",
    )
    assert cq.df.count() == 0


def test_robots_query_string_rules_match(spark):
    """REP prefixes match path-plus-query: 'Disallow: /search?q=' must
    actually disallow /search?q=... pages."""
    from geomesa_spark.functions.robots import robots_filter, robots_rules

    rules = robots_rules(spark, [("h.com", "User-agent: *\nDisallow: /search?q=\n")])
    pages = spark.createDataFrame(
        [(0, "https://h.com/search?q=x"), (1, "https://h.com/search"),
         (2, "https://h.com/searchable?q=x")],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in robots_filter(pages, rules).collect()}
    assert kept == {1, 2}


def test_robots_pages_with_host_column_no_collision(spark):
    from geomesa_spark.functions.robots import robots_filter, robots_rules

    rules = robots_rules(spark, [("h.com", "User-agent: *\nDisallow: /x/\n")])
    pages = spark.createDataFrame(
        [(0, "https://h.com/x/1", "whatever"), (1, "https://h.com/y", "h.com")],
        "doc_id long, url string, host string",
    )
    out = robots_filter(pages, rules)
    assert {r["doc_id"] for r in out.collect()} == {1}
    assert set(out.columns) == {"doc_id", "url", "host"}


def test_spatial_join_rejects_nonpolygonal_build_side(spark):
    from geomesa_spark.operators.spatial_join import spatial_join

    df = spark.createDataFrame([(1, 5.0, 5.0)], "id long, lon double, lat double")
    t = as_geotable(df, dtg=None, fid="id")
    with pytest.raises(ValueError, match="polygonal"):
        spatial_join(t, [("l1", "LINESTRING (0 0, 10 10)")])


def test_density_geometries_offgrid_contributes_nothing(spark):
    from geomesa_spark.operators.aggregations import density_geometries

    df = spark.createDataFrame(
        [("POINT (55 5)",),                      # fully off-grid
         ("POLYGON ((50 0, 60 0, 60 5, 50 5, 50 0))",),  # off-grid polygon
         ("POINT (5 5)",)],                      # in-grid
        "wkt string",
    )
    out = density_geometries(df, "wkt", (0, 0, 10, 10), 10, 10).collect()
    total = sum(r["weight"] for r in out)
    assert total == 1.0  # only the in-grid point's mass


def test_stratified_sample_null_stratum_not_dropped(spark):
    from geomesa_spark.operators.corpus import stratified_sample

    df = spark.range(4000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit("en")).otherwise(F.lit(None)).alias("s"),
    )
    out = stratified_sample(df, "s", quota=200, id_col="id")
    sizes = {r["s"]: r["n"] for r in
             out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert None in sizes and abs(sizes[None] - 200) <= 60
    assert abs(sizes["en"] - 200) <= 60


def test_descriptive_stats_constant_large_group_std_zero(spark):
    from geomesa_spark.operators.corpus import descriptive_stats

    df = spark.createDataFrame(
        [("a", 1234567.891)] * 1000, "g string, v double")
    [r] = descriptive_stats(df, "g", "v").collect()
    assert r["std"] == 0.0  # decimal cancellation: exactly zero, not NaN
    assert abs(r["mean"] - 1234567.891) < 1e-3


# ---------------------------------------------------------------------------
# fourth review batch
# ---------------------------------------------------------------------------

def test_live_delete_in_later_batch_does_not_resurrect(spark, tmp_path):
    """A delete arriving in a LATER micro-batch than its create must win in
    live_snapshot: the tombstone now carries the delete's event time."""
    from geomesa_spark.streaming.live import live_snapshot, live_view

    src = tmp_path / "live_src"
    os.makedirs(src)
    schema = "offset long, kind string, id string, lon double, lat double, ts timestamp"
    t0 = dt.datetime(2024, 1, 1)
    b1 = [(0, "create", "a", 1.0, 1.0, t0),
          (1, "create", "b", 2.0, 2.0, t0 + dt.timedelta(seconds=1))]
    b2 = [(2, "delete", "a", None, None, t0 + dt.timedelta(minutes=1))]
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite").parquet(str(src / name))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    q = (
        live_view(stream, ttl_seconds=3600)
        .writeStream.format("memory").queryName("live_del_state")
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_live"))
        .start()
    )
    q.awaitTermination(60)
    state = {r["id"] for r in live_snapshot(spark, "live_del_state").collect()}
    assert state == {"b"}  # 'a' was deleted in a later batch: no resurrection


def test_cli_spec_positional_fields_offset(spark, tmp_path, capsys):
    """$1 in a CLI converter spec means the FIRST csv field ($0 = raw line)."""
    from geomesa_spark.cli import main

    catalog = str(tmp_path / "cat2")
    f = tmp_path / "d.csv"
    f.write_text("7,3.5,4.5\n8,bad,5.5\n")
    assert main(["create", "--catalog", catalog, "--name", "t2",
                 "--lon", "lon", "--lat", "lat", "--fid", "fid"]) == 0
    assert main([
        "ingest", "--catalog", catalog, "--name", "t2", "--file", str(f),
        "--format", "csv", "--fields", "fid,lon,lat",
        "--spec", "fid = $1", "--spec", "lon = toDouble($2)",
        "--spec", "lat = toDouble($3)",
    ]) == 0
    out = capsys.readouterr().out
    assert "ingested 2 features" in out
    data = os.path.join(catalog, "t2", "data")
    rows = {r["fid"]: (r["lon"], r["lat"])
            for r in spark.read.parquet(data).select("fid", "lon", "lat").collect()}
    assert rows["7"] == (3.5, 4.5)
    assert rows["8"][0] is None  # 'bad' -> NULL, job not aborted


def test_shapefile_deleted_record_alignment(spark, tmp_path):
    """A dbf-deleted record must drop WITH its geometry — attributes never
    shift onto the wrong shape."""
    from geomesa_spark.sources.shapefile import read_shapefile, write_shapefile_points

    df = spark.createDataFrame(
        [(1.0, 10.0, "first"), (2.0, 20.0, "second"), (3.0, 30.0, "third")],
        "lon double, lat double, name string",
    )
    base = str(tmp_path / "pts")
    write_shapefile_points(df.orderBy("lon"), base + ".shp", attrs=["name"])
    # flag record 0 deleted in the .dbf (header_size at bytes 8-9)
    import struct as _s

    dbf = bytearray((tmp_path / "pts.dbf").read_bytes())
    header_size = _s.unpack("<H", dbf[8:10])[0]
    dbf[header_size] = ord("*")
    (tmp_path / "pts.dbf").write_bytes(bytes(dbf))

    out = read_shapefile(spark, base + ".shp").collect()
    got = {r["NAME"]: r["wkt"] for r in out}  # dbf upper-cases field names
    assert set(got) == {"second", "third"}
    assert "2" in got["second"] and "3" in got["third"]  # paired correctly


def test_shapefile_empty_roundtrip(spark, tmp_path):
    from geomesa_spark.sources.shapefile import read_shapefile, write_shapefile_points

    df = spark.createDataFrame([], "lon double, lat double, name string")
    base = str(tmp_path / "empty")
    write_shapefile_points(df, base + ".shp", attrs=["name"])
    out = read_shapefile(spark, base + ".shp")
    assert out.count() == 0
    assert "wkt" in out.columns


def test_gml_null_property_keeps_row(spark):
    from geomesa_spark.sources.convert import to_gml

    df = spark.createDataFrame(
        [(1, 1.0, 2.0, None), (2, 3.0, 4.0, "x")],
        "fid long, lon double, lat double, name string",
    )
    lines = [r["g"] for r in df.select(
        to_gml(df, id_col="fid", props=["name"]).alias("g")).collect()]
    assert all(l is not None for l in lines)
    assert "<name></name>" in lines[0] and "<name>x</name>" in lines[1]


def test_cql_parenthesis_free_geometry_is_parse_error(spark):
    from geomesa_spark.plans.predicates import parse_cql

    with pytest.raises(ValueError, match="geometry literal"):
        parse_cql("INTERSECTS(geom, POINT EMPTY)")


# ---------------------------------------------------------------------------
# fifth review batch
# ---------------------------------------------------------------------------

def test_multipoint_bbox_and_predicate(spark):
    from geomesa_spark.geom.wkt import parse_wkt

    assert parse_wkt("MULTIPOINT (0 0, 1 2)").bbox() == (0.0, 0.0, 1.0, 2.0)
    assert parse_wkt("MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))").bbox() == (
        0.0, 0.0, 3.0, 3.0)
    # reachable through the query compiler
    from geomesa_spark.plans.compiler import compile_query

    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lon double, lat double")
    t = as_geotable(df, dtg=None, fid="id")
    got = compile_query(t, "INTERSECTS(geom, MULTIPOINT (0 0, 5 5))").df.collect()
    assert [r["id"] for r in got] == [1]


def test_registry_literal_separator_and_casts(spark):
    from geomesa_spark.functions.registry import resolve_function

    df = spark.createDataFrame([("a|b.c", "n/a", "new YORK city", "20240105")],
                               "s string, bad string, cap string, d string")
    row = df.select(
        resolve_function("toList")(F.col("s"), "|").alias("lst"),
        resolve_function("toInt")(F.col("bad")).alias("bad_int"),
        resolve_function("capitalize")(F.col("cap")).alias("cap"),
        resolve_function("isodate")(F.col("bad")).alias("bad_date"),
        resolve_function("isodate")(F.col("d")).alias("good_date"),
        resolve_function("wktPoint")(-122.3, 47.6).alias("pt"),
    ).collect()[0]
    assert row["lst"] == ["a", "b.c"]          # literal '|', not regex
    assert row["bad_int"] is None              # malformed -> NULL, no abort
    assert row["cap"] == "New YORK city"       # first char only
    assert row["bad_date"] is None
    assert row["good_date"] is not None
    assert row["pt"] == "POINT (-122.3 47.6)"  # numeric literals coerce


def test_bin_pack_hash_matches_bin_records_and_null_safety(spark):
    from geomesa_spark.operators.bin_export import bin_pack, bin_records
    from geomesa_spark.plans.compiler import GeoTable
    import struct as _s

    rows = [
        ("t1", 1.0, 2.0, dt.datetime(2024, 1, 1)),
        ("t1", 1.5, 2.5, dt.datetime(2024, 1, 2)),
        (None, 3.0, 4.0, dt.datetime(2024, 1, 3)),   # null track: dropped
        ("t2", 5.0, 6.0, None),                      # null dtg: dropped
        ("t2", 5.5, 6.5, dt.datetime(2040, 1, 1)),   # post-2038: wraps, no abort
    ]
    df = spark.createDataFrame(rows, "k string, lon double, lat double, dtg timestamp")
    t = GeoTable(df=df, lon="lon", lat="lat", dtg="dtg", fid=None)
    logical = {r["track"]: r["track_hash"] for r in bin_records(t, "k").collect()
               if r["track"] is not None}
    packed = {r["track"]: r for r in bin_pack(t, "k").collect()}
    assert set(packed) == {"t1", "t2"}
    assert packed["t1"]["n"] == 2 and packed["t2"]["n"] == 1
    for trk in ("t1", "t2"):
        h = _s.unpack("<i", bytes(packed[trk]["record_bytes"])[:4])[0]
        assert h == logical[trk]  # ONE hash across logical + packed forms


def test_geohash_precision_12_guard_and_cover_bail():
    import numpy as np
    from geomesa_spark.cells.geohash import geohash_cover_bbox, geohash_int

    with pytest.raises(ValueError, match="11"):
        geohash_int(np.array([0.0]), np.array([0.0]), 12)
    # continent-scale bbox at deep precision: falls back without
    # materializing millions of cells, result respects the cap
    cells = geohash_cover_bbox(-120, 10, -60, 60, precision=7, max_cells=512)
    assert 0 < len(cells) <= 512


# ---------------------------------------------------------------------------
# sixth review batch
# ---------------------------------------------------------------------------

def test_tiles_for_bbox_antimeridian_and_level_guard():
    from geomesa_spark.cells.tiles import tile_id, tiles_for_bbox

    cells = tiles_for_bbox(170.0, -10.0, -170.0, 10.0, 5)
    assert cells  # naive range enumeration would be empty
    west = int(tile_id(np.array([175.0]), np.array([0.0]), 5)[0])
    east = int(tile_id(np.array([-175.0]), np.array([0.0]), 5)[0])
    assert west in cells and east in cells
    # a mid-pacific-free cell is NOT included (two disjoint ranges, not all)
    mid = int(tile_id(np.array([0.0]), np.array([0.0]), 5)[0])
    assert mid not in cells
    with pytest.raises(ValueError, match="26"):
        tiles_for_bbox(0, 0, 1, 1, 27)
    from geomesa_spark.functions.zexpr import tile_id_expr

    with pytest.raises(ValueError, match="26"):
        tile_id_expr(F.lit(0.0), F.lit(0.0), 27)


def test_raster_query_cells_antimeridian():
    from geomesa_spark.cells.tiles import tile_id
    from geomesa_spark.operators.tiling import raster_query_cells

    cells = raster_query_cells((170.0, -10.0, -170.0, 10.0), 5)
    west = int(tile_id(np.array([175.0]), np.array([0.0]), 5)[0])
    assert west in cells


def test_simhash_max_hamming_guard(spark):
    from geomesa_spark.operators.dedup import simhash_near_pairs

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_pairs(df, "text", "doc_id", max_hamming=4)


def test_synth_corpus_mutate_exact_count(spark):
    from geomesa_spark.operators.dedup import synth_dedup_corpus

    base = synth_dedup_corpus(spark, n_groups=2, mutate=0).collect()
    mut = synth_dedup_corpus(spark, n_groups=2, mutate=7).collect()
    b = {r["doc_id"]: r["text"].split() for r in base}
    m = {r["doc_id"]: r["text"].split() for r in mut}
    for g in range(2):
        # role-1 doc differs from the role-0 doc in EXACTLY `mutate` tokens
        diffs = sum(x != y for x, y in zip(m[3 * g], m[3 * g + 1]))
        assert diffs == 7, diffs
    with pytest.raises(ValueError, match="mutate"):
        synth_dedup_corpus(spark, 1, mutate=61)


def test_check_oracle_unknown_name_fails():
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "scripts/check_oracle.py", "/root/testdata/sf0.001",
         "zz_not_a_query"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2
    assert "unknown query name" in r.stdout
