"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (geoparse -> spatial join -> tile
assignment, the BASELINE.json headline metric) at sf0.001. ``queries``
exposes one entry per implemented operator from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / ANN / text analysis);
``oracle_sql`` gives the DuckDB-equivalent SQL for every query whose
semantics are ANSI-SQL-expressible. Column names/types are aligned on both
sides (the driver hash-compares values after sorting columns by name).

Determinism notes (so the DuckDB oracle matches bit-for-bit):
* session timezone is forced to UTC in every builder (timestamps in the
  parquet are naive/UTC; DuckDB treats them the same way);
* geoparse/grid/tile keys are pure integer-and-double arithmetic written in
  the exact same operation order in both engines;
* distance comparisons (haversine) mirror operation-for-operation; outputs
  expose ids/ranks, never raw floats of transcendental results.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geomesa_spark.operators.aggregations import (
    bounds,
    count_by_day,
    density,
    temporal_density,
    unique_histogram,
)
from geomesa_spark.operators.ann import cosine_topk
from geomesa_spark.operators.bin_export import bin_records
from geomesa_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_near_pairs,
)
from geomesa_spark.operators.knn import knn_join
from geomesa_spark.operators.spatial_join import proximity_join, spatial_join
from geomesa_spark.operators.textstats import fingerprint, language_id, text_quality
from geomesa_spark.operators.tiling import tile_counts, tile_rollup
from geomesa_spark.operators.tube import tube_select
from geomesa_spark.plans.compiler import GeoTable, query
from geomesa_spark.sources.layout import as_geotable
from geomesa_spark.functions.urls import canonicalize_url, domain_stats, url_dedup
from geomesa_spark.sources.webpages import (
    extract_text,
    geoparse,
    raw_url_expr,
    webpages_from_documents,
)

# ---------------------------------------------------------------------------
# shared fixtures (deterministic, embedded in both engines)
# ---------------------------------------------------------------------------

SF_DEFAULT = "/root/testdata/sf0.001"

# geoparse arithmetic (sources/webpages.py geoparse) as a DuckDB CTE
_PTS_CTE = (
    "pts AS (SELECT *, "
    "CAST(-180.0 + (event_id * 7919 % 36000) / 100.0 AS DOUBLE) AS lon, "
    "CAST(-90.0 + (event_id * 104729 % 18000) / 100.0 AS DOUBLE) AS lat, "
    "CAST(floor(epoch(ts)) AS BIGINT) AS secs "
    "FROM events)"
)

# spatial fixtures: corners at *.005 so no geoparsed grid point (always at
# hundredths) ever sits exactly on a boundary -> inclusive/exclusive agnostic
_BOXES = [
    ("box_eu", -10.005, 35.005, 30.005, 60.005),
    ("box_na", -125.005, 25.005, -65.005, 50.005),
    ("box_au", 110.005, -45.005, 155.005, -10.005),
]
_TRI = (
    ("tri_a", (-20.005, -10.005), (40.005, -10.005), (10.005, 50.005)),
)
_KNN_QUERIES = [("q0", 0.0, 0.0), ("q1", 100.0, 40.0), ("q2", -150.0, -70.0), ("q3", 20.0, 60.0)]
_SITES = [("s0", 10.0, 20.0), ("s1", -100.0, 40.0), ("s2", 140.0, -30.0)]
_PROX_M = 300_000.0
_DW_LON, _DW_LAT, _DW_M = 10.0, 20.0, 500_000.0
_TRACK = [
    (datetime(2024, 1, 2, 0, 0, tzinfo=timezone.utc), -50.0, -20.0),
    (datetime(2024, 1, 2, 6, 0, tzinfo=timezone.utc), -30.0, -10.0),
    (datetime(2024, 1, 2, 12, 0, tzinfo=timezone.utc), -10.0, 0.0),
]
_TUBE_BUFFER_M = 2_000_000.0
_TUBE_BIN_S = 21_600.0


def _utc(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _events_pts(spark: SparkSession, sf_dir: str) -> GeoTable:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return GeoTable(geoparse(ev, "event_id"), lon="lon", lat="lat", dtg="ts", fid="event_id")


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    """Documents table. ``spread=True`` repartitions an under-split input
    across the cluster: a single parquet split serializes every per-doc
    text kernel behind one task — and that includes the WIDE CODEGEN chains
    (lang-id CASE tree ~0.6 ms/row, quality ratios, winnowing), measured
    3-5x slower unspread. Only trivially-cheap consumers (md5 dedup, point
    geoparse) pass ``spread=False``: there the shuffle costs more than the
    work. At real scale the corpus arrives in thousands of splits and the
    partition-count guard makes this a no-op either way."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if spread:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    return df


def _poly_wkts() -> list[tuple[str, str]]:
    polys = [
        (pid, f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")
        for pid, x0, y0, x1, y1 in _BOXES
    ]
    for pid, a, b, c in _TRI:
        polys.append((
            pid,
            f"POLYGON(({a[0]} {a[1]}, {b[0]} {b[1]}, {c[0]} {c[1]}, {a[0]} {a[1]}))",
        ))
    return polys


# haversine SQL mirroring geom/distance.py::haversine_expr operation order
# (the shared column-vs-column kernel behind knn/tube/proximity)
def _hav_sql(qlon: str, qlat: str) -> str:
    return (
        f"2.0 * 6371008.8 * asin(sqrt(least(1.0, "
        f"pow(sin((radians({qlat}) - radians(lat)) / 2), 2) "
        f"+ cos(radians(lat)) * cos(radians({qlat})) "
        f"* pow(sin(radians({qlon} - lon) / 2), 2))))"
    )


def _tri_sql(pt=("lon", "lat")) -> str:
    """Half-plane membership test for the (CCW) fixture triangle."""
    (ax, ay), (bx, by), (cx, cy) = _TRI[0][1], _TRI[0][2], _TRI[0][3]
    px, py = pt
    e = []
    for (x1, y1), (x2, y2) in [((ax, ay), (bx, by)), ((bx, by), (cx, cy)), ((cx, cy), (ax, ay))]:
        e.append(f"(({x2!r} - {x1!r}) * ({py} - {y1!r}) - ({y2!r} - {y1!r}) * ({px} - {x1!r})) > 0")
    return "(" + " AND ".join(e) + ")"


# ---------------------------------------------------------------------------
# entry: flagship pipeline
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geoparse web pages -> spatial join vs polygon set -> tile
    assignment (the BASELINE.json headline operation) at sf0.001."""
    _utc(spark)
    pages = webpages_from_documents(spark, SF_DEFAULT)
    pages = pages.withColumn("text_ok", extract_text(F.col("html")) == F.col("text"))
    pts = geoparse(pages, "doc_id")
    t = GeoTable(pts, lon="lon", lat="lat", dtg="warc_ts", fid="doc_id")
    joined = spatial_join(t, _poly_wkts())
    from geomesa_spark.functions.zexpr import tile_id_expr

    return joined.select(
        "doc_id", "url", "poly_id", "lon", "lat", "text_ok",
        tile_id_expr(F.col("lon"), F.col("lat"), 8).alias("tile_id"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_bbox(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return query(t, "BBOX(geom, -50, -20, 30, 45)").select("event_id")


def _q_bbox_time(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    cql = ("BBOX(geom, -120, -60, 60, 70) AND "
           "ts DURING 2024-01-05T00:00:00Z/2024-01-20T00:00:00Z")
    return query(t, cql).select("event_id")


def _q_bbox_s2(spark, sf_dir):
    """BBOX via the true spherical S2 cell path (cells/s2.py): vectorized
    cube-face-Hilbert leaf encode in one Arrow batch pass, driver-side
    rectangle cover (a SUPERSET by construction), OR-of-BETWEEN prefilter
    on the sorted-able int64 cell id, exact lon/lat residual — the same
    cover+residual split as the Z3 plan (reference:
    geomesa-z3 Z3.scala zranges -> range scan + fine filter), but on
    spherical cells whose leaf ranges are exact, no prefix tree needed.
    Oracle = the plain bbox SQL: superset cover + exact residual make the
    S2 plan's result identical to the naive filter.
    """
    import functools
    import operator

    from geomesa_spark.cells.s2 import cover_rect
    from geomesa_spark.functions.zudf import s2_leaf_udf

    ev = geoparse(
        _utc(spark).read.parquet(f"{sf_dir}/events.parquet"), "event_id"
    )
    ranges = cover_rect(-50.0, -20.0, 30.0, 45.0, level=6, max_cells=32)
    pre = functools.reduce(
        operator.or_, [F.col("__s2").between(a, b) for a, b in ranges]
    )
    return (
        ev.withColumn("__s2", s2_leaf_udf(F.col("lon"), F.col("lat")))
        .where(pre)
        .where(
            (F.col("lon") >= -50.0) & (F.col("lon") <= 30.0)
            & (F.col("lat") >= -20.0) & (F.col("lat") <= 45.0)
        )
        .select("event_id")
    )


_LAYOUT_CACHE = "/tmp/geomesa_layout"


def _source_fingerprint(sf_dir: str, table: str) -> str:
    """Cache key component from the source parquet's size+mtime: if the
    driver regenerates the testdata between rounds, stale layouts must not
    answer for it. Single-file tables keep the original ``size_mtime``
    format (existing cache keys stay valid); a DIRECTORY table (partitioned
    write) is walked recursively — file count + total bytes + newest
    mtime_ns — because the directory's own stat misses in-place rewrites
    of nested part files."""
    import os

    p = f"{sf_dir}/{table}.parquet"
    try:
        if os.path.isdir(p):
            total, newest, n = 0, 0, 0
            for root, _dirs, files in os.walk(p):
                for fname in files:
                    st = os.stat(os.path.join(root, fname))
                    total += st.st_size
                    newest = max(newest, st.st_mtime_ns)
                    n += 1
            return f"{n}_{total}_{newest}"
        st = os.stat(p)
        return f"{st.st_size}_{int(st.st_mtime)}"
    except OSError:
        return "nosrc"


def _layout_events(spark, sf_dir):
    """Materialized z3 layout of the events points (written once per sf_dir,
    reused across runs): week-partitioned, z3-sorted, with an attribute
    secondary copy on event_type. This is the path a real deployment
    queries — the driver suite exercises it so the index's pruning shows up
    in the bench, not just in write-path tests."""
    import os

    from geomesa_spark.sources.layout import read_layout, write_layout

    name = f"{sf_dir.strip('/').replace('/', '_')}_{_source_fingerprint(sf_dir, 'events')}"
    path = f"{_LAYOUT_CACHE}/{name}_events"
    # gate on the whole-layout marker (written after main + _attr + _st),
    # not the main table's _SUCCESS — a crash mid-fanout must rebuild
    if not os.path.exists(os.path.join(path, "_LAYOUT_SUCCESS")):
        t = _events_pts(spark, sf_dir)
        write_layout(t.df, path, lon="lon", lat="lat", dtg="ts", fid="event_id",
                     attr_indexes=["event_type"], st_copy=True)
    return read_layout(spark, path, lon="lon", lat="lat", dtg="ts", fid="event_id",
                       attr_indexes=["event_type"],
                       cardinality={"event_type": "high"}, st_copy=True)


def _q_bbox_time_indexed(spark, sf_dir):
    """Same predicate as bbox_time, answered from the materialized layout
    (week partition prune + z3-range row-group skipping)."""
    t = _layout_events(_utc(spark), sf_dir)
    cql = ("BBOX(geom, -120, -60, 60, 70) AND "
           "ts DURING 2024-01-05T00:00:00Z/2024-01-20T00:00:00Z")
    return query(t, cql).select("event_id")


def _q_bbox_indexed(spark, sf_dir):
    """Time-unbounded BBOX through the layout's z2-sorted ST copy
    (z2-st strategy: the spatial-only sort makes the z2 ranges skip)."""
    t = _layout_events(_utc(spark), sf_dir)
    return query(t, "BBOX(geom, -50, -20, 30, 45)").select("event_id")


def _q_attr_filter_indexed(spark, sf_dir):
    """Same predicate as attr_filter, routed to the attribute-sorted
    secondary copy (attr-idx strategy; PushedFilter + row-group skip)."""
    t = _layout_events(_utc(spark), sf_dir)
    return query(t, "event_type = 'click' AND value >= 50.0").select("event_id")


def _q_intersects(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    (ax, ay), (bx, by), (cx, cy) = _TRI[0][1], _TRI[0][2], _TRI[0][3]
    cql = f"INTERSECTS(geom, POLYGON(({ax} {ay}, {bx} {by}, {cx} {cy}, {ax} {ay})))"
    return query(t, cql).select("event_id")


_GEOM_BOX = (-50.0025, -20.0025, 30.0025, 45.0025)


def _geom_rows(spark, sf_dir):
    """Geometry-typed rows derived from events: even ids become axis-aligned
    square polygons (half-size keyed to the id), odd ids horizontal line
    segments — shapes whose exact box-intersection an ANSI oracle can state
    while the engine runs the generic WKT kernels."""
    t = _events_pts(spark, sf_dir)
    lon, lat = F.col("lon"), F.col("lat")
    h = F.lit(0.055) + (F.col("event_id") % 10).cast("double") * F.lit(0.02)
    ll = F.lit(0.065) + (F.col("event_id") % 7).cast("double") * F.lit(0.03)
    sq = F.format_string(
        "POLYGON ((%s %s, %s %s, %s %s, %s %s, %s %s))",
        lon - h, lat - h, lon + h, lat - h, lon + h, lat + h,
        lon - h, lat + h, lon - h, lat - h,
    )
    ln = F.format_string("LINESTRING (%s %s, %s %s)", lon - ll, lat, lon + ll, lat)
    wkt = F.when(F.col("event_id") % 2 == 0, sq).otherwise(ln)
    return t.df.select("event_id", wkt.alias("wkt"))


def _q_bbox_geoms(spark, sf_dir):
    """BBOX over non-point geometry rows through the cell-decomposed layout
    (explode per cover cell, cell-range prune, exact kernel on straddlers,
    id dedupe — STIndexEntry.scala:43-61 / IndexSchema.scala:298-307)."""
    from geomesa_spark.sources.geom_layout import query_geom_bbox

    lay = _geom_layout(_utc(spark), sf_dir)
    return query_geom_bbox(lay, _GEOM_BOX, fid="event_id").select("event_id")


def _geom_layout(spark, sf_dir):
    """Cell-decomposed layout of the geometry rows (written once per
    sf_dir, shared by the bbox and join entries)."""
    import os

    from geomesa_spark.sources.geom_layout import read_geom_layout, write_geom_layout

    name = f"{sf_dir.strip('/').replace('/', '_')}_{_source_fingerprint(sf_dir, 'events')}"
    path = f"{_LAYOUT_CACHE}/{name}_geoms"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_geom_layout(_geom_rows(spark, sf_dir), path, wkt_col="wkt")
    return read_geom_layout(spark, path)


def _q_spatial_join_geoms(spark, sf_dir):
    """Non-point spatial join: geometry rows (squares + horizontal
    segments) against the axis-aligned reference boxes through the
    cell-decomposed layout (geometry-shaped cover equi-join + codegen
    bbox cut + exact kernel + (row, poly) dedupe,
    ``geom_layout.geom_spatial_join``). Axis-aligned build side keeps the
    oracle pure interval arithmetic while the engine runs the generic WKT
    kernels."""
    from geomesa_spark.sources.geom_layout import geom_spatial_join

    lay = _geom_layout(_utc(spark), sf_dir)
    box_polys = [
        (pid, f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")
        for pid, x0, y0, x1, y1 in _BOXES
    ]
    return geom_spatial_join(lay, box_polys, fid="event_id").select(
        "event_id", "poly_id"
    )


def _q_within(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    (ax, ay), (bx, by), (cx, cy) = _TRI[0][1], _TRI[0][2], _TRI[0][3]
    cql = f"WITHIN(geom, POLYGON(({ax} {ay}, {bx} {by}, {cx} {cy}, {ax} {ay})))"
    return query(t, cql).select("event_id")


def _q_contains_pt(spark, sf_dir):
    """CONTAINS over point rows: only rows whose geometry equals the literal
    point match (events sharing event 42's geoparsed grid point)."""
    t = _events_pts(_utc(spark), sf_dir)
    lon42 = -180.0 + (42 * 7919 % 36000) / 100.0
    lat42 = -90.0 + (42 * 104729 % 18000) / 100.0
    return query(t, f"CONTAINS(geom, POINT({lon42!r} {lat42!r}))").select("event_id")


def _q_disjoint(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    (ax, ay), (bx, by), (cx, cy) = _TRI[0][1], _TRI[0][2], _TRI[0][3]
    cql = (
        f"BBOX(geom, -60, -60, 60, 60) AND "
        f"DISJOINT(geom, POLYGON(({ax} {ay}, {bx} {by}, {cx} {cy}, {ax} {ay})))"
    )
    return query(t, cql).select("event_id")


def _q_dwithin(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    cql = f"DWITHIN(geom, POINT({_DW_LON} {_DW_LAT}), {_DW_M}, meters)"
    return query(t, cql).select("event_id")


def _q_attr_filter(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return query(t, "event_type = 'click' AND value >= 50.0").select("event_id")


def _q_record_lookup(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return query(t, "event_id IN (5, 42, 999, 4999)").select("event_id", "event_type", "user_id")


def _q_or_union(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return query(
        t, "BBOX(geom, -50, -20, 30, 45) OR event_type = 'error'"
    ).select("event_id")


def _q_knn(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return knn_join(t, _KNN_QUERIES, k=10).select("query_id", "event_id")


def _q_knn_hex(spark, sf_dir):
    """kNN via ring expansion over hex neighborhoods (knn.knn_hex_ring,
    res=2, k=10) — the north-star's "kNN via ring-expansion over H3
    neighborhoods" literally: a degree search radius doubles per round,
    each round covered by the hex-cell disk of the finest resolution
    under the cover cap (per-round coarsening, like the tile twin's
    level re-pick), sized so the PROVABLE bound — points outside
    disk(D) are >= 1.5*s*(D+1) - 2s away (min center displacement at
    hex distance D is 1.5*s*D) — makes candidates a superset of the
    radius ball; a query finalizes when its k-th best distance is
    STRICTLY under the radius (an exact-radius tie with a smaller id
    could still win the (dist, id) tie-break), and the whole-plane
    final round joins all points. The oracle is index-free exact
    top-10 by the same euclidean-degree metric — candidate generation
    must not change the answer, only the work."""
    from geomesa_spark.operators.knn import knn_hex_ring

    t = _events_pts(_utc(spark), sf_dir)
    return knn_hex_ring(t, _KNN_QUERIES, k=10, res=2).select("query_id", "event_id")


def _q_proximity(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return proximity_join(t, _SITES, _PROX_M).select("site_id", "event_id")


def _q_tube(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return tube_select(t, _TRACK, _TUBE_BUFFER_M, _TUBE_BIN_S).select("tube_bin", "event_id")


def _q_spatial_join_boxes(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    polys = [
        (pid, f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")
        for pid, x0, y0, x1, y1 in _BOXES
    ]
    return spatial_join(t, polys).select("poly_id", "event_id")


def _q_spatial_join_poly(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return spatial_join(t, _poly_wkts()).select("poly_id", "event_id")


def _q_density(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return density(t, (-180.0, -90.0, 180.0, 90.0), 64, 32)


def _q_temporal_density(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return temporal_density(
        t,
        datetime(2024, 1, 1, tzinfo=timezone.utc),
        datetime(2024, 1, 31, tzinfo=timezone.utc),
        30,
    )


def _q_unique_hist(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return unique_histogram(t, "event_type", sort_by="count", descending=True)


def _q_count_by_day(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return count_by_day(GeoTable(t.df, lon="lon", lat="lat", dtg="ts", fid="event_id"))


def _q_bounds(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return bounds(t)


def _q_tile_counts(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return tile_counts(t, level=6)


def _q_surface(spark, sf_dir):
    """Surface aggregation: per-cell max of an attribute
    (SurfaceAggregatingIterator analog)."""
    from geomesa_spark.functions.zexpr import tile_id_expr
    from geomesa_spark.operators.aggregations import surface

    t = _events_pts(_utc(spark), sf_dir)
    cells = t.df.select(
        tile_id_expr(F.col("lon"), F.col("lat"), 6).alias("cell"), "value"
    )
    return surface(cells, "cell", "value")


def _q_tile_rollup(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return tile_rollup(tile_counts(t, level=6), from_level=6, to_level=4)


def _q_bin_records(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return bin_records(t, "user_id").select("track", "secs", "lat", "lon")


def _q_geoparse_docs(spark, sf_dir):
    d = geoparse(_docs(_utc(spark), sf_dir, spread=False), "doc_id")
    return d.select("doc_id", "lon", "lat")


def _q_extract_text(spark, sf_dir):
    pages = webpages_from_documents(_utc(spark), sf_dir)
    return pages.select("doc_id", extract_text(F.col("html")).alias("text"))


def _q_dedup_exact(spark, sf_dir):
    return exact_dedup(_docs(_utc(spark), sf_dir, spread=False), "text", "doc_id")


_DEDUP_GROUPS = 100


def _q_minhash_lsh(spark, sf_dir):
    """MinHash-LSH over the planted corpus: expected pairs are exactly
    {(3g, 3g+1)} by construction (mutate=2 -> shingle Jaccard ~0.87, far
    above the 0.5 threshold; groups share no vocabulary so cross-group
    estimates are ~0)."""
    from geomesa_spark.operators.dedup import synth_dedup_corpus

    docs = _cached_table(
        _utc(spark), f"dedup_corpus_m2_{_DEDUP_GROUPS}",
        lambda s: synth_dedup_corpus(s, _DEDUP_GROUPS, mutate=2),
    )
    return minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).select(
        "id_a", "id_b"
    )


def _q_simhash(spark, sf_dir):
    """SimHash banding over the planted corpus with exact-copy pairs:
    hamming(base, copy) = 0, all other docs share no tokens."""
    from geomesa_spark.operators.dedup import synth_dedup_corpus

    docs = _cached_table(
        _utc(spark), f"dedup_corpus_m0_{_DEDUP_GROUPS}",
        lambda s: synth_dedup_corpus(s, _DEDUP_GROUPS, mutate=0),
    )
    return simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).select(
        "id_a", "id_b", "hamming"
    )


def _q_ann_cosine(spark, sf_dir):
    emb = _utc(spark).read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()
    qs = [(f"q{r['vec_id']}", list(r["embedding"])) for r in qrows]
    return cosine_topk(emb, qs, k=5).select("query_id", "vec_id", "rank")


_ANN_DIM = 16
_ANN_BASE = 200
_ANN_QUERIES = 3
_ANN_COPIES = 5


def _emb_component(vec_id: int, d: int) -> float:
    """Deterministic pseudo-random component, mirrored as a Spark expr.

    Lehmer-mixed: a plain linear-congruential form makes ids a fixed stride
    apart near-constant-offset vectors (cosine ~1 across families), which
    broke the embed_dedup oracle."""
    return ((vec_id * 73856093 + d * 19349663 + 7) * 48271 % 2147483647) % 2000 / 1000.0 - 1.0


def _cached_table(spark, name: str, build) -> DataFrame:
    """Materialize a deterministic synthetic table to parquet once and scan
    it thereafter: the generator expression trees (nested transform/
    sequence) cost seconds of codegen per query; a scan costs nothing and
    parquet round-trips doubles bit-exactly, so every planted oracle is
    unaffected. Atomic rename guards concurrent builders."""
    import os

    path = f"{_LAYOUT_CACHE}/{name}.parquet"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        tmp = f"{path}.tmp{os.getpid()}"
        # a few files, not one: a single split would serialize the Arrow
        # kernels that consume these tables behind one task
        build(spark).repartition(8).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:  # lost the race: someone else finished first
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)


def _synth_planted_embeddings(spark):
    """Planted ANN table: 200 deterministic base vectors + 5 power-of-two
    scaled copies of each of the first 3 (scaling by 2^j is IEEE-exact, so
    a copy's hyperplane signs and cosine-to-query are bit-identical to the
    base's self-similarity -> the expected top-k is analytic). Served from
    the parquet cache (see :func:`_cached_table`); the generator constants
    are part of the cache key so changing them can never serve stale rows."""
    name = f"planted_embeddings_{_ANN_BASE}_{_ANN_QUERIES}_{_ANN_COPIES}_{_ANN_DIM}"
    return _cached_table(spark, name, _build_planted_embeddings)


def _build_planted_embeddings(spark):
    base = spark.range(0, _ANN_BASE).select(
        F.col("id").alias("vec_id"), F.col("id").alias("base_id"),
        F.lit(1.0).alias("scale"),
    )
    copies = (
        spark.range(0, _ANN_QUERIES * _ANN_COPIES)
        .select(
            (F.lit(1000) + (F.col("id") / _ANN_COPIES).cast("long") * 10
             + F.col("id") % _ANN_COPIES).alias("vec_id"),
            (F.col("id") / _ANN_COPIES).cast("long").alias("base_id"),
            F.pow(F.lit(2.0), (F.col("id") % _ANN_COPIES + 1).cast("double")).alias("scale"),
        )
    )
    rows = base.unionByName(copies)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(_ANN_DIM - 1)),
        lambda d: F.col("scale")
        * (
            ((F.col("base_id") * 73856093 + d * 19349663 + 7) * 48271
             % 2147483647 % 2000).cast("double") / 1000.0 - 1.0
        ),
    )
    return rows.select("vec_id", vec.cast("array<double>").alias("embedding"))


def _q_ann_lsh(spark, sf_dir):
    from geomesa_spark.operators.ann import lsh_cosine_topk

    emb = _synth_planted_embeddings(_utc(spark))
    qs = [
        (f"q{i}", [_emb_component(i, d) for d in range(_ANN_DIM)])
        for i in range(_ANN_QUERIES)
    ]
    return lsh_cosine_topk(emb, qs, k=5).select("query_id", "vec_id", "rank")


_NPY_MEMO: dict = {}


def _cached_npy(filename: str, build):
    """Process-memo + disk-cached numpy artifact (IVF centroids, PQ
    codebooks): one-time trained index artifacts over the deterministic
    planted corpus, reusable across driver processes like the materialized
    layout. ``filename`` must embed every generator AND training parameter
    (same discipline as _cached_table) so a parameter change never serves a
    stale artifact. Writes are tmp + os.replace: a bare np.save would let a
    concurrent driver np.load a half-written file."""
    import os

    import numpy as _np

    arr = _NPY_MEMO.get(filename)
    if arr is not None:
        return arr
    cpath = os.path.join(_LAYOUT_CACHE, filename)
    if os.path.exists(cpath):
        arr = _np.load(cpath)
    else:
        arr = build()
        os.makedirs(_LAYOUT_CACHE, exist_ok=True)
        tmp = f"{cpath}.{os.getpid()}.tmp.npy"
        _np.save(tmp, arr)
        os.replace(tmp, cpath)
    _NPY_MEMO[filename] = arr
    return arr


def _q_ann_ivf(spark, sf_dir):
    """IVF coarse-quantizer ANN over the planted table. Power-of-two copies
    normalize to the bit-identical unit vector, so they land in the query's
    own (first-probed) cell with cosine exactly 1 — the analytic top-k is
    the same as ann_lsh's regardless of centroid jitter.

    Training is a one-time INDEX BUILD, not a per-query cost: centroids are
    trained once per process on a 50% sample (k-means needs ~100s of points
    per cell, never the corpus) and memoized — mirroring a real deployment
    where centroids + the persisted cell column (``assign_ivf_cells``) live
    with the table layout and each query is just a broadcast equi-join on
    the probed cell ids."""
    from geomesa_spark.operators.ann import ivf_cosine_topk, train_ivf_centroids

    emb = _synth_planted_embeddings(_utc(spark))
    cents = _cached_npy(
        f"ivf_planted_centroids_{_ANN_BASE}_{_ANN_QUERIES}_{_ANN_COPIES}"
        f"_{_ANN_DIM}_c8_i2_s050.npy",
        lambda: train_ivf_centroids(emb, n_cells=8, iters=2, sample_fraction=0.5),
    )
    qs = [
        (f"q{i}", [_emb_component(i, d) for d in range(_ANN_DIM)])
        for i in range(_ANN_QUERIES)
    ]
    return ivf_cosine_topk(emb, qs, k=5, n_cells=8, nprobe=2, centroids=cents).select(
        "query_id", "vec_id", "rank"
    )


def _q_embed_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs over the planted table: every pair
    within a {base, 5 scaled copies} family has cosine exactly 1; all
    family members share every LSH band (identical hyperplane signs), so
    the expected output is the full C(6,2) pair set per family."""
    from geomesa_spark.operators.ann import embedding_near_pairs

    emb = _synth_planted_embeddings(_utc(spark))
    return embedding_near_pairs(emb, threshold=0.9999).select("id_a", "id_b")


def _q_ngram_jaccard(spark, sf_dir):
    from geomesa_spark.operators.dedup import ngram_jaccard_exact

    # max_gram_df=None: the oracle computes UNGUARDED exact Jaccard, so the
    # engine must too — the hot-gram cap is the production default, but a
    # capped engine vs an uncapped oracle would diverge the moment any gram
    # exceeded the cap's document frequency (per the operator's docstring)
    return ngram_jaccard_exact(
        _docs(_utc(spark), sf_dir), "text", "doc_id", n=3, threshold=0.4,
        max_gram_df=None,
    )


def _messages(spark, sf_dir):
    """Deterministic GeoMessage log derived from events (FIXTURES-style)."""
    t = _events_pts(spark, sf_dir)
    return t.df.select(
        F.col("event_id").alias("offset"),
        F.when(F.col("event_id") % 17 == 0, F.lit("delete"))
        .otherwise(F.lit("create"))
        .alias("kind"),
        F.col("user_id").cast("string").alias("id"),
        "lon",
        "lat",
        "ts",
    )


def _q_replay(spark, sf_dir):
    from geomesa_spark.streaming.live import replay_snapshot

    return replay_snapshot(
        _messages(_utc(spark), sf_dir), datetime(2024, 1, 20, tzinfo=timezone.utc)
    )


def _q_map_agg_json(spark, sf_dir):
    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_total")
    )


def _q_knn_ring(spark, sf_dir):
    from geomesa_spark.operators.knn import knn_ring_expansion

    t = _events_pts(_utc(spark), sf_dir)
    return knn_ring_expansion(
        t, _KNN_QUERIES, k=10, r0_m=2_000_000.0, max_radius_m=30_000_000.0
    ).select("query_id", "event_id")


def _q_media_features(spark, sf_dir):
    """Feature extraction exploded to scalar (media_id, kind, dim, val) rows
    so the driver canonicalizer can sort/hash them (arrays are unhashable)."""
    from geomesa_spark.operators.multimodal import media_features, synth_media

    feats = media_features(synth_media(_utc(spark), 2000))
    return feats.select(
        "media_id", "kind", F.posexplode("feat").alias("dim", "val")
    )


def _q_frame_sample(spark, sf_dir):
    """Frame payloads are ASCII by construction; cast to string so the
    oracle can compare them as text."""
    from geomesa_spark.operators.multimodal import sample_frames, synth_media

    frames = sample_frames(synth_media(_utc(spark), 1000), every_n=30)
    return frames.select(
        "media_id", "frame_idx", F.col("frame").cast("string").alias("frame_str")
    )


_VIS_CASE = (
    "CASE event_type WHEN 'click' THEN 'ops' WHEN 'view' THEN '' "
    "WHEN 'purchase' THEN 'ops&pii' WHEN 'signup' THEN 'pii|admin' "
    "ELSE 'admin&(ops|sec)' END"
)


def _q_vis_filter(spark, sf_dir):
    """Accumulo-style visibility filtering over a derived marking column
    (boolean label expressions; runtime/security.py). Auths {ops, sec}:
    'ops' and '' visible, 'ops&pii' not (no pii), 'pii|admin' not,
    'admin&(ops|sec)' not (no admin). The oracle states the same CASE +
    the precomputed visible set."""
    from geomesa_spark.runtime.security import visibility_filter

    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    marked = ev.withColumn("vis", F.expr(_VIS_CASE))
    return visibility_filter(marked, "vis", {"ops", "sec"}).select(
        "event_id", "vis"
    )


def _q_convert_avro(spark, sf_dir):
    """Avro container ingest end-to-end WITHOUT spark-avro: a deterministic
    OCF (first 200 events, deflate codec) is written once per sf_dir, then
    read back through the distributed binaryFile + pure-python OCF decode
    fallback (sources/avro_codec.py). The oracle states the same rows
    straight from the events parquet — matching proves byte-level decode
    fidelity (zigzag longs, IEEE doubles, strings, codec)."""
    import os

    from geomesa_spark.sources.avro_codec import write_container
    from geomesa_spark.sources.convert import avro_ingest

    _utc(spark)
    name = f"{sf_dir.strip('/').replace('/', '_')}_{_source_fingerprint(sf_dir, 'events')}"
    path = f"{_LAYOUT_CACHE}/{name}_avro"
    marker = os.path.join(path, "part0.avro")
    if not os.path.exists(marker):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        rows = (
            ev.filter(F.col("event_id") < 200)
            .select("event_id", "user_id", "event_type", "value")
            .collect()
        )
        schema = {
            "type": "record", "name": "Event",
            "fields": [
                {"name": "event_id", "type": "long"},
                {"name": "user_id", "type": "long"},
                {"name": "event_type", "type": "string"},
                {"name": "value", "type": "double"},
            ],
        }
        recs = sorted(
            ({k: r[k] for k in ("event_id", "user_id", "event_type", "value")}
             for r in rows),
            key=lambda r: r["event_id"],
        )
        os.makedirs(path, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "wb") as f:
            f.write(write_container(schema, recs, codec="deflate"))
        os.replace(tmp, marker)
    return avro_ingest(spark, path).select(
        "event_id", "user_id", "event_type", "value"
    )


def _q_convert_delimited(spark, sf_dir):
    """Converter end-to-end via STRING specs (the reference's expression
    language): events formatted to pipe-delimited lines, parsed back through
    a parsed spec; oracle is the original table. $0 is the raw line, $1..n
    the split fields (Transformers.scala ref semantics)."""
    from geomesa_spark.functions.dsl import parse_spec
    from geomesa_spark.sources.convert import apply_converter, delimited_text

    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    lines = ev.select(
        F.format_string("%s|'%s'|%s", F.col("event_id"), F.col("event_type"), F.col("value"))
        .alias("line")
    )
    raw = delimited_text(lines, "line", "|", ["f0", "f1", "f2"])
    spec = parse_spec(
        [
            "event_id = toLong($1)",
            "event_type = stripQuotes($2)",
            "value = toDouble($3)",
        ],
        fields=["line", "f0", "f1", "f2"],
    )
    return apply_converter(raw, spec)


def _q_transform_project(spark, sf_dir):
    """Query.properties transform surface: projection + derived expressions
    through the function registry (QueryPlanner.scala:234-297)."""
    t = _events_pts(_utc(spark), sf_dir)
    return query(
        t,
        "BBOX(geom, -50, -20, 30, 45)",
        properties=[
            "event_id",
            "label=strConcat(event_type, '-tag')",
            "v2=toDouble(value)",
        ],
    )


def _q_dms_parse(spark, sf_dir):
    """DMS coordinate parsing over synthesized DMS strings."""
    from geomesa_spark.sources.convert import dms_to_decimal

    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    dms = F.format_string(
        "%s:%s:%s%s",
        (F.col("event_id") % 89).cast("int"),
        (F.col("event_id") % 60).cast("int"),
        (F.col("event_id") % 57).cast("int"),
        F.when(F.col("event_id") % 2 == 0, F.lit("N")).otherwise(F.lit("S")),
    )
    return ev.select("event_id", dms_to_decimal(dms).alias("lat_dec"))


def _q_bbox_idl(spark, sf_dir):
    t = _events_pts(_utc(spark), sf_dir)
    return query(t, "BBOX(geom, 170, -60, -170, 60)").select("event_id")


def _q_geojson_roundtrip(spark, sf_dir):
    """GeoJSON export fidelity via parse-back (string formatting stays
    engine-local; the oracle checks the extracted coordinates)."""
    from geomesa_spark.sources.convert import to_geojson

    t = _events_pts(_utc(spark), sf_dir)
    gj = to_geojson(t.df, "lon", "lat", id_col="event_id")
    out = t.df.select(F.col("event_id"), gj.alias("gj"))
    return out.select(
        "event_id",
        F.get_json_object("gj", "$.geometry.coordinates[0]").cast("double").alias("gj_lon"),
        F.get_json_object("gj", "$.geometry.coordinates[1]").cast("double").alias("gj_lat"),
    )


def _q_gml_roundtrip(spark, sf_dir):
    """GML 2 export fidelity via parse-back (same contract as
    geojson_roundtrip: the oracle checks the extracted coordinates; the
    double->string->double round-trip is exact)."""
    from geomesa_spark.sources.convert import to_gml

    t = _events_pts(_utc(spark), sf_dir)
    gml = to_gml(t.df, "lon", "lat", id_col="event_id")
    out = t.df.select(F.col("event_id"), gml.alias("g"))
    coords = r"<gml:coordinates>([^,]+),([^<]+)</gml:coordinates>"
    return out.select(
        "event_id",
        F.regexp_extract("g", coords, 1).cast("double").alias("gml_lon"),
        F.regexp_extract("g", coords, 2).cast("double").alias("gml_lat"),
    )


def _q_shp_roundtrip(spark, sf_dir):
    """Shapefile export fidelity for the three reference shape types
    (``TLS/FeatureExporter.scala:62-96`` exports arbitrary geometries):
    events -> point / polyline / polygon WKTs, written driver-side by the
    native .shp/.shx/.dbf writer, read back by the native reader. The
    double -> Double.toString -> shp IEEE bytes -> repr -> cast(double)
    chain is exact, so the oracle recomputes per-feature vertex count and
    bbox straight from the geoparse arithmetic."""
    import os
    import tempfile

    from geomesa_spark.sources.shapefile import read_shapefile, write_shapefile

    t = _events_pts(_utc(spark), sf_dir)
    feats = t.df.filter(F.col("event_id") % 97 == 0).select(
        "event_id", "lon", "lat"
    )
    lon, lat = F.col("lon"), F.col("lat")
    shapes = {
        "point": F.format_string("POINT (%s %s)", lon, lat),
        "line": F.format_string(
            "LINESTRING (%s %s, %s %s)", lon, lat, lon + 1.0, lat + 0.5
        ),
        "polygon": F.format_string(
            "POLYGON ((%s %s, %s %s, %s %s, %s %s))",
            lon, lat, lon + 1.0, lat, lon, lat + 1.0, lon, lat,
        ),
    }
    tmp = tempfile.mkdtemp(prefix="shp_rt_")
    parts = []
    for kind, expr in shapes.items():
        base = os.path.join(tmp, kind)
        write_shapefile(
            feats.select(
                expr.alias("wkt"), F.col("event_id").cast("string").alias("eid")
            ),
            base + ".shp",
            attrs=["eid"],
        )
        back = read_shapefile(spark, base + ".shp")
        parts.append(
            back.select(
                F.col("EID").cast("long").alias("event_id"),
                F.lit(kind).alias("shape"),
                F.col("wkt"),
            )
        )
    allb = parts[0].unionByName(parts[1]).unionByName(parts[2])
    pairs = F.expr(
        r"regexp_extract_all(wkt, '(-?[0-9.]+) (-?[0-9.]+)', 0)"
    )
    xs = F.transform(pairs, lambda p: F.split(p, " ")[0].cast("double"))
    ys = F.transform(pairs, lambda p: F.split(p, " ")[1].cast("double"))
    return allb.select(
        "event_id",
        "shape",
        F.size(pairs).cast("int").alias("nv"),
        F.array_min(xs).alias("x0"),
        F.array_min(ys).alias("y0"),
        F.array_max(xs).alias("x1"),
        F.array_max(ys).alias("y1"),
    )


def _q_bin_pack(spark, sf_dir):
    """Packed BIN blobs per track: the blob bytes are pytest-verified
    (test_operators struct unpack); the driver row checks the per-track
    record counts and width exactly."""
    from geomesa_spark.operators.bin_export import bin_pack

    t = _events_pts(_utc(spark), sf_dir)
    return bin_pack(t, "event_type").select("track", "n", "record_width")


def _q_convert_fixedwidth(spark, sf_dir):
    """Fixed-width converter end-to-end: events formatted into fixed-offset
    lines, parsed back by byte offsets (FixedWidthConverters semantics);
    oracle is the original table."""
    from geomesa_spark.sources.convert import fixed_width

    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    lines = ev.select(
        F.concat(
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
            F.lpad(F.col("user_id").cast("string"), 12, "0"),
            F.rpad(F.col("event_type"), 10, " "),
        ).alias("line")
    )
    parsed = fixed_width(lines, "line", [
        ("f_id", 0, 12), ("f_user", 12, 24), ("f_type", 24, 34),
    ])
    return parsed.select(
        F.expr("try_cast(f_id AS LONG)").alias("event_id"),
        F.expr("try_cast(f_user AS LONG)").alias("user_id"),
        F.trim(F.col("f_type")).alias("event_type"),
    )


_TS_LO = datetime(2024, 1, 8, 0, 0, tzinfo=timezone.utc)
_TS_HI = datetime(2024, 1, 9, 12, 0, tzinfo=timezone.utc)


def _q_ts_filter(spark, sf_dir):
    """Ingest-timestamp range pruning (TimestampRangeIterator analog)."""
    from geomesa_spark.plans.compiler import timestamp_range_filter

    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    return timestamp_range_filter(ev, "ts", _TS_LO, _TS_HI).select("event_id")


_RASTER_BBOX = (-30.005, -20.005, 40.005, 35.005)


def _raster_chunks(spark, sf_dir):
    """Chunk table derived from events tile counts at level 6 (+ bboxes)."""
    t = _events_pts(spark, sf_dir)
    tc = tile_counts(t, level=6)
    x = ((F.col("tile_id") - 6 * (1 << 52)) / F.lit(1 << 26)).cast("long")
    y = F.col("tile_id") - F.lit(6 * (1 << 52)) - x * F.lit(1 << 26)
    n = 64
    lon0 = F.lit(-180.0) + F.lit(360.0) * x / F.lit(float(n))
    lat1 = F.lit(90.0) - F.lit(180.0) * y / F.lit(float(n))
    return tc.select(
        "tile_id", "weight",
        lon0.alias("c_lon_min"), (lat1 - 180.0 / n).alias("c_lat_min"),
        (lon0 + 360.0 / n).alias("c_lon_max"), lat1.alias("c_lat_max"),
    )


def _q_raster_query(spark, sf_dir):
    from geomesa_spark.operators.tiling import raster_query

    chunks = _raster_chunks(_utc(spark), sf_dir)
    return raster_query(chunks, _RASTER_BBOX, requested_level=7,
                        available_levels=[4, 6]).select("tile_id", "weight")


def _q_mosaic(spark, sf_dir):
    """Geo-positioned mosaic over the pruned raster chunks: each chunk's
    4x4 pixel block (constant value = weight mod 256 under the declared fake
    decoder) lands at its bbox offset in the canvas, last write in ascending
    tile-key order wins overlaps, nearest-neighbor scale to 64x64. The
    64x64 canvas is exploded to one row per pixel so the DuckDB twin
    (which mirrors the crop/round/floor placement arithmetic per chunk and
    the nearest-neighbor index map in SQL) value-checks every byte — this
    closes the one `no_oracle` row from rounds 1-4; exact canvas bytes stay
    additionally byte-verified in tests/test_round3.py."""
    from geomesa_spark.operators.tiling import mosaic_geo, raster_query

    chunks = _raster_chunks(_utc(spark), sf_dir)
    pruned = raster_query(chunks, _RASTER_BBOX, requested_level=7,
                          available_levels=[4, 6])
    byte_hex = F.lpad(F.hex(F.pmod(F.col("weight").cast("long"), F.lit(256))), 2, "0")
    with_px = pruned.select(
        "tile_id", "c_lon_min", "c_lat_min", "c_lon_max", "c_lat_max",
        F.lit(4).alias("c_width"), F.lit(4).alias("c_height"),
        F.unhex(F.repeat(byte_hex, 16)).alias("payload"),
    )
    out = mosaic_geo(with_px, _RASTER_BBOX, 64, 64)
    px = out.select(
        "mosaic", "mosaic_width",
        F.explode(
            F.sequence(F.lit(0), F.col("mosaic_width") * F.col("mosaic_height") - 1)
        ).alias("i"),
    )
    return px.select(
        F.pmod(F.col("i"), F.col("mosaic_width")).cast("int").alias("px_x"),
        (F.col("i") / F.col("mosaic_width")).cast("int").alias("px_y"),
        F.conv(F.hex(F.expr("substring(mosaic, i + 1, 1)")), 16, 10)
        .cast("int")
        .alias("val"),
    )


def _q_span_dedup(spark, sf_dir):
    """Span-level exact dedup over a planted multi-paragraph corpus: each
    document becomes 3 paragraphs (two 40-char slices of its own text plus
    one shared paragraph keyed by doc_id % 40, so ~12 docs share each);
    the removal list keeps the first (doc_id, span_idx) occurrence of every
    duplicated span. The DuckDB twin rebuilds the identical corpus and
    ranks occurrences with a window."""
    from geomesa_spark.operators.dedup import span_dedup

    docs = _docs(_utc(spark), sf_dir)
    planted = docs.select(
        "doc_id",
        F.concat_ws(
            "\n\n",
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40),
            F.format_string(
                "shared paragraph %d duplicated across the corpus",
                F.pmod(F.col("doc_id"), F.lit(40)),
            ),
            F.substring(F.coalesce(F.col("text"), F.lit("")), 5, 40),
        ).alias("text"),
    )
    return span_dedup(planted, "text", "doc_id", min_len=20)


def _q_substr_dedup(spark, sf_dir):
    """Token-granular ExactSubstr self-dedup (Lee et al. 2022 proper) over
    the raw documents table at n=8: any 8-token window occurring twice
    anywhere in the corpus keeps only its first (doc_id, position)
    occurrence; every other occurrence's token range is cut and survivors
    rejoin on single spaces. The DuckDB twin regenerates every window with
    generate_series + list_slice, elects the identical struct-min keeper,
    and applies the same coverage filter."""
    from geomesa_spark.operators.dedup import exact_substring_dedup

    docs = _docs(_utc(spark), sf_dir, spread=False).select("doc_id", "text")
    return exact_substring_dedup(docs, "text", "doc_id", n=8)


def _q_density_wkt(spark, sf_dir):
    """Non-point-capable density operator over WKT geometries (exercised on
    POINT rows so a SQL oracle can reproduce the grid exactly)."""
    from geomesa_spark.operators.aggregations import density_geometries

    t = _events_pts(_utc(spark), sf_dir)
    df = t.df.select(
        F.format_string("POINT (%s %s)", F.col("lon"), F.col("lat")).alias("wkt")
    )
    return density_geometries(df, "wkt", (-180.0, -90.0, 180.0, 90.0), 64, 32)


def _q_text_quality(spark, sf_dir):
    return text_quality(_docs(_utc(spark), sf_dir), "text", "doc_id")


def _q_lang_id(spark, sf_dir):
    return language_id(_docs(_utc(spark), sf_dir), "text", "doc_id")


def _q_fingerprint(spark, sf_dir):
    # the SQL twin's gram positions (generate_series(1, len-15)) vanish for
    # docs whose normalized text is under the 16-char window, while the
    # engine hashes a shorter gram — filter symmetrically so the driver row
    # is well-defined (short-doc engine semantics stay pytest-covered)
    docs = _docs(_utc(spark), sf_dir).filter(
        F.length(F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "))
        >= 16
    )
    return fingerprint(docs, "text", "doc_id")


def _url_pages(spark, sf_dir):
    """Crawl-surface url table: documents + deterministic messy urls
    (sources.webpages.raw_url_expr) + integer crawl second. Pure codegen;
    the DuckDB oracle rebuilds the same table arithmetically."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    return docs.select(
        did,
        raw_url_expr(did).alias("url"),
        ((did * 97) % 31_536_000).cast("long").alias("warc_sec"),
        F.col("n_chars"),
    )


def _q_url_canonicalize(spark, sf_dir):
    p = _url_pages(_utc(spark), sf_dir)
    return p.select("doc_id", "url", canonicalize_url(F.col("url")).alias("canonical_url"))


def _q_url_dedup(spark, sf_dir):
    p = _url_pages(_utc(spark), sf_dir)
    return url_dedup(p, url_col="url", ts_col="warc_sec", id_col="doc_id")


def _q_domain_stats(spark, sf_dir):
    p = _url_pages(_utc(spark), sf_dir)
    return domain_stats(p, url_col="url", size_col="n_chars")


def _q_hll_domains(spark, sf_dir):
    """Mergeable per-domain distinct-page panel (operators/sketches.py):
    the crawl-url table split into two "ingest deltas" by doc_id parity,
    per-host DataSketches HLL sketches built per delta, union-merged,
    and read as estimates — the incremental path that never re-scans
    prior deltas. Oracle-comparable because HLL union is lossless
    (merged state == single-pass state) and at driver scales every host
    sits in the sparse coupon regime where the deterministic estimate IS
    the exact distinct count — the DuckDB twin is a plain
    COUNT(DISTINCT canonical_url) per host (exactness pinned per-sf by
    test_sketches against domain_stats; lgk=12 leaves 4 orders of
    headroom over the ~5-50 canonical pages per fixture host)."""
    from geomesa_spark.functions.urls import canonicalize_url, url_host
    from geomesa_spark.operators.sketches import (
        distinct_sketches,
        merge_sketch_tables,
        sketch_estimates,
    )

    p = _url_pages(_utc(spark), sf_dir).select(
        "doc_id",
        url_host(F.col("url")).alias("host"),
        canonicalize_url(F.col("url")).alias("canon"),
    )
    deltas = [
        distinct_sketches(p.filter(F.col("doc_id") % 2 == i), "canon", ["host"])
        for i in (0, 1)
    ]
    return sketch_estimates(merge_sketch_tables(*deltas), "n_canonical")


def _q_sessionize(spark, sf_dir):
    from geomesa_spark.operators.sessions import session_rollup

    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    return session_rollup(ev, "user_id", "ts", "event_id", gap_s=1800)


def _q_sample_stratified(spark, sf_dir):
    from geomesa_spark.operators.corpus import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(docs, "lang", quota=60, id_col="doc_id").select(
        "doc_id", "lang", "n_chars"
    )


def _q_descriptive_stats(spark, sf_dir):
    from geomesa_spark.operators.corpus import descriptive_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return descriptive_stats(ev, "event_type", "value", scale=1000)


def _q_group_percentiles(spark, sf_dir):
    from geomesa_spark.operators.corpus import group_percentiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return group_percentiles(ev, "event_type", "value")


def _q_robots_filter(spark, sf_dir):
    """Robots compliance over the crawl-surface url table: every third
    host disallows /page/ but allows /page/1* — longest-prefix-match
    semantics the oracle reproduces arithmetically from doc_id."""
    from geomesa_spark.functions.robots import robots_filter, robots_rules

    body = "User-agent: *\nDisallow: /page/\nAllow: /page/1\n"
    rules = robots_rules(
        spark, [(f"site{h}.example", body) for h in range(0, 997, 3)]
    )
    p = _url_pages(_utc(spark), sf_dir).select("doc_id", "url")
    return robots_filter(p, rules, "url")


def _q_topk_tokens(spark, sf_dir):
    from geomesa_spark.operators.corpus import topk_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return topk_tokens(docs, "text", k=40)


def _q_warc_roundtrip(spark, sf_dir):
    """Build WARC/1.0 records from the pages table (codegen), pack them
    into multi-record buffers, parse them back with the from-scratch WARC
    parser, and emit per-record facts the oracle derives directly from
    ``documents`` — matching proves the full build->pack->parse loop is
    byte-exact."""
    from geomesa_spark.sources.warc import parse_warc, warc_buffers, warc_record_expr

    pages = webpages_from_documents(_utc(spark), sf_dir)
    rec = warc_record_expr(
        F.col("url"),
        F.col("warc_ts"),
        F.col("text"),
        F.format_string("%08x-0000-4000-8000-000000000000", F.col("doc_id")),
    )
    w = pages.select(
        F.col("doc_id"), (F.col("doc_id") % 64).alias("bucket"), rec.alias("rec")
    )
    parsed = parse_warc(warc_buffers(w, "rec", "doc_id", "bucket"))
    return parsed.select(
        F.col("target_uri").alias("url"),
        "warc_date",
        F.md5(F.col("payload")).alias("payload_md5"),
        F.octet_length(F.col("payload")).cast("long").alias("n_bytes"),
    )


def _q_arrow_roundtrip(spark, sf_dir):
    """Export documents as self-contained Arrow IPC chunks and read them
    back — matching the plain table scan proves the export is lossless."""
    from geomesa_spark.sources.arrow_io import from_arrow_ipc, to_arrow_ipc

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    chunks = to_arrow_ipc(docs, max_rows_per_chunk=128)
    return from_arrow_ipc(chunks, "doc_id long, lang string, n_chars long")


def _q_dedup_components(spark, sf_dir):
    """Connected components over a deterministic chain graph (doc i ~ i+1
    within 50-blocks): the oracle knows the closed-form component minimum,
    the engine has to discover it through the large-star/small-star
    rounds — long chains are the worst case for label propagation.

    ``driver_edge_cap=0`` pins the DISTRIBUTED star-contraction here: the
    toy graph would otherwise take the operator's bounded small-graph
    collapse, and this gate exists to validate the path that runs at
    100 TB (the collapse is parity-tested in test_components.py)."""
    from geomesa_spark.operators.components import connected_components

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    nxt = docs.select((F.col("doc_id") - 1).alias("doc_id"))
    pairs = (
        docs.join(nxt, "doc_id")  # doc_id+1 exists
        .filter(F.col("doc_id") % 50 != 49)
        .select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b"))
    )
    return connected_components(pairs, driver_edge_cap=0)


_SQL_BOX = "POLYGON ((0.005 0.005, 40.005 0.005, 40.005 30.005, 0.005 30.005, 0.005 0.005))"


def _pii_text_expr():
    """Deterministic PII-planted text: one email, one phone, one IPv4 per
    doc, all pure arithmetic on doc_id so the DuckDB twin rebuilds the
    string byte-for-byte, followed by the real document text."""
    did = F.col("doc_id").cast("long")
    return F.concat(
        F.lit("contact user"), did.cast("string"),
        F.lit("@site"), (did % 7).cast("string"),
        F.lit(".org or +49"),
        F.lpad(((did * 37) % 100000000).cast("string"), 8, "0"),
        F.lit(" at 10."), (did % 256).cast("string"),
        F.lit(".0."), (did % 200).cast("string"),
        F.lit(" :: "), F.col("text"),
    )


def _q_redact_pii(spark, sf_dir):
    """PII redaction (emails/IPv4/phone runs -> typed placeholders): the
    corpus-cleaning stage that runs right after extract_text in a
    training-data pipeline. Patterns live in the Java-regex/RE2 common
    subset, so the DuckDB oracle applies the SAME patterns with
    regexp_replace(...,'g') and the redacted strings hash-compare
    exactly."""
    from geomesa_spark.operators.textclean import pii_counts, redact_pii

    docs = _docs(spark, sf_dir, spread=False).select("doc_id", "text")
    built = docs.select("doc_id", _pii_text_expr().alias("raw"))
    n_email, n_ip, n_phone = pii_counts(F.col("raw"))
    return built.select(
        "doc_id",
        redact_pii(F.col("raw")).alias("clean"),
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
    )


def _q_boilerplate(spark, sf_dir):
    """Per-group boilerplate-line removal (CCNet-style site cleanup):
    header/footer lines shared by every doc of a lang-group are removed;
    the per-doc body line and the 1/3-frequency x-line stay below the 50%
    threshold and survive. The oracle knows the closed-form result (the
    fixture's line frequencies are exact: 100% vs ~33%), like the
    dedup_components chain oracle."""
    from geomesa_spark.operators.textclean import remove_boilerplate

    docs = _docs(spark, sf_dir, spread=False).select("doc_id", "lang")
    did = F.col("doc_id").cast("long")
    built = docs.select(
        "doc_id", "lang",
        F.concat_ws(
            "\n",
            F.concat(F.lit("hdr-"), F.col("lang")),
            F.concat(F.lit("body-"), did.cast("string")),
            F.concat(F.lit("x-"), (did % 3).cast("string")),
            F.concat(F.lit("ftr-"), F.col("lang")),
        ).alias("text"),
    )
    return remove_boilerplate(
        built, "text", "lang", "doc_id", min_docs=3, max_ratio=0.5
    )


def _q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the 13-gram overlap rule): flag corpus
    docs sharing any token-aligned 13-gram with an eval set. The eval set
    here is the first 13 tokens of every 97th document, so contamination
    is real (each source doc hits its own gram; exact-dup docs hit each
    other's). The DuckDB twin materializes every token window with
    generate_series + list_slice — a full independent implementation, not
    a closed form."""
    from geomesa_spark.operators.textclean import decontaminate

    docs = _docs(spark, sf_dir, spread=False).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(toks, 1, 13)).alias("text"),
    )
    return decontaminate(docs, bench, n=13)


def _repetition_corpus(docs):
    """Constructed multi-line corpus shared by `repetition` and
    `quality_filter`: document text re-lined 10 tokens/line, plus the
    first line re-appended doc_id%3 times (planted duplicate-line mass,
    so line-repetition signals and thresholds are exercised
    non-degenerately — raw fixture docs are single-line)."""
    did = F.col("doc_id").cast("long")
    toks = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(toks) / F.lit(10.0)).cast("int")
    body = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), nlines - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * 10 + 1, 10)),
        ),
    )
    first_line = F.concat_ws(" ", F.slice(toks, 1, 10))
    return docs.select(
        "doc_id",
        F.concat(
            body,
            F.repeat(F.concat(F.lit("\n"), first_line), (did % 3).cast("int")),
        ).alias("text"),
    )


def _q_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals over the constructed
    multi-line corpus (see _repetition_corpus). All four signals are
    exact-count ratios, so the DuckDB twin — a full independent
    unnest/GROUP BY implementation — hash-matches bit-for-bit."""
    from geomesa_spark.operators.textclean import repetition_signals

    # spread: the signals fold per-row with ZERO downstream exchanges now,
    # so an under-split input would serialize the whole kernel on one task
    # (the old explode+groupBy shape parallelized after its shuffle)
    built = _repetition_corpus(_docs(spark, sf_dir).select("doc_id", "text"))
    return repetition_signals(built)


def _q_pack_shards(spark, sf_dir):
    """Deterministic training-shard packing (operators/shards.py): lay the
    document corpus end-to-end in Lehmer-key order, 2048 tokens per shard.
    The engine computes the running token offset with range partitions +
    per-partition Arrow cumsums (no global window sort); the DuckDB twin
    IS the global window sum over the identical integer key, so every
    (shard_id, offset) hash-matches bit-for-bit — proving the distributed
    prefix-sum equals the single-node total order."""
    from geomesa_spark.operators.shards import pack_shards

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return pack_shards(docs, "text", "doc_id", shard_tokens=2048)


def _q_quality_filter(spark, sf_dir):
    """Composite Gopher/C4-style keep/drop verdict (operators/quality.py)
    over the same constructed corpus as `repetition`, so the repetition
    thresholds see planted duplicate-line mass. Default thresholds split
    the fixture corpus non-degenerately on length (min 30 tokens ~ p25),
    stopword floor (0.01 ~ p25), dup-line cap (0.30 separates the
    doc_id%3 planting classes), and language (en = ~half the lang votes).
    Every emitted column is a boolean over values the component oracles
    already prove bit-reproducible, so the verdict hash-matches exactly."""
    from geomesa_spark.operators.quality import quality_filter

    built = _repetition_corpus(_docs(spark, sf_dir).select("doc_id", "text"))
    return quality_filter(built, "text", "doc_id")


_BM25_TERMS = ("join", "filter", "window", "spark")


def _q_bm25(spark, sf_dir):
    """Okapi BM25 relevance of every document against a 4-term query
    drawn from the fixture vocabulary (operators/scoring.py). Per-term
    contributions are fixed-pointed to integer micro-units before the
    per-doc sum, so the DuckDB twin — a full independent tokenize/tf/df
    implementation running the same operand-order arithmetic —
    hash-matches bit-for-bit."""
    from geomesa_spark.operators.scoring import bm25

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text")
    return bm25(docs, _BM25_TERMS)


def _q_lm_score(spark, sf_dir):
    """CCNet-style unigram LM quality score: mean Laplace-smoothed
    log-probability per document under the corpus's own unigram
    distribution (operators/scoring.py). Vocabulary log-probs are
    fixed-pointed once per distinct term; per-doc sums are exact BIGINT,
    so the oracle twin reproduces every score exactly."""
    from geomesa_spark.operators.scoring import unigram_logprob

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text")
    return unigram_logprob(docs)


def _q_dsir_weights(spark, sf_dir):
    """DSIR-style importance weight of every document against the
    English slice as the target distribution (operators/scoring.py,
    Xie et al. 2023). Hashed-bigram buckets come from an md5-hex prefix
    (cross-engine-stable), per-bucket log-ratios are fixed-pointed to
    integer micro-units once per distinct bucket, and each document's
    weight is an exact BIGINT sum — the DuckDB twin reproduces every
    double bit-for-bit without any rounding step."""
    from geomesa_spark.operators.scoring import dsir_weights

    docs = _docs(_utc(spark), sf_dir).select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_target")
    )
    return dsir_weights(docs)


def _q_dsir_resample(spark, sf_dir):
    """Gumbel top-k resampling of the DSIR weights (the sampling half of
    Xie et al. 2023): k=100 documents drawn without replacement with
    probability ∝ exp(weight), using the package's deterministic
    two-round Lehmer hash as the uniform source so the draw is
    bit-reproducible — the oracle twin recomputes weight, Gumbel key,
    and the top-100 cut from scratch."""
    from geomesa_spark.operators.scoring import dsir_resample, dsir_weights

    docs = _docs(_utc(spark), sf_dir).select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_target")
    )
    return dsir_resample(dsir_weights(docs), k=100)


def _q_cap_domain(spark, sf_dir):
    """Exact per-domain page cap (corpus.cap_per_group): keep the 2
    largest pages per host from the messy-url crawl surface, rank cut by
    (n_chars DESC, doc_id ASC). The engine parses hosts from raw urls
    and runs the two-branch skew-aware plan (broadcast anti-join pass-
    through for within-quota domains; WindowGroupLimit top-n for the
    over-quota slice); the oracle rebuilds the host arithmetically and
    takes the same rank cut with a global window."""
    from geomesa_spark.functions.urls import url_host
    from geomesa_spark.operators.corpus import cap_per_group

    p = _url_pages(_utc(spark), sf_dir).select(
        "doc_id", url_host(F.col("url")).alias("host"), "n_chars"
    )
    return cap_per_group(p, "host", "n_chars", "doc_id", 2)


def _host_links(spark, sf_dir):
    """Page-level outlink table for the web-graph family: every crawled
    page (group ``g = doc_id // 3`` on host ``site{g%997}.example``)
    links to three deterministic targets ``(h*31 + j*97 + g%13) % 997``
    (j = 1..3); hosts with ``h % 11 == 3`` emit nothing, so they enter
    the graph purely as link targets — the dangling-node population
    PageRank has to redistribute. Pure integer codegen; the DuckDB twin
    rebuilds the identical rows arithmetically (FIXTURES.md F1 style)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    g = F.floor(F.col("doc_id") / 3).cast("long")
    h = (g % 997).alias("h")
    j = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j")
    pages = docs.select(F.col("doc_id"), g.alias("g"), h).filter(
        F.col("h") % 11 != 3
    )
    # the two-word anchor ("w%d w%d") rides along for anchor_terms; the
    # graph queries project it away, so their plans/oracles are unchanged
    return pages.select("doc_id", "g", "h", j).select(
        "doc_id",
        F.format_string("site%d.example", F.col("h")).alias("src"),
        F.format_string(
            "site%d.example",
            (F.col("h") * 31 + F.col("j") * 97 + F.col("g") % 13) % 997,
        ).alias("dst"),
        F.format_string(
            "w%d w%d",
            (F.col("h") * 7 + F.col("j") * 13 + F.col("g") % 5) % 23,
            (F.col("h") + F.col("j")) % 7,
        ).alias("anchor"),
    )


def _q_link_graph(spark, sf_dir):
    """Weighted host→host edge list (operators/webgraph.py host_graph)
    from the deterministic outlink fixture: one map-side-combined hash
    aggregate on (src, dst), self-loops dropped — the Common-Crawl
    webgraph build step."""
    from geomesa_spark.operators.webgraph import host_graph

    return host_graph(_host_links(_utc(spark), sf_dir))


def _q_host_degrees(spark, sf_dir):
    """Per-host in/out degree + link mass (webgraph.degree_stats): a
    single hash aggregation over a tagged union of the two edge
    endpoints — no outer join, one shuffle keyed by host."""
    from geomesa_spark.operators.webgraph import degree_stats, host_graph

    return degree_stats(host_graph(_host_links(_utc(spark), sf_dir)))


def _q_pagerank(spark, sf_dir):
    """Fixed-point integer PageRank, 4 iterations, d=0.85
    (webgraph.pagerank). All rank arithmetic is int64 (shares are
    ``rank DIV out_deg``, damping is ``(85*x) DIV 100``), so the sums
    are associative and the result is bit-identical at any parallelism
    — the oracle twin unrolls the same four iterations in SQL and
    hash-matches exactly, dangling mass included."""
    from geomesa_spark.operators.webgraph import host_graph, pagerank

    edges = host_graph(_host_links(_utc(spark), sf_dir))
    return pagerank(edges, iterations=4, damping_pct=85)


def _q_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail quality bands (scoring.ppl_buckets): the
    lm_score surface joined back to the language column, then ntile(3)
    per language ordered by (score DESC, doc_id) — the deterministic
    tiebreak makes the equal-depth cut bit-reproducible. The threshold
    path for web-scale skew is bucket_by_thresholds (pytest-pinned)."""
    from geomesa_spark.operators.scoring import ppl_buckets, unigram_logprob

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text", "lang")
    scored = unigram_logprob(docs.select("doc_id", "text")).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return ppl_buckets(scored)


def _q_domain_mixture(spark, sf_dir):
    """Temperature-scaled domain sampling weights, alpha=0.5
    (corpus.domain_mixture) over the crawl-surface hosts: c^0.5 via the
    IEEE-exact sqrt chain, fixed-pointed once per domain; both
    normalizing sums are BIGINTs so every emitted double is a single
    division of identical operands in Spark and the oracle."""
    from geomesa_spark.functions.urls import url_host
    from geomesa_spark.operators.corpus import domain_mixture

    p = _url_pages(_utc(spark), sf_dir).select(
        url_host(F.col("url")).alias("host")
    )
    return domain_mixture(p, "host", alpha=0.5)


def _q_crawl_delta(spark, sf_dir):
    """Crawl-snapshot diff (operators/delta.py crawl_delta): two
    deterministic snapshots of the corpus — `old` drops doc_id%17==0,
    `new` drops doc_id%19==0 and mutates the text of doc_id%13==0 — are
    diffed by url with md5 content fingerprints into
    added/removed/changed/unchanged. One full-outer equi-join on the
    unique url key; only (url, fp) pairs shuffle, never page bytes."""
    from geomesa_spark.operators.delta import crawl_delta

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text")
    did = F.col("doc_id")
    url = F.format_string(
        "https://site%d.example/p/%d",
        F.floor(did / 3).cast("long") % 997,
        did,
    )
    old = docs.filter(did % 17 != 0).select(
        url.alias("url"), F.md5(F.col("text")).alias("fingerprint")
    )
    new = docs.filter(did % 19 != 0).select(
        url.alias("url"),
        F.md5(
            F.when(did % 13 == 0, F.concat(F.col("text"), F.lit("~v2"))).otherwise(
                F.col("text")
            )
        ).alias("fingerprint"),
    )
    return crawl_delta(old, new)


def _q_normalize_text(spark, sf_dir):
    """Unicode/whitespace normalization (textclean.normalize_text) over
    a corpus with planted NFD combining sequences, control characters,
    and whitespace runs (suffix keyed by doc_id%4). NFC is the one
    Arrow stage; strip/collapse/trim are codegen twins of the DuckDB
    nfc_normalize + regexp_replace chain."""
    from geomesa_spark.operators.textclean import normalize_text

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text")
    did = F.col("doc_id")
    suffix = (
        F.when(did % 4 == 0, F.lit("  resume\u0301\t"))
        .when(did % 4 == 1, F.lit(" ctrl\x07X"))
        .when(did % 4 == 3, F.lit("  double  space  "))
        .otherwise(F.lit(""))
    )
    return normalize_text(
        docs.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    )


_BADWORDS = ["slow", "null", "error"]  # stand-in for the C4 obscenity list


def _q_badwords(spark, sf_dir):
    """C4-style banned-word filter (textclean.badwords_filter, flag
    mode) with a 3-word stand-in lexicon drawn from the fixture
    vocabulary: distinct-word hit count + verdict per doc, zero-shuffle
    codegen (literal-array intersect over the standard tokenizer)."""
    from geomesa_spark.operators.textclean import badwords_filter

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text")
    return badwords_filter(docs, _BADWORDS)


def _q_anchor_terms(spark, sf_dir):
    """Top-3 anchor-text terms per link target (webgraph.anchor_terms) —
    the Common-Crawl anchor-corpus build over the outlink fixture's
    deterministic two-word anchors. One map-side-combined (host, term)
    hash aggregate, then a WindowGroupLimit top-k over the already-
    aggregated rows with the (n DESC, term ASC) tiebreak; the oracle
    rebuilds the links arithmetically and takes the same rank cut."""
    from geomesa_spark.operators.webgraph import anchor_terms

    links = _host_links(_utc(spark), sf_dir).select("dst", "anchor")
    return anchor_terms(links, "dst", "anchor", k=3)


def _q_incr_dedup(spark, sf_dir):
    """Incremental dedup of a new crawl snapshot against an existing
    corpus fingerprint table (dedup.incremental_dedup): exact via
    content-hash equi-join, near via MinHash band match + full-signature
    verify, 'new' otherwise — the corpus is never re-clustered. Planted
    fixture: corpus = roles {0,2} of groups [0,200); the snapshot holds
    100 exact copies (mutate=0 role-1, groups [0,100) — byte-equal to
    base), 100 near-dups (mutate=2 role-1, groups [100,200), shingle
    Jaccard ~0.87), and 100 novel docs (fresh groups [200,300), vocab
    disjoint by construction). Expected verdicts are analytic."""
    from geomesa_spark.operators.dedup import (
        corpus_fingerprints,
        incremental_dedup,
        synth_dedup_corpus,
    )

    n = _DEDUP_GROUPS
    role = F.col("doc_id") % 3
    g = F.floor(F.col("doc_id") / 3)
    full = _cached_table(
        _utc(spark), f"dedup_corpus_m2_{3 * n}",
        lambda s: synth_dedup_corpus(s, 3 * n, mutate=2),
    )
    corpus = full.filter((role != 1) & (g < 2 * n))
    exact_new = _cached_table(
        _utc(spark), f"dedup_corpus_m0_{n}",
        lambda s: synth_dedup_corpus(s, n, mutate=0),
    ).filter(role == 1)
    near_new = full.filter((role == 1) & (g >= n) & (g < 2 * n))
    novel_new = full.filter((role == 0) & (g >= 2 * n))
    snapshot = exact_new.unionByName(near_new).unionByName(novel_new)
    # materialize the corpus fingerprints once: the operator reads the
    # corpus side three times, and an unmaterialized lineage would rerun
    # the Arrow MinHash UDF over the corpus per read (in production this
    # frame is a stored table; localCheckpoint is the session-local twin
    # and is released when the frame is garbage-collected)
    fp = corpus_fingerprints(corpus, "text", "doc_id").localCheckpoint(eager=False)
    return incremental_dedup(snapshot, fp, "text", "doc_id", threshold=0.5)


def _q_bloom_seen(spark, sf_dir):
    """Bloom seen-set prefilter (bloom.bloom_new_keys): the EXACT set of
    snapshot URLs absent from the corpus URL seen-set, computed via a
    broadcast Bloom bitset built in one narrow corpus pass — the
    zero-shuffle probe clears definitely-new rows and only maybe-seen
    candidates reach the exact verify anti-join. Planted fixture:
    corpus = urls of even doc_ids; the snapshot re-uses url(doc_id-1)
    for doc_id%4==1 (seen), url(doc_id) otherwise — so even ids and
    %4==1 are seen and exactly the %4==3 quarter is new. Output is
    bloom-independent (false positives only add verify candidates), so
    the oracle is a plain anti-join over the same arithmetic urls."""
    from geomesa_spark.operators.bloom import bloom_new_keys

    docs = _docs(_utc(spark), sf_dir, spread=False).select("doc_id")

    def url(c):
        return F.format_string("https://h%d.example/p/%d", c % 97, c)

    did = F.col("doc_id")
    corpus = docs.filter(did % 2 == 0).select(url(did).alias("url"))
    snapshot = docs.select(
        "doc_id",
        F.when(did % 4 == 1, url(did - 1)).otherwise(url(did)).alias("url"),
    )
    return bloom_new_keys(snapshot, corpus, "url").select("doc_id", "url")


def _q_postings(spark, sf_dir):
    """Inverted-index postings build (scoring.build_postings, k=3,
    min_df=2): per term the document frequency and the top-3 docs by
    (tf DESC, doc ASC). Skew-shaped: map-side-combined tf agg,
    WindowGroupLimit partial top-k, df from a separate term-keyed count
    (never a window over raw postings) joined to the capped rows."""
    from geomesa_spark.operators.scoring import build_postings

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text")
    return build_postings(docs, "text", "doc_id", k=3, min_df=2)


def _q_extract_outlinks(spark, sf_dir):
    """WAT-style href extraction (webpages.extract_outlinks) over pages
    whose <nav> block plants the _host_links targets (j=2 single-quoted
    to exercise both attribute styles; hosts h%11==3 emit no nav; a
    relative href is planted and must NOT be extracted). The oracle
    rebuilds the identical html arithmetically and runs the same two
    RE2-subset regexes in DuckDB — regex semantics parity, not just row
    parity. extract_outlinks → host_graph reproduces link_graph."""
    from geomesa_spark.sources.webpages import extract_outlinks

    docs = _utc(spark).read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    g = F.floor(did / 3).cast("long")
    h = g % 997

    def a(j, quote):
        return F.format_string(
            f"<a href={quote}https://site%d.example/{quote}>t{j}</a>",
            (h * 31 + F.lit(j) * 97 + g % 13) % 997,
        )

    nav = F.when(
        h % 11 != 3, F.concat(a(1, '"'), a(2, "'"), a(3, '"'))
    ).otherwise(F.lit(""))
    html = F.encode(
        F.concat(
            F.lit("<html><body><nav>"),
            nav,
            F.lit('</nav><p>x</p><a href="/rel">rel</a></body></html>'),
        ),
        "UTF-8",
    )
    pages = docs.select(
        F.format_string("https://site%d.example/p/%d", h, did).alias("url"),
        html.alias("html"),
    )
    return extract_outlinks(pages)


def _q_hex_density(spark, sf_dir):
    """Hexagonal density surface (cells/hexgrid.py, res=3): the F1
    geoparse points binned into H3-style axial hexagons — one pure
    codegen map (axial transform + floor-based cube round, no Python)
    and ONE (q, r)-keyed hash aggregate; the hex complement of the
    rectangular `density` grid (every hex neighbor is edge-adjacent at
    equal center distance, so the surface has no diagonal anisotropy).
    The oracle replicates the arithmetic operation-for-operation with
    the same 17-digit double literals and the same floor(x+0.5)
    rounding — each engine's native round() differs on ties, floor
    doesn't — so cell assignment is bit-identical."""
    from geomesa_spark.cells.hexgrid import hex_qr
    from geomesa_spark.sources.webpages import geoparse

    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    pts = geoparse(ev, "event_id")
    q, r = hex_qr(F.col("lon"), F.col("lat"), res=3)
    return (
        pts.select(q.alias("hex_q"), r.alias("hex_r"))
        .groupBy("hex_q", "hex_r")
        .agg(F.count("*").alias("n"))
    )


def _q_redirects(spark, sf_dir):
    """Redirect-chain resolution (webgraph.resolve_redirects, pointer
    doubling, max_chain=64): planted functional graph keyed by
    pos=doc_id%16 — pos 0..6 chain into the pos-7 terminal (hops 7-pos),
    pos 8/9/10 form a 3-cycle, pos 11 self-loops (both unresolved with
    NULL final/hops), pos 12..15 are not sources. The oracle walks the
    same edges sequentially with a hop-capped recursive CTE — algorithm
    parity between log-round doubling and the linear walk, plus verdict
    parity on the unresolved flag."""
    from geomesa_spark.operators.webgraph import resolve_redirects

    docs = _utc(spark).read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    pos = did % 16

    def url(c):
        return F.format_string("https://r%d.example/%d", c % 239, c)

    target = (
        F.when(pos <= 6, url(did + 1))
        .when((pos >= 8) & (pos <= 9), url(did + 1))
        .when(pos == 10, url(did - 2))
        .when(pos == 11, url(did))
    )
    edges = docs.select(url(did).alias("url"), target.alias("target")).filter(
        F.col("target").isNotNull()
    )
    return resolve_redirects(edges)


def _q_sitemaps(spark, sf_dir):
    """Sitemap / sitemap-index parsing (webpages.parse_sitemaps) over
    arithmetically-planted XML: hosts h=doc_id%389; doc_id%7==0 plants a
    two-child <sitemapindex> (the nested-index case), every other doc a
    three-entry <urlset> whose <loc> carries surrounding whitespace
    (trim parity), whose <lastmod> appears only when (doc_id+j)%2==0
    (NULL parity via nullif), and whose j==3 entry on doc_id%11==0 has
    NO <loc> (dropped-row parity). Entries span lines so the (?s)
    non-greedy block regex is exercised. The oracle rebuilds the
    byte-identical XML with printf/|| and runs the SAME RE2-subset
    regexes in DuckDB — regex-semantics parity, like extract_outlinks."""
    from geomesa_spark.sources.webpages import parse_sitemaps

    docs = _utc(spark).read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    did = F.col("doc_id")
    h = did % 389

    def urlentry(j):
        loc = F.format_string(
            "<url>\n  <loc> https://s%d.example/p/%d </loc>\n", h, did * 10 + j
        )
        lastmod = F.when(
            (did + j) % 2 == 0,
            F.format_string(
                "<lastmod>2025-%02d-%02d</lastmod>",
                (did + j) % 12 + 1,
                (did * j) % 28 + 1,
            ),
        ).otherwise(F.lit(""))
        entry = F.concat(loc, lastmod, F.lit("</url>\n"))
        if j == 3:
            entry = F.when(
                did % 11 == 0, F.lit("<url><lastmod>x</lastmod></url>\n")
            ).otherwise(entry)
        return entry

    def idxentry(j):
        return F.format_string(
            "<sitemap>\n<loc>https://s%d.example/sitemap%d.xml</loc>"
            "<lastmod>2025-01-0%d</lastmod></sitemap>\n",
            h,
            F.lit(j),
            F.lit(j),
        )

    xml = F.when(
        did % 7 == 0,
        F.concat(
            F.lit("<sitemapindex>\n"), idxentry(1), idxentry(2), F.lit("</sitemapindex>")
        ),
    ).otherwise(
        F.concat(
            F.lit("<urlset>\n"), urlentry(1), urlentry(2), urlentry(3), F.lit("</urlset>")
        )
    )
    pages = docs.select(
        F.format_string("https://s%d.example/sitemaps/%d.xml", h, did).alias("url"),
        F.encode(xml, "UTF-8").alias("xml"),
    )
    return parse_sitemaps(pages)


def _q_classifier_score(spark, sf_dir):
    """Linear quality-classifier scoring (quality.classifier_filter, flag
    mode, declared stand-in weights): logit = round(bias + Σ w·feature, 6)
    over the text_quality 6-decimal features plus len_frac, summed in the
    fixed weight order so the double is bit-identical in any IEEE engine;
    the oracle chains the identical operations left-to-right."""
    from geomesa_spark.operators.quality import classifier_filter

    docs = _docs(_utc(spark), sf_dir).select("doc_id", "text")
    return classifier_filter(docs, "text", "doc_id")


def _q_crawl_frontier(spark, sf_dir):
    """Re-crawl frontier (delta.crawl_frontier): the crawl_delta fixture
    joined to the pagerank host authority table, int64 priority
    weight(status) * (rank_micro + 1), then the exact skew-aware top-3
    per host via cap_per_group. Composes three surfaces the driver
    already checks independently (crawl_delta, pagerank, cap_domain's
    cap path); the oracle rebuilds all of them and takes the same
    (priority DESC, url ASC) rank cut. The rank surface is served from
    the parquet cache: in production the scheduler reads a STORED
    authority table refreshed on its own cadence, not a fresh PageRank
    per scheduling run (int64 ranks round-trip parquet bit-exactly, so
    the oracle is unaffected; the live 4-iteration computation stays
    independently checked and timed as the `pagerank` query)."""
    from geomesa_spark.operators.delta import crawl_frontier

    delta = _q_crawl_delta(spark, sf_dir)
    import os

    base = os.path.basename(os.path.normpath(sf_dir))
    ranks = _cached_table(
        _utc(spark),
        f"host_ranks_i4_d85_{base}_{_source_fingerprint(sf_dir, 'documents')}"
        f"_{_rank_code_token()}",
        lambda s: _q_pagerank(s, sf_dir),
    )
    return crawl_frontier(delta, ranks, n_per_host=3)


def _rank_code_token() -> str:
    """Code-identity component of the cached rank surface's key: a crc of
    the source of every function the cached build runs through. The
    generator caches embed their constants in the key for the same
    reason — editing pagerank/host_graph/_host_links must rotate the
    key, or the cache would keep answering with ranks computed by the
    old code until someone remembers to clear /tmp/geomesa_layout."""
    import inspect
    import zlib

    from geomesa_spark.operators import webgraph

    src = "".join(
        inspect.getsource(f)
        for f in (webgraph.pagerank, webgraph.host_graph, _host_links, _q_pagerank)
    )
    return f"{zlib.crc32(src.encode()):08x}"


_BLOCKED_DOMAINS = ["site13.example", "site250.example", "site777.example"]


def _q_blocklist(spark, sf_dir):
    """Domain-blocklist filtering (UT1-style): flag mode over the crawl
    url table — one row per doc, blocked_domain NULL for survivors. The
    fixture hosts are two-label, so the oracle's suffix test (equality OR
    dot-suffix LIKE) mirrors the engine's suffix-chain join; subdomain
    cases are pinned in test_urlops."""
    from geomesa_spark.functions.urls import blocklist_filter

    p = _url_pages(_utc(spark), sf_dir).select("doc_id", "url")
    return blocklist_filter(p, _BLOCKED_DOMAINS, mode="flag")


def _q_semdedup(spark, sf_dir):
    """SemDeDup semantic dedup (ann.semantic_dedup) over the real
    embeddings table plus IEEE-exact 2x copies of vec_id < 30 planted in
    BOTH engines (power-of-two scaling preserves every cosine bit-exactly
    — numerator and norm both scale by exactly 2 — so each copy lands in
    its base's cell with cosine exactly 1). The verdict is FP-robust
    cross-engine: the closest natural pair sits at cos 0.60 (sf0.1), far
    under the 0.8 cut, and the smallest assignment-argmax margin is
    4.7e-5, ten orders above summation-order noise. Centroids are the
    embeddings of vec_id < 8 — the injectable-index production shape
    (train_ivf_centroids output in a real deployment); a data-derived
    fixture here so the DuckDB twin reconstructs the SAME centroids in
    SQL."""
    from geomesa_spark.operators.ann import semantic_dedup

    import numpy as _np

    emb = _utc(spark).read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    copies = emb.filter(F.col("vec_id") < 30).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
    )
    corpus = emb.unionByName(copies)
    cents = _np.array(
        [
            list(r["embedding"])
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ],
        dtype=_np.float64,
    )
    return semantic_dedup(corpus, cents, threshold=0.8).select(
        "vec_id", "cell", "keep"
    )


def _q_incr_semdedup(spark, sf_dir):
    """Incremental semantic dedup (ann.incremental_semantic_dedup): a
    planted snapshot — 0.5x scaled copies of vec_id < 40 (cosine exactly
    1 to their base; power-of-two scaling is cosine-preserving bit-for-
    bit) and NEGATED copies of 40 <= vec_id < 80 (max cosine vs the whole
    corpus 0.484, below the 0.8 cut) — classified against the real
    embeddings corpus via cell probe + exact cosine. match_id is the
    smallest matching corpus id (integer-deterministic; never
    best-by-sim). FP margins verified: negated-row assignment argmax
    margin >= 2.2e-3, verdict gap 0.484 vs 0.8."""
    from geomesa_spark.operators.ann import incremental_semantic_dedup

    import numpy as _np

    emb = _utc(spark).read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dup_rows = emb.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
    )
    new_rows = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 80)).select(
        (F.col("vec_id") + 6000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"),
    )
    snapshot = dup_rows.unionByName(new_rows)
    cents = _np.array(
        [
            list(r["embedding"])
            for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        ],
        dtype=_np.float64,
    )
    return incremental_semantic_dedup(snapshot, emb, cents, threshold=0.8)


def _q_dedup_select(spark, sf_dir):
    """Canonical-document selection (dedup.select_canonical) over the
    chain-graph clusters — same fixture as dedup_components, whose
    component id has the closed form doc_id - doc_id % 50 — with
    text_quality's 6-decimal quality_score as the keep priority: per
    cluster keep the highest-scoring member, ties to the smallest id.
    The engine's single min_by over the (-score, id) struct equals the
    oracle's two-step cut (max score per component, then min id among
    the score ties); quality_score itself already hash-matches the
    oracle (the text_quality row), so the argmax decisions are exact."""
    from geomesa_spark.operators.dedup import select_canonical
    from geomesa_spark.operators.textstats import text_quality

    docs = _docs(_utc(spark), sf_dir)
    q = text_quality(docs, "text", "doc_id").select("doc_id", "quality_score")
    members = q.select(
        "doc_id",
        (F.col("doc_id") - F.col("doc_id") % 50).alias("component"),
        "quality_score",
    )
    return select_canonical(members)


def _q_contamination_matrix(spark, sf_dir):
    """Per-benchmark contamination report (textclean.contamination_matrix)
    over the same corpus as `decontaminate`, with a WIDER eval slice (the
    first 30 tokens of every 97th doc -> up to 18 distinct 13-gram windows
    per bench doc, so frac_grams_hit is exercised away from 0 and 1). The
    DuckDB twin materializes both window sets with generate_series +
    list_slice and joins on the gram STRINGS (the engine joins on
    xxhash64 of the same strings — identical sans collisions, which the
    hash match itself rules out at fixture scale)."""
    from geomesa_spark.operators.textclean import contamination_matrix

    docs = _docs(spark, sf_dir, spread=False).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(toks, 1, 30)).alias("text"),
    )
    return contamination_matrix(docs, bench, n=13)


def _q_decontaminate_spans(spark, sf_dir):
    """Exact-substring span removal (textclean.decontaminate_spans): the
    surgical variant of `decontaminate` — same 13-token eval slices, but
    instead of flagging the doc, every token covered by a matching window
    is cut and the survivors re-join on single spaces. Clean text rides
    the hash compare byte-for-byte, so the oracle (an independent DuckDB
    rebuild via list_filter over 1-based starts) pins the whole rebuild,
    not just the counts."""
    from geomesa_spark.operators.textclean import decontaminate_spans

    docs = _docs(spark, sf_dir, spread=False).select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(toks, 1, 13)).alias("text"),
    )
    return decontaminate_spans(docs, bench, n=13)


def _q_ngram_counts(spark, sf_dir):
    """Corpus n-gram counts with count pruning and a deterministic
    per-order top-k cut (scoring.ngram_counts — the KenLM lmplz counting
    stage). Orders 1..3 ride one corpus scan; the DuckDB twin regenerates
    every window with generate_series + list_slice and applies the same
    (count DESC, gram ASC) QUALIFY cut."""
    from geomesa_spark.operators.scoring import ngram_counts

    docs = _docs(spark, sf_dir, spread=False).select("doc_id", "text")
    return ngram_counts(docs, orders=(1, 2, 3), min_count=2, topk_per_order=50)


def _q_ann_pq(spark, sf_dir):
    """Product-quantization ANN over the planted table (ann.encode_pq +
    ann.pq_adc_topk): vectors compress to m=4 tinyint codes (k=32 centroids
    per subspace) and search is a pure-codegen ADC scan over the code
    column. Power-of-two copies normalize bit-identical to their base, so
    the whole family shares one PQ code and one ADC distance — the
    analytic top-k is the same as ann_lsh's. At this (m, k) no non-family
    vector shares a family code (margin to rank 7 >= 0.003, pinned by
    test_ann), so the expectation is exact, not approximate. Codebook
    training is a one-time INDEX BUILD (FAISS-style bounded sample),
    disk-cached like the IVF centroids."""
    from geomesa_spark.operators.ann import (
        encode_pq,
        pq_adc_topk,
        train_pq_codebooks,
    )

    emb = _synth_planted_embeddings(_utc(spark))
    books = _cached_npy(
        # v2: sorted-sample training determinism (TakeOrdered, not limit)
        f"pq_planted_books_{_ANN_BASE}_{_ANN_QUERIES}_{_ANN_COPIES}"
        f"_{_ANN_DIM}_m4_k32_i10_v2.npy",
        lambda: train_pq_codebooks(emb, m=4, k=32, iters=10),
    )
    qs = [
        (f"q{i}", [_emb_component(i, d) for d in range(_ANN_DIM)])
        for i in range(_ANN_QUERIES)
    ]
    encoded = encode_pq(emb, books)
    return pq_adc_topk(encoded, qs, books, k=5).select("query_id", "vec_id", "rank")


def _q_sql_functions(spark, sf_dir):
    """The registered st_* SQL surface driving a plain spark.sql query.
    Distances stay internal (numpy vs libm trig can differ in the last
    ulp); the emitted columns are booleans with fixture thresholds far
    from any boundary, exact tile ids, and an exact WKT float roundtrip."""
    from geomesa_spark.functions.sqlfns import register_sql_functions

    register_sql_functions(spark)
    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    geoparse(ev, "event_id").createOrReplaceTempView("sqlfns_pts")
    return spark.sql(f"""
        SELECT event_id,
               st_tile_id(lon, lat, 8) AS tid,
               st_contains('{_SQL_BOX}', st_point(lon, lat)) AS inside,
               st_within(st_point(lon, lat), '{_SQL_BOX}') AS within_ok,
               st_x(st_point(lon, lat)) AS x,
               st_dwithin(st_point(lon, lat), 'POINT (10 20)', 2000000) AS near
        FROM sqlfns_pts
    """)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the driver oracle-checks only the FIRST 50 entries.
    # Round-5 window policy (documented with evidence in BENCH/WINDOW_r05.md):
    # a query needs a slot iff it has never had a driver row, or its
    # implementation/oracle changed since its last green row. Slots 1-30:
    # the 30 round-5 additions with no prior CORRECTNESS row anywhere.
    # Slots 31-40: queries whose engine function or oracle changed since
    # their last green row (AST function-body diff vs the r3/r4 boundary
    # commits e59c2f1/815f3d9): mosaic (new pixel oracle), ann_ivf
    # (assign_ivf_cells/ivf_cosine_topk), repetition/decontaminate/
    # boilerplate (textclean rework), minhash_lsh (signature kernel),
    # text_quality/lang_id (textstats rework), density_wkt
    # (density_geometries vectorization), convert_avro (avro_ingest).
    # Slots 41-50: four late-round-5 additions with no prior row anywhere
    # (substr_dedup, bloom_seen, hll_domains, sitemaps - "never had a
    # driver row" outranks a belt-and-braces re-check under this policy),
    # then r3-green queries whose own functions are unchanged but which
    # share a file with round-4/5 churn (ann.py, dedup.py,
    # aggregations.py, textstats.py) - re-checked belt-and-braces. The
    # four displaced re-checks keep coverage: map_agg_json/unique_hist/
    # surface via slot 39's density_wkt plus temporal_density here;
    # ann_lsh via ann_cosine + embed_dedup (same ann.py paths).
    # Slots 51+: every entry has a green row in CORRECTNESS_r03/r04 and
    # its entry callable, oracle SQL, and reachable engine functions are
    # byte-identical (AST-verified) since that row was recorded; the
    # only kernel edit since r3 (GEOMETRYCOLLECTION branches in
    # geometry_intersects_*) is additive-only and unreachable from them.
    return {
        # -- slots 1-30: first-ever driver rows (new in round 5) ------------
        "span_dedup": _q_span_dedup,
        "anchor_terms": _q_anchor_terms,
        "incr_dedup": _q_incr_dedup,
        "quality_filter": _q_quality_filter,
        "pack_shards": _q_pack_shards,
        "bm25": _q_bm25,
        "lm_score": _q_lm_score,
        "cap_domain": _q_cap_domain,
        "dsir_weights": _q_dsir_weights,
        "dsir_resample": _q_dsir_resample,
        "link_graph": _q_link_graph,
        "host_degrees": _q_host_degrees,
        "pagerank": _q_pagerank,
        "ppl_buckets": _q_ppl_buckets,
        "domain_mixture": _q_domain_mixture,
        "crawl_delta": _q_crawl_delta,
        "normalize_text": _q_normalize_text,
        "badwords": _q_badwords,
        "bbox_s2": _q_bbox_s2,
        "crawl_frontier": _q_crawl_frontier,
        "classifier_score": _q_classifier_score,
        "extract_outlinks": _q_extract_outlinks,
        "postings": _q_postings,
        "semdedup": _q_semdedup,
        "dedup_select": _q_dedup_select,
        "incr_semdedup": _q_incr_semdedup,
        "contamination_matrix": _q_contamination_matrix,
        "decontaminate_spans": _q_decontaminate_spans,
        "ngram_counts": _q_ngram_counts,
        "ann_pq": _q_ann_pq,
        # -- slots 31-40: implementation or oracle changed since last green -
        "mosaic": _q_mosaic,
        "ann_ivf": _q_ann_ivf,
        "repetition": _q_repetition,
        "decontaminate": _q_decontaminate,
        "boilerplate": _q_boilerplate,
        "minhash_lsh": _q_minhash_lsh,
        "text_quality": _q_text_quality,
        "lang_id": _q_lang_id,
        "density_wkt": _q_density_wkt,
        "convert_avro": _q_convert_avro,
        # -- slots 41-50: late new queries, then churn-adjacent re-checks ---
        "substr_dedup": _q_substr_dedup,
        "bloom_seen": _q_bloom_seen,
        "hll_domains": _q_hll_domains,
        "sitemaps": _q_sitemaps,
        "redirects": _q_redirects,
        "hex_density": _q_hex_density,
        "knn_hex": _q_knn_hex,
        "embed_dedup": _q_embed_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "extract_text": _q_extract_text,
        # -- slots 51+: green in r03/r04, AST-verified unchanged since ------
        "ann_cosine": _q_ann_cosine,
        "simhash": _q_simhash,
        "temporal_density": _q_temporal_density,
        "surface": _q_surface,
        "ann_lsh": _q_ann_lsh,
        "map_agg_json": _q_map_agg_json,
        "unique_hist": _q_unique_hist,
        "proximity": _q_proximity,
        "bbox_time": _q_bbox_time,
        "attr_filter": _q_attr_filter,
        "count_by_day": _q_count_by_day,
        "bounds": _q_bounds,
        "tile_counts": _q_tile_counts,
        "tile_rollup": _q_tile_rollup,
        "bin_records": _q_bin_records,
        "geoparse_docs": _q_geoparse_docs,
        "replay": _q_replay,
        "knn_ring": _q_knn_ring,
        "media_features": _q_media_features,
        "frame_sample": _q_frame_sample,
        "convert_delimited": _q_convert_delimited,
        "vis_filter": _q_vis_filter,
        "transform_project": _q_transform_project,
        "dms_parse": _q_dms_parse,
        "bbox_idl": _q_bbox_idl,
        "bbox_time_indexed": _q_bbox_time_indexed,
        "knn": _q_knn,
        "spatial_join_boxes": _q_spatial_join_boxes,
        "bbox": _q_bbox,
        "attr_filter_indexed": _q_attr_filter_indexed,
        "record_lookup": _q_record_lookup,
        "tube": _q_tube,
        "dedup_exact": _q_dedup_exact,
        "density": _q_density,
        "or_union": _q_or_union,
        "bbox_indexed": _q_bbox_indexed,
        "spatial_join_poly": _q_spatial_join_poly,
        "spatial_join_geoms": _q_spatial_join_geoms,
        "dedup_components": _q_dedup_components,
        "intersects": _q_intersects,
        "within": _q_within,
        "dwithin": _q_dwithin,
        "contains_pt": _q_contains_pt,
        "disjoint": _q_disjoint,
        "bbox_geoms": _q_bbox_geoms,
        "geojson_roundtrip": _q_geojson_roundtrip,
        "gml_roundtrip": _q_gml_roundtrip,
        "bin_pack": _q_bin_pack,
        "convert_fixedwidth": _q_convert_fixedwidth,
        "ts_filter": _q_ts_filter,
        "raster_query": _q_raster_query,
        "fingerprint": _q_fingerprint,
        "url_canonicalize": _q_url_canonicalize,
        "url_dedup": _q_url_dedup,
        "domain_stats": _q_domain_stats,
        "sessionize": _q_sessionize,
        "sample_stratified": _q_sample_stratified,
        "descriptive_stats": _q_descriptive_stats,
        "group_percentiles": _q_group_percentiles,
        "robots_filter": _q_robots_filter,
        "topk_tokens": _q_topk_tokens,
        "warc_roundtrip": _q_warc_roundtrip,
        "arrow_roundtrip": _q_arrow_roundtrip,
        "sql_functions": _q_sql_functions,
        "shp_roundtrip": _q_shp_roundtrip,
        "redact_pii": _q_redact_pii,
        "blocklist": _q_blocklist,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------


def _boxes_values() -> str:
    return ", ".join(
        f"('{pid}', {x0!r}, {y0!r}, {x1!r}, {y1!r})" for pid, x0, y0, x1, y1 in _BOXES
    )


def _sites_values() -> str:
    from geomesa_spark.geom.kernels import meters_to_degrees

    rows = []
    for sid, slon, slat in _SITES:
        d = meters_to_degrees(_PROX_M, slat)
        rows.append(
            f"('{sid}', {slon!r}, {slat!r}, {slon - d!r}, {slat - d!r}, "
            f"{slon + d!r}, {slat + d!r})"
        )
    return ", ".join(rows)


def _tube_values() -> str:
    from geomesa_spark.geom.kernels import meters_to_degrees
    from geomesa_spark.operators.tube import build_tube_bins

    rows = []
    for b, t_lo, t_hi, c_lon, c_lat, r in build_tube_bins(_TRACK, _TUBE_BUFFER_M, _TUBE_BIN_S):
        d = meters_to_degrees(r, c_lat)
        rows.append(
            f"({b}, {t_lo}, {t_hi}, {c_lon!r}, {c_lat!r}, {r!r}, "
            f"{c_lon - d!r}, {c_lat - d!r}, {c_lon + d!r}, {c_lat + d!r})"
        )
    return ", ".join(rows)


def _lang_id_oracle() -> str:
    """Mirror the expression-based stopword vote (operators/textstats.py
    language_id): per-language token-in-marker counts, argmax with
    first-in-profile-order tie-break, 'und' on empty/no-signal."""
    from geomesa_spark.operators.textstats import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    cnt_cols = ", ".join(
        "len(list_filter(toks, x -> x IN ({}))) AS c_{}".format(
            ", ".join("'" + w.replace("'", "''") + "'" for w in _LANG_MARKERS[lang]),
            lang,
        )
        for lang in langs
    )
    best = "greatest({})".format(", ".join(f"c_{lang}" for lang in langs))
    case = " ".join(f"WHEN c_{lang} = best THEN '{lang}'" for lang in langs)
    return f"""
        WITH t AS (
          SELECT doc_id,
                 string_split_regex(trim(lower(text)), '\\s+') AS toks,
                 length(trim(text)) AS n
          FROM documents
        ),
        c AS (SELECT doc_id, n, {cnt_cols} FROM t),
        m AS (SELECT *, {best} AS best FROM c)
        SELECT doc_id,
               CASE WHEN n = 0 OR best <= 0 THEN 'und' {case} ELSE 'und' END
                 AS lang_pred
        FROM m
    """


def _quality_filter_oracle() -> str:
    """DuckDB twin of the composite quality verdict: rebuilds the
    repetition-corpus text, then every component signal with the same
    arithmetic its standalone oracle uses (quality ratios rounded to 6
    decimals, repetition fractions as exact-count divisions, the
    stopword-vote language CASE), and applies the identical thresholds.
    All comparisons are on bit-identical doubles, so the booleans agree
    even at exact-threshold ties."""
    from geomesa_spark.operators.textstats import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    cnt_cols = ", ".join(
        "len(list_filter(lg_toks, x -> x IN ({}))) AS c_{}".format(
            ", ".join("'" + w.replace("'", "''") + "'" for w in _LANG_MARKERS[lang]),
            lang,
        )
        for lang in langs
    )
    best = "greatest({})".format(", ".join(f"c_{lang}" for lang in langs))
    case = " ".join(f"WHEN c_{lang} = best THEN '{lang}'" for lang in langs)
    stop_list = "'the','and','of','to','in','is','that','for'"
    return f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS tk FROM documents
            WHERE text IS NOT NULL
        ),
        built AS (
            SELECT doc_id,
                   array_to_string(
                       list_transform(
                           generate_series(0,
                               CAST(ceil(len(tk) / 10.0) AS INT) - 1),
                           i -> array_to_string(
                               list_slice(tk, i * 10 + 1, i * 10 + 10),
                               ' ')
                       ), chr(10))
                   || repeat(
                       chr(10) || array_to_string(
                           list_slice(tk, 1, 10), ' '),
                       CAST(doc_id % 3 AS INT)) AS txt
            FROM t
        ),
        q AS (
            SELECT doc_id,
                   length(txt) AS n_chars,
                   CASE WHEN length(trim(txt)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(txt), '\\s+')) END
                     AS n_tokens,
                   length(txt) - length(regexp_replace(txt, '[^\\w\\s]', '', 'g'))
                     AS n_punct,
                   len(list_filter(string_split_regex(lower(txt), '\\s+'),
                                   x -> x IN ({stop_list}))) AS n_stop
            FROM built
        ),
        qr AS (
            SELECT doc_id, n_tokens,
                   round(CAST(greatest(1, n_chars) AS DOUBLE)
                         / CAST(greatest(1, n_tokens) AS DOUBLE), 6) AS mtl,
                   round(CAST(n_punct AS DOUBLE)
                         / CAST(greatest(1, n_chars) AS DOUBLE), 6) AS pr,
                   round(CAST(n_stop AS DOUBLE)
                         / CAST(greatest(1, n_tokens) AS DOUBLE), 6) AS sr
            FROM q
        ),
        lines AS (
            SELECT doc_id, u.l
            FROM built, UNNEST(string_split(txt, chr(10))) AS u(l)
        ),
        per_line AS (
            SELECT doc_id, l, count(*) AS c FROM lines GROUP BY 1, 2
        ),
        line_sig AS (
            SELECT doc_id,
                   CASE WHEN sum(c) = 0 THEN 0.0 ELSE
                       CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END)
                            AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                   END AS dlf,
                   CASE WHEN sum(c * len(l)) = 0 THEN 0.0 ELSE
                       CAST(sum(CASE WHEN c > 1 THEN c * len(l)
                                ELSE 0 END) AS DOUBLE)
                       / CAST(sum(c * len(l)) AS DOUBLE)
                   END AS dlcf
            FROM per_line GROUP BY doc_id
        ),
        bt AS (
            SELECT doc_id,
                   string_split(replace(txt, chr(10), ' '), ' ') AS tk2,
                   len(replace(txt, chr(10), ' ')) AS tlen
            FROM built
        ),
        bgs AS (
            SELECT doc_id, tlen,
                   array_to_string(list_slice(tk2, i, i + 1), ' ') AS bg
            FROM bt, UNNEST(generate_series(1, len(tk2) - 1)) AS u(i)
        ),
        per_bg AS (
            SELECT doc_id, bg, count(*) AS c, first(tlen) AS tlen
            FROM bgs GROUP BY 1, 2
        ),
        bg_sig AS (
            SELECT doc_id,
                   CASE WHEN first(tlen) = 0 THEN 0.0 ELSE
                       CAST(max(c * len(bg)) AS DOUBLE)
                       / CAST(first(tlen) AS DOUBLE)
                   END AS tbmf
            FROM per_bg GROUP BY doc_id
        ),
        lg0 AS (
            SELECT doc_id,
                   string_split_regex(trim(lower(txt)), '\\s+') AS lg_toks,
                   length(trim(txt)) AS lg_n
            FROM built
        ),
        lg1 AS (SELECT doc_id, lg_n, {cnt_cols} FROM lg0),
        lg2 AS (SELECT *, {best} AS best FROM lg1),
        lg AS (
            SELECT doc_id,
                   CASE WHEN lg_n = 0 OR best <= 0 THEN 'und' {case}
                        ELSE 'und' END AS lang_pred
            FROM lg2
        )
        SELECT qr.doc_id,
               CAST(qr.n_tokens AS INTEGER) AS n_tokens,
               lg.lang_pred,
               qr.n_tokens BETWEEN 30 AND 100000 AS pass_length,
               qr.mtl BETWEEN 3.0 AND 10.0 AS pass_token_shape,
               qr.pr <= 0.25 AS pass_punct,
               qr.sr >= 0.01 AS pass_stopwords,
               (ls.dlf <= 0.30 AND ls.dlcf <= 0.30
                AND COALESCE(bs.tbmf, 0.0) <= 0.18) AS pass_repetition,
               lg.lang_pred IN ('en') AS pass_lang,
               (qr.n_tokens BETWEEN 30 AND 100000
                AND qr.mtl BETWEEN 3.0 AND 10.0
                AND qr.pr <= 0.25
                AND qr.sr >= 0.01
                AND ls.dlf <= 0.30 AND ls.dlcf <= 0.30
                AND COALESCE(bs.tbmf, 0.0) <= 0.18
                AND lg.lang_pred IN ('en')) AS keep
        FROM qr
        JOIN line_sig ls ON qr.doc_id = ls.doc_id
        JOIN lg ON qr.doc_id = lg.doc_id
        LEFT JOIN bg_sig bs ON qr.doc_id = bs.doc_id
    """


def _fingerprint_oracle(window: int = 16) -> str:
    """Winnowing fingerprint in SQL: the rolling polynomial hash of each
    ``window``-byte gram is a plain linear combination with precomputed
    power-of-B constants; min over positions. Arithmetic runs in HUGEINT
    and reduces mod 2^62 (a quotient ring of the engine's uint64
    wraparound, so the values agree; operators/textstats.py fingerprint)."""
    p62 = [pow(1000003, j, 1 << 62) for j in range(window)]
    terms = " + ".join(
        f"CAST(ascii(substring(s, i + {k}, 1)) AS HUGEINT) * {p62[window - 1 - k]}"
        for k in range(window)
    )
    return f"""
        WITH d AS (
          SELECT doc_id,
                 regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS s
          FROM documents
        ),
        pos AS (
          SELECT doc_id, s, CAST(u.p AS INTEGER) AS i
          FROM d, unnest(generate_series(1, len(s) - {window - 1})) u(p)
        ),
        h AS (
          SELECT doc_id, ({terms}) % {1 << 62} AS hv
          FROM pos
        )
        SELECT doc_id, CAST(min(hv) AS BIGINT) AS fingerprint
        FROM h GROUP BY doc_id
    """


def _media_features_oracle(n_rows: int = 2000, dim: int = 16) -> str:
    """synth_media payload = repeat('{id}|', 64) -> UTF-8 bytes; the feature
    fold is mean over rows of the (L/dim, dim) reshape. L = 64*(digits+1) is
    always a multiple of 16, so feat[d] = sum(bytes at pos%16==d) / (L/16),
    computed in float64 and rounded once to float32 on both sides."""
    return f"""
        WITH m AS (
          SELECT t.i AS media_id,
                 ['image','audio','video'][CAST(t.i % 3 AS INTEGER) + 1] AS kind,
                 repeat(concat(CAST(t.i AS VARCHAR), '|'), 64) AS s
          FROM range(0, {n_rows}) t(i)
        ),
        b AS (
          SELECT media_id, kind, len(s) AS L, CAST(u.p AS INTEGER) AS p,
                 ascii(substring(s, CAST(u.p AS INTEGER), 1)) AS code
          FROM m, unnest(generate_series(1, len(s))) u(p)
        ),
        f AS (
          SELECT media_id, kind, CAST((p - 1) % {dim} AS INTEGER) AS dim,
                 CAST(sum(code) AS DOUBLE) AS sb, max(L) AS L
          FROM b GROUP BY 1, 2, 3
        )
        SELECT media_id, kind, dim,
               CAST(sb / (L / {dim}.0) AS REAL) AS val
        FROM f
    """


def _frame_sample_oracle(n_rows: int = 1000, every_n: int = 30) -> str:
    """sample_frames on synth_media: video rows (id%3==2) emit the 8-byte
    slice at (frame_idx*7) % (L-8) for frame_idx in range(0, n_frames, 30)."""
    return f"""
        WITH m AS (
          SELECT t.i AS media_id, CAST(t.i % 120 + 1 AS INTEGER) AS nf,
                 repeat(concat(CAST(t.i AS VARCHAR), '|'), 64) AS s
          FROM range(0, {n_rows}) t(i)
          WHERE t.i % 3 = 2
        ),
        fr AS (
          SELECT media_id, CAST(u.fi AS INTEGER) AS frame_idx, s,
                 CAST((u.fi * 7) % (len(s) - 8) AS INTEGER) AS lo
          FROM m, unnest(generate_series(0, nf - 1, {every_n})) u(fi)
        )
        SELECT media_id, frame_idx, substring(s, lo + 1, 8) AS frame_str
        FROM fr
    """


def _embed_dedup_oracle() -> str:
    """All within-family pairs (base + 5 scaled copies, cosine exactly 1)."""
    rows = []
    for q in range(_ANN_QUERIES):
        ids = sorted([q] + [1000 + 10 * q + j for j in range(_ANN_COPIES)])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append(f"({ids[i]}, {ids[j]})")
    return (
        "SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b "
        "FROM (VALUES " + ", ".join(rows) + ") v(id_a, id_b)"
    )


def _ann_lsh_oracle() -> str:
    """Analytic expected top-k from the planted construction: for each
    query i the 6 candidates at bit-identical max similarity are {i} and
    its 5 scaled copies; ties break on vec_id asc, so ranks 1..5 are
    (i, 1000+10i+0..3)."""
    rows = []
    for i in range(_ANN_QUERIES):
        rows.append(f"('q{i}', {i}, 1)")
        for r in range(2, 6):
            rows.append(f"('q{i}', {1000 + 10 * i + (r - 2)}, {r})")
    return (
        "SELECT query_id, CAST(vec_id AS BIGINT) AS vec_id, "
        "CAST(rank AS INTEGER) AS rank FROM (VALUES "
        + ", ".join(rows)
        + ") v(query_id, vec_id, rank)"
    )


def _raster_query_oracle() -> str:
    from geomesa_spark.operators.tiling import raster_query_cells

    cells = ", ".join(str(c) for c in raster_query_cells(_RASTER_BBOX, 6))
    b = _RASTER_BBOX
    return f"""
        WITH {_PTS_CTE},
        t AS (
          SELECT least(63, greatest(0, CAST(floor((lon - -180.0) / 360.0 * 64.0) AS BIGINT))) AS x,
                 least(63, greatest(0, CAST(floor((90.0 - lat) / 180.0 * 64.0) AS BIGINT))) AS y
          FROM pts
        ),
        tc AS (
          SELECT 6 * 4503599627370496 + x * 67108864 + y AS tile_id,
                 CAST(count(*) AS BIGINT) AS weight
          FROM t GROUP BY 1
        ),
        chunks AS (
          SELECT tile_id, weight,
                 CAST(floor((tile_id - 27021597764222976) / 67108864) AS BIGINT) AS cx,
                 tile_id - 27021597764222976
                   - CAST(floor((tile_id - 27021597764222976) / 67108864) AS BIGINT) * 67108864 AS cy
          FROM tc
        ),
        cb AS (
          SELECT tile_id, weight,
                 -180.0 + 360.0 * cx / 64.0 AS c_lon_min,
                 90.0 - 180.0 * cy / 64.0 - 2.8125 AS c_lat_min,
                 -180.0 + 360.0 * cx / 64.0 + 5.625 AS c_lon_max,
                 90.0 - 180.0 * cy / 64.0 AS c_lat_max
          FROM chunks
        )
        SELECT tile_id, weight FROM cb
        WHERE tile_id IN ({cells})
          AND c_lon_min <= {b[2]!r} AND c_lon_max >= {b[0]!r}
          AND c_lat_min <= {b[3]!r} AND c_lat_max >= {b[1]!r}
    """


def _mosaic_oracle() -> str:
    """DuckDB twin of the geo-positioned mosaic (tiling.mosaic_geo,
    ``RAS/util/RasterUtils.scala:112-160``): rebuilds the pruned level-6
    chunk set (same CTE chain as the raster_query oracle), mirrors the
    crop / round / floor placement arithmetic per chunk to get each
    painted canvas rect, maps every 64x64 output pixel to its
    nearest-neighbor native pixel, and picks the covering chunk with the
    highest tile_id (= last write in ascending key order; level-6 tiles
    are disjoint so this only guards the contract). All doubles below are
    the same exact binary values the engine computes (tile edges are
    multiples of 45/8 resp. 45/16), and none of the round() inputs sits
    on a .5 tie, so half-even (python) vs half-away (DuckDB) agree."""
    from geomesa_spark.operators.tiling import raster_query_cells

    cells = ", ".join(str(c) for c in raster_query_cells(_RASTER_BBOX, 6))
    ex0, ey0, ex1, ey1 = _RASTER_BBOX
    rx, ry = 360.0 / 64.0 / 4.0, 180.0 / 64.0 / 4.0
    mw = int(round((ex1 - ex0) / rx))
    mh = int(round((ey1 - ey0) / ry))
    return f"""
        WITH {_PTS_CTE},
        t AS (
          SELECT least(63, greatest(0, CAST(floor((lon - -180.0) / 360.0 * 64.0) AS BIGINT))) AS x,
                 least(63, greatest(0, CAST(floor((90.0 - lat) / 180.0 * 64.0) AS BIGINT))) AS y
          FROM pts
        ),
        tc AS (
          SELECT 6 * 4503599627370496 + x * 67108864 + y AS tile_id,
                 CAST(count(*) AS BIGINT) AS weight
          FROM t GROUP BY 1
        ),
        chunks AS (
          SELECT tile_id, weight,
                 CAST(floor((tile_id - 27021597764222976) / 67108864) AS BIGINT) AS cx,
                 tile_id - 27021597764222976
                   - CAST(floor((tile_id - 27021597764222976) / 67108864) AS BIGINT) * 67108864 AS cy
          FROM tc
        ),
        cb AS (
          SELECT tile_id, weight,
                 -180.0 + 360.0 * cx / 64.0 AS c_lon_min,
                 90.0 - 180.0 * cy / 64.0 - 2.8125 AS c_lat_min,
                 -180.0 + 360.0 * cx / 64.0 + 5.625 AS c_lon_max,
                 90.0 - 180.0 * cy / 64.0 AS c_lat_max
          FROM chunks
        ),
        pruned AS (
          SELECT * FROM cb
          WHERE tile_id IN ({cells})
            AND c_lon_min <= {ex1!r} AND c_lon_max >= {ex0!r}
            AND c_lat_min <= {ey1!r} AND c_lat_max >= {ey0!r}
        ),
        cropped AS (
          SELECT tile_id, CAST(weight % 256 AS INTEGER) AS val,
                 c_lon_min, c_lat_min, c_lon_max, c_lat_max,
                 greatest(c_lon_min, {ex0!r}) AS ix0,
                 least(c_lon_max, {ex1!r}) AS ix1,
                 greatest(c_lat_min, {ey0!r}) AS iy0,
                 least(c_lat_max, {ey1!r}) AS iy1,
                 (c_lon_max - c_lon_min) / 4 AS crx,
                 (c_lat_max - c_lat_min) / 4 AS cry
          FROM pruned
        ),
        px AS (
          SELECT tile_id, val,
                 CAST(round((ix0 - c_lon_min) / crx) AS INTEGER) AS sx0,
                 CAST(round((c_lat_max - iy1) / cry) AS INTEGER) AS sy0,
                 CAST(round((ix1 - ix0) / crx) AS INTEGER) AS w_px,
                 CAST(round((iy1 - iy0) / cry) AS INTEGER) AS h_px,
                 CAST(floor((ix0 - {ex0!r}) / {rx!r}) AS INTEGER) AS ox,
                 CAST(floor(({ey1!r} - iy1) / {ry!r}) AS INTEGER) AS oy
          FROM cropped WHERE ix1 > ix0 AND iy1 > iy0
        ),
        rects0 AS (
          SELECT tile_id, val,
                 least(w_px, 4 - sx0) AS blk_w, least(h_px, 4 - sy0) AS blk_h,
                 greatest(0, -ox) AS bx0, greatest(0, -oy) AS by0,
                 greatest(0, ox) AS ox2, greatest(0, oy) AS oy2
          FROM px WHERE w_px >= 1 AND h_px >= 1
        ),
        rects AS (
          SELECT tile_id, val, ox2, oy2,
                 least(blk_w - bx0, {mw} - ox2) AS bw,
                 least(blk_h - by0, {mh} - oy2) AS bh
          FROM rects0
        ),
        grid AS (
          SELECT CAST(xx.x AS INTEGER) AS px_x, CAST(yy.y AS INTEGER) AS px_y
          FROM range(0, 64) xx(x), range(0, 64) yy(y)
        ),
        nat AS (
          SELECT px_x, px_y,
                 least(CAST((px_x * {mw}) // 64 AS INTEGER), {mw - 1}) AS nx,
                 least(CAST((px_y * {mh}) // 64 AS INTEGER), {mh - 1}) AS ny
          FROM grid
        )
        SELECT n.px_x, n.px_y,
               CAST(coalesce(arg_max(r.val, r.tile_id), 0) AS INTEGER) AS val
        FROM nat n LEFT JOIN (SELECT * FROM rects WHERE bw >= 1 AND bh >= 1) r
          ON n.nx BETWEEN r.ox2 AND r.ox2 + r.bw - 1
         AND n.ny BETWEEN r.oy2 AND r.oy2 + r.bh - 1
        GROUP BY n.px_x, n.px_y
    """


# DuckDB twin of operators/scoring.dsir_weights (target = lang 'en'):
# md5-prefix bucket assignment, per-bucket Laplace log-ratios fixed-pointed
# to BIGINT micro-units, exact integer per-doc sums — shared by the
# dsir_weights oracle and (wrapped with the Gumbel key) dsir_resample's.
# DuckDB twin of scoring.unigram_logprob (min_count=1), shared by the
# lm_score and ppl_buckets oracles: full independent vocab-count +
# Laplace smoothing + micro-unit fixed point; final per-doc surface in
# CTE `lm`.
_LM_CTE = """
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    occ AS (SELECT doc_id, unnest(toks) AS t FROM d),
    vocab AS (SELECT t, count(*) AS c FROM occ GROUP BY t),
    tot AS (SELECT sum(c) AS tt, count(*) AS v FROM vocab),
    lp AS (
      SELECT t, CAST(round(
               ln(CAST(c + 1 AS DOUBLE) / CAST(tt + v + 1 AS DOUBLE))
               * 1000000.0) AS BIGINT) AS lp
      FROM vocab, tot
    ),
    fl AS (
      SELECT CAST(round(
               ln(1.0 / CAST(tt + v + 1 AS DOUBLE))
               * 1000000.0) AS BIGINT) AS floor_lp
      FROM tot
    ),
    lm AS (
      SELECT occ.doc_id,
             CAST(count(*) AS INTEGER) AS n_tokens,
             CAST(sum(CASE WHEN lp.lp IS NULL THEN 1 ELSE 0 END)
                  AS INTEGER) AS n_oov,
             round(CAST(sum(coalesce(lp.lp, floor_lp)) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) / 1000000.0, 4)
               AS mean_logprob
      FROM occ LEFT JOIN lp USING (t), fl
      GROUP BY occ.doc_id
    )
"""


# DuckDB twin of _host_links -> webgraph.host_graph: rebuilds the
# deterministic outlink fixture arithmetically (3 targets per crawled
# page, hosts h%11==3 silent), then the same self-loop-free (src,dst)
# aggregation.
_WEBGRAPH_CTE = """
    WITH pg AS (
      SELECT doc_id, doc_id // 3 AS g, (doc_id // 3) % 997 AS h
      FROM documents
    ),
    links AS (
      SELECT printf('site%d.example', h) AS src,
             printf('site%d.example', (h * 31 + j * 97 + g % 13) % 997) AS dst
      FROM pg CROSS JOIN (VALUES (1), (2), (3)) AS t(j)
      WHERE h % 11 <> 3
    ),
    edges AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n_links
      FROM links WHERE src <> dst GROUP BY src, dst
    )
"""


def _pagerank_oracle(iterations: int = 4, d: int = 85, scale: int = 10**12) -> str:
    """Unrolled SQL twin of webgraph.pagerank: the same int64 update rule
    (share = rank // out_deg, damping = (d*x) // 100, dangling mass // n)
    iterated as chained CTEs — integer sums are associative, so this
    hash-matches the engine bit-for-bit."""
    base = f"(SELECT (({100 - d}) * {scale} // 100) // n FROM nn)"
    sql = _WEBGRAPH_CTE + f"""
    , pairs AS (SELECT DISTINCT src, dst FROM edges),
    nodes AS (SELECT src AS host FROM pairs UNION SELECT dst AS host FROM pairs),
    nn AS (SELECT count(*) AS n FROM nodes),
    od AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS out_deg
           FROM pairs GROUP BY src),
    r0 AS (SELECT host, CAST((SELECT {scale} // n FROM nn) AS BIGINT) AS r
           FROM nodes)
    """
    for k in range(iterations):
        sql += f"""
    , dang{k} AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dg
                  FROM r{k} WHERE host NOT IN (SELECT host FROM od)),
    c{k} AS (SELECT p.dst AS host, CAST(sum(r.r // o.out_deg) AS BIGINT) AS c
             FROM pairs p JOIN r{k} r ON r.host = p.src
                          JOIN od o ON o.host = p.src
             GROUP BY p.dst),
    r{k + 1} AS (SELECT n.host,
                 CAST({base}
                      + ({d} * (coalesce(c.c, 0)
                                + (SELECT dg FROM dang{k})
                                  // (SELECT n FROM nn))) // 100
                      AS BIGINT) AS r
                 FROM nodes n LEFT JOIN c{k} c ON c.host = n.host)
        """
    sql += f"""
    SELECT host, r AS rank_micro,
           CAST(r AS DOUBLE) / {float(scale)!r} AS "rank"
    FROM r{iterations}
    """
    return sql


_DSIR_SQL = """
    WITH d AS (
      SELECT doc_id, (lang = 'en') AS tgt,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ),
    d2 AS (SELECT doc_id, tgt, toks FROM d WHERE len(toks) >= 2),
    occ AS (
      SELECT doc_id, tgt, substring(md5(bg), 1, 3) AS f
      FROM (SELECT doc_id, tgt,
                   unnest(list_transform(
                     generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1])) AS bg
            FROM d2)
    ),
    counts AS (
      SELECT f, count(*) AS cr,
             sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
      FROM occ GROUP BY f
    ),
    tot AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM counts),
    ratio AS (
      SELECT f, CAST(round(
          (ln((CAST(ct AS DOUBLE) + 1.0)
              / (CAST(tt AS DOUBLE) + 4096.0))
         - ln((CAST(cr AS DOUBLE) + 1.0)
              / (CAST(tr AS DOUBLE) + 4096.0)))
          * 1000000.0) AS BIGINT) AS mu
      FROM counts, tot
    ),
    w AS (
      SELECT occ.doc_id, CAST(count(*) AS INTEGER) AS n_feats,
             CAST(sum(mu) AS DOUBLE) / 1000000.0 AS dsir_logratio
      FROM occ JOIN ratio USING (f)
      GROUP BY occ.doc_id
    )
"""

# DuckDB twin of (_url_pages -> functions.urls.canonicalize_url): rebuilds
# the deterministic messy urls from doc_id, then canonicalizes them with
# regexp components + list_filter/list_sort mirroring the Spark expression
# tree step for step.
_URL_CANON_CTE = r"""
    WITH p AS (
      SELECT doc_id, doc_id // 3 AS g,
             CAST((doc_id * 97) % 31536000 AS BIGINT) AS warc_sec,
             n_chars
      FROM documents
    ),
    u AS (
      SELECT doc_id, warc_sec, n_chars,
        (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        || (CASE WHEN doc_id % 2 = 0 THEN printf('Site%d.Example', g % 997)
                 ELSE printf('site%d.example', g % 997) END)
        || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
        || printf('/page/%d', g)
        || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
        || (CASE WHEN doc_id % 2 = 0
                 THEN printf('?b=%d&utm_campaign=c%d&a=%d', g % 4, doc_id % 7, g % 2)
                 ELSE printf('?a=%d&b=%d&fbclid=f%d', g % 2, g % 4, doc_id) END)
        || (CASE WHEN doc_id % 4 = 1 THEN printf('#sec%d', doc_id) ELSE '' END)
        AS url
      FROM p
    ),
    parts AS (
      SELECT *,
        lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) AS hostport,
        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS raw_path,
        regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS query
      FROM u
    ),
    hp AS (
      SELECT *,
        lower(split_part(hostport, ':', 1)) AS host,
        CASE WHEN hostport LIKE '%:%' THEN split_part(hostport, ':', 2)
             ELSE '' END AS port
      FROM parts
    ),
    norm AS (
      SELECT *,
        CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                  OR (scheme = 'https' AND port = '443')
             THEN '' ELSE ':' || port END AS port_part,
        CASE WHEN regexp_replace(raw_path, '/$', '') = '' THEN '/'
             ELSE regexp_replace(raw_path, '/$', '') END AS path,
        list_sort(list_filter(string_split(query, '&'),
          x -> x <> '' AND NOT regexp_matches(x,
               '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))) AS params
      FROM hp
    ),
    canon AS (
      SELECT doc_id, url, warc_sec, n_chars, host,
        scheme || '://' || host || port_part || path ||
        CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
             ELSE '' END AS canonical_url
      FROM norm
    )
"""


def oracle_sql() -> dict[str, str]:
    # compiler's DWithin residual embeds python-computed constants; mirror them
    from geomesa_spark.geom.kernels import meters_to_degrees

    dw_deg = meters_to_degrees(_DW_M, _DW_LAT)
    dw_rlat2 = _DW_LAT * 3.141592653589793 / 180.0
    dw_hav = (
        f"2.0 * 6371008.8 * asin(sqrt(least(1.0, "
        f"pow(sin(({dw_rlat2!r} - radians(lat)) / 2), 2) "
        f"+ cos(radians(lat)) * cos({dw_rlat2!r}) "
        f"* pow(sin(radians({_DW_LON!r} - lon) / 2), 2))))"
    )

    tile6 = (
        "least(63, greatest(0, CAST(floor((lon - -180.0) / 360.0 * 64.0) AS BIGINT))) AS x, "
        "least(63, greatest(0, CAST(floor((90.0 - lat) / 180.0 * 64.0) AS BIGINT))) AS y"
    )

    stop_list = "'the','and','of','to','in','is','that','for'"

    return {
        "bbox": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon BETWEEN -50 AND 30 AND lat BETWEEN -20 AND 45
        """,
        # S2 cover is a superset + exact residual -> identical to plain bbox
        "bbox_s2": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon BETWEEN -50 AND 30 AND lat BETWEEN -20 AND 45
        """,
        "bbox_time": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon BETWEEN -120 AND 60 AND lat BETWEEN -60 AND 70
              AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        """,
        "bbox_time_indexed": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon BETWEEN -120 AND 60 AND lat BETWEEN -60 AND 70
              AND ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        """,
        "intersects": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts WHERE {_tri_sql()}
        """,
        "within": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts WHERE {_tri_sql()}
        """,
        "contains_pt": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon = {-180.0 + (42 * 7919 % 36000) / 100.0!r}
              AND lat = {-90.0 + (42 * 104729 % 18000) / 100.0!r}
        """,
        "disjoint": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon BETWEEN -60 AND 60 AND lat BETWEEN -60 AND 60
              AND NOT {_tri_sql()}
        """,
        "bbox_geoms": f"""
            WITH {_PTS_CTE},
            g AS (
              SELECT event_id, lon, lat,
                     0.055 + CAST(event_id % 10 AS DOUBLE) * 0.02 AS h,
                     0.065 + CAST(event_id % 7 AS DOUBLE) * 0.03 AS ll
              FROM pts
            )
            SELECT event_id FROM g
            WHERE CASE WHEN event_id % 2 = 0 THEN
                    lon - h <= {_GEOM_BOX[2]!r} AND lon + h >= {_GEOM_BOX[0]!r}
                    AND lat - h <= {_GEOM_BOX[3]!r} AND lat + h >= {_GEOM_BOX[1]!r}
                  ELSE
                    lat BETWEEN {_GEOM_BOX[1]!r} AND {_GEOM_BOX[3]!r}
                    AND lon + ll >= {_GEOM_BOX[0]!r} AND lon - ll <= {_GEOM_BOX[2]!r}
                  END
        """,
        "spatial_join_geoms": f"""
            WITH {_PTS_CTE},
            g AS (
              SELECT event_id, lon, lat,
                     0.055 + CAST(event_id % 10 AS DOUBLE) * 0.02 AS h,
                     0.065 + CAST(event_id % 7 AS DOUBLE) * 0.03 AS ll
              FROM pts
            ),
            boxes(poly_id, x0, y0, x1, y1) AS (VALUES {_boxes_values()})
            SELECT event_id, poly_id FROM g CROSS JOIN boxes
            WHERE CASE WHEN event_id % 2 = 0 THEN
                    lon - h <= x1 AND lon + h >= x0
                    AND lat - h <= y1 AND lat + h >= y0
                  ELSE
                    lat BETWEEN y0 AND y1
                    AND lon + ll >= x0 AND lon - ll <= x1
                  END
        """,
        "dwithin": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon BETWEEN {_DW_LON - dw_deg!r} AND {_DW_LON + dw_deg!r}
              AND lat BETWEEN {_DW_LAT - dw_deg!r} AND {_DW_LAT + dw_deg!r}
              AND {dw_hav} <= {_DW_M!r}
        """,
        "attr_filter": """
            SELECT event_id FROM events WHERE event_type = 'click' AND value >= 50.0
        """,
        "attr_filter_indexed": """
            SELECT event_id FROM events WHERE event_type = 'click' AND value >= 50.0
        """,
        "bbox_indexed": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE lon BETWEEN -50 AND 30 AND lat BETWEEN -20 AND 45
        """,
        "record_lookup": """
            SELECT event_id, event_type, user_id FROM events
            WHERE event_id IN (5, 42, 999, 4999)
        """,
        "or_union": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE (lon BETWEEN -50 AND 30 AND lat BETWEEN -20 AND 45)
               OR event_type = 'error'
        """,
        "knn": f"""
            WITH {_PTS_CTE},
            q(query_id, q_lon, q_lat) AS (VALUES {", ".join(f"('{qid}', {x!r}, {y!r})" for qid, x, y in _KNN_QUERIES)}),
            d AS (
              SELECT q.query_id, pts.event_id,
                     {_hav_sql("q.q_lon", "q.q_lat")} AS dist
              FROM pts CROSS JOIN q
            ),
            r AS (
              SELECT query_id, event_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, event_id ASC) AS rn
              FROM d
            )
            SELECT query_id, event_id FROM r WHERE rn <= 10
        """,
        # twin of knn.knn_hex_ring: exact euclid-degree top-10, index-free
        # — hex-disk candidate generation may only change the work, never
        # the answer (same operand order in the distance, same tie-break)
        "knn_hex": f"""
            WITH {_PTS_CTE},
            q(query_id, q_lon, q_lat) AS (VALUES {", ".join(f"('{qid}', {x!r}, {y!r})" for qid, x, y in _KNN_QUERIES)}),
            d AS (
              SELECT q.query_id, pts.event_id,
                     sqrt(pow(pts.lon - q.q_lon, 2)
                          + pow(pts.lat - q.q_lat, 2)) AS dist
              FROM pts CROSS JOIN q
            ),
            r AS (
              SELECT query_id, event_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY dist ASC, event_id ASC) AS rn
              FROM d
            )
            SELECT query_id, event_id FROM r WHERE rn <= 10
        """,
        "proximity": f"""
            WITH {_PTS_CTE},
            sites(site_id, s_lon, s_lat, b0, b1, b2, b3) AS (VALUES {_sites_values()})
            SELECT site_id, event_id
            FROM pts JOIN sites
              ON lon BETWEEN b0 AND b2 AND lat BETWEEN b1 AND b3
            WHERE 2.0 * 6371008.8 * asin(sqrt(least(1.0,
                    pow(sin((radians(s_lat) - radians(lat)) / 2), 2)
                    + cos(radians(lat)) * cos(radians(s_lat))
                    * pow(sin(radians(s_lon - lon) / 2), 2)))) <= {_PROX_M!r}
        """,
        "tube": f"""
            WITH {_PTS_CTE},
            bins(tube_bin, t_lo, t_hi, c_lon, c_lat, radius_m, b0, b1, b2, b3)
              AS (VALUES {_tube_values()}),
            j AS (
              SELECT pts.event_id, bins.tube_bin,
                     2.0 * 6371008.8 * asin(sqrt(least(1.0,
                       pow(sin((radians(c_lat) - radians(lat)) / 2), 2)
                       + cos(radians(lat)) * cos(radians(c_lat))
                       * pow(sin(radians(c_lon - lon) / 2), 2)))) AS dist_m,
                     radius_m
              FROM pts JOIN bins
                ON secs BETWEEN t_lo AND t_hi
               AND lon BETWEEN b0 AND b2 AND lat BETWEEN b1 AND b3
            ),
            k AS (
              SELECT tube_bin, event_id,
                     row_number() OVER (PARTITION BY event_id ORDER BY dist_m ASC, tube_bin ASC) AS rn
              FROM j WHERE dist_m <= radius_m
            )
            SELECT tube_bin, event_id FROM k WHERE rn = 1
        """,
        "spatial_join_boxes": f"""
            WITH {_PTS_CTE},
            boxes(poly_id, x0, y0, x1, y1) AS (VALUES {_boxes_values()})
            SELECT poly_id, event_id FROM pts JOIN boxes
              ON lon BETWEEN x0 AND x1 AND lat BETWEEN y0 AND y1
        """,
        "spatial_join_poly": f"""
            WITH {_PTS_CTE},
            boxes(poly_id, x0, y0, x1, y1) AS (VALUES {_boxes_values()})
            SELECT poly_id, event_id FROM pts JOIN boxes
              ON lon BETWEEN x0 AND x1 AND lat BETWEEN y0 AND y1
            UNION ALL
            SELECT 'tri_a' AS poly_id, event_id FROM pts WHERE {_tri_sql()}
        """,
        "density": f"""
            WITH {_PTS_CTE},
            g AS (
              SELECT least(63, greatest(0,
                       CAST(floor((lon - -180.0) / 360.0 * 64) AS INTEGER))) AS i,
                     least(31, greatest(0,
                       CAST(floor((lat - -90.0) / 180.0 * 32) AS INTEGER))) AS j
              FROM pts
              WHERE lon BETWEEN -180.0 AND 180.0 AND lat BETWEEN -90.0 AND 90.0
            )
            SELECT i, j, CAST(count(*) AS DOUBLE) AS weight FROM g GROUP BY i, j
        """,
        "temporal_density": f"""
            WITH {_PTS_CTE}
            SELECT least(29, CAST(floor((secs - 1704067200) / 86400.0) AS INTEGER)) AS bucket,
                   count(*) AS n
            FROM pts
            WHERE secs >= 1704067200 AND secs < 1706659200
            GROUP BY 1
        """,
        "unique_hist": """
            SELECT event_type AS "value", count(*) AS "count"
            FROM events GROUP BY event_type
        """,
        "count_by_day": """
            SELECT strftime(ts, '%Y%m%d') AS day, count(*) AS n
            FROM events GROUP BY 1
        """,
        "bounds": f"""
            WITH {_PTS_CTE}
            SELECT min(lon) AS lon_min, min(lat) AS lat_min,
                   max(lon) AS lon_max, max(lat) AS lat_max
            FROM pts
        """,
        "tile_counts": f"""
            WITH {_PTS_CTE},
            t AS (SELECT {tile6} FROM pts)
            SELECT 6 * 4503599627370496 + x * 67108864 + y AS tile_id,
                   CAST(count(*) AS BIGINT) AS weight
            FROM t GROUP BY 1
        """,
        "tile_rollup": f"""
            WITH {_PTS_CTE},
            t AS (SELECT {tile6} FROM pts)
            SELECT 4 * 4503599627370496 + (x >> 2) * 67108864 + (y >> 2) AS tile_id,
                   CAST(count(*) AS BIGINT) AS weight
            FROM t GROUP BY 1
        """,
        "surface": f"""
            WITH {_PTS_CTE},
            t AS (SELECT {tile6}, value FROM pts)
            SELECT 6 * 4503599627370496 + x * 67108864 + y AS cell,
                   max(value) AS vmax
            FROM t GROUP BY 1
        """,
        "bin_records": f"""
            WITH {_PTS_CTE}
            SELECT user_id AS track, CAST(secs AS INTEGER) AS secs,
                   CAST(lat AS FLOAT) AS lat, CAST(lon AS FLOAT) AS lon
            FROM pts
        """,
        "geoparse_docs": """
            SELECT doc_id,
                   CAST(-180.0 + (doc_id * 7919 % 36000) / 100.0 AS DOUBLE) AS lon,
                   CAST(-90.0 + (doc_id * 104729 % 18000) / 100.0 AS DOUBLE) AS lat
            FROM documents
        """,
        "extract_text": """
            SELECT doc_id, text FROM documents
        """,
        "dedup_exact": """
            WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents)
            SELECT min(doc_id) AS doc_id, content_hash FROM h GROUP BY content_hash
        """,
        "convert_delimited": """
            SELECT event_id, event_type, value FROM events
        """,
        "convert_avro": """
            SELECT event_id, user_id, event_type, value FROM events
            WHERE event_id < 200
        """,
        "vis_filter": f"""
            WITH m AS (SELECT event_id, {_VIS_CASE} AS vis FROM events)
            SELECT event_id, vis FROM m WHERE vis IN ('ops', '')
        """,
        "transform_project": f"""
            WITH {_PTS_CTE}
            SELECT event_id, event_type || '-tag' AS label,
                   CAST(value AS DOUBLE) AS v2
            FROM pts
            WHERE lon BETWEEN -50 AND 30 AND lat BETWEEN -20 AND 45
        """,
        "dms_parse": """
            SELECT event_id,
                   CASE WHEN event_id % 2 = 0 THEN
                     CAST(event_id % 89 AS DOUBLE)
                     + CAST(event_id % 60 AS DOUBLE) / 60.0
                     + CAST(event_id % 57 AS DOUBLE) / 3600.0
                   ELSE
                     -(CAST(event_id % 89 AS DOUBLE)
                       + CAST(event_id % 60 AS DOUBLE) / 60.0
                       + CAST(event_id % 57 AS DOUBLE) / 3600.0)
                   END AS lat_dec
            FROM events
        """,
        "density_wkt": f"""
            WITH {_PTS_CTE},
            g AS (
              SELECT least(63, greatest(0,
                       CAST(floor((lon - -180.0) / 5.625) AS BIGINT))) AS i64,
                     least(31, greatest(0,
                       CAST(floor((lat - -90.0) / 5.625) AS BIGINT))) AS j64
              FROM pts
            )
            SELECT CAST(i64 AS INTEGER) AS i, CAST(j64 AS INTEGER) AS j,
                   CAST(count(*) AS DOUBLE) AS weight
            FROM g GROUP BY 1, 2
        """,
        "bbox_idl": f"""
            WITH {_PTS_CTE}
            SELECT event_id FROM pts
            WHERE (lon >= 170 OR lon <= -170) AND lat BETWEEN -60 AND 60
        """,
        "geojson_roundtrip": f"""
            WITH {_PTS_CTE}
            SELECT event_id, lon AS gj_lon, lat AS gj_lat FROM pts
        """,
        "gml_roundtrip": f"""
            WITH {_PTS_CTE}
            SELECT event_id, lon AS gml_lon, lat AS gml_lat FROM pts
        """,
        "redact_pii": r"""
            WITH built AS (
                SELECT doc_id,
                       'contact user' || CAST(doc_id AS VARCHAR)
                       || '@site' || CAST(doc_id % 7 AS VARCHAR)
                       || '.org or +49'
                       || lpad(CAST((CAST(doc_id AS BIGINT) * 37) % 100000000
                               AS VARCHAR), 8, '0')
                       || ' at 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.' || CAST(doc_id % 200 AS VARCHAR)
                       || ' :: ' || text AS raw
                FROM documents
            )
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(raw,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                       '<IP>', 'g'),
                       '\+[0-9]{9,15}', '<PHONE>', 'g') AS clean,
                   CAST(len(regexp_extract_all(raw,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'))
                       AS INTEGER) AS n_email,
                   CAST(len(regexp_extract_all(raw,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                       AS INTEGER) AS n_ip,
                   CAST(len(regexp_extract_all(raw,
                       '\+[0-9]{9,15}')) AS INTEGER) AS n_phone
            FROM built
        """,
        "decontaminate": """
            WITH bench AS (
                SELECT doc_id AS bid,
                       array_to_string(
                           list_slice(string_split(text, ' '), 1, 13), ' '
                       ) AS gram
                FROM documents
                WHERE doc_id % 97 = 0
                  AND len(string_split(text, ' ')) >= 13
            ),
            toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            wins AS (
                SELECT doc_id,
                       array_to_string(list_slice(t, i, i + 12), ' ') AS w
                FROM toks, UNNEST(generate_series(1, len(t) - 12)) AS u(i)
            )
            SELECT w.doc_id,
                   CAST(count(*) AS INTEGER) AS n_hits,
                   CAST(count(DISTINCT b.bid) AS INTEGER) AS n_bench_hit
            FROM wins w JOIN bench b ON w.w = b.gram
            GROUP BY w.doc_id
        """,
        "blocklist": _URL_CANON_CTE + """
            SELECT doc_id, url,
                   CASE
                     WHEN host = 'site13.example'
                          OR host LIKE '%.site13.example'
                       THEN 'site13.example'
                     WHEN host = 'site250.example'
                          OR host LIKE '%.site250.example'
                       THEN 'site250.example'
                     WHEN host = 'site777.example'
                          OR host LIKE '%.site777.example'
                       THEN 'site777.example'
                   END AS blocked_domain
            FROM hp
        """,
        "repetition": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS tk FROM documents
            ),
            built AS (
                SELECT doc_id,
                       array_to_string(
                           list_transform(
                               generate_series(0,
                                   CAST(ceil(len(tk) / 10.0) AS INT) - 1),
                               i -> array_to_string(
                                   list_slice(tk, i * 10 + 1, i * 10 + 10),
                                   ' ')
                           ), chr(10))
                       || repeat(
                           chr(10) || array_to_string(
                               list_slice(tk, 1, 10), ' '),
                           CAST(doc_id % 3 AS INT)) AS txt
                FROM t
            ),
            lines AS (
                SELECT doc_id, u.l
                FROM built, UNNEST(string_split(txt, chr(10))) AS u(l)
            ),
            per_line AS (
                SELECT doc_id, l, count(*) AS c FROM lines GROUP BY 1, 2
            ),
            line_sig AS (
                SELECT doc_id,
                       CAST(sum(c) AS INTEGER) AS n_lines,
                       CASE WHEN sum(c) = 0 THEN 0.0 ELSE
                           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END)
                                AS DOUBLE) / CAST(sum(c) AS DOUBLE)
                       END AS dup_line_frac,
                       CASE WHEN sum(c * len(l)) = 0 THEN 0.0 ELSE
                           CAST(sum(CASE WHEN c > 1 THEN c * len(l)
                                    ELSE 0 END) AS DOUBLE)
                           / CAST(sum(c * len(l)) AS DOUBLE)
                       END AS dup_line_char_frac
                FROM per_line GROUP BY doc_id
            ),
            bt AS (
                SELECT doc_id,
                       string_split(replace(txt, chr(10), ' '), ' ') AS tk2,
                       len(replace(txt, chr(10), ' ')) AS tlen
                FROM built
            ),
            bgs AS (
                SELECT doc_id, tlen,
                       array_to_string(list_slice(tk2, i, i + 1), ' ') AS bg
                FROM bt, UNNEST(generate_series(1, len(tk2) - 1)) AS u(i)
            ),
            per_bg AS (
                SELECT doc_id, bg, count(*) AS c, first(tlen) AS tlen
                FROM bgs GROUP BY 1, 2
            ),
            bg_sig AS (
                SELECT doc_id,
                       CASE WHEN first(tlen) = 0 THEN 0.0 ELSE
                           CAST(max(c * len(bg)) AS DOUBLE)
                           / CAST(first(tlen) AS DOUBLE)
                       END AS top_bigram_mass_frac
                FROM per_bg GROUP BY doc_id
            )
            SELECT l.doc_id, n_lines, dup_line_frac, dup_line_char_frac,
                   COALESCE(top_bigram_mass_frac, 0.0) AS top_bigram_mass_frac
            FROM line_sig l LEFT JOIN bg_sig b ON l.doc_id = b.doc_id
        """,
        "boilerplate": """
            SELECT doc_id, lang,
                   'body-' || CAST(doc_id AS VARCHAR) || chr(10)
                   || 'x-' || CAST(doc_id % 3 AS VARCHAR) AS text,
                   CAST(2 AS INTEGER) AS n_lines_kept,
                   CAST(2 AS INTEGER) AS n_lines_removed
            FROM documents
        """,
        "shp_roundtrip": f"""
            WITH {_PTS_CTE},
            sel AS (SELECT event_id, lon, lat FROM pts WHERE event_id % 97 = 0)
            SELECT event_id, 'point' AS shape, CAST(1 AS INTEGER) AS nv,
                   lon AS x0, lat AS y0, lon AS x1, lat AS y1 FROM sel
            UNION ALL
            SELECT event_id, 'line', CAST(2 AS INTEGER),
                   lon, lat, lon + 1.0, lat + 0.5 FROM sel
            UNION ALL
            SELECT event_id, 'polygon', CAST(4 AS INTEGER),
                   lon, lat, lon + 1.0, lat + 1.0 FROM sel
        """,
        "bin_pack": """
            SELECT event_type AS track, CAST(count(*) AS BIGINT) AS n,
                   CAST(16 AS INTEGER) AS record_width
            FROM events GROUP BY event_type
        """,
        "convert_fixedwidth": """
            SELECT event_id, user_id, event_type FROM events
        """,
        "ts_filter": f"""
            SELECT event_id FROM events
            WHERE ts BETWEEN TIMESTAMP '{_TS_LO.strftime("%Y-%m-%d %H:%M:%S")}'
                         AND TIMESTAMP '{_TS_HI.strftime("%Y-%m-%d %H:%M:%S")}'
        """,
        "raster_query": _raster_query_oracle(),
        "mosaic": _mosaic_oracle(),
        "span_dedup": r"""
            WITH planted AS (
              SELECT doc_id,
                     substring(coalesce(text, ''), 1, 40)
                     || chr(10) || chr(10)
                     || printf('shared paragraph %d duplicated across the corpus',
                               doc_id % 40)
                     || chr(10) || chr(10)
                     || substring(coalesce(text, ''), 5, 40) AS text
              FROM documents
            ),
            arrs AS (
              SELECT doc_id, regexp_split_to_array(text, '\n{2,}') AS arr
              FROM planted
            ),
            spans0 AS (
              SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS span_idx,
                     trim(arr[CAST(u.i AS INTEGER)]) AS norm
              FROM arrs, unnest(generate_series(1, len(arr))) u(i)
            ),
            spans AS (SELECT * FROM spans0 WHERE length(norm) >= 20),
            r AS (
              SELECT doc_id, span_idx, norm,
                     row_number() OVER (PARTITION BY norm
                                        ORDER BY doc_id, span_idx) AS rn,
                     count(*) OVER (PARTITION BY norm) AS n_occ
              FROM spans
            )
            SELECT doc_id, span_idx, md5(norm) AS span_md5,
                   CAST(n_occ AS BIGINT) AS n_occurrences
            FROM r WHERE n_occ >= 2 AND rn > 1
        """,
        "replay": f"""
            WITH {_PTS_CTE},
            m AS (
              SELECT event_id AS msg_offset,
                     CASE WHEN event_id % 17 = 0 THEN 'delete' ELSE 'create' END AS kind,
                     CAST(user_id AS VARCHAR) AS id, lon, lat, ts
              FROM pts
              WHERE ts <= TIMESTAMP '2024-01-20 00:00:00'
            ),
            r AS (
              SELECT *, row_number() OVER (PARTITION BY id ORDER BY msg_offset DESC) AS rn FROM m
            )
            SELECT id, lon, lat, ts FROM r WHERE rn = 1 AND kind = 'create'
        """,
        "map_agg_json": """
            SELECT event_type,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
            FROM events GROUP BY event_type
        """,
        "knn_ring": f"""
            WITH {_PTS_CTE},
            q(query_id, q_lon, q_lat) AS (VALUES {", ".join(f"('{qid}', {x!r}, {y!r})" for qid, x, y in _KNN_QUERIES)}),
            d AS (
              SELECT q.query_id, pts.event_id,
                     {_hav_sql("q.q_lon", "q.q_lat")} AS dist
              FROM pts CROSS JOIN q
            ),
            r AS (
              SELECT query_id, event_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, event_id ASC) AS rn
              FROM d
            )
            SELECT query_id, event_id FROM r WHERE rn <= 10
        """,
        "ann_cosine": """
            WITH q AS (SELECT vec_id AS qvid, embedding AS qe FROM embeddings WHERE vec_id < 3),
            s AS (
              SELECT 'q' || CAST(q.qvid AS VARCHAR) AS query_id, e.vec_id,
                     list_cosine_similarity(e.embedding, q.qe) AS sim
              FROM embeddings e CROSS JOIN q
            ),
            r AS (
              SELECT query_id, vec_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC)
                       AS rank
              FROM s
            )
            SELECT query_id, vec_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 5
        """,
        "text_quality": f"""
            WITH m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                     length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x IN ({stop_list}))) AS n_stop
              FROM documents
            ),
            r AS (
              SELECT doc_id, n_chars, n_tokens,
                     CAST(greatest(1, n_chars) AS DOUBLE) AS sc,
                     CAST(greatest(1, n_tokens) AS DOUBLE) AS st,
                     n_punct, n_digit, n_upper, n_stop
              FROM m
            )
            SELECT doc_id,
                   CAST(n_chars AS INTEGER) AS n_chars,
                   CAST(n_tokens AS INTEGER) AS n_tokens,
                   round(sc / st, 6) AS mean_token_len,
                   round(n_punct / sc, 6) AS punct_ratio,
                   round(n_digit / sc, 6) AS digit_ratio,
                   round(n_upper / sc, 6) AS upper_ratio,
                   round(n_stop / st, 6) AS stopword_ratio,
                   round(1.0 - least(0.5, n_punct / sc) - least(0.3, n_digit / sc)
                         + least(0.2, n_stop / st), 6) AS quality_score
            FROM r
        """,
        # twin of scoring.build_postings: same tokenizer, same
        # (tf DESC, doc ASC) rank cut, df from a separate term count
        "postings": """
            WITH t AS (
              SELECT doc_id AS doc,
                     unnest(list_filter(
                       string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x <> '')) AS term
              FROM documents
            ),
            tf AS (
              SELECT term, doc, CAST(count(*) AS BIGINT) AS tf
              FROM t GROUP BY term, doc
            ),
            dfq AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df_term
              FROM tf GROUP BY term HAVING count(*) >= 2
            ),
            r AS (
              SELECT term, doc, tf,
                     CAST(row_number() OVER (
                       PARTITION BY term ORDER BY tf DESC, doc ASC)
                       AS INTEGER) AS rnk
              FROM tf
            )
            SELECT r.term, dfq.df_term, r.doc, r.tf, r.rnk
            FROM r JOIN dfq USING (term)
            WHERE r.rnk <= 3
        """,
        # twin of ann.semantic_dedup: same planted 2x copies, same
        # argmax-cosine assignment (lowest-cell tie-break), same
        # triangular drop rule (smaller-id same-cell member at cos>=0.8)
        "semdedup": """
            WITH corpus AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
              FROM embeddings
              UNION ALL
              SELECT vec_id + 1000,
                     list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)
              FROM embeddings WHERE vec_id < 30
            ),
            cents AS (
              SELECT vec_id AS cell,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
              FROM embeddings WHERE vec_id < 8
            ),
            a AS (
              SELECT c.vec_id, t.cell,
                     row_number() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY list_cosine_similarity(c.ev, t.ce) DESC,
                                t.cell ASC) AS rn
              FROM corpus c CROSS JOIN cents t
            ),
            members AS (
              SELECT a.vec_id, a.cell, c.ev
              FROM a JOIN corpus c ON c.vec_id = a.vec_id
              WHERE a.rn = 1
            ),
            dropped AS (
              SELECT DISTINCT d.vec_id
              FROM members d JOIN members e
                ON e.cell = d.cell AND e.vec_id < d.vec_id
              WHERE list_cosine_similarity(d.ev, e.ev) >= 0.8
            )
            SELECT m.vec_id, CAST(m.cell AS INTEGER) AS cell,
                   (dr.vec_id IS NULL) AS keep
            FROM members m LEFT JOIN dropped dr ON dr.vec_id = m.vec_id
        """,
        # twin of ann.incremental_semantic_dedup: same planted snapshot
        # (0.5x copies dup, negated rows new), same argmax-cosine cell
        # assignment on BOTH sides, same min-matching-id choice
        "incr_semdedup": """
            WITH corpus AS (
              SELECT vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
              FROM embeddings
            ),
            snap AS (
              SELECT vec_id + 5000 AS vec_id,
                     list_transform(embedding, x -> CAST(x AS DOUBLE) * 0.5) AS ev
              FROM embeddings WHERE vec_id < 40
              UNION ALL
              SELECT vec_id + 6000,
                     list_transform(embedding, x -> -CAST(x AS DOUBLE))
              FROM embeddings WHERE vec_id >= 40 AND vec_id < 80
            ),
            cents AS (
              SELECT vec_id AS cell,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
              FROM embeddings WHERE vec_id < 8
            ),
            sa AS (
              SELECT vec_id, cell FROM (
                SELECT s.vec_id, t.cell,
                       row_number() OVER (
                         PARTITION BY s.vec_id
                         ORDER BY list_cosine_similarity(s.ev, t.ce) DESC,
                                  t.cell ASC) AS rn
                FROM snap s CROSS JOIN cents t) WHERE rn = 1
            ),
            ca AS (
              SELECT vec_id, cell FROM (
                SELECT c.vec_id, t.cell,
                       row_number() OVER (
                         PARTITION BY c.vec_id
                         ORDER BY list_cosine_similarity(c.ev, t.ce) DESC,
                                  t.cell ASC) AS rn
                FROM corpus c CROSS JOIN cents t) WHERE rn = 1
            ),
            cand AS (
              -- LEFT joins mirror the engine's left join: a snapshot row
              -- whose cell holds no corpus members keeps its row with a
              -- NULL sim (counted as 'new'), never silently vanishes
              SELECT sa.vec_id, sa.cell, ca.vec_id AS cid,
                     list_cosine_similarity(s.ev, c.ev) AS sim
              FROM sa
              JOIN snap s ON s.vec_id = sa.vec_id
              LEFT JOIN ca ON ca.cell = sa.cell
              LEFT JOIN corpus c ON c.vec_id = ca.vec_id
            )
            SELECT vec_id, CAST(cell AS INTEGER) AS cell,
                   CASE WHEN count(*) FILTER (WHERE sim >= 0.8) > 0
                        THEN 'dup' ELSE 'new' END AS verdict,
                   min(cid) FILTER (WHERE sim >= 0.8) AS match_id,
                   CAST(count(*) FILTER (WHERE sim >= 0.8) AS BIGINT)
                     AS n_matches
            FROM cand GROUP BY vec_id, cell
        """,
        # twin of dedup.select_canonical: closed-form chain components
        # (doc_id - doc_id % 50, the dedup_components fixture), the
        # text_quality score arithmetic, and the two-step keep cut
        # (max score per component, then min id among score ties)
        "dedup_select": f"""
            WITH m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END
                       AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                       AS n_punct,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                       AS n_digit,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x IN ({stop_list}))) AS n_stop
              FROM documents
            ),
            q AS (
              SELECT doc_id,
                     doc_id - (doc_id % 50) AS component,
                     round(1.0
                           - least(0.5, n_punct / CAST(greatest(1, n_chars) AS DOUBLE))
                           - least(0.3, n_digit / CAST(greatest(1, n_chars) AS DOUBLE))
                           + least(0.2, n_stop / CAST(greatest(1, n_tokens) AS DOUBLE)),
                           6) AS qs
              FROM m
            ),
            mx AS (SELECT component, max(qs) AS ms FROM q GROUP BY component),
            keepers AS (
              SELECT q.component, min(q.doc_id) AS keep_id
              FROM q JOIN mx ON mx.component = q.component AND q.qs = mx.ms
              GROUP BY q.component
            )
            SELECT q.doc_id, q.component, (q.doc_id = k.keep_id) AS keep
            FROM q JOIN keepers k ON k.component = q.component
        """,
        # twin of webpages.extract_outlinks: the html is rebuilt
        # arithmetically and DuckDB runs the SAME two RE2-subset regexes
        # (backref-free by design) — parity of the regex semantics
        # twin of cells/hexgrid.hex_qr at res=3: identical 17-digit double
        # literals, identical operation order, floor(x+0.5) rounding on
        # both sides (native round() differs on ties between engines) —
        # cell assignment is bit-identical, so the aggregate hash-matches
        "hex_density": """
            WITH pts AS (
                SELECT -180.0 + (event_id * 7919 % 36000) / 100.0 AS lon,
                       -90.0 + (event_id * 104729 % 18000) / 100.0 AS lat
                FROM events
            ),
            ax AS (
                SELECT (0.5773502691896257 * lon - 0.3333333333333333 * lat)
                           / 0.5399492471560388 AS fx,
                       (0.6666666666666666 * lat) / 0.5399492471560388 AS fz
                FROM pts
            ),
            rr AS (
                SELECT fx, fz, -fx - fz AS fy,
                       CAST(floor(fx + 0.5) AS DOUBLE) AS rx,
                       CAST(floor(-fx - fz + 0.5) AS DOUBLE) AS ry,
                       CAST(floor(fz + 0.5) AS DOUBLE) AS rz
                FROM ax
            ),
            cells AS (
                SELECT CASE WHEN abs(rx - fx) > abs(ry - fy)
                                 AND abs(rx - fx) > abs(rz - fz)
                            THEN -ry - rz ELSE rx END AS q,
                       CASE WHEN NOT (abs(rx - fx) > abs(ry - fy)
                                      AND abs(rx - fx) > abs(rz - fz))
                                 AND NOT (abs(ry - fy) > abs(rz - fz))
                            THEN -rx - ry ELSE rz END AS r
                FROM rr
            )
            SELECT CAST(q AS BIGINT) AS hex_q, CAST(r AS BIGINT) AS hex_r,
                   CAST(count(*) AS BIGINT) AS n
            FROM cells GROUP BY 1, 2
        """,
        # twin of webgraph.resolve_redirects: the oracle walks the SAME
        # planted edges sequentially (hop-capped recursive CTE) where the
        # engine pointer-doubles in log rounds — algorithm parity on
        # final url + exact hop count, verdict parity on the unresolved
        # flag (loops and over-cap chains)
        "redirects": """
            WITH RECURSIVE e AS (
                SELECT printf('https://r%d.example/%d', doc_id % 239, doc_id) AS url,
                       CASE
                         WHEN doc_id % 16 <= 6 OR doc_id % 16 IN (8, 9)
                           THEN printf('https://r%d.example/%d',
                                       (doc_id + 1) % 239, doc_id + 1)
                         WHEN doc_id % 16 = 10
                           THEN printf('https://r%d.example/%d',
                                       (doc_id - 2) % 239, doc_id - 2)
                         WHEN doc_id % 16 = 11
                           THEN printf('https://r%d.example/%d',
                                       doc_id % 239, doc_id)
                       END AS target
                FROM documents
                WHERE doc_id % 16 <= 6 OR doc_id % 16 BETWEEN 8 AND 11
            ),
            walk(u, cur, hops) AS (
                SELECT url, target, 1 FROM e
                UNION ALL
                SELECT w.u, e2.target, w.hops + 1
                FROM walk w JOIN e e2 ON w.cur = e2.url
                WHERE w.hops < 64
            ),
            last AS (
                SELECT u, arg_max(cur, hops) AS cur, max(hops) AS h
                FROM walk GROUP BY u
            )
            SELECT l.u AS url,
                   CASE WHEN s.url IS NULL THEN l.cur END AS final_url,
                   CASE WHEN s.url IS NULL THEN CAST(l.h AS BIGINT) END AS hops,
                   (s.url IS NOT NULL) AS unresolved
            FROM last l
            LEFT JOIN (SELECT DISTINCT url FROM e) s ON l.cur = s.url
        """,
        # twin of webpages.parse_sitemaps: rebuilds the byte-identical
        # planted XML with printf/||/chr(10) and runs the SAME (?s)
        # non-greedy RE2-subset block regexes plus the same per-block
        # loc/lastmod extraction — regex-semantics parity
        "sitemaps": """
            WITH base AS (
                SELECT doc_id, doc_id % 389 AS h FROM documents
            ),
            xml AS (
                SELECT printf('https://s%d.example/sitemaps/%d.xml', h, doc_id) AS url,
                       CASE WHEN doc_id % 7 = 0 THEN
                         '<sitemapindex>' || chr(10) ||
                         array_to_string(list_transform([1, 2], j ->
                           printf('<sitemap>%s<loc>https://s%d.example/sitemap%d.xml</loc><lastmod>2025-01-0%d</lastmod></sitemap>%s',
                                  chr(10), h, j, j, chr(10))), '') ||
                         '</sitemapindex>'
                       ELSE
                         '<urlset>' || chr(10) ||
                         array_to_string(list_transform([1, 2, 3], j ->
                           CASE WHEN j = 3 AND doc_id % 11 = 0
                                THEN '<url><lastmod>x</lastmod></url>' || chr(10)
                                ELSE printf('<url>%s  <loc> https://s%d.example/p/%d </loc>%s',
                                            chr(10), h, doc_id * 10 + j, chr(10))
                                  || CASE WHEN (doc_id + j) % 2 = 0
                                          THEN printf('<lastmod>2025-%02d-%02d</lastmod>',
                                                      (doc_id + j) % 12 + 1,
                                                      (doc_id * j) % 28 + 1)
                                          ELSE '' END
                                  || '</url>' || chr(10)
                           END), '') ||
                         '</urlset>'
                       END AS x
                FROM base
            ),
            blocks AS (
                SELECT url, 'url' AS kind,
                       unnest(regexp_extract_all(x, '(?s)<url>(.*?)</url>', 1)) AS b
                FROM xml
                UNION ALL
                SELECT url, 'sitemap' AS kind,
                       unnest(regexp_extract_all(x, '(?s)<sitemap>(.*?)</sitemap>', 1)) AS b
                FROM xml
            )
            SELECT url, kind,
                   trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) AS loc,
                   nullif(regexp_extract(b, '<lastmod>([^<]*)</lastmod>', 1), '') AS lastmod
            FROM blocks
            WHERE trim(regexp_extract(b, '<loc>([^<]*)</loc>', 1)) <> ''
        """,
        "extract_outlinks": """
            WITH pg AS (
              SELECT doc_id, doc_id // 3 AS g, (doc_id // 3) % 997 AS h
              FROM documents
            ),
            nv AS (
              SELECT doc_id, g, h,
                CASE WHEN h % 11 <> 3 THEN
                  printf('<a href="https://site%d.example/">t1</a>',
                         (h * 31 + 97 + g % 13) % 997)
                  || printf('<a href=''https://site%d.example/''>t2</a>',
                            (h * 31 + 194 + g % 13) % 997)
                  || printf('<a href="https://site%d.example/">t3</a>',
                            (h * 31 + 291 + g % 13) % 997)
                ELSE '' END AS nav
              FROM pg
            ),
            page AS (
              SELECT printf('https://site%d.example/p/%d', h, doc_id) AS url,
                     '<html><body><nav>' || nav ||
                     '</nav><p>x</p><a href="/rel">rel</a></body></html>' AS html
              FROM nv
            )
            SELECT url,
                   unnest(list_concat(
                     regexp_extract_all(html, 'href="(https?://[^"]+)"', 1),
                     regexp_extract_all(html, 'href=''(https?://[^'']+)''', 1)
                   )) AS outlink
            FROM page
        """,
        # twin of quality.classifier_filter (flag mode, stand-in weights):
        # the same left-to-right weighted sum over the same rounded
        # features — identical IEEE operation chain, identical double
        "classifier_score": f"""
            WITH m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens,
                     length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
                     length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                     length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
                     len(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x IN ({stop_list}))) AS n_stop
              FROM documents
            ),
            r AS (
              SELECT doc_id, n_tokens,
                     CAST(greatest(1, n_chars) AS DOUBLE) AS sc,
                     CAST(greatest(1, n_tokens) AS DOUBLE) AS st,
                     n_punct, n_digit, n_upper, n_stop
              FROM m
            ),
            s AS (
              SELECT doc_id,
                     round(-0.5
                           + 2.0 * round(n_stop / st, 6)
                           + -1.5 * round(n_punct / sc, 6)
                           + -1.25 * round(n_digit / sc, 6)
                           + -0.75 * round(n_upper / sc, 6)
                           + 0.125 * round(sc / st, 6)
                           + 0.5 * (CAST(least(n_tokens, 1000) AS DOUBLE) / 1000.0),
                           6) AS logit
              FROM r
            )
            SELECT doc_id, logit, logit >= 0.0 AS keep FROM s
        """,
        "minhash_lsh": f"""
            SELECT 3 * t.g AS id_a, 3 * t.g + 1 AS id_b
            FROM range(0, {_DEDUP_GROUPS}) t(g)
        """,
        "simhash": f"""
            SELECT 3 * t.g AS id_a, 3 * t.g + 1 AS id_b,
                   CAST(0 AS INTEGER) AS hamming
            FROM range(0, {_DEDUP_GROUPS}) t(g)
        """,
        "ngram_jaccard": """
            WITH t AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM documents
            ),
            g0 AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(0, greatest(0, len(toks) - 3)),
                       j -> array_to_string(list_slice(toks, j + 1, j + 3), ' ')
                     )) AS grams
              FROM t
            ),
            g AS (SELECT doc_id, len(grams) AS ng, unnest(grams) AS gram FROM g0),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter,
                     max(a.ng) AS na, max(b.ng) AS nb
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
            FROM p
            WHERE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) >= 0.4
        """,
        "ann_lsh": _ann_lsh_oracle(),
        "ann_ivf": _ann_lsh_oracle(),  # same analytic expectation
        "embed_dedup": _embed_dedup_oracle(),
        "lang_id": _lang_id_oracle(),
        "quality_filter": _quality_filter_oracle(),
        "pack_shards": """
            WITH t AS (
                SELECT doc_id,
                       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(string_split_regex(trim(text), '\\s+'))
                            END AS BIGINT) AS n_tokens,
                       ((doc_id * 48271) % 2147483647) * 48271
                           % 2147483647 AS k
                FROM documents WHERE text IS NOT NULL
            ),
            c AS (
                SELECT doc_id, n_tokens,
                       CAST(SUM(n_tokens) OVER (
                           ORDER BY k, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) - n_tokens AS BIGINT) AS s
                FROM t
            )
            SELECT doc_id, n_tokens,
                   s // 2048 AS shard_id,
                   s % 2048 AS offset_in_shard
            FROM c
        """,
        # twin of operators.scoring.bm25: same tokenization, same
        # Lucene/ATIRE idf, same operand order (the expression tree is
        # written to parenthesize exactly like the Spark column), same
        # micro-unit rounding before the per-doc sum
        "bm25": f"""
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            ),
            docs AS (
              SELECT doc_id, len(toks) AS dl, toks FROM d WHERE len(toks) > 0
            ),
            stats AS (SELECT count(*) AS n, sum(dl) AS sdl FROM docs),
            occ AS (
              SELECT doc_id, dl, unnest(toks) AS t FROM docs
            ),
            tf AS (
              SELECT doc_id, dl, t, count(*) AS tf FROM occ
              WHERE t IN {_BM25_TERMS!r}
              GROUP BY doc_id, dl, t
            ),
            dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
            scored AS (
              SELECT tf.doc_id, tf.dl,
                CAST(round(
                  ln(1.0 + (CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                           / (CAST(df AS DOUBLE) + 0.5))
                  * (CAST(tf AS DOUBLE) * 2.2)
                  / (CAST(tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                                             / (CAST(sdl AS DOUBLE)
                                                / CAST(n AS DOUBLE)))))
                  * 1000000.0) AS BIGINT) AS micro
              FROM tf JOIN dfreq USING (t), stats
            )
            SELECT doc_id,
                   CAST(count(*) AS INTEGER) AS n_hit,
                   CAST(max(dl) AS INTEGER) AS dl,
                   round(CAST(sum(micro) AS DOUBLE) / 1000000.0, 4) AS bm25
            FROM scored GROUP BY doc_id
        """,
        # twin of operators.scoring.unigram_logprob (min_count=1): full
        # independent vocab-count + Laplace smoothing + micro-unit
        # fixed-point; LEFT JOIN + floor mirrors the engine's OOV path
        # structurally even though nothing prunes at min_count=1
        "lm_score": _LM_CTE + """
            SELECT doc_id, n_tokens, n_oov, mean_logprob FROM lm
        """,
        # twin of scoring.ppl_buckets over the lm_score surface: ntile's
        # fill rule (earlier buckets take the remainder) is identical in
        # Spark and DuckDB; the (score DESC, doc_id ASC) tiebreak makes
        # the cut deterministic
        "ppl_buckets": _LM_CTE + """
            , lb AS (
              SELECT lm.doc_id, d2.lang, lm.mean_logprob,
                     CAST(ntile(3) OVER (
                       PARTITION BY d2.lang
                       ORDER BY lm.mean_logprob DESC, lm.doc_id ASC)
                       AS INTEGER) AS bucket
              FROM lm JOIN documents d2 USING (doc_id)
            )
            SELECT doc_id, lang, mean_logprob, bucket,
                   CASE WHEN bucket = 1 THEN 'head'
                        WHEN bucket = 2 THEN 'middle'
                        ELSE 'tail' END AS label
            FROM lb
        """,
        "link_graph": _WEBGRAPH_CTE + """
            SELECT src, dst, n_links FROM edges
        """,
        # twin of webgraph.degree_stats: same tagged-union single agg
        "host_degrees": _WEBGRAPH_CTE + """
            , ends AS (
              SELECT src AS host, 1 AS od, 0 AS idg,
                     n_links AS ol, CAST(0 AS BIGINT) AS il
              FROM edges
              UNION ALL
              SELECT dst, 0, 1, CAST(0 AS BIGINT), n_links FROM edges
            )
            SELECT host,
                   CAST(sum(od) AS BIGINT) AS out_deg,
                   CAST(sum(idg) AS BIGINT) AS in_deg,
                   CAST(sum(ol) AS BIGINT) AS out_links,
                   CAST(sum(il) AS BIGINT) AS in_links
            FROM ends GROUP BY host
        """,
        "pagerank": _pagerank_oracle(iterations=4, d=85),
        # twin of webgraph.anchor_terms: rebuild the anchored outlink
        # fixture arithmetically, same (host, term) count + rank cut with
        # the (n DESC, term ASC) tiebreak
        "anchor_terms": """
            WITH pg AS (
              SELECT doc_id, doc_id // 3 AS g, (doc_id // 3) % 997 AS h
              FROM documents
            ),
            links AS (
              SELECT printf('site%d.example',
                            (h * 31 + j * 97 + g % 13) % 997) AS host,
                     printf('w%d w%d',
                            (h * 7 + j * 13 + g % 5) % 23,
                            (h + j) % 7) AS anchor
              FROM pg CROSS JOIN (VALUES (1), (2), (3)) AS t(j)
              WHERE h % 11 <> 3
            ),
            terms AS (
              SELECT host,
                     unnest(string_split_regex(lower(trim(anchor)), '\\s+'))
                       AS term
              FROM links
            ),
            counts AS (
              SELECT host, term, CAST(count(*) AS BIGINT) AS n
              FROM terms WHERE term <> '' GROUP BY host, term
            ),
            r AS (
              SELECT host, term, n,
                     CAST(row_number() OVER (
                       PARTITION BY host ORDER BY n DESC, term ASC)
                       AS INTEGER) AS rnk
              FROM counts
            )
            SELECT host, term, n, rnk FROM r WHERE rnk <= 3
        """,
        # twin of dedup.incremental_dedup over the planted snapshot: the
        # expected verdicts are analytic by construction (exact copies in
        # groups [0,100), mutate=2 near-dups in [100,200) — shingle
        # Jaccard 54/62 ~ 0.87, est >= 0.5 at 64 hashes — and vocabulary-
        # disjoint novel groups in [200,300))
        "incr_dedup": f"""
            SELECT CAST(3 * g + 1 AS BIGINT) AS doc_id,
                   'exact' AS verdict,
                   CAST(3 * g AS BIGINT) AS match_id
            FROM range(0, {_DEDUP_GROUPS}) t(g)
            UNION ALL
            SELECT CAST(3 * g + 1 AS BIGINT), 'near', CAST(3 * g AS BIGINT)
            FROM range({_DEDUP_GROUPS}, {2 * _DEDUP_GROUPS}) t(g)
            UNION ALL
            SELECT CAST(3 * g AS BIGINT), 'new', CAST(NULL AS BIGINT)
            FROM range({2 * _DEDUP_GROUPS}, {3 * _DEDUP_GROUPS}) t(g)
        """,
        # twin of delta.crawl_frontier: crawl_delta fixture + unrolled
        # pagerank (as a derived table) + the same int64 priority and
        # (priority DESC, url ASC) per-host rank cut
        "crawl_frontier": f"""
            WITH o AS (
              SELECT printf('https://site%d.example/p/%d',
                            (doc_id // 3) % 997, doc_id) AS url,
                     printf('site%d.example', (doc_id // 3) % 997) AS host,
                     md5(text) AS old_fp
              FROM documents WHERE doc_id % 17 <> 0
            ),
            n AS (
              SELECT printf('https://site%d.example/p/%d',
                            (doc_id // 3) % 997, doc_id) AS url,
                     printf('site%d.example', (doc_id // 3) % 997) AS host,
                     md5(CASE WHEN doc_id % 13 = 0 THEN text || '~v2'
                              ELSE text END) AS new_fp
              FROM documents WHERE doc_id % 19 <> 0
            ),
            delta AS (
              SELECT coalesce(o.url, n.url) AS url,
                     coalesce(o.host, n.host) AS host,
                     CASE WHEN o.old_fp IS NULL THEN 'added'
                          WHEN n.new_fp IS NULL THEN 'removed'
                          WHEN o.old_fp = n.new_fp THEN 'unchanged'
                          ELSE 'changed' END AS status
              FROM o FULL OUTER JOIN n ON o.url = n.url
            ),
            pr AS (
              SELECT host, rank_micro
              FROM ({_pagerank_oracle(iterations=4, d=85)}) q
            ),
            scored AS (
              SELECT d.url, d.host, d.status,
                     CAST((CASE d.status WHEN 'changed' THEN 3
                                         WHEN 'added' THEN 2
                                         ELSE 1 END)
                          * (coalesce(pr.rank_micro, 0) + 1) AS BIGINT)
                       AS priority
              FROM delta d LEFT JOIN pr ON pr.host = d.host
              WHERE d.status <> 'removed'
            ),
            r AS (
              SELECT url, host, status, priority,
                     row_number() OVER (
                       PARTITION BY host
                       ORDER BY priority DESC, url ASC) AS rn
              FROM scored
            )
            SELECT url, host, status, priority FROM r WHERE rn <= 3
        """,
        # twin of textclean.badwords_filter (flag mode): distinct lexicon
        # hits via list_distinct/list_filter mirroring array_intersect
        "badwords": """
            WITH d AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(list_distinct(list_filter(toks,
                     x -> list_contains(['error', 'null', 'slow'], x))))
                     AS INTEGER) AS n_bad,
                   len(list_distinct(list_filter(toks,
                     x -> list_contains(['error', 'null', 'slow'], x)))) > 0
                     AS flagged
            FROM d
        """,
        # twin of textclean.normalize_text over the planted-suffix corpus:
        # DuckDB nfc_normalize (utf8proc) and CPython unicodedata both
        # implement standard NFC; the regex chain is the same Java/RE2
        # common subset the engine uses
        "normalize_text": r"""
            WITH raw AS (
              SELECT doc_id, text ||
                CASE WHEN doc_id % 4 = 0
                       THEN '  resum' || chr(101) || chr(769) || chr(9)
                     WHEN doc_id % 4 = 1 THEN ' ctrl' || chr(7) || 'X'
                     WHEN doc_id % 4 = 3 THEN '  double  space  '
                     ELSE '' END AS raw
              FROM documents
            ),
            n AS (
              SELECT doc_id, raw,
                     nfc_normalize(trim(regexp_replace(regexp_replace(raw,
                       '[\x00-\x08\x0E-\x1F\x7F-\x84\x86-\x9F]',
                       '', 'g'),
                       '[ \t\n\r\f\x0B\x{0085}\x{00A0}\x{1680}\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]+',
                       ' ', 'g')))
                       AS norm_text
              FROM raw
            )
            SELECT doc_id, norm_text, (norm_text <> raw) AS changed FROM n
        """,
        # twin of operators.delta.crawl_delta over the two deterministic
        # snapshots: same drop/mutate arithmetic, same full-outer
        # classification
        "crawl_delta": """
            WITH o AS (
              SELECT printf('https://site%d.example/p/%d',
                            (doc_id // 3) % 997, doc_id) AS url,
                     md5(text) AS old_fp
              FROM documents WHERE doc_id % 17 <> 0
            ),
            n AS (
              SELECT printf('https://site%d.example/p/%d',
                            (doc_id // 3) % 997, doc_id) AS url,
                     md5(CASE WHEN doc_id % 13 = 0 THEN text || '~v2'
                              ELSE text END) AS new_fp
              FROM documents WHERE doc_id % 19 <> 0
            )
            SELECT coalesce(o.url, n.url) AS url,
                   CASE WHEN o.old_fp IS NULL THEN 'added'
                        WHEN n.new_fp IS NULL THEN 'removed'
                        WHEN o.old_fp = n.new_fp THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   o.old_fp, n.new_fp
            FROM o FULL OUTER JOIN n ON o.url = n.url
        """,
        # twin of corpus.domain_mixture (alpha=0.5): host rebuilt
        # arithmetically (url_host lowercases, so every surface variant
        # of a host collapses to site{h}.example), sqrt is IEEE-exact in
        # both engines, sums are BIGINT
        "domain_mixture": """
            WITH hosts AS (
              SELECT printf('site%d.example', (doc_id // 3) % 997) AS host
              FROM documents
            ),
            per AS (
              SELECT host, CAST(count(*) AS BIGINT) AS n_docs
              FROM hosts GROUP BY host
            ),
            pw AS (
              SELECT host, n_docs,
                     CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0)
                          AS BIGINT) AS weight_micro
              FROM per
            ),
            tot AS (
              SELECT CAST(sum(n_docs) AS BIGINT) AS tn,
                     CAST(sum(weight_micro) AS BIGINT) AS tw
              FROM pw
            )
            SELECT host, n_docs,
                   CAST(n_docs AS DOUBLE) / CAST(tn AS DOUBLE) AS share,
                   weight_micro,
                   CAST(weight_micro AS DOUBLE) / CAST(tw AS DOUBLE) AS weight,
                   (CAST(weight_micro AS DOUBLE) / CAST(tw AS DOUBLE))
                     / (CAST(n_docs AS DOUBLE) / CAST(tn AS DOUBLE)) AS boost
            FROM pw, tot
        """,
        # twin of corpus.cap_per_group over the url crawl surface: the
        # global-window rank cut IS the spec the two-branch plan must equal
        "dsir_weights": _DSIR_SQL + """
            SELECT doc_id, n_feats, dsir_logratio FROM w
        """,
        "dsir_resample": _DSIR_SQL + """
            , g AS (
              SELECT doc_id, dsir_logratio,
                     CAST(round((dsir_logratio / 1.0
                       - ln(-ln((CAST((doc_id * 48271) % 2147483647
                                      * 48271 % 2147483647 AS DOUBLE) + 0.5)
                                / 2147483647.0))) * 1000000.0)
                          AS BIGINT) AS k
              FROM w
            )
            SELECT doc_id, dsir_logratio,
                   CAST(k AS DOUBLE) / 1000000.0 AS sample_key
            FROM g
            ORDER BY k DESC, doc_id
            LIMIT 100
        """,
        "cap_domain": _URL_CANON_CTE + """
            SELECT doc_id, host, n_chars FROM hp
            QUALIFY row_number() OVER (
              PARTITION BY host ORDER BY n_chars DESC, doc_id ASC) <= 2
        """,
        "fingerprint": _fingerprint_oracle(),
        "media_features": _media_features_oracle(),
        "frame_sample": _frame_sample_oracle(),
        "url_canonicalize": _URL_CANON_CTE + """
            SELECT doc_id, url, canonical_url FROM canon
        """,
        "url_dedup": _URL_CANON_CTE + """
            , d AS (
              SELECT canonical_url, doc_id, warc_sec,
                     row_number() OVER (PARTITION BY canonical_url
                                        ORDER BY warc_sec DESC, doc_id DESC) AS rn,
                     count(*) OVER (PARTITION BY canonical_url) AS nd,
                     max(warc_sec) OVER (PARTITION BY canonical_url) AS max_ts
              FROM canon
            )
            SELECT canonical_url, doc_id, max_ts AS warc_sec,
                   CAST(nd AS BIGINT) AS n_dups
            FROM d WHERE rn = 1
        """,
        "domain_stats": _URL_CANON_CTE + """
            SELECT host,
                   CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_canonical,
                   CAST(sum(n_chars) AS BIGINT) AS total_bytes
            FROM canon GROUP BY host
        """,
        # twin of sketches.distinct_sketches -> merge -> estimate: HLL
        # union is lossless and driver-scale hosts sit in the sparse
        # coupon regime where the deterministic estimate is the exact
        # distinct count, so the twin is the exact aggregate
        "hll_domains": _URL_CANON_CTE + """
            SELECT host,
                   CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_canonical
            FROM canon GROUP BY host
        """,
        # twin of operators.sessions.session_rollup: same (ts_sec, event_id)
        # ordering, same gap boundary, same rollup
        "sessionize": """
            WITH e AS (
              SELECT user_id, event_id, event_type,
                     CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
              FROM events
            ),
            s AS (
              SELECT *, CASE WHEN lag(ts_sec) OVER w IS NULL
                               OR ts_sec - lag(ts_sec) OVER w > 1800
                             THEN 1 ELSE 0 END AS b
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
            ),
            x AS (
              SELECT *, sum(b) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_idx
              FROM s
            )
            SELECT user_id AS entity, CAST(session_idx AS BIGINT) AS session_idx,
                   min(ts_sec) AS start_sec, max(ts_sec) AS end_sec,
                   max(ts_sec) - min(ts_sec) AS duration_s,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
            FROM x GROUP BY entity, session_idx
        """,
        # twin of operators.corpus.stratified_sample: two Lehmer rounds on
        # doc_id, threshold quota/count per lang
        "sample_stratified": """
            WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d JOIN c USING (lang)
            WHERE ((d.doc_id * 48271) % 2147483647 * 48271 % 2147483647)
                  / 2147483647.0 < least(1.0, 60.0 / c.n)
        """,
        # twin of operators.corpus.descriptive_stats: exact fixed-point
        # integer sums, then the identical double-op derivation
        "descriptive_stats": """
            WITH v AS (
              SELECT event_type AS grp, value,
                     CAST(floor(value * 1000) AS HUGEINT) AS vv
              FROM events
            )
            SELECT grp, CAST(count(*) AS BIGINT) AS n,
                   min(value) AS vmin, max(value) AS vmax,
                   CAST(sum(vv) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000
                     AS mean,
                   CASE WHEN count(*) > 1 THEN
                     sqrt(CAST(count(*) * sum(vv * vv)
                               - sum(vv) * sum(vv) AS DOUBLE)
                          / (CAST(count(*) AS DOUBLE)
                             * (CAST(count(*) AS DOUBLE) - 1.0))) / 1000
                   END AS std
            FROM v GROUP BY grp
        """,
        # twin of _q_warc_roundtrip: derives each record's facts straight
        # from documents — the Spark side must reproduce them through the
        # WARC build->pack->parse loop byte-exactly
        "warc_roundtrip": """
            SELECT printf('https://site%d.example/%s/page/%d',
                          doc_id % 1000, lang, doc_id) AS url,
                   strftime(TIMESTAMP '2010-05-07 00:00:00'
                            + ((doc_id * 97) % 31536000) * INTERVAL 1 SECOND,
                            '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
                   md5(text) AS payload_md5,
                   CAST(strlen(text) AS BIGINT) AS n_bytes
            FROM documents
        """,
        # twin of _q_arrow_roundtrip: the IPC export/import loop must be
        # the identity on the scanned columns
        "arrow_roundtrip": """
            SELECT doc_id, lang, n_chars FROM documents
        """,
        # twin of _q_sql_functions: tile arithmetic + strict box tests
        # (fixture corners at .005 keep hundredth-grid points off every
        # boundary) + haversine threshold mirroring geom/kernels.py::
        # haversine_m operation order
        "sql_functions": f"""
            WITH {_PTS_CTE}
            SELECT event_id,
                   8 * 4503599627370496
                   + least(255, greatest(0, CAST(floor((lon + 180.0) / 360.0 * 256.0) AS BIGINT))) * 67108864
                   + least(255, greatest(0, CAST(floor((90.0 - lat) / 180.0 * 256.0) AS BIGINT))) AS tid,
                   (lon > 0.005 AND lon < 40.005 AND lat > 0.005 AND lat < 30.005) AS inside,
                   (lon > 0.005 AND lon < 40.005 AND lat > 0.005 AND lat < 30.005) AS within_ok,
                   lon AS x,
                   (2.0 * 6371008.8 * asin(sqrt(least(1.0, greatest(0.0,
                      pow(sin((radians(20.0) - radians(lat)) / 2.0), 2)
                      + cos(radians(lat)) * cos(radians(20.0))
                        * pow(sin((radians(10.0) - radians(lon)) / 2.0), 2)))))
                    <= 2000000.0) AS near
            FROM pts
        """,
        # twin of _q_dedup_components: doc_ids are contiguous, so the
        # component minimum of each 50-chain has the closed form n - n%50
        "dedup_components": """
            WITH e AS (
              SELECT d1.doc_id AS a, d1.doc_id + 1 AS b
              FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
              WHERE d1.doc_id % 50 <> 49
            ),
            nodes AS (SELECT a AS n FROM e UNION SELECT b FROM e)
            SELECT n AS node, n - (n % 50) AS component FROM nodes
        """,
        # twin of operators.corpus.group_percentiles: percentile_disc picks
        # an actual data value (no interpolation), so engines agree exactly
        "group_percentiles": """
            SELECT event_type AS grp,
                   quantile_disc(value, 0.5) AS p50,
                   quantile_disc(value, 0.9) AS p90,
                   quantile_disc(value, 0.99) AS p99
            FROM events GROUP BY grp
        """,
        # twin of _q_robots_filter: hosts h%3==0 disallow /page/ but allow
        # /page/1 (longer prefix wins), so a page survives iff its host
        # has no rules or its group id starts with '1'
        "robots_filter": _URL_CANON_CTE + """
            SELECT doc_id, url FROM u
            WHERE NOT ((doc_id // 3 % 997) % 3 = 0)
               OR CAST(doc_id // 3 AS VARCHAR) LIKE '1%'
        """,
        # twin of operators.corpus.topk_tokens: k=40, ties on token bytes
        "topk_tokens": r"""
            SELECT token, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_split_to_array(lower(text), '\s+'))
                    AS token FROM documents)
            WHERE token <> ''
            GROUP BY token ORDER BY n DESC, token ASC LIMIT 40
        """,
        # twin of textclean.contamination_matrix: bench = first-30-token
        # slices of every 97th doc; both window sets rebuilt with
        # generate_series + list_slice, joined on gram STRINGS (the
        # engine joins xxhash64 of the same strings)
        "contamination_matrix": """
            WITH bt AS (
                SELECT doc_id AS bid,
                       list_slice(string_split(text, ' '), 1, 30) AS t
                FROM documents WHERE doc_id % 97 = 0
            ),
            bwins AS (
                SELECT DISTINCT bid,
                       array_to_string(list_slice(t, i, i + 12), ' ') AS g
                FROM bt, UNNEST(generate_series(1, len(t) - 12)) u(i)
            ),
            totals AS (
                SELECT bid, count(*) AS n_bench_grams FROM bwins GROUP BY bid
            ),
            toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ),
            wins AS (
                SELECT doc_id,
                       array_to_string(list_slice(t, i, i + 12), ' ') AS w
                FROM toks, UNNEST(generate_series(1, len(t) - 12)) u(i)
            ),
            hits AS (
                SELECT b.bid,
                       count(DISTINCT w.doc_id) AS n_docs_hit,
                       count(*) AS n_windows_hit,
                       count(DISTINCT b.g) AS n_grams_hit
                FROM wins w JOIN bwins b ON w.w = b.g
                GROUP BY b.bid
            )
            SELECT h.bid AS bench_id,
                   CAST(h.n_docs_hit AS BIGINT) AS n_docs_hit,
                   CAST(h.n_windows_hit AS BIGINT) AS n_windows_hit,
                   CAST(h.n_grams_hit AS BIGINT) AS n_grams_hit,
                   CAST(t.n_bench_grams AS BIGINT) AS n_bench_grams,
                   h.n_grams_hit / CAST(t.n_bench_grams AS DOUBLE)
                       AS frac_grams_hit
            FROM hits h JOIN totals t ON h.bid = t.bid
        """,
        # twin of bloom.bloom_new_keys: the operator's output is exact by
        # contract (Bloom false positives only add verify candidates; false
        # negatives are impossible), so the twin is a plain anti-join over
        # the same arithmetic url construction
        "bloom_seen": """
            WITH ids AS (SELECT doc_id FROM documents),
            corpus AS (
                SELECT printf('https://h%d.example/p/%d',
                              doc_id % 97, doc_id) AS url
                FROM ids WHERE doc_id % 2 = 0
            ),
            snap AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 4 = 1
                            THEN printf('https://h%d.example/p/%d',
                                        (doc_id - 1) % 97, doc_id - 1)
                            ELSE printf('https://h%d.example/p/%d',
                                        doc_id % 97, doc_id) END AS url
                FROM ids
            )
            SELECT s.doc_id, s.url
            FROM snap s
            WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.url = s.url)
        """,
        # twin of dedup.exact_substring_dedup: every 8-token window at
        # stride 1, struct-min keeper election per window string (Spark
        # elects on the xxhash64 key — identical absent a 2^-64 collision),
        # removal starts per doc, then the same coverage-filter rebuild.
        # DuckDB i is 1-based where Spark __pos is 0-based; the coverage
        # predicate [st, st+7] shifts with it, so verdicts align.
        "substr_dedup": """
            WITH toks AS (
                SELECT doc_id, text, string_split(text, ' ') AS t
                FROM documents
            ),
            wins AS (
                SELECT doc_id, i,
                       array_to_string(list_slice(t, i, i + 7), ' ') AS g
                FROM toks,
                     UNNEST(generate_series(1, len(t) - 7)) u(i)
            ),
            keep AS (
                SELECT g, min({'d': doc_id, 'i': i}) AS mk
                FROM wins
                GROUP BY g
                HAVING count(*) >= 2
            ),
            starts AS (
                SELECT w.doc_id, list(w.i) AS ss
                FROM wins w JOIN keep k USING (g)
                WHERE w.doc_id <> (k.mk).d OR w.i <> (k.mk).i
                GROUP BY w.doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN s.ss IS NULL THEN d.text
                        -- coalesce: DuckDB's array_to_string([]) is NULL,
                        -- Spark's concat_ws over an empty array is ''
                        ELSE coalesce(array_to_string(list_filter(d.t, (x, j) ->
                            len(list_filter(s.ss,
                                st -> j >= st AND j <= st + 7)) = 0), ' '), '')
                   END AS clean_text,
                   CAST(len(d.t) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN s.ss IS NULL THEN 0
                        ELSE len(d.t) - len(list_filter(d.t, (x, j) ->
                            len(list_filter(s.ss,
                                st -> j >= st AND j <= st + 7)) = 0))
                   END AS BIGINT) AS n_removed
            FROM toks d LEFT JOIN starts s ON d.doc_id = s.doc_id
        """,
        # twin of textclean.decontaminate_spans: matched 1-based window
        # starts per doc, then an independent list_filter rebuild; docs
        # with no hits pass through byte-identical via the LEFT JOIN
        "decontaminate_spans": """
            WITH bench AS (
                SELECT DISTINCT array_to_string(
                           list_slice(string_split(text, ' '), 1, 13), ' '
                       ) AS g
                FROM documents
                WHERE doc_id % 97 = 0
                  AND len(string_split(text, ' ')) >= 13
            ),
            toks AS (
                SELECT doc_id, text, string_split(text, ' ') AS t
                FROM documents
            ),
            starts AS (
                SELECT doc_id, list(i) AS ss
                FROM (
                    SELECT doc_id, i
                    FROM toks,
                         UNNEST(generate_series(1, len(t) - 12)) u(i)
                    WHERE array_to_string(list_slice(t, i, i + 12), ' ')
                          IN (SELECT g FROM bench)
                )
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CASE WHEN s.ss IS NULL THEN d.text
                        ELSE array_to_string(list_filter(d.t, (x, j) ->
                            len(list_filter(s.ss,
                                st -> j >= st AND j <= st + 12)) = 0), ' ')
                   END AS clean_text,
                   CAST(len(d.t) AS BIGINT) AS n_tokens,
                   CAST(CASE WHEN s.ss IS NULL THEN 0
                        ELSE len(d.t) - len(list_filter(d.t, (x, j) ->
                            len(list_filter(s.ss,
                                st -> j >= st AND j <= st + 12)) = 0))
                   END AS BIGINT) AS n_removed
            FROM toks d LEFT JOIN starts s ON d.doc_id = s.doc_id
        """,
        # twin of scoring.ngram_counts: same tokenizer as bm25/topk_tokens
        # (lower + trim + regex split + drop empties), orders 1..3,
        # min_count=2, top-50 per order on (count DESC, gram ASC)
        "ngram_counts": r"""
            WITH toks AS (
                SELECT list_filter(
                           regexp_split_to_array(lower(trim(text)), '\s+'),
                           x -> x <> '') AS t
                FROM documents
            ),
            g AS (
                SELECT o.n AS ord,
                       array_to_string(list_slice(t, i, i + o.n - 1), ' ')
                           AS gram
                FROM toks, (VALUES (1), (2), (3)) o(n),
                     UNNEST(generate_series(1, len(t) - o.n + 1)) u(i)
            )
            SELECT "order", gram, n FROM (
                SELECT CAST(ord AS INTEGER) AS "order", gram,
                       CAST(count(*) AS BIGINT) AS n,
                       row_number() OVER (
                           PARTITION BY ord
                           ORDER BY count(*) DESC, gram ASC) AS rnk
                FROM g GROUP BY ord, gram HAVING count(*) >= 2
            ) WHERE rnk <= 50
        """,
        # PQ/ADC search: the planted family construction makes the
        # expected top-k analytic and identical to ann_lsh's (copies
        # share the base's PQ code bit-for-bit; no non-family vector
        # shares a family code at m=4,k=32 — margin pinned by test_ann)
        "ann_pq": _ann_lsh_oracle(),
    }
