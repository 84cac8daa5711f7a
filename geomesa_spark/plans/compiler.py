"""Predicate -> Spark plan compiler (the query planner).

Rebuilds the reference's planning pipeline —
filter split (``ACC/index/QueryFilterSplitter.scala:60-134``), strategy choice
(``ACC/index/QueryStrategyDecider.scala:67-127``), key-range planning
(``ACC/index/Z3IdxStrategy.scala:37-174``, ``Z3.zranges``) — as a compiler
from the predicate AST to DataFrame operations:

* the *prune* predicate constrains partition / sorted-key columns
  (``week`` + ``z3`` ranges, or ``z2`` ranges) so Parquet partition pruning
  and row-group min/max skipping do the work Accumulo ranges did;
* the *residual* predicate is the exact filter (bbox arithmetic, inclusive
  time interval, attribute comparisons, vectorized point-in-polygon), always
  applied, so the prune only ever needs to be a superset.

Everything but arbitrary-polygon point-in-polygon lowers to built-in Column
expressions (whole-stage codegen); PIP is an Arrow-batched pandas UDF over the
numpy kernel.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime, timezone
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_spark.cells.zcurve import SECONDS_PER_WEEK, Z2, Z3
from geomesa_spark.geom.kernels import is_whole_world, meters_to_degrees, points_in_polygon
from geomesa_spark.geom.wkt import Geometry, parse_wkt
from geomesa_spark.plans import predicates as P

# ---------------------------------------------------------------------------


@dataclass
class GeoTable:
    """A DataFrame + the column roles the planner needs.

    The reference fixes these in the SimpleFeatureType (default geometry +
    dtg attribute, ``UTL/geotools/Conversions.scala:207``); here they are
    explicit column names. ``week``/``z3``/``z2`` name precomputed index-key
    columns when the table was written through the engine's layout writer —
    if absent, keys are computed on the fly (correct, just unpruned).
    """

    df: DataFrame
    lon: str = "lon"
    lat: str = "lat"
    dtg: str | None = "dtg"
    fid: str | None = "id"
    week_col: str | None = None
    z3_col: str | None = None
    z2_col: str | None = None
    # secondary attribute-sorted copies (AttributeTable.scala analog): column
    # name -> DataFrame of the same rows range-partitioned + sorted by that
    # column, so attribute predicates skip row groups instead of full-scanning
    attr_tables: dict[str, DataFrame] = field(default_factory=dict)
    # z2-sorted secondary copy (the reference's ST table): time-unbounded
    # spatial queries scan this instead of the z3-sorted main table, whose
    # interleaved time bits scramble spatial locality within row groups
    st_table: DataFrame | None = None
    # per-attribute cardinality hints ('high' | 'low') for strategy costing
    # (UTL/stats/Cardinality.scala, AttributeIdxStrategy.scala:170-183)
    cardinality: dict[str, str] = field(default_factory=dict)


@dataclass
class QueryStats:
    """Per-query audit record (mirrors ``ACC/stats/QueryStat.scala:25-60``)."""

    strategy: str = "fullscan"
    planning_ms: float = 0.0
    n_z_ranges: int = 0
    n_weeks: int = 0
    filter: str = ""
    notes: list[str] = field(default_factory=list)


@dataclass
class CompiledQuery:
    df: DataFrame
    stats: QueryStats


# ---------------------------------------------------------------------------
# residual lowering (exact predicates as Columns)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=256)
def _cached_geom(wkt: str) -> Geometry:
    return parse_wkt(wkt)


# DWithin unit table (GeoTools/reference accepted units). A single shared
# normalization for BOTH the prune-box and the residual: a mismatch between
# the two (e.g. "miles" box computed as meters) would produce a non-superset
# prune — silently wrong rows.
_UNIT_METERS = {
    "m": 1.0, "meter": 1.0, "meters": 1.0, "metre": 1.0, "metres": 1.0,
    "km": 1000.0, "kilometer": 1000.0, "kilometers": 1000.0,
    "ft": 0.3048, "foot": 0.3048, "feet": 0.3048,
    "mi": 1609.344, "mile": 1609.344, "miles": 1609.344,
    "statute miles": 1609.344,
    "nm": 1852.0, "nautical miles": 1852.0, "nauticalmiles": 1852.0,
}


def dwithin_meters(distance: float, units: str) -> float | None:
    """Distance in meters, or None for degree (planar) semantics.

    Unknown units raise — a guessed conversion could under-size the prune
    box (mirrors the strict unit parse in ``FLT/visitor/
    QueryPlanFilterVisitor`` / GeoTools DistanceBufferOperator units).
    """
    u = (units or "").strip().lower()
    if u in ("", "degree", "degrees", "deg"):
        return None
    if u not in _UNIT_METERS:
        raise ValueError(f"unsupported DWITHIN unit: {units!r}")
    return float(distance) * _UNIT_METERS[u]


def _pip_udf_factory(wkt: str):
    @F.pandas_udf("boolean")
    def pip(lon: pd.Series, lat: pd.Series) -> pd.Series:
        g = _cached_geom(wkt)
        return pd.Series(points_in_polygon(lon.to_numpy(), lat.to_numpy(), g))

    return pip


def _boundary_udf_factory(wkt: str):
    @F.pandas_udf("boolean")
    def onb(lon: pd.Series, lat: pd.Series) -> pd.Series:
        from geomesa_spark.geom.kernels import points_on_boundary

        g = _cached_geom(wkt)
        return pd.Series(points_on_boundary(lon.to_numpy(), lat.to_numpy(), g))

    return onb


def _is_axis_aligned_box(g: Geometry) -> bool:
    if g.kind != "POLYGON" or len(g.rings) != 1 or len(g.rings[0]) != 5:
        return False
    r = g.rings[0]
    xs, ys = sorted(set(r[:, 0])), sorted(set(r[:, 1]))
    return len(xs) == 2 and len(ys) == 2


def _haversine_expr(lon1: Column, lat1: Column, lon2: float, lat2: float) -> Column:
    """Great-circle meters as built-in functions (stays in codegen)."""
    R = 6_371_008.8
    rlat1 = F.radians(lat1)
    rlat2 = F.lit(float(lat2) * 3.141592653589793 / 180.0)
    dlat = rlat2 - rlat1
    dlon = F.radians(F.lit(float(lon2)) - lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * R) * F.asin(F.sqrt(F.least(F.lit(1.0), a)))


def _ts_lit(dt: datetime) -> Column:
    return F.to_timestamp(F.lit(dt.astimezone(timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")))


def _is_array_col(t: GeoTable, field: str) -> bool:
    try:
        return dict(t.df.dtypes).get(field, "").startswith("array")
    except Exception:
        return False


def _lower_residual(t: GeoTable, pred: P.Pred) -> Column:
    lon, lat = F.col(t.lon), F.col(t.lat)
    if isinstance(pred, P.Include):
        return F.lit(True)
    if isinstance(pred, P.And):
        out = _lower_residual(t, pred.children[0])
        for c in pred.children[1:]:
            out = out & _lower_residual(t, c)
        return out
    if isinstance(pred, P.Or):
        out = _lower_residual(t, pred.children[0])
        for c in pred.children[1:]:
            out = out | _lower_residual(t, c)
        return out
    if isinstance(pred, P.Not):
        return ~_lower_residual(t, pred.child)
    if isinstance(pred, P.BBox):
        if is_whole_world(pred.lon_min, pred.lat_min, pred.lon_max, pred.lat_max):
            return F.lit(True)  # whole-world elimination (FilterHelper.scala:69-87)
        if pred.lon_min > pred.lon_max:
            # antimeridian-crossing box (GeohashUtils.scala:722-774 IDL
            # handling): split into the two hemispheres' half-boxes
            return (
                ((lon >= pred.lon_min) | (lon <= pred.lon_max))
                & lat.between(pred.lat_min, pred.lat_max)
            )
        return (
            lon.between(pred.lon_min, pred.lon_max) & lat.between(pred.lat_min, pred.lat_max)
        )
    if isinstance(pred, (P.Intersects, P.Within)):
        # point rows: WITHIN(point, polygon) and INTERSECTS coincide
        # (boundary-inclusive PIP; fixtures avoid exact-boundary points —
        # FLT/package.scala:275-287 accepted-predicate set)
        g = pred.geom
        if g.kind in ("POINT", "MULTIPOINT"):
            # point row vs point literal(s): exact coordinate equality —
            # pure codegen, no UDF
            eq = None
            for px, py in g.rings[0]:
                c = (lon == F.lit(float(px))) & (lat == F.lit(float(py)))
                eq = c if eq is None else (eq | c)
            return eq if eq is not None else F.lit(False)
        b = g.bbox()
        coarse = lon.between(b[0], b[2]) & lat.between(b[1], b[3])
        if g.kind in ("LINESTRING", "MULTILINESTRING"):
            # point intersects a lineal geometry iff it lies on the path
            return coarse & _boundary_udf_factory(g.to_wkt())(lon, lat)
        if _is_axis_aligned_box(g):
            return coarse
        return coarse & _pip_udf_factory(g.to_wkt())(lon, lat)
    if isinstance(pred, P.Contains):
        # row CONTAINS literal: a point row contains only an equal point
        if pred.geom.kind == "POINT":
            px, py = pred.geom.rings[0][0]
            return (lon == F.lit(float(px))) & (lat == F.lit(float(py)))
        return F.lit(False)  # a 0-dim row cannot contain a 1/2-dim geometry
    if isinstance(pred, P.Touches):
        # point touches areal/lineal geometry iff on its boundary
        return _boundary_udf_factory(pred.geom.to_wkt())(lon, lat)
    if isinstance(pred, (P.Crosses, P.Overlaps)):
        # OGC dimension rules: a point row can neither cross nor overlap
        # anything (crossing needs higher-dim interiors, overlap needs
        # equal-dim partial sharing; equal points are "equals", not overlaps)
        return F.lit(False)
    if isinstance(pred, P.Disjoint):
        return ~_lower_residual(t, P.Intersects(pred.field, pred.geom))
    if isinstance(pred, P.DWithin):
        cx, cy = pred.geom.rings[0][0]
        meters = dwithin_meters(pred.distance, pred.units)
        if meters is not None:
            deg = meters_to_degrees(meters, cy)
            coarse = lon.between(cx - deg, cx + deg) & lat.between(cy - deg, cy + deg)
            return coarse & (_haversine_expr(lon, lat, cx, cy) <= F.lit(meters))
        # degree euclidean (the reference's post-rewrite semantics)
        d = float(pred.distance)
        coarse = lon.between(cx - d, cx + d) & lat.between(cy - d, cy + d)
        return coarse & (
            F.sqrt(F.pow(lon - F.lit(float(cx)), 2) + F.pow(lat - F.lit(float(cy)), 2))
            <= F.lit(d)
        )
    if isinstance(pred, P.During):
        return F.col(pred.field).between(_ts_lit(pred.start), _ts_lit(pred.end))
    if isinstance(pred, P.AttrBetween):
        lo = _ts_lit(pred.lo) if isinstance(pred.lo, datetime) else F.lit(pred.lo)
        hi = _ts_lit(pred.hi) if isinstance(pred.hi, datetime) else F.lit(pred.hi)
        return F.col(pred.field).between(lo, hi)
    if isinstance(pred, P.AttrIn):
        if _is_array_col(t, pred.field):
            # multi-valued (List) attribute: match if ANY element is in the
            # set (the reference indexes one row per element,
            # ``ACC/data/tables/AttributeTable.scala:259-270``)
            return F.arrays_overlap(
                F.col(pred.field), F.array(*[F.lit(v) for v in pred.values])
            )
        return F.col(pred.field).isin(pred.values)
    if isinstance(pred, P.AttrCmp):
        c = F.col(pred.field)
        v = _ts_lit(pred.value) if isinstance(pred.value, datetime) else F.lit(pred.value)
        if pred.op == "=":
            if _is_array_col(t, pred.field):
                return F.array_contains(c, v)
            return c == v
        if pred.op == "<>":
            return c != v
        if pred.op == "<":
            return c < v
        if pred.op == "<=":
            return c <= v
        if pred.op == ">":
            return c > v
        if pred.op == ">=":
            return c >= v
        if pred.op == "like":
            return c.like(pred.value)
        if pred.op == "isnotnull":
            return c.isNotNull()
    raise ValueError(f"cannot lower predicate: {pred}")


# ---------------------------------------------------------------------------
# constraint extraction (QueryFilterSplitter analog)
# ---------------------------------------------------------------------------


def _flatten_and(pred: P.Pred) -> list[P.Pred]:
    if isinstance(pred, P.And):
        out = []
        for c in pred.children:
            out.extend(_flatten_and(c))
        return out
    return [pred]


def _extract_bbox(t: GeoTable, leaves: list[P.Pred]):
    """Intersection of all spatial constraints as one bbox (or None)."""
    box = None

    def merge(b):
        nonlocal box
        box = b if box is None else (
            max(box[0], b[0]), max(box[1], b[1]), min(box[2], b[2]), min(box[3], b[3])
        )

    for leaf in leaves:
        if isinstance(leaf, P.BBox):
            if leaf.lon_min > leaf.lon_max:
                continue  # IDL-crossing: residual-only (no single z-range box)
            if not is_whole_world(leaf.lon_min, leaf.lat_min, leaf.lon_max, leaf.lat_max):
                merge((leaf.lon_min, leaf.lat_min, leaf.lon_max, leaf.lat_max))
        elif isinstance(leaf, (P.Intersects, P.Within, P.Touches)):
            merge(leaf.geom.bbox())
        elif isinstance(leaf, P.Contains) and leaf.geom.kind == "POINT":
            # rows containing the point must cover it -> the point is a
            # valid prune box (exact for point rows, superset for areal)
            merge(leaf.geom.bbox())
        elif isinstance(leaf, P.DWithin):
            cx, cy = leaf.geom.rings[0][0]
            meters = dwithin_meters(leaf.distance, leaf.units)
            d = meters_to_degrees(meters, cy) if meters is not None else float(leaf.distance)
            merge((cx - d, cy - d, cx + d, cy + d))
    return box


def _extract_interval(t: GeoTable, leaves: list[P.Pred]):
    """Bounded [start, end] on the dtg column, or None."""
    lo = hi = None
    for leaf in leaves:
        if isinstance(leaf, P.During) and leaf.field == t.dtg:
            lo = leaf.start if lo is None else max(lo, leaf.start)
            hi = leaf.end if hi is None else min(hi, leaf.end)
        elif isinstance(leaf, P.AttrBetween) and leaf.field == t.dtg and isinstance(leaf.lo, datetime):
            lo = leaf.lo if lo is None else max(lo, leaf.lo)
            hi = leaf.hi if hi is None else min(hi, leaf.hi)
        elif isinstance(leaf, P.AttrCmp) and leaf.field == t.dtg and isinstance(leaf.value, datetime):
            if leaf.op in (">", ">="):
                lo = leaf.value if lo is None else max(lo, leaf.value)
            elif leaf.op in ("<", "<="):
                hi = leaf.value if hi is None else min(hi, leaf.value)
    if lo is None or hi is None:
        return None
    return (lo, hi)


# ---------------------------------------------------------------------------
# prune emission
# ---------------------------------------------------------------------------


def _z3_prune(t: GeoTable, bbox, interval, stats: QueryStats,
              max_ranges_per_week: int = 8) -> Column | None:
    """week + z3-range prune predicate (Z3IdxStrategy.scala:37-174 analog).

    Weeks fully inside the interval share one full-time-range cover; the
    first/last partial weeks get their own tighter covers
    (mirrors the per-week range computation in ``Z3IdxStrategy.scala:139-156``).

    ``max_ranges_per_week`` defaults LOW deliberately: each range becomes a
    BETWEEN in the pushed OR-filter, and the filter is evaluated per row on
    whatever survives row-group skipping. Measured on a 100M-row z-sorted
    layout (local[8]): 12 coarse ranges run the same query 16x faster than
    144 tight ones (0.21s vs 3.41s) and 5x faster than no prune at all —
    range precision is NOT free; the exact residual catches what coarse
    covers admit.
    """
    lo_s = int(interval[0].timestamp())
    hi_s = int(interval[1].timestamp())
    if lo_s > hi_s:
        # contradictory (empty) intersected interval — e.g. two disjoint
        # DURING clauses ANDed together: a legal query whose answer is
        # empty, not a planner crash
        stats.n_weeks = 0
        stats.notes.append("empty time interval: query compiles to no rows")
        return F.lit(False)
    w0, w1 = lo_s // SECONDS_PER_WEEK, hi_s // SECONDS_PER_WEEK
    stats.n_weeks = w1 - w0 + 1
    if w1 - w0 > 512:
        # interval too wide for per-week range planning: prune on week only
        return F.col(t.week_col).between(w0, w1)

    zcol = F.col(t.z3_col)
    groups: dict[tuple[int, int], list[int]] = {}
    for w in range(w0, w1 + 1):
        t_lo = lo_s - w * SECONDS_PER_WEEK if w == w0 else 0
        t_hi = hi_s - w * SECONDS_PER_WEEK if w == w1 else SECONDS_PER_WEEK - 1
        t_lo = max(0, min(t_lo, SECONDS_PER_WEEK - 1))
        t_hi = max(0, min(t_hi, SECONDS_PER_WEEK - 1))
        groups.setdefault((t_lo, t_hi), []).append(w)

    clauses = []
    total_ranges = 0
    for (t_lo, t_hi), weeks in groups.items():
        ranges = Z3.ranges(bbox[0], bbox[1], bbox[2], bbox[3], t_lo, t_hi,
                           max_ranges=max_ranges_per_week)
        total_ranges += len(ranges)
        zpred = None
        for lo, hi in ranges:
            c = zcol.between(lo, hi)
            zpred = c if zpred is None else (zpred | c)
        wmin, wmax = min(weeks), max(weeks)
        wpred = (
            F.col(t.week_col).between(wmin, wmax)
            if wmax - wmin + 1 == len(weeks)
            else F.col(t.week_col).isin(weeks)
        )
        clauses.append(wpred & zpred if zpred is not None else wpred)
    stats.n_z_ranges = total_ranges
    out = clauses[0]
    for c in clauses[1:]:
        out = out | c
    return out


def _z2_prune(t: GeoTable, bbox, stats: QueryStats, max_ranges: int = 16) -> Column | None:
    ranges = Z2.ranges(bbox[0], bbox[1], bbox[2], bbox[3], max_ranges=max_ranges)
    stats.n_z_ranges = len(ranges)
    zcol = F.col(t.z2_col)
    out = None
    for lo, hi in ranges:
        c = zcol.between(lo, hi)
        out = c if out is None else (out | c)
    return out


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------


def compile_query(table: GeoTable, pred: P.Pred | str) -> CompiledQuery:
    """Compile a predicate into a filtered DataFrame + audit stats.

    OR at the top level becomes a union of per-branch scans deduplicated on
    the feature id (``QueryPlanner.scala:84-98`` semantics); each AND-branch
    independently picks record / z3 / z2 / attribute strategy by the same
    preference order as the reference's cost model
    (``QueryStrategyDecider.scala:104-127``: record=1 < attr < z3=200 < st=400).
    """
    t0 = time.perf_counter()
    if isinstance(pred, str):
        cql = pred
        pred = P.parse_cql(pred)
    else:
        cql = repr(pred)

    stats = QueryStats(filter=cql)

    if isinstance(pred, P.Or):
        branches = [compile_query(table, c) for c in pred.children]
        df = branches[0].df
        for b in branches[1:]:
            df = df.unionByName(b.df)
        if table.fid:
            df = df.dropDuplicates([table.fid])
        stats.strategy = "union(" + ",".join(b.stats.strategy for b in branches) + ")"
        stats.planning_ms = (time.perf_counter() - t0) * 1000
        return CompiledQuery(df, stats)

    leaves = _flatten_and(pred)
    residual = _lower_residual(table, pred)

    # strategy selection
    prune = None
    id_leaf = next(
        (l for l in leaves if table.fid and (
            (isinstance(l, P.AttrIn) and l.field == table.fid)
            or (isinstance(l, P.AttrCmp) and l.op == "=" and l.field == table.fid)
        )),
        None,
    )
    bbox = _extract_bbox(table, leaves)
    interval = _extract_interval(table, leaves) if table.dtg else None

    # attribute-index candidacy: a sargable leaf on a column with a
    # secondary sorted copy (AttributeIdxStrategy.scala:119-183)
    attr_idx_col = None
    for leaf in leaves:
        fld = getattr(leaf, "field", None)
        if fld and fld in table.attr_tables and (
            isinstance(leaf, (P.AttrIn, P.AttrBetween))
            or (isinstance(leaf, P.AttrCmp) and leaf.op in ("=", "<", "<=", ">", ">="))
        ):
            attr_idx_col = fld
            break
    z3_ok = bool(bbox and interval and table.z3_col and table.week_col)
    z2_ok = bool(bbox and table.z2_col)
    # cost preference (QueryStrategyDecider.scala:104-127): record < attr
    # (high-cardinality) < z3 < z2/st < attr (unknown) < fullscan
    use_attr_idx = attr_idx_col is not None and (
        table.cardinality.get(attr_idx_col) == "high" or not (z3_ok or z2_ok)
    )

    source_df = table.df
    if id_leaf is not None:
        stats.strategy = "record"  # RecordIdxStrategy analog: fid filter is the prune
    elif use_attr_idx:
        # scan the attribute-sorted copy: the residual's comparison on the
        # sort column reaches parquet as a PushedFilter and row-group
        # min/max stats skip the rest — the lexicoded-attr-range analog
        stats.strategy = f"attr-idx({attr_idx_col})"
        source_df = table.attr_tables[attr_idx_col]
    elif z3_ok:
        stats.strategy = "z3"
        prune = _z3_prune(table, bbox, interval, stats)
    elif z2_ok:
        stats.strategy = "z2"
        prune = _z2_prune(table, bbox, stats)
        if table.st_table is not None:
            # route to the z2-SORTED copy so the ranges actually skip row
            # groups (STIndexTable analog of the 4-table fanout)
            stats.strategy = "z2-st"
            source_df = table.st_table
    elif interval and table.week_col:
        # whole-world or non-spatial + bounded time: still the z3 layout,
        # pruned on its week partition column only (z-ranges would be the
        # full space). The reference likewise routes this to the Z3 table.
        stats.strategy = "z3-time"
        w0 = int(interval[0].timestamp()) // SECONDS_PER_WEEK
        w1 = int(interval[1].timestamp()) // SECONDS_PER_WEEK
        prune = F.col(table.week_col).between(w0, w1)
    else:
        stats.strategy = "attribute" if not bbox else "fullscan"

    df = source_df
    if prune is not None:
        df = df.filter(prune)
    df = df.filter(residual)
    stats.planning_ms = (time.perf_counter() - t0) * 1000
    return CompiledQuery(df, stats)


def query(
    table: GeoTable,
    cql: str,
    sort_by: list[tuple[str, bool]] | None = None,
    limit: int | None = None,
    auths: set[str] | None = None,
    vis_col: str = "vis",
    properties: list[str] | None = None,
) -> DataFrame:
    """Compile and return the DataFrame, with the GeoTools ``Query`` knobs:

    * ``sort_by`` — [(column, ascending)], the reference's SortBy handling
      (``ACC/index/QueryPlanner.scala:346-400`` LazySortedIterator; Spark's
      external sort is strictly better);
    * ``limit`` — ``Query.maxFeatures`` (GeoTools MaxFeatureReader);
    * ``auths`` — visibility filter: keep rows whose ``vis_col`` label is
      empty/null or within the caller's auth set
      (``geomesa-security/.../VisibilityFilter.scala`` applied at
      ``QueryPlanner.scala:319-324``; simple single-label model);
    * ``properties`` — projection/transform list: plain column names or
      ``derived=expr`` strings parsed through the converter function
      registry (``Query.properties`` + transform-SFT derivation,
      ``QueryPlanner.scala:234-297``). Applied after the visibility filter
      (a transform may project the vis label away) and before sort/limit
      (sorting on derived properties is allowed).
    """
    df = compile_query(table, cql).df
    if auths is not None and vis_col in df.columns:
        from geomesa_spark.runtime.security import visibility_filter

        df = visibility_filter(df, vis_col, set(auths))
    if properties:
        from geomesa_spark.functions.dsl import parse_properties

        cols = {c: F.col(c) for c in df.columns}
        df = df.select(
            *[builder(cols).alias(name) for name, builder in parse_properties(properties)]
        )
    if sort_by:
        df = df.orderBy(*[F.col(c).asc() if asc else F.col(c).desc() for c, asc in sort_by])
    if limit is not None:
        df = df.limit(limit)
    return df


def timestamp_range_filter(df: DataFrame, ts_col: str, start, end) -> DataFrame:
    """Ingest-timestamp pruning (``ACC/iterators/TimestampRangeIterator``)."""
    return df.filter(F.col(ts_col).between(_ts_lit(start), _ts_lit(end)))


def timestamp_set_filter(df: DataFrame, ts_col: str, instants) -> DataFrame:
    """Exact-instant selection (``ACC/iterators/TimestampSetIterator``)."""
    return df.filter(F.col(ts_col).isin([_ts_lit(t) for t in instants]))
