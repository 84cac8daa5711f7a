"""Tile assignment and tile-pyramid rollups (raster <-> vector bridge).

Rebuilds the reference's raster-index chunking and query planning
(``RAS/index/RasterEntry.scala:58-86`` keys ``lexiEncode(res)~geohash``;
``RAS/data/AccumuloRasterQueryPlanner.scala:34-110`` resolution selection +
bbox cell enumeration + neighbors; mosaic ``RAS/util/RasterUtils.scala:112-160``)
on the XYZ tile pyramid:

* :func:`assign_tiles` — every feature gets a ``tile_id`` per requested level
  (pure arithmetic, codegen); this is the vector->tile assignment used for
  tile-pyramid materialization at 10^12 scale (partition by tile_id).
* :func:`tile_counts` / :func:`tile_rollup` — per-tile aggregates; rolling a
  level up to its parent is integer arithmetic on (x, y) >> 1.
* :func:`mosaic` — grouped compositing of chunk payloads per output tile via
  ``applyInPandas`` (image decode is stubbed deterministically; the container
  has no imaging libs — the Spark-side grouping/partitioning is the real part).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import tile_id_expr
from geomesa_spark.plans.compiler import GeoTable


def assign_tiles(table: GeoTable, levels: list[int]) -> DataFrame:
    """Add ``tile_id_l{level}`` columns (one per pyramid level)."""
    df = table.df
    for level in levels:
        df = df.withColumn(
            f"tile_id_l{level}",
            tile_id_expr(F.col(table.lon), F.col(table.lat), level),
        )
    return df


def tile_counts(table: GeoTable, level: int, weight_col: str | None = None) -> DataFrame:
    """Feature count (or weight sum) per tile at one level."""
    tid = tile_id_expr(F.col(table.lon), F.col(table.lat), level)
    w = F.col(weight_col) if weight_col else F.lit(1)
    return table.df.groupBy(tid.alias("tile_id")).agg(F.sum(w).alias("weight"))


def tile_rollup(tile_df: DataFrame, from_level: int, to_level: int) -> DataFrame:
    """Aggregate per-tile weights up the pyramid: child -> parent tiles.

    tile_id encodes (level, x, y) as level*2^52 + x*2^26 + y; the parent at
    level-1 is (x >> 1, y >> 1). Pure integer arithmetic, re-aggregated with
    a hash agg per level step (each step shrinks the data 4x).
    """
    assert to_level < from_level
    df = tile_df
    for level in range(from_level, to_level, -1):
        x = ((F.col("tile_id") - F.lit(level * (1 << 52))) / F.lit(1 << 26)).cast("long")
        y = F.col("tile_id") - F.lit(level * (1 << 52)) - x * F.lit(1 << 26)
        parent = (
            F.lit((level - 1) * (1 << 52))
            + F.shiftright(x, 1) * F.lit(1 << 26)
            + F.shiftright(y, 1)
        )
        df = df.groupBy(parent.alias("tile_id")).agg(F.sum("weight").alias("weight"))
    return df


def select_level(available: list[int], requested: int) -> int:
    """Choose the serving pyramid level for a requested resolution: the
    finest available level not finer than requested, else the coarsest
    available (mirrors the resolution selection of
    ``RAS/data/AccumuloRasterQueryPlanner.scala:34-110`` — closest available
    resolution <= requested, fall back to what exists)."""
    le = [l for l in available if l <= requested]
    return max(le) if le else min(available)


def raster_query_cells(
    bbox: tuple[float, float, float, float], level: int
) -> list[int]:
    """Tile ids intersecting ``bbox`` at ``level`` **plus touching
    neighbors** (the planner enumerates bbox hashes + neighbors so chunks
    whose extent bleeds over a cell edge are fetched —
    ``AccumuloRasterQueryPlanner.getQueryPlan:49``)."""
    from geomesa_spark.cells.tiles import tile_xy

    import numpy as np

    n = 1 << level
    x0, y1 = tile_xy(np.array([bbox[0]]), np.array([bbox[1]]), level)
    x1, y0 = tile_xy(np.array([bbox[2]]), np.array([bbox[3]]), level)
    xs = np.arange(max(0, x0[0] - 1), min(n - 1, x1[0] + 1) + 1)
    ys = np.arange(max(0, y0[0] - 1), min(n - 1, y1[0] + 1) + 1)
    gx, gy = np.meshgrid(xs, ys)
    ids = np.int64(level) * np.int64(1 << 52) + gx.ravel() * np.int64(1 << 26) + gy.ravel()
    return [int(v) for v in ids]


def raster_query(
    chunks: DataFrame,
    bbox: tuple[float, float, float, float],
    requested_level: int,
    available_levels: list[int],
) -> DataFrame:
    """Plan + execute a raster chunk query: pick the serving level, prune to
    the cell enumeration (partition prune / row-group skip on ``tile_id``),
    then the exact chunk-bbox overlap residual
    (``RAS/iterators/RasterFilteringIterator`` analog). ``chunks`` carries
    (tile_id, c_lon_min, c_lat_min, c_lon_max, c_lat_max, payload...)."""
    level = select_level(available_levels, requested_level)
    cells = raster_query_cells(bbox, level)
    pruned = chunks.filter(F.col("tile_id").isin(cells))
    overlap = (
        (F.col("c_lon_min") <= bbox[2])
        & (F.col("c_lon_max") >= bbox[0])
        & (F.col("c_lat_min") <= bbox[3])
        & (F.col("c_lat_max") >= bbox[1])
    )
    return pruned.filter(overlap)


def mosaic(chunks: DataFrame, out_level: int, canvas_bytes: int = 256) -> DataFrame:
    """Composite chunk payloads per output tile (``mosaicChunks`` analog,
    ``RAS/.../RasterUtils.mosaicChunks``: paint candidate chunks onto one
    output canvas, best-resolution pixels win).

    ``chunks``: (tile_id long, payload binary, weight double). The pixel
    DECODER is the environment-gated fake from
    :mod:`geomesa_spark.operators.multimodal` (no imaging libs here); the
    compositing math is real: every chunk decodes to a pixel array scaled
    by its weight, and the canvas keeps the per-pixel maximum — the
    order-independent compositing mode for density/elevation mosaics
    (deterministic under any task ordering, unlike alpha painting).
    Distributed shape: groupBy tile, bounded group size, one numpy pass per
    group.
    """
    from geomesa_spark.operators.multimodal import decode_payload

    def composite(key, pdf: pd.DataFrame) -> pd.DataFrame:
        canvas = np.zeros(canvas_bytes, dtype=np.float64)
        for payload, weight in zip(pdf["payload"], pdf["weight"]):
            if payload is None:
                continue
            a = decode_payload(bytes(payload), "image").astype(np.float64)
            reps = int(np.ceil(canvas_bytes / max(1, len(a))))
            tile_px = np.tile(a, reps)[:canvas_bytes]
            w = 1.0 if weight is None else float(weight)
            np.maximum(canvas, tile_px * w, out=canvas)
        out = np.clip(canvas, 0, 255).astype(np.uint8).tobytes()
        return pd.DataFrame(
            {"tile_id": [key[0]], "n_chunks": [len(pdf)], "composite": [out]}
        )

    return chunks.groupBy("tile_id").applyInPandas(
        composite, "tile_id long, n_chunks long, composite binary"
    )
