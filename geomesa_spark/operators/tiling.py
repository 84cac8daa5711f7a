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
    from geomesa_spark.cells.tiles import tiles_for_bbox

    # canonical enumeration + one-cell neighbor expansion (one tile-id
    # packing implementation repo-wide; antimeridian boxes split there)
    return [int(v) for v in
            tiles_for_bbox(bbox[0], bbox[1], bbox[2], bbox[3], level, expand=1)]


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

    def composite(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
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


def mosaic_geo(
    chunks: DataFrame,
    query_env: tuple[float, float, float, float],
    query_width: int,
    query_height: int,
) -> DataFrame:
    """GEO-POSITIONED mosaic: place each chunk's pixel block into the output
    canvas at its bbox offset (``RAS/util/RasterUtils.scala:112-160``
    ``mosaicChunks``/``writeToMosaic``), then nearest-neighbor scale to the
    requested output size.

    Mirrored semantics:

    * the working canvas is allocated at the CHUNKS' native resolution over
      the query envelope (``mosaicX = round(envWidth / chunkXRes)``), taken
      from the first chunk like the reference;
    * each chunk is cropped to the query envelope and written with
      ``setRect`` at ``originX = floor((chunkMinX - envMinX) / resX)``,
      ``originY = floor((envMaxY - chunkMaxY) / resY)`` — top-down y axis;
    * overlapping chunks: last write wins, in ascending ``tile_id`` order
      (the reference iterates in Accumulo key-scan order, which is the
      tile-key order; Spark groups are unordered so the kernel sorts);
    * the finished native-resolution canvas is scaled to
      (query_width, query_height) with nearest-neighbor.

    ``chunks``: (tile_id long, c_lon_min/.../c_lat_max double,
    c_width int, c_height int, payload binary). The pixel DECODER is the
    declared environment-gated fake (payload bytes tiled to c_width x
    c_height); everything spatial — crop windows, canvas offsets, overlap
    order, scaling — is real and tested against exact canvas bytes.

    One query = one canvas, so this job has a single group; a tile server
    parallelizes across many such requests, each pre-pruned by
    :func:`raster_query`. Returns one row
    (n_chunks, mosaic_width, mosaic_height, mosaic binary).
    """
    ex0, ey0, ex1, ey1 = (float(v) for v in query_env)

    def composite(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        n, w, h, data = _composite_canvas(
            pdf, (ex0, ey0, ex1, ey1), query_width, query_height
        )
        return pd.DataFrame({
            "n_chunks": [n], "mosaic_width": [w],
            "mosaic_height": [h], "mosaic": [data],
        })

    return chunks.withColumn("__g", F.lit(1)).groupBy("__g").applyInPandas(
        composite, "n_chunks long, mosaic_width int, mosaic_height int, mosaic binary"
    )


def _composite_canvas(
    pdf: pd.DataFrame,
    env: tuple[float, float, float, float],
    query_width: int,
    query_height: int,
) -> tuple[int, int, int, bytes]:
    """The mosaicChunks kernel for one output canvas (shared by the
    single-request :func:`mosaic_geo` and the per-tile fanout
    :func:`mosaic_geo_tiles`)."""
    from geomesa_spark.operators.multimodal import decode_payload

    ex0, ey0, ex1, ey1 = env
    pdf = pdf.sort_values("tile_id", kind="mergesort")
    first = pdf.iloc[0]
    res_x = (first["c_lon_max"] - first["c_lon_min"]) / max(1, int(first["c_width"]))
    res_y = (first["c_lat_max"] - first["c_lat_min"]) / max(1, int(first["c_height"]))
    mw = int(round((ex1 - ex0) / res_x)) if res_x > 0 else 0
    mh = int(round((ey1 - ey0) / res_y)) if res_y > 0 else 0
    if mw <= 0 or mh <= 0:
        return len(pdf), 0, 0, b""
    canvas = np.zeros((mh, mw), dtype=np.uint8)
    for _, row in pdf.iterrows():
        if row["payload"] is None:
            continue
        cw, ch = int(row["c_width"]), int(row["c_height"])
        flat = decode_payload(bytes(row["payload"]), "image").astype(np.uint8)
        reps = int(np.ceil(cw * ch / max(1, len(flat))))
        px = np.tile(flat, reps)[: cw * ch].reshape(ch, cw)
        cx0, cy0 = float(row["c_lon_min"]), float(row["c_lat_min"])
        cx1, cy1 = float(row["c_lon_max"]), float(row["c_lat_max"])
        # crop to the query envelope (cropRaster)
        ix0, ix1 = max(cx0, ex0), min(cx1, ex1)
        iy0, iy1 = max(cy0, ey0), min(cy1, ey1)
        if ix1 <= ix0 or iy1 <= iy0:
            continue
        crx = (cx1 - cx0) / cw
        cry = (cy1 - cy0) / ch
        sx0 = int(round((ix0 - cx0) / crx))
        sy0 = int(round((cy1 - iy1) / cry))  # chunk rows run north->south
        w_px = max(0, int(round((ix1 - ix0) / crx)))
        h_px = max(0, int(round((iy1 - iy0) / cry)))
        if w_px < 1 or h_px < 1:
            continue
        block = px[sy0 : sy0 + h_px, sx0 : sx0 + w_px]
        # writeToMosaic origin (floor, top-down y)
        ox = int(np.floor((ix0 - ex0) / res_x))
        oy = int(np.floor((ey1 - iy1) / res_y))
        # clip the destination rect to the canvas
        bx0, by0 = max(0, -ox), max(0, -oy)
        ox, oy = max(0, ox), max(0, oy)
        bw = min(block.shape[1] - bx0, mw - ox)
        bh = min(block.shape[0] - by0, mh - oy)
        if bw < 1 or bh < 1:
            continue
        canvas[oy : oy + bh, ox : ox + bw] = block[by0 : by0 + bh, bx0 : bx0 + bw]
    # nearest-neighbor scale to the requested output size
    if (query_width, query_height) != (mw, mh):
        xi = np.minimum((np.arange(query_width) * mw) // query_width, mw - 1)
        yi = np.minimum((np.arange(query_height) * mh) // query_height, mh - 1)
        canvas = canvas[yi][:, xi]
    return len(pdf), int(canvas.shape[1]), int(canvas.shape[0]), canvas.tobytes()


def mosaic_geo_tiles(
    chunks: DataFrame, out_level: int, tile_px: int = 256
) -> DataFrame:
    """Tile-pyramid mosaic fanout: ONE canvas per output XYZ tile at
    ``out_level``, each composited with the same geo-positioned kernel as
    :func:`mosaic_geo` over its own tile envelope.

    This is the materialization shape at scale: a chunk is exploded to
    every output tile its bbox overlaps (driver-free — the overlap tiles
    are computed with built-in arithmetic on the chunk bbox columns), then
    one ``groupBy(out_tile)`` fans the compositing across the cluster —
    thousands of canvases in one job instead of one job per request.
    Returns (out_tile long, n_chunks, mosaic_width, mosaic_height,
    mosaic binary).
    """
    n = 1 << out_level
    # output-tile x/y index ranges overlapped by each chunk bbox (XYZ grid:
    # x from lon west->east, y from lat NORTH->south)
    x0 = F.floor((F.col("c_lon_min") + 180.0) / 360.0 * n).cast("long")
    x1 = F.ceil((F.col("c_lon_max") + 180.0) / 360.0 * n).cast("long") - 1
    y0 = F.floor((90.0 - F.col("c_lat_max")) / 180.0 * n).cast("long")
    y1 = F.ceil((90.0 - F.col("c_lat_min")) / 180.0 * n).cast("long") - 1
    clamp = lambda c: F.greatest(F.lit(0), F.least(F.lit(n - 1), c))  # noqa: E731
    xs = F.sequence(clamp(x0), clamp(F.greatest(x1, x0)))
    ys = F.sequence(clamp(y0), clamp(F.greatest(y1, y0)))
    tiled = (
        chunks.withColumn("__tx", F.explode(xs))
        .withColumn("__ty", F.explode(ys))
        .withColumn(
            "out_tile",
            F.lit(out_level * (1 << 52)) + F.col("__tx") * F.lit(1 << 26) + F.col("__ty"),
        )
        .drop("__tx", "__ty")
    )

    def composite(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        from geomesa_spark.cells.tiles import tile_bbox

        tid = int(key[0])
        x = (tid - out_level * (1 << 52)) // (1 << 26)
        y = tid - out_level * (1 << 52) - x * (1 << 26)
        env = tile_bbox(out_level, int(x), int(y))
        cnt, w, h, data = _composite_canvas(pdf, env, tile_px, tile_px)
        return pd.DataFrame({
            "out_tile": [tid], "n_chunks": [cnt], "mosaic_width": [w],
            "mosaic_height": [h], "mosaic": [data],
        })

    return tiled.groupBy("out_tile").applyInPandas(
        composite,
        "out_tile long, n_chunks long, mosaic_width int, mosaic_height int, mosaic binary",
    )
