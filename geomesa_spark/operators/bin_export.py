"""BIN track-record packing.

Rebuilds the reference's BIN aggregating output
(``ACC/iterators/BinAggregatingIterator.scala:39-945``, format
``FLT/function/Convert2ViewerFunction.scala:85-147``): each feature becomes a
packed little-endian record ``(track_hash:int32, secs:int32, lat:f32,
lon:f32)`` (16 B) or with a trailing ``label:int64`` (24 B), optionally
time-sorted per chunk.

Spark shape: the *logical* record is produced with built-in expressions
(:func:`bin_records`, SQL-oracle-checkable); the byte packing is a grouped
``applyInPandas`` that emits one blob per track via ``numpy.tobytes`` —
vectorized struct packing, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.functions.zexpr import epoch_seconds
from geomesa_spark.plans.compiler import GeoTable


def _track_hash_expr(track):
    """ONE 32-bit track hash for both the logical rows and the packed
    blobs (xxhash64 folded to int32 range) — consumers can join unpacked
    record bytes back to ``bin_records`` rows on it."""
    return (F.xxhash64(track.cast("string")) % F.lit(2147483647)).cast("int")


def _wrap_int32(secs):
    """Epoch seconds with explicit int32 wraparound — post-2038 timestamps
    truncate like the packed <i4 field (and like numpy ``astype``) instead
    of aborting the job under ANSI overflow checking."""
    return (
        F.pmod(secs + F.lit(2_147_483_648), F.lit(4_294_967_296))
        - F.lit(2_147_483_648)
    ).cast("int")


def bin_records(table: GeoTable, track_col: str, total_sort: bool = False) -> DataFrame:
    """The logical BIN projection: (track_hash, secs, lat, lon), time-sorted
    per partition by default — a global sort is an all-to-one range shuffle
    at 100 TB, so it is opt-in, mirroring the reference's optional
    whole-result time sort (``BinAggregatingIterator`` sorts per chunk by
    default and only the export client merge-sorts the chunks when asked).

    ``total_sort=True`` produces the merged total time order
    (range-partitioned sort: each output split holds one time slice, the
    distributed equivalent of the client-side chunk merge).

    track_hash matches the reference's int hash of the track id; here a
    deterministic 32-bit hash (xxhash64 folded) so both engines can agree.
    """
    out = table.df.select(
        F.col(track_col).alias("track"),
        _track_hash_expr(F.col(track_col)).alias("track_hash"),
        _wrap_int32(epoch_seconds(F.col(table.dtg))).alias("secs"),
        F.col(table.lat).cast("float").alias("lat"),
        F.col(table.lon).cast("float").alias("lon"),
    )
    if total_sort:
        return out.orderBy("secs", "track")
    return out.sortWithinPartitions("track", "secs")


def bin_pack(table: GeoTable, track_col: str, label_col: str | None = None) -> DataFrame:
    """One packed blob per track: rows sorted by time, 16 B (or 24 B) each.

    Rows with a null track or null dtg are dropped up front (a null key
    would poison a whole group; a null time has no defined slot in the
    fixed-width record). The per-record hash is :func:`_track_hash_expr`
    — the SAME value ``bin_records`` emits, so the two forms join.
    """
    width = 24 if label_col else 16
    cols = [
        F.col(track_col).cast("string").alias("track"),
        _track_hash_expr(F.col(track_col)).alias("track_hash"),
        _wrap_int32(epoch_seconds(F.col(table.dtg))).alias("secs"),
        F.col(table.lat).cast("double").alias("lat"),
        F.col(table.lon).cast("double").alias("lon"),
    ]
    if label_col:
        cols.append(F.col(label_col).cast("long").alias("label"))
    src = table.df.select(*cols).filter(
        F.col("track").isNotNull() & F.col("secs").isNotNull()
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("secs", kind="mergesort")
        n = len(pdf)
        rec = np.zeros(n, dtype=np.dtype(
            [("h", "<i4"), ("t", "<i4"), ("lat", "<f4"), ("lon", "<f4")]
            + ([("label", "<i8")] if label_col else [])
        ))
        rec["h"] = np.int32(pdf["track_hash"].iloc[0])
        rec["t"] = pdf["secs"].to_numpy().astype(np.int64).astype(np.int32)
        rec["lat"] = pdf["lat"].to_numpy()
        rec["lon"] = pdf["lon"].to_numpy()
        if label_col:
            rec["label"] = pdf["label"].to_numpy()
        return pd.DataFrame(
            {"track": [key[0]], "n": [n], "record_bytes": [rec.tobytes()]}
        )

    out = src.groupBy("track").applyInPandas(
        pack, "track string, n long, record_bytes binary"
    )
    return out.withColumn("record_width", F.lit(width))
