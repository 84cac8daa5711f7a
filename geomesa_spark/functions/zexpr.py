"""Space-filling-curve keys as pure Spark Column expressions.

The reference computes Z3 keys row-at-a-time in JVM iterators
(``geomesa-accumulo/.../data/tables/Z3Table.scala:120-139``). Here the same
21/21/20-bit Morton interleave is emitted as a tree of built-in bitwise
Column functions, so key computation runs **inside whole-stage codegen** on
the JVM — no Python, no Arrow transfer, vectorized by Tungsten. The numpy
twin (``geomesa_spark.cells.zcurve``) is used driver-side for range planning;
tests assert both produce identical keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from geomesa_spark.cells.zcurve import SECONDS_PER_WEEK

_SPLIT2_STEPS = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]

_SPLIT1_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _clip(c: Column, lo: int, hi: int) -> Column:
    return F.greatest(F.lit(lo), F.least(F.lit(hi), c))


def epoch_seconds(ts: Column) -> Column:
    """Unix seconds from TimestampType, TIMESTAMP_NTZ, or a long column.

    TIMESTAMP_NTZ cannot cast directly to long; routing through TimestampType
    (a no-op for LTZ, session-tz interpretation for NTZ — the engine pins the
    session to UTC) makes every input shape work.
    """
    return ts.cast("timestamp").cast("long")


def _normalize_expr(value: Column, lo: float, hi: float, bits: int) -> Column:
    n = F.floor((value - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << bits)))
    return _clip(n.cast("long"), 0, (1 << bits) - 1)


def _split_expr(x: Column, steps, head_mask: int) -> Column:
    x = x.bitwiseAND(F.lit(head_mask))
    for shift, mask in steps:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def z3_expr(lon: Column, lat: Column, ts: Column) -> Column:
    """z3 key (long) from lon/lat columns and a timestamp column.

    ``ts`` may be TimestampType or a long of unix seconds.
    """
    x = _normalize_expr(lon.cast("double"), -180.0, 180.0, 21)
    y = _normalize_expr(lat.cast("double"), -90.0, 90.0, 21)
    secs = epoch_seconds(ts)
    t = _clip(secs % F.lit(SECONDS_PER_WEEK), 0, SECONDS_PER_WEEK - 1)
    sx = _split_expr(x, _SPLIT2_STEPS, 0x1FFFFF)
    sy = _split_expr(y, _SPLIT2_STEPS, 0x1FFFFF)
    st_ = _split_expr(t, _SPLIT2_STEPS, 0x1FFFFF)
    return sx.bitwiseOR(F.shiftleft(sy, 1)).bitwiseOR(F.shiftleft(st_, 2))


def z2_expr(lon: Column, lat: Column) -> Column:
    """z2 key (long, 62 bits) from lon/lat columns."""
    x = _normalize_expr(lon.cast("double"), -180.0, 180.0, 31)
    y = _normalize_expr(lat.cast("double"), -90.0, 90.0, 31)
    sx = _split_expr(x, _SPLIT1_STEPS, 0xFFFFFFFF)
    sy = _split_expr(y, _SPLIT1_STEPS, 0xFFFFFFFF)
    return sx.bitwiseOR(F.shiftleft(sy, 1))


def week_expr(ts: Column) -> Column:
    """Epoch week (int) — the Z3 partition column
    (mirrors ``Z3Table.scala:40-51`` week binning)."""
    return F.floor(epoch_seconds(ts) / F.lit(SECONDS_PER_WEEK)).cast("int")


def seconds_in_week_expr(ts: Column) -> Column:
    return (epoch_seconds(ts) % F.lit(SECONDS_PER_WEEK)).cast("long")


def tile_id_expr(lon: Column, lat: Column, level: int) -> Column:
    """XYZ tile id as pure arithmetic (see cells/tiles.py for the scheme)."""
    if not 0 <= level <= 26:
        raise ValueError(f"tile level must be in [0, 26], got {level}")
    n = 1 << level
    x = _clip(F.floor((lon.cast("double") + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))).cast("long"), 0, n - 1)
    y = _clip(F.floor((F.lit(90.0) - lat.cast("double")) / F.lit(180.0) * F.lit(float(n))).cast("long"), 0, n - 1)
    return (F.lit(level) * F.lit(1 << 52) + x * F.lit(1 << 26) + y).cast("long")
