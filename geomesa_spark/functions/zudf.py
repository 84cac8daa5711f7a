"""Arrow-batched pandas UDFs for space-filling-curve keys.

These are the production encoders used by the layout writer: one numpy pass
per Arrow batch (``geomesa_spark.cells.zcurve``), evaluated exactly once per
row in a dedicated ArrowEvalPython stage.

Why not the pure Column expressions in ``zexpr.py``? The Morton spread
``(x | x << s) & m`` references its input twice per step, so a Column tree
duplicates subtrees ~2^5x per dimension; when Catalyst then inlines that tree
into each of the ~50 z-range BETWEEN predicates of a query prune, generated
code explodes (observed: multi-second codegen per stage, heap exhaustion).
A pandas UDF output is a single attribute that downstream predicates
reference by name — no duplication — and the numpy kernel is vectorized.
``zexpr.py`` remains for SQL-only consumers and as the JVM cross-check in
tests (both must produce identical keys).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from geomesa_spark.cells.zcurve import Z2, Z3, seconds_in_week


_cache: dict[str, object] = {}


def _z3_udf():
    # built lazily: pandas_udf registration requires an active SparkSession
    if "z3" not in _cache:

        @F.pandas_udf("long")
        def z3(lon: pd.Series, lat: pd.Series, unix_secs: pd.Series) -> pd.Series:
            z = Z3.encode(lon.to_numpy(), lat.to_numpy(), seconds_in_week(unix_secs.to_numpy()))
            return pd.Series(z.astype("int64"))

        _cache["z3"] = z3
    return _cache["z3"]


def _z2_udf():
    if "z2" not in _cache:

        @F.pandas_udf("long")
        def z2(lon: pd.Series, lat: pd.Series) -> pd.Series:
            z = Z2.encode(lon.to_numpy(), lat.to_numpy())
            return pd.Series(z.astype("int64"))

        _cache["z2"] = z2
    return _cache["z2"]


def z3_udf(lon, lat, unix_secs):
    return _z3_udf()(lon, lat, unix_secs)


def z2_udf(lon, lat):
    return _z2_udf()(lon, lat)


def _s2_leaf_udf():
    if "s2" not in _cache:
        from geomesa_spark.cells.s2 import lonlat_to_leaf

        @F.pandas_udf("long")
        def s2_leaf(lon: pd.Series, lat: pd.Series) -> pd.Series:
            ids = lonlat_to_leaf(lon.to_numpy(), lat.to_numpy())
            return pd.Series(ids.astype("int64"))

        _cache["s2"] = s2_leaf
    return _cache["s2"]


def s2_leaf_udf(lon, lat):
    """Leaf (level-30) S2 cell id column — same Arrow-batch contract as
    z2/z3 (one numpy pass per batch, one attribute out)."""
    return _s2_leaf_udf()(lon, lat)
