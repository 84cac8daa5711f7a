"""Shared distance Column expressions (whole-stage codegen).

ONE implementation of the column-vs-column haversine used by the kNN,
tube, and proximity operators — the formula shape is mirrored
operation-for-operation by the DuckDB oracles (``__spark_entry__.py::
_hav_sql``), so changes here must update those twins in lockstep.

(``plans/compiler.py::_haversine_expr`` keeps its own scalar-constant
variant deliberately: its right-hand side is a python-precomputed
constant whose exact op order is mirrored by the dwithin oracle; folding
it into this helper would change last-ulp behavior under that twin.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.8


def haversine_expr(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle meters between two point columns (IUGG mean radius)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    a = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(F.radians(lon2 - lon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(F.lit(1.0), a)))
