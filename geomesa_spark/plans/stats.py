"""Attribute cardinality statistics for strategy costing.

The reference attaches per-attribute cardinality hints
(``UTL/stats/Cardinality.scala``) that ``QueryStrategyDecider`` /
``AttributeIdxStrategy.scala:170-183`` consult when choosing between the
attribute index and the spatio-temporal indexes. This module measures them:
one pass of ``approx_count_distinct`` (HLL sketch, map-side combinable — a
single small-aggregate job even at 10^12 rows) classifies each column, and
the result plugs straight into ``GeoTable.cardinality`` /
``read_layout(cardinality=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cardinality_hints(
    df: DataFrame,
    cols: list[str],
    high_fraction: float = 0.01,
    high_min: int = 1000,
) -> dict[str, str]:
    """Classify columns as 'high' or 'low' cardinality.

    'high' = approx distinct count exceeds ``high_min`` AND
    ``high_fraction`` of the row count — the regime where an
    attribute-sorted scan touches a small slice and should outrank z3.
    """
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.approx_count_distinct(c).alias(c) for c in cols
    ]
    row = df.agg(*aggs).first()
    n = max(1, row["__n"])
    return {
        c: "high" if row[c] >= max(high_min, high_fraction * n) else "low"
        for c in cols
    }
