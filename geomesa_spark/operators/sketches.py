"""Mergeable distinct-count sketches (DataSketches HLL) per group.

`urls.domain_stats(approx=True)` answers "distinct urls per domain" with
``approx_count_distinct`` — one pass, but the sketch state dies with the
query. At 10^12 rows the panel a pipeline actually maintains is
INCREMENTAL: per-ingest-delta sketch tables (KBs per group) stored at
write time and union-merged on read, so "distinct urls per domain this
quarter" never re-scans a quarter of crawl data — the distinct-count
sibling of the stored Bloom bitset (``bloom.py``) and fingerprint table
(``dedup.corpus_fingerprints``).

Built on Spark's Apache DataSketches HLL functions (public SQL surface
since 3.5: ``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``), which give the two properties the incremental
design needs:

* **lossless merge**: HLL register state is a coordinate-wise max, so
  ``union(sketch(A), sketch(B)) == sketch(A ∪ B)`` EXACTLY — estimates
  after any merge tree equal the single-pass sketch's, independent of
  partitioning, merge order, or how ingest batched the deltas;
* **deterministic estimates**: the estimate is a pure function of the
  input value set (no run-time randomness), and in the sparse
  (coupon-list) regime — cardinalities well under 2^lgk registers — it
  is the exact distinct count.

The aggregation itself is Spark partial/final (map-side combined); a
group's sketch is ``~2^lgk`` bytes dense, far smaller sparse, so even a
10^8-domain panel is a few GB of sketch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame, key_col: str, group_cols: list[str], lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketch of ``count_distinct(key_col)``:
    ``(*group_cols, sketch binary)``. One map-side-combined hash
    aggregate; the sketch column round-trips parquet byte-exactly, so
    this is the frame an ingest job appends to the stored panel."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch")
    )


def merge_sketch_tables(*tables: DataFrame) -> DataFrame:
    """Union-merge sketch tables (same group columns) into one row per
    group. Register-max merge: the result is bit-identical to a
    single-pass sketch over the union of the inputs' rows. One hash
    aggregate over rows that are already one-per-(table, group)."""
    if not tables:
        raise ValueError("at least one sketch table required")
    acc = tables[0]
    for t in tables[1:]:
        acc = acc.unionByName(t)
    groups = [c for c in acc.columns if c != "sketch"]
    return acc.groupBy(*groups).agg(
        # allowDifferentLgConfigK=False: a silently-downgraded precision
        # is a corrupted panel, fail loudly instead
        F.hll_union_agg(F.col("sketch"), F.lit(False)).alias("sketch")
    )


def sketch_estimates(table: DataFrame, out_col: str = "n_distinct") -> DataFrame:
    """Read the panel: ``(*group_cols, estimate bigint)``."""
    groups = [c for c in table.columns if c != "sketch"]
    return table.select(
        *groups, F.hll_sketch_estimate(F.col("sketch")).alias(out_col)
    )
