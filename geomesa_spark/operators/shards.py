"""Deterministic training-shard packing: the last mile of a corpus
pipeline, assigning every document a (shard_id, offset) in a reproducible
global token order.

Training jobs consume fixed-size token shards; the packing must be a pure
function of the corpus (re-runs, retries, and resumes all agree), and the
global running token count must NOT be computed with a global window sort
— ``sum() over (order by ...)`` is one unpartitioned sort task at corpus
scale. This operator is the scalable prefix-sum shape instead:

1. order key: the same two-round Lehmer permutation the sampling ops use
   (:func:`geomesa_spark.operators.corpus.hash_frac` — MINSTD, modulus
   2^31-1), exactly reproducible in any 64-bit engine, so the DuckDB twin
   can ORDER BY the identical key;
2. ``repartitionByRange(P, key, id)`` + ``sortWithinPartitions`` — the
   only corpus-sized exchange, and range partition i always holds keys
   below partition i+1 (global order = partition order + in-partition
   order, at any P: boundaries move with parallelism, the order does not);
3. per-partition token totals (P rows) are collected and prefix-summed on
   the driver — bounded by the partition count, never by the corpus;
4. one Arrow-batched cumsum per partition (numpy, vectorized) adds the
   broadcast partition offset; no further shuffle.

The two passes over the ranged projection share one persisted
(id, n_tokens, key) frame — 3 numeric columns, so the cache is ~24 bytes
per document even at the 10^12-doc target.

Reference analog: the closest thing the reference has is the BIN export's
total-ordered packed output (``ACC/.../BinAggregatingIterator.scala``
sort-merge); shard packing is that idea at training-corpus granularity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geomesa_spark.operators.corpus import _MINSTD_A, _MINSTD_M
from geomesa_spark.operators.textstats import token_count_col


def shard_order_key(id_col: Column, salt: int = 0) -> Column:
    """Two-round Lehmer permutation of the id as a BIGINT order key (the
    integer form of ``corpus.hash_frac`` — same constants, no division)."""
    x = id_col.cast("long")
    h1 = ((x + F.lit(salt)) * _MINSTD_A) % _MINSTD_M
    return (h1 * _MINSTD_A) % _MINSTD_M


def pack_shards(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shard_tokens: int,
    salt: int = 0,
    num_ranges: int | None = None,
) -> DataFrame:
    """Assign each non-NULL-text document to a training shard.

    Documents are laid end-to-end in Lehmer-key order; a document's shard
    is the one its FIRST token lands in (greedy sequential packing, so a
    document may straddle a boundary but its assignment is unambiguous).

    Returns ``(id_col, n_tokens long, shard_id long, offset_in_shard
    long)``. The result is a pure function of (corpus, shard_tokens,
    salt): independent of parallelism (``num_ranges`` moves range
    boundaries, not the order) and bit-reproducible by a SQL window twin.
    """
    import pandas as pd  # noqa: F401  (mapInPandas batches)

    spark = df.sparkSession
    shard = int(shard_tokens)
    if shard <= 0:
        raise ValueError("shard_tokens must be positive")
    p = int(num_ranges or spark.conf.get("spark.sql.shuffle.partitions"))
    id_type = df.schema[id_col].dataType.simpleString()

    ranged = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            token_count_col(F.col(text_col)).cast("long").alias("n_tokens"),
            shard_order_key(F.col(id_col), salt).alias("__k"),
        )
        .repartitionByRange(p, F.col("__k"), F.col(id_col))
        .sortWithinPartitions("__k", id_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    totals = {
        r["__pid"]: r["__t"]
        for r in ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("__t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])
    b_offsets = spark.sparkContext.broadcast(offsets)

    def gen(batches):
        carry = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is None:
                carry = b_offsets.value.get(int(pdf["__pid"].iloc[0]), 0)
            n = pdf["n_tokens"].to_numpy()
            cum = n.cumsum()
            start = carry + cum - n
            carry += int(cum[-1])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": n,
                    "shard_id": start // shard,
                    "offset_in_shard": start % shard,
                }
            )

    out_schema = (
        f"{id_col} {id_type}, n_tokens long, shard_id long, offset_in_shard long"
    )
    return ranged.mapInPandas(gen, out_schema)
