"""Bloom-filter seen-set prefilter for snapshot-vs-corpus membership.

The third member of the incremental-ingest family (with
``dedup.corpus_fingerprints`` / ``dedup.incremental_dedup``): admit the
rows of a NEW crawl snapshot whose key (canonical URL) has never been
ingested, without shuffling the snapshot against the 10^12-row corpus
seen-set. The reference's analogue is key-membership via its record
index (``ACC/index/RecordIdxStrategy.scala`` id-lookup scans); at
web-crawl scale the standing "have we fetched this URL" check is a Bloom
filter over the corpus key column, rebuilt (or incrementally OR-merged)
at corpus-build time, broadcast to every executor, and consulted before
any join is attempted.

Exactness contract: the Bloom filter can produce false POSITIVES, never
false negatives, so the final answer is exact — rows the filter clears
("definitely new") are admitted with no join at all, and only the
maybe-seen candidates are verified with an exact anti-join against the
corpus key table. The output is byte-identical to a plain anti-join;
the filter changes only how much data moves.

Scale shape (10^12-row corpus, 10^9-row snapshot): the build is one
narrow pass over the corpus keys (per-partition numpy bitsets, a
``fanin``-way executor-side OR-merge tree, then <= ``fanin`` bitset rows
to the driver — a bounded driver aggregate, like the IVF centroid
partials in ``ann.py``). The probe is a vectorized pandas UDF over a
broadcast bitset: zero shuffle. Only the FP-rate x |snapshot| + truly
seen slice reaches the verify anti-join, and with the corpus key table
stored bucketed by key (the ``incremental_dedup`` discipline) that join
shuffles candidate rows only. With m/n = 16 bits/key and k = 5 probes
the FP rate is ~5e-3, so the verify join sees ~0.5% of a disjoint
snapshot instead of 100%.

Determinism: probe positions derive from the JVM-side ``xxhash64`` of
the key column and fixed odd multiply-shift constants (same discipline
as ``dedup._hash_params``), so build and probe agree bit-for-bit across
runs, sessions, and resumes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _probe_params(k: int, seed: int = 42):
    """k deterministic odd multiply-shift (a, b) pairs (uint64 ring)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=k, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)  # odd: x -> a*x must be injective mod 2^64
    return a, b


def _positions(keys: np.ndarray, a: np.ndarray, b: np.ndarray, log2_m: int):
    """(k, n) probe positions in [0, 2^log2_m) via multiply-shift."""
    shift = np.uint64(64 - log2_m)
    # outer product in the 2^64 wraparound ring; top log2_m bits are the
    # best-mixed bits of a multiply-shift hash
    return ((keys[None, :] * a[:, None]) + b[:, None]) >> shift


def bloom_build(
    keys: DataFrame, key_col: str, log2_m: int = 23, k: int = 5,
    seed: int = 42, fanin: int = 64,
) -> bytes:
    """Build an m = 2^log2_m bit Bloom filter over ``keys[key_col]``.

    One narrow pass: each input partition folds its keys into a local
    numpy bitset (``mapInPandas``, one output row per partition), the
    partials OR-merge executor-side in ``fanin`` groups
    (``applyInPandas``), and the driver ORs the <= ``fanin`` survivors —
    at 10^5 build tasks the driver still sees ``fanin`` rows of m/8
    bytes, not 10^5. Returns the bitset as bytes (little-endian uint64
    words), ready for ``SparkContext.broadcast``.
    """
    if not 10 <= log2_m <= 36:
        raise ValueError(f"log2_m {log2_m} out of range [10, 36]")
    m_words = (1 << log2_m) // 64
    a, b = _probe_params(k, seed)

    keyed = keys.select(
        F.xxhash64(F.col(key_col)).alias("__k"),
        (F.spark_partition_id() % fanin).alias("__g"),
    )

    def partial(batches):
        bits = np.zeros(m_words, dtype=np.uint64)
        grp, any_rows = 0, False
        for pdf in batches:
            if not len(pdf):
                continue
            grp, any_rows = int(pdf["__g"].iloc[0]), True
            pos = _positions(pdf["__k"].values.astype(np.uint64), a, b, log2_m)
            np.bitwise_or.at(
                bits, (pos >> 6).ravel(),
                np.uint64(1) << (pos.ravel() & np.uint64(63)),
            )
        if any_rows:
            yield pd.DataFrame({"__g": [grp], "bits": [bits.tobytes()]})

    def or_group(pdf):
        acc = np.zeros(m_words, dtype=np.uint64)
        for raw in pdf["bits"]:
            acc |= np.frombuffer(raw, dtype=np.uint64)
        return pd.DataFrame({"bits": [acc.tobytes()]})

    partials = keyed.mapInPandas(partial, "__g int, bits binary")
    merged = partials.groupBy("__g").applyInPandas(or_group, "bits binary")
    acc = np.zeros(m_words, dtype=np.uint64)
    for row in merged.collect():  # <= fanin rows — bounded driver aggregate
        acc |= np.frombuffer(row["bits"], dtype=np.uint64)
    return acc.tobytes()


def bloom_merge(*bitsets: bytes) -> bytes:
    """OR-merge Bloom bitsets built with the SAME (log2_m, k, seed).

    This is the per-ingest maintenance step the stored-artifact design
    relies on: ``merge(build(delta1), build(delta2)) == build(delta1 ∪
    delta2)`` bit-for-bit (set-bit union is commutative/associative and
    probe positions depend only on the key), so a standing seen-set is
    refreshed by building a bitset over the new delta's keys alone and
    OR-ing it in — never re-scanning the corpus. Mixed sizes raise:
    positions are modulo m, so same-key bits land differently in
    different-m filters and a silent merge would corrupt the artifact.
    """
    if not bitsets:
        raise ValueError("at least one bitset required")
    sizes = {len(b) for b in bitsets}
    if len(sizes) != 1:
        raise ValueError(f"mixed bitset sizes {sorted(sizes)}: incompatible log2_m")
    acc = np.frombuffer(bitsets[0], dtype=np.uint64).copy()
    for b in bitsets[1:]:
        acc |= np.frombuffer(b, dtype=np.uint64)
    return acc.tobytes()


def bloom_probe_udf(bitset_bc, log2_m: int, k: int = 5, seed: int = 42):
    """Vectorized maybe-seen probe over an ``xxhash64`` key column.

    ``bitset_bc`` is a ``Broadcast[bytes]`` from :func:`bloom_build` —
    broadcast, not a literal, so the 10^12-scale bitset (GBs) ships once
    per executor instead of riding every task's serialized plan.
    """
    a, b = _probe_params(k, seed)

    @pandas_udf("boolean")
    def maybe_seen(key: pd.Series) -> pd.Series:
        bits = np.frombuffer(bitset_bc.value, dtype=np.uint64)
        keys = key.values.astype(np.uint64)
        pos = _positions(keys, a, b, log2_m)
        hit = (bits[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
        return pd.Series(hit.all(axis=0))

    return maybe_seen


def bloom_new_keys(
    snapshot: DataFrame, corpus_keys: DataFrame, key_col: str = "url",
    log2_m: int = 23, k: int = 5, seed: int = 42, fanin: int = 64,
) -> DataFrame:
    """EXACT snapshot rows whose ``key_col`` is absent from the corpus.

    Plan: build + broadcast the corpus Bloom (:func:`bloom_build`),
    split the snapshot on the zero-shuffle probe, anti-join ONLY the
    maybe-seen slice against the (distinct) corpus keys, and union the
    definitely-new slice back. False positives cost a candidate row in
    the verify join; false negatives cannot occur, so the result equals
    a plain ``left_anti`` join row-for-row.

    In production the Bloom is a stored artifact refreshed per ingest
    (OR-merge of the delta's partials into the standing bitset — the OR
    tree in :func:`bloom_build` is exactly that merge), so a snapshot
    run never re-scans corpus text, and re-runs resume from the stored
    bitset + bucketed key table.
    """
    spark = snapshot.sparkSession
    bitset = bloom_build(corpus_keys, key_col, log2_m, k, seed, fanin)
    bc = spark.sparkContext.broadcast(bitset)
    probe = bloom_probe_udf(bc, log2_m, k, seed)

    # materialized once: both branches read it, and an unmaterialized
    # lineage would re-run the probe UDF (and at 10^12 the snapshot scan)
    # per branch — the incremental_dedup discipline; released when the
    # returned frame is garbage-collected
    keyed = snapshot.withColumn(
        "__maybe", probe(F.xxhash64(F.col(key_col)))
    ).localCheckpoint(eager=False)
    certain_new = keyed.filter(~F.col("__maybe")).drop("__maybe")
    candidates = keyed.filter(F.col("__maybe")).drop("__maybe")
    # no distinct() on the build side: anti-join semantics are unaffected
    # by duplicate corpus keys, and a dedup pass over 10^12 corpus rows
    # would cost a corpus-wide aggregate for zero semantic effect
    verified_new = candidates.join(
        corpus_keys.select(key_col), on=key_col, how="left_anti"
    )
    # unionByName tolerates the anti-join's column reorder (join key first)
    return certain_new.unionByName(verified_new)
