"""Streaming exact deduplication for the ingest path.

The reference deduplicates at-least-once Kafka deliveries by feature id
(``ACC/iterators/DeDuplicatingIterator.scala`` on the query side; consumer
offset + idempotent upsert on the live view). A training-data ingest
pipeline needs the CONTENT-level twin: drop re-crawled/duplicate documents
as they stream in, before they ever land in the corpus.

Spark-first shape: ``dropDuplicatesWithinWatermark`` over the 128-bit
content hash — first-seen doc per hash wins, and the watermark bounds the
dedup state store (without a bound, 10^12 hashes of state accumulate
forever; with it, a hash seen more than ``delay`` after its first arrival
is treated as new content, which is the correct trade for a crawl where
true re-deliveries cluster in time). Only (hash, timestamp) lives in
state; the document body rides the stream untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str,
    ts_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """First-seen-wins content dedup over a streaming DataFrame.

    ``stream`` must be a streaming DataFrame carrying ``text_col`` and an
    event-time ``ts_col``. Returns the stream with duplicate-content rows
    dropped and a ``content_hash`` column attached. State is keyed on the
    md5 hex string (32 chars/doc), evicted ``delay`` past the watermark.

    Null-content rows (fetch failures, binary pages): ``md5(null)`` is
    null, and ``dropDuplicatesWithinWatermark`` treats null keys as EQUAL
    — every distinct null-text document after the first would be silently
    dropped as a "duplicate". Such rows get a surrogate key hashed from
    the whole row instead (deterministic, so micro-batch replays still
    dedup exactly): distinct fetch-failures pass through, fully identical
    rows still collapse.
    """
    h = F.md5(F.col(text_col))
    # concat_ws silently SKIPS null columns, so (NULL,'x') and ('x',NULL)
    # would collide to one surrogate and the second row would be wrongly
    # dropped; coalesce each column to a sentinel so null POSITION changes
    # the hash (the sentinel can't collide with a real value containing
    # the separator because real values never contain \x00)
    surrogate = F.concat(F.lit("null:"), F.sha2(F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
          for c in stream.columns]
    ), 256))
    hashed = stream.withColumn(
        "content_hash",
        F.when(F.col(text_col).isNull(), surrogate).otherwise(h),
    )
    return hashed.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def streaming_incremental_dedup(
    stream: DataFrame,
    corpus_fp: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Stream-static twin of ``operators.dedup.incremental_dedup``'s
    exact stage: classify documents streaming in against the EXISTING
    corpus fingerprint table as they arrive.

    ``corpus_fp`` is the static fingerprint table
    (``dedup.corpus_fingerprints`` output or the stored equivalent —
    only ``id_col`` and ``content_hash`` are read). Each streamed doc
    gains ``content_hash``, ``verdict`` ('exact' for an already-ingested
    content hash, else 'new'), and ``match_id`` (smallest matching
    corpus id, NULL for new docs). Append-mode safe: one stateless
    stream-static left equi-join per micro-batch, no streaming state at
    all — with the stored corpus table bucketed on ``content_hash``,
    only the micro-batch side shuffles.

    Near-dup classification (MinHash band match + verify) stays a batch
    concern: it needs a window over candidate pairs, which streaming
    can't express incrementally — run the batch operator inside
    ``foreachBatch`` where per-batch near-dup verdicts are required.
    """
    clash = {"content_hash", "verdict", "match_id"} & set(stream.columns)
    if clash:
        # silently overwriting a caller's content_hash (then re-emitting
        # it twice via select(*stream.columns, ...)) would raise an
        # ambiguous-reference error only deep inside the streaming query
        raise ValueError(
            f"stream already carries output column(s) {sorted(clash)}; "
            "rename them before streaming_incremental_dedup"
        )
    hashes = corpus_fp.groupBy("content_hash").agg(
        F.min(id_col).alias("match_id")
    )
    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    return hashed.join(hashes, "content_hash", "left").select(
        *stream.columns,
        "content_hash",
        F.when(F.col("match_id").isNotNull(), F.lit("exact"))
        .otherwise(F.lit("new"))
        .alias("verdict"),
        "match_id",
    )
