"""Document deduplication operators (exact, MinHash-LSH, SimHash, n-gram).

Beyond the reference's feature-id dedupe
(``ACC/iterators/DeDuplicatingIterator.scala``), these are the content-dedup
operators a web-scale training-data pipeline needs. All signature computation
is Arrow-batched numpy (one matrix op per batch); candidate generation is
band-bucket equi-joins so the all-pairs comparison never materializes —
at 10^12 docs the only shuffles are on (band, bucket-hash) keys, and the
verify step touches candidate pairs only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic MinHash seeds (fixed so runs are reproducible/resumable)
_MERSENNE = (1 << 61) - 1


def _hash_params(n_hashes: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64)
    # ODD multipliers: the products wrap mod 2^64 long before the final
    # % _MERSENNE fold, so the effective family is multiply-shift in the
    # 2^64 ring — x -> a*x is only injective there when a is odd (an even
    # a halves the image and doubles collision rates)
    a |= 1
    return a, b


def _shingle_hashes(text: str, shingle_words: int) -> np.ndarray:
    """Stable 62-bit hashes of word shingles.

    Per-token crc32/adler32 once, then each shingle hash is a vectorized
    polynomial combination of its tokens' hashes (uint64 wraparound ring) —
    no per-gram string building, ~6x faster than hashing joined grams.
    """
    import zlib

    toks = text.split()
    if not toks:
        return np.array([0], dtype=np.int64)
    tok_h = np.array(
        [((zlib.crc32(w.encode()) << 31) | zlib.adler32(w.encode())) for w in toks],
        dtype=np.uint64,
    )
    k = min(shingle_words, len(toks))
    n = len(toks) - k + 1
    # powers of P mod 2^64 via python ints (numpy warns on intended wraparound)
    powers = np.array([pow(1000000007, j, 1 << 64) for j in range(k)], dtype=np.uint64)
    hs = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        hs += tok_h[j : j + n] * powers[j]
    return np.unique((hs & np.uint64((1 << 62) - 1)).astype(np.int64))


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per identical text (hash groupBy).

    One shuffle on the 128-bit content hash; the text itself never shuffles
    (only hash + id), which is what makes this viable at 100 TB.
    """
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
    keep = h.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    # no global orderBy: a total sort is an all-to-one shuffle at 100 TB and
    # neither dedup semantics nor the (order-insensitive) gate needs it
    return keep.select(id_col, "content_hash")


def _minhash_udf(n_hashes: int, shingle_words: int, seed: int):
    """Arrow-batched MinHash signature UDF (array<long>, length n_hashes)."""
    a, b = _hash_params(n_hashes, seed)

    @F.pandas_udf("array<long>")
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_hashes(t or "", shingle_words)
            # odd-multiplier multiply-shift: a*x + b wraps mod 2^64
            # (injective per hash since a is odd), then folds % _MERSENNE
            vals = (a[:, None] * (sh[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return sig


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 64,
    shingle_words: int = 3, seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature (array<long>, length n_hashes)."""
    sig = _minhash_udf(n_hashes, shingle_words, seed)
    return df.select(F.col(id_col), sig(F.col(text_col)).alias("minhash"))


def _band_expr(sig_col: str, n_hashes: int, bands: int):
    """array<struct<band,bucket>> — one xxhash64 bucket per signature band."""
    rows_per_band = n_hashes // bands
    return F.array(*[
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(F.concat_ws(",", *[
                F.col(sig_col)[i * rows_per_band + j].cast("string")
                for j in range(rows_per_band)
            ])).alias("bucket"),
        )
        for i in range(bands)
    ])


def minhash_lsh_pairs(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 64,
    bands: int = 16, shingle_words: int = 3, threshold: float = 0.5, seed: int = 42,
    bucket_cap: int = 100_000,
    precomputed_sigs: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    shingle -> minhash -> split signature into ``bands`` bands -> bucket-join
    docs sharing any band -> estimate Jaccard from full signatures ->
    keep pairs with est >= threshold. Returns (id_a, id_b, est_jaccard),
    id_a < id_b, deduplicated.

    Shuffle shape (the 100 TB concern): only ``(id, band, bucket)`` rides
    the band explode and both sides of the self-join — the 64-long signature
    array is re-attached to the surviving *pairs* by id afterwards, so the
    16x explode amplification carries 24 bytes/row, not the signature.
    Singleton buckets are dropped before the self-join (they cannot pair).

    Skew guard: a degenerate bucket of B near-identical docs would emit
    B^2/2 candidate rows. Buckets larger than ``bucket_cap`` switch to
    star-shape linking — every member pairs with the bucket's minimum id
    only (O(B) rows).

    Exact guarantee under the cap (the Jaccard-estimate filter runs on
    every emitted pair): a pair is found iff it shares at least one
    bucket of size <= cap, or verifies against an over-cap bucket's hub.
    A pair whose EVERY shared band lands in an over-cap bucket and whose
    members both miss the hub by the threshold is not emitted — that
    residual is exactly the O(B^2) work the cap avoids. In practice an
    over-cap MinHash bucket (>= ``bucket_cap`` docs sharing an identical
    16-value band) is a near-identical template family whose members all
    verify against the hub; raise ``bucket_cap`` or ``bands`` where that
    assumption is too strong. (:func:`simhash_near_pairs` additionally
    sub-splits its over-cap buckets because its 16-bit chunk space makes
    them routine; MinHash's 64-bit band-hash space makes them rare.)

    Memory note: the signature table persists for the SparkSession's
    lifetime (it is read twice: band explode + pair re-attach). Pipelines
    managing executor storage across many calls should pass
    ``precomputed_sigs`` and own the persistence lifecycle.
    """
    # persist only a frame we built ourselves: a caller-supplied
    # precomputed_sigs owns its persistence lifecycle (see docstring) —
    # pinning it here would leak executor storage the caller can't release
    if precomputed_sigs is not None:
        sigs = precomputed_sigs
    else:
        sigs = minhash_signatures(
            df, text_col, id_col, n_hashes, shingle_words, seed
        ).persist()

    band_cols = _band_expr("minhash", n_hashes, bands)
    exploded = sigs.withColumn("bb", F.explode(band_cols)).select(
        F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # bucket sizes via a window count, not agg+join: one shuffle of the
    # exploded table instead of two, and the window's (band, bucket) hash
    # partitioning feeds the self-join below without another exchange
    keyed = exploded.withColumn(
        "__bn", F.count("*").over(Window.partitionBy("band", "bucket"))
    )

    small = keyed.filter((F.col("__bn") >= 2) & (F.col("__bn") <= bucket_cap)).drop("__bn")
    l, r = small.alias("l"), small.alias("r")
    cand_small = l.join(
        r,
        (F.col("l.band") == F.col("r.band"))
        & (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
    )

    big = keyed.filter(F.col("__bn") > bucket_cap).drop("__bn")
    reps = big.groupBy("band", "bucket").agg(F.min(id_col).alias("id_a"))
    cand_big = big.join(reps, ["band", "bucket"]).filter(
        F.col(id_col) > F.col("id_a")
    ).select("id_a", F.col(id_col).alias("id_b"))

    cand = cand_small.unionByName(cand_big).dropDuplicates(["id_a", "id_b"])

    mh_a = sigs.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"))
    mh_b = sigs.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"))
    paired = cand.join(mh_a, "id_a").join(mh_b, "id_b")

    est = (
        F.aggregate(
            F.zip_with("mh_a", "mh_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double") / F.lit(float(n_hashes))
    )
    return (
        paired.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_signatures(df: DataFrame, text_col: str, id_col: str, seed: int = 42) -> DataFrame:
    """64-bit SimHash per document (token-hash weighted bit votes)."""

    @F.pandas_udf("long")
    def sim(texts: pd.Series) -> pd.Series:
        import zlib

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            hs = np.array(
                [((zlib.crc32(w.encode()) << 31) | zlib.adler32(w.encode())) & ((1 << 63) - 1) for w in toks],
                dtype=np.int64,
            )
            bits = ((hs[:, None] >> np.arange(63)[None, :]) & 1) * 2 - 1
            vec = bits.sum(axis=0)
            out[i] = int(((vec > 0).astype(np.int64) << np.arange(63)).sum())
        return pd.Series(out)

    return df.select(F.col(id_col), sim(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3,
    bucket_cap: int = 100_000,
    precomputed_sigs: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 63 bits into 4 chunks (pigeonhole:
    any pair within hamming distance 3 shares at least one exact chunk),
    bucket-join, verify hamming distance exactly.

    Skew guard (same shape as :func:`minhash_lsh_pairs`): the 16-bit chunk
    values give only ~65k buckets per chunk, so at corpus scale the average
    bucket is huge and the self-join is O(B^2). Buckets larger than
    ``bucket_cap`` get two bounded treatments instead of the full self-join:

    * **sub-split**: members re-bucket by every OTHER chunk of their own
      signature, and sub-buckets up to ``bucket_cap`` self-join — any true
      pair sharing a second chunk is found (costs one extra explode of the
      over-cap rows only, no extra join: the signature is already in hand);
    * **hub edges**: every member additionally pairs with the bucket's
      minimum id, so a mega-bucket whose members really are near-identical
      collapses into one connected component.

    Exact guarantee (the hamming verify runs on every emitted pair): a
    pair is found iff it shares (a) any bucket of size <= cap, or (b) a
    sub-bucket of size <= cap inside an over-cap bucket, or (c) verifies
    against an over-cap bucket's hub. A pair whose every shared chunk sits
    in an over-cap bucket, shares no second chunk, and is far from each
    hub is NOT emitted — recovering it is exactly the O(B^2) join the cap
    exists to avoid. Raise ``bucket_cap`` to trade cost for that recall.
    """
    if max_hamming > 3:
        # 4-chunk banding only guarantees a shared chunk for hamming <= 3
        # (pigeonhole); accepting a larger bound would silently lose pairs
        raise ValueError(
            f"max_hamming must be <= 3 with 4-chunk banding, got {max_hamming}"
        )
    sigs = (
        precomputed_sigs
        if precomputed_sigs is not None
        else simhash_signatures(df, text_col, id_col)
    )
    chunks = F.array(*[
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
        )
        for i in range(4)
    ])
    exploded = sigs.withColumn("c", F.explode(chunks)).select(
        F.col(id_col), "simhash", F.col("c.chunk").alias("chunk"), F.col("c.val").alias("val")
    )
    # window count, same shuffle diet as minhash_lsh_pairs
    keyed = exploded.withColumn(
        "__bn", F.count("*").over(Window.partitionBy("chunk", "val"))
    )

    small = keyed.filter((F.col("__bn") >= 2) & (F.col("__bn") <= bucket_cap)).drop("__bn")
    l, r = small.alias("l"), small.alias("r")
    cand_small = l.join(
        r,
        (F.col("l.chunk") == F.col("r.chunk"))
        & (F.col("l.val") == F.col("r.val"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(
        F.col(f"l.{id_col}").alias("id_a"),
        F.col(f"r.{id_col}").alias("id_b"),
        F.col("l.simhash").alias("sh_a"),
        F.col("r.simhash").alias("sh_b"),
    )

    big = keyed.filter(F.col("__bn") > bucket_cap).drop("__bn")
    reps = big.groupBy("chunk", "val").agg(
        F.min(id_col).alias("id_a"), F.min_by("simhash", F.col(id_col)).alias("sh_a")
    )
    cand_big = big.join(reps, ["chunk", "val"]).filter(
        F.col(id_col) > F.col("id_a")
    ).select(
        "id_a", F.col(id_col).alias("id_b"), "sh_a", F.col("simhash").alias("sh_b")
    )

    # sub-split of over-cap buckets: re-bucket by every other chunk of the
    # member's own signature (no join — simhash is already on the row);
    # sub-buckets <= cap self-join, recovering pairs that share >= 2 chunks
    sub = big.withColumn("c2", F.explode(chunks)).filter(
        F.col("c2.chunk") != F.col("chunk")
    ).select(
        F.col(id_col), "simhash", "chunk", "val",
        F.col("c2.chunk").alias("chunk2"), F.col("c2.val").alias("val2"),
    )
    subkeyed = sub.withColumn(
        "__sn", F.count("*").over(Window.partitionBy("chunk", "val", "chunk2", "val2"))
    )
    ss = subkeyed.filter((F.col("__sn") >= 2) & (F.col("__sn") <= bucket_cap)).drop("__sn")
    sl, sr = ss.alias("sl"), ss.alias("sr")
    cand_sub = sl.join(
        sr,
        (F.col("sl.chunk") == F.col("sr.chunk"))
        & (F.col("sl.val") == F.col("sr.val"))
        & (F.col("sl.chunk2") == F.col("sr.chunk2"))
        & (F.col("sl.val2") == F.col("sr.val2"))
        & (F.col(f"sl.{id_col}") < F.col(f"sr.{id_col}")),
    ).select(
        F.col(f"sl.{id_col}").alias("id_a"),
        F.col(f"sr.{id_col}").alias("id_b"),
        F.col("sl.simhash").alias("sh_a"),
        F.col("sr.simhash").alias("sh_b"),
    )

    cand = (
        cand_small.unionByName(cand_big).unionByName(cand_sub)
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact word-n-gram Jaccard over LSH candidates (verify stage).

    Candidates come from MinHash LSH (cheap); this recomputes the exact
    Jaccard for surviving pairs with a cogrouped pandas step.
    """
    cands = minhash_lsh_pairs(df, text_col, id_col, threshold=max(0.0, threshold - 0.2))
    texts = df.select(F.col(id_col), F.col(text_col).alias("__text"))
    paired = (
        cands.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed("__text", "text_a"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed("__text", "text_b"), "id_b")
    )

    @F.pandas_udf("double")
    def jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.zeros(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            wx, wy = (x or "").split(), (y or "").split()
            sx = {" ".join(wx[j : j + n]) for j in range(max(1, len(wx) - n + 1))}
            sy = {" ".join(wy[j : j + n]) for j in range(max(1, len(wy) - n + 1))}
            u = len(sx | sy)
            out[i] = (len(sx & sy) / u) if u else 0.0
        return pd.Series(out)

    return (
        paired.withColumn("jaccard", jac(F.col("text_a"), F.col("text_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _gram_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, n_grams, gram) — one row per DISTINCT word n-gram per doc.

    Pure built-in expressions (split / sequence / transform / slice): the
    gram at offset j is the ``n``-token slice starting there (shorter at the
    tail when the doc has < n tokens, mirroring python's ``wx[j:j+n]``).
    """
    # the token array is staged in its own projection: the gram transform
    # below references it once per position, and Catalyst does not CSE a
    # split() across lambda scopes — inline, each position re-tokenizes
    # the document (the measured-6x ngram_counts trap)
    toks = F.col("__gtoks")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.lit(0), F.size(toks) - n)),
            lambda j: F.concat_ws(" ", F.slice(toks, j + 1, n)),
        )
    )
    # zip the per-doc gram count INTO the array before exploding: a plain
    # `size(grams)` column would sit in the Project above the Generate after
    # project-collapse and re-evaluate the whole gram expression once per
    # exploded row (measured 30x slowdown); zipped, everything is evaluated
    # O(1) times per input row.
    zipped = F.arrays_zip(grams, F.array_repeat(F.size(grams), F.size(grams)))
    # gram construction is the expensive part (~1.5 ms/doc of string ops);
    # small inputs often arrive as one parquet split, which would serialize
    # it — spread first (at scale the input already has many partitions and
    # this is a no-op)
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    return (
        df.select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__gtoks"),
        )
        .select(F.col(id_col), F.explode(zipped).alias("zz"))
        .select(
            F.col(id_col),
            F.col("zz.1").alias("n_grams"),
            F.col("zz.0").alias("gram"),
        )
    )


def ngram_jaccard_exact(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5,
    max_gram_df: int = 10_000,
) -> DataFrame:
    """EXACT word-n-gram Jaccard for every pair sharing >= 1 gram.

    The distributed set-intersection form: explode each doc to its distinct
    grams, equi-join on gram (hash join, no all-pairs compare), count
    matches per pair, J = inter / (|A| + |B| - inter). This is the exact
    verify kernel; at 10^12 docs it runs on LSH candidates
    (:func:`ngram_jaccard_pairs`), never the full corpus — but the kernel
    itself is all-built-in and oracle-checkable, which is why it exists as
    a standalone operator.

    Hot-gram guard: a gram shared by B docs (stopword shingles — "one of
    the" appears in a large constant fraction of a web corpus) emits B^2
    rows from the equi-join. Grams whose document frequency exceeds
    ``max_gram_df`` are dropped BEFORE the join. Error bound: the Jaccard
    denominator (na + nb - inter) keeps the exact per-doc set sizes, only
    the intersection count can miss dropped grams, so J is underestimated
    by at most (dropped grams shared by the pair) / union — and a gram in
    >max_gram_df docs carries essentially zero discrimination between a
    near-duplicate pair and an unrelated pair. Pairs whose ONLY shared
    grams are dropped are not emitted (they are not near-duplicates at any
    useful threshold). Pass ``max_gram_df=None`` for the unbounded exact
    kernel (candidate-verify use, where the input is already small).
    """
    g = _gram_table(df, text_col, id_col, n)
    if max_gram_df is not None:
        # window count over gram (one shuffle, partitioning reused by the
        # self-join below); drops the O(B^2) blowup. na/nb stay exact:
        # they were folded into the array before the explode.
        g = (
            g.withColumn("__df", F.count("*").over(Window.partitionBy("gram")))
            .filter(F.col("__df") <= max_gram_df)
            .drop("__df")
        )
    a = g.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"), "gram")
    b = g.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"), "gram")
    pairs = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"), F.max("na").alias("na"), F.max("nb").alias("nb"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def synth_dedup_corpus(spark, n_groups: int, mutate: int = 0) -> DataFrame:
    """Deterministic planted near-duplicate corpus (no external data).

    3 docs per group g: doc ``3g`` is the 60-token base (token vocabulary
    unique per group), doc ``3g+1`` is the base with ``mutate`` tokens
    replaced (``mutate=0`` -> exact copy), doc ``3g+2`` is fully distinct.
    The expected near-dup pairs are exactly {(3g, 3g+1)} — an analytic
    oracle. Tokens are base-36 strings of a double-Lehmer mix of
    (group, position, variant) — pseudo-random, so token hashes are
    decorrelated across groups (structured token strings like ``g59w5``
    made crc32/adler32-derived SimHashes collide across groups). All
    generation is whole-stage-codegen expressions over ``spark.range``.
    """
    if not 0 <= mutate <= 60:
        raise ValueError(f"mutate must be in [0, 60], got {mutate}")
    df = spark.range(0, 3 * n_groups)
    g = (F.col("id") / 3).cast("long")
    role = F.col("id") % 3
    # exactly `mutate` evenly-spread replacement positions (the stride
    # trick replaced ceil(60/(60//m)) tokens and divided by zero at m>60)
    mut_pos = {i * 60 // mutate for i in range(mutate)} if mutate else set()

    def tok(j):
        is_mut = j.isin(*sorted(mut_pos)) if mut_pos else F.lit(False)
        salt = F.when(role == 2, F.lit(2)).otherwise(
            F.when((role == 1) & is_mut, F.lit(1)).otherwise(F.lit(0))
        )
        v = g * 73856093 + j * 19349663 + salt * 83492791 + 17
        h1 = (v * 48271) % 2147483647
        h2 = (h1 * 48271) % 2147483647
        return F.conv(h2.cast("string"), 10, 36)

    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(59)), lambda j: tok(j)), " "
    )
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))


def span_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int = 20,
    span_split: str = r"\n{2,}",
) -> DataFrame:
    """Span-level exact dedup: removal list of duplicated spans (paragraphs
    by default), keeping each span's first occurrence in (id, span_idx)
    order.

    This is the distributed re-expression of substring-level exact dedup
    (suffix-array dedup a la "Deduplicating Training Data Makes Language
    Models Better", Lee et al. 2022) at the granularity a Spark pipeline
    can shuffle: documents are split into spans, each span is keyed by a
    64-bit hash, and only ``(hash, id, idx, md5)`` ever leaves the map side
    — span text itself never shuffles. Complements doc-level
    :func:`exact_dedup`/:func:`minhash_lsh_pairs` (whole-doc dups) and
    line-level boilerplate removal (per-group frequent lines): this one
    finds verbatim cross-document spans corpus-wide.

    Scale shape (10^12 docs): two hash-partitioned exchanges on the span
    hash — one combiner-friendly ``min/count`` aggregate to elect each
    span's keeper, one equi-join back to tag occurrences. Deliberately NOT
    a single window (``row_number() over (partition by hash)``): a viral
    chrome span duplicated across billions of pages would pin that window
    to one task, while the agg is map-side combined and the join is
    AQE-skew-splittable. The removal fanout per span equals its duplicate
    count — inherent output, not amplification.

    Returns (id, span_idx int, span_md5, n_occurrences) — one row per
    REMOVED occurrence; rebuild the cleaned doc by dropping those span
    indexes. xxhash64 keying tolerates a ~2^-64 per-pair collision rate
    (two distinct spans merging); the md5 column rides along so downstream
    audits can detect one.
    """
    spans = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), span_split)
            ).alias("span_idx", "__span"),
        )
        .withColumn("__norm", F.trim(F.col("__span")))
        .filter(F.length("__norm") >= min_len)
        .select(
            F.col(id_col),
            F.col("span_idx").cast("int").alias("span_idx"),
            F.xxhash64(F.col("__norm")).alias("__h"),
            F.md5(F.col("__norm")).alias("span_md5"),
        )
    )
    keepers = (
        spans.groupBy("__h")
        .agg(
            F.min(F.struct(F.col(id_col), F.col("span_idx"))).alias("__keep"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )
    return (
        spans.join(keepers, "__h")
        .filter(
            (F.col(id_col) != F.col(f"__keep.{id_col}"))
            | (F.col("span_idx") != F.col("__keep.span_idx"))
        )
        .select(id_col, "span_idx", "span_md5", "n_occurrences")
    )


def exact_substring_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 50,
) -> DataFrame:
    """Token-granular exact-substring SELF-dedup (the ExactSubstr half of
    Lee et al. 2022 proper): any token-aligned ``n``-gram window that
    occurs more than once ANYWHERE in the corpus keeps only its first
    occurrence in ``(id, position)`` order — every other occurrence's
    token range is surgically cut and the survivors re-join on single
    spaces. A duplicated region of length L > n is covered by its
    L - n + 1 duplicate windows, so the whole region is removed, exactly
    the suffix-array semantics.

    Completes the exact-substring family: :func:`span_dedup` removes
    duplicated PARAGRAPHS (coarse, cheapest), ``textclean.
    decontaminate_spans`` cuts corpus windows matching an external
    benchmark, and this one is corpus-vs-itself at stride-1 token
    granularity. Shares the window kernel (``textclean._window_hashes``)
    with the decontamination operators.

    Scale shape (10^12 docs): two window-hash-partitioned exchanges —
    one map-side-combined keeper aggregate (min (id, pos) struct +
    count), one equi-join back to tag occurrences — then ONE doc-keyed
    aggregate of removal starts (ints bounded by the doc's own window
    count) and one equi-join of that (dup-docs-only) table back to the
    corpus; the rebuild is a pure codegen array filter. Deliberately NOT
    a per-hash window function: a viral boilerplate window duplicated
    across billions of pages would pin one task, while the agg combines
    map-side and the tag join is AQE-skew-splittable. Join fanout per
    window equals its occurrence count — that IS the removal list, output
    not amplification. Window text never shuffles, only 64-bit hashes
    (~2^-64 per-pair collision odds; a collision cuts a non-duplicate
    window — the conservative direction for training data).

    Returns one row per input doc: (id, clean_text, n_tokens, n_removed);
    docs with no duplicated window pass through byte-identical.
    """
    from geomesa_spark.operators.textclean import _window_hashes

    did = F.col(id_col)
    wins = df.select(
        did.alias("__id"), F.split(F.col(text_col), " ").alias("__t")
    ).select(
        "__id",
        F.posexplode(_window_hashes(F.col("__t"), n)).alias("__pos", "__g"),
    )
    keepers = (
        wins.groupBy("__g")
        .agg(
            F.min(F.struct(F.col("__id"), F.col("__pos"))).alias("__k"),
            F.count(F.lit(1)).alias("__c"),
        )
        .filter(F.col("__c") >= 2)
    )
    starts = (
        wins.join(keepers, "__g")
        .filter(
            (F.col("__id") != F.col("__k.__id"))
            | (F.col("__pos") != F.col("__k.__pos"))
        )
        .groupBy("__id")
        .agg(F.collect_set("__pos").alias("__starts"))
    )
    joined = (
        df.join(starts, did == F.col("__id"), "left")
        .select(
            did,
            F.col(text_col),
            F.col("__starts"),
            F.split(F.col(text_col), " ").alias("__toks"),
        )
        .select(
            did,
            F.col(text_col),
            F.col("__starts"),
            F.col("__toks"),
            F.filter(
                F.col("__toks"),
                lambda t, i: ~F.exists(
                    F.col("__starts"), lambda s: (i >= s) & (i < s + F.lit(n))
                ),
            ).alias("__kept"),
        )
    )
    clean = F.when(F.col("__starts").isNull(), F.col(text_col)).otherwise(
        F.concat_ws(" ", F.col("__kept"))
    )
    n_tokens = F.size(F.col("__toks")).cast("long")
    n_kept = F.when(
        F.col("__starts").isNull(), n_tokens
    ).otherwise(F.size(F.col("__kept")).cast("long"))
    return joined.select(
        did,
        clean.alias("clean_text"),
        n_tokens.alias("n_tokens"),
        (n_tokens - n_kept).alias("n_removed"),
    )


def corpus_fingerprints(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 64,
    shingle_words: int = 3, seed: int = 42,
) -> DataFrame:
    """One-pass fingerprint index of a corpus: ``(id, content_hash,
    minhash)`` — the persisted artifact incremental dedup matches new
    crawls against.

    Single projection (md5 + the Arrow MinHash UDF in the same map
    stage, no self-join); in production this is written once at
    corpus-build time, bucketed by ``content_hash``, and every later
    snapshot dedupes against the stored table without touching corpus
    text again.
    """
    sig = _minhash_udf(n_hashes, shingle_words, seed)
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_hash"),
        sig(F.col(text_col)).alias("minhash"),
    )


def incremental_dedup(
    new_docs: DataFrame, corpus_fp: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", n_hashes: int = 64, bands: int = 16,
    shingle_words: int = 3, threshold: float = 0.5, seed: int = 42,
    bucket_cap: int = 100_000,
) -> DataFrame:
    """Dedupe a NEW crawl snapshot against an EXISTING corpus — without
    re-clustering the corpus.

    This is the incremental half of the dedup family the batch operators
    (:func:`exact_dedup`, :func:`minhash_lsh_pairs`) don't cover: in a
    running pipeline each monthly/daily snapshot must be checked against
    the 10^12-doc corpus already ingested, and recomputing all-pairs LSH
    over corpus+snapshot every time would re-shuffle the whole corpus for
    a 0.1% delta. Here the corpus side is its precomputed fingerprint
    table (:func:`corpus_fingerprints` — id, content_hash, minhash) and
    only the snapshot is fingerprinted fresh.

    Verdict per new doc, first match wins:

    * ``exact`` — content_hash equals some corpus doc's (match_id = the
      smallest such corpus id);
    * ``near``  — shares a MinHash band bucket with a corpus doc AND the
      full-signature Jaccard estimate >= ``threshold`` (match_id = best
      match: highest estimate, smallest corpus id on ties);
    * ``new``   — neither (match_id NULL). These are the rows the
      pipeline admits and appends to the fingerprint table.

    Returns ``(id, verdict string, match_id bigint)``, one row per new doc.

    Scale shape (10^12-doc corpus, 10^9-doc snapshot): the exact stage is
    an equi-join keyed on content_hash — with the corpus fingerprint
    table bucketed on that key at build time only the snapshot side
    shuffles. The near stage explodes both sides to (band, bucket) rows
    (24 bytes each, signatures never ride the explode) and equi-joins;
    corpus buckets larger than ``bucket_cap`` are collapsed to their
    min-id representative (the star-hub discipline of
    :func:`minhash_lsh_pairs` — an over-cap bucket is a near-identical
    template family, so matching the hub is matching the family), which
    bounds the join fanout per snapshot row. Verification re-attaches
    full signatures to CANDIDATE pairs only, by id. In production the
    corpus band table — like the window count that sizes its buckets —
    is precomputed once at corpus-build time, so a snapshot run shuffles
    only snapshot-derived rows.

    Memory note: the snapshot fingerprint frame is localCheckpointed
    (read by the exact join, the band explode, the verify re-attach,
    and the final anti-join) — materialized once, released when the
    returned frame is garbage-collected, so repeated calls in a
    long-lived session don't pin executor storage (the leak class the
    pagerank cleanup fixed). The CORPUS side is deliberately left
    untouched: it is read three times, so callers holding only an
    unmaterialized ``corpus_fingerprints`` lineage should persist or
    store it themselves — in production it is a stored table.
    """
    nh = corpus_fingerprints(
        new_docs, text_col, id_col, n_hashes, shingle_words, seed
    ).select(
        F.col(id_col).alias("__nid"), "content_hash",
        F.col("minhash").alias("__nmh"),
    ).localCheckpoint(eager=False)
    ch = corpus_fp.select(
        F.col(id_col).alias("__cid"), "content_hash",
        F.col("minhash").alias("__cmh"),
    )

    exact = (
        nh.join(ch.select("__cid", "content_hash"), "content_hash")
        .groupBy("__nid")
        .agg(F.min("__cid").alias("match_id"))
    )

    rem = nh.join(exact.select("__nid"), "__nid", "left_anti")
    nb = rem.withColumn(
        "bb", F.explode(_band_expr("__nmh", n_hashes, bands))
    ).select("__nid", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cb = ch.withColumn(
        "bb", F.explode(_band_expr("__cmh", n_hashes, bands))
    ).select("__cid", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # corpus-side hot-bucket guard (see docstring): over-cap buckets match
    # via their min-id hub only, so fanout per snapshot row is bounded
    keyed = cb.withColumn(
        "__bn", F.count("*").over(Window.partitionBy("band", "bucket"))
    )
    cside = (
        keyed.filter(F.col("__bn") <= bucket_cap).drop("__bn")
        .unionByName(
            keyed.filter(F.col("__bn") > bucket_cap)
            .groupBy("band", "bucket").agg(F.min("__cid").alias("__cid"))
            .select("__cid", "band", "bucket")
        )
    )
    cand = (
        nb.join(cside, ["band", "bucket"])
        .select("__nid", "__cid")
        .dropDuplicates(["__nid", "__cid"])
    )
    paired = (
        cand.join(rem.select("__nid", "__nmh"), "__nid")
        .join(ch.select("__cid", "__cmh"), "__cid")
    )
    est = (
        F.aggregate(
            F.zip_with("__nmh", "__cmh", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double") / F.lit(float(n_hashes))
    )
    near = paired.withColumn("__est", est).filter(F.col("__est") >= threshold)
    best = (
        near.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__nid")
                .orderBy(F.col("__est").desc(), F.col("__cid").asc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("__nid", F.col("__cid").alias("match_id"))
    )

    matched = (
        exact.select("__nid", F.lit("exact").alias("verdict"), "match_id")
        .unionByName(best.select("__nid", F.lit("near").alias("verdict"), "match_id"))
    )
    novel = (
        nh.select("__nid")
        .join(matched.select("__nid"), "__nid", "left_anti")
        .select(
            "__nid",
            F.lit("new").alias("verdict"),
            F.lit(None).cast("long").alias("match_id"),
        )
    )
    return matched.unionByName(novel).withColumnRenamed("__nid", id_col)


def select_canonical(
    members: DataFrame,
    id_col: str = "doc_id",
    comp_col: str = "component",
    score_col: str = "quality_score",
) -> DataFrame:
    """Canonical-document selection: per duplicate cluster, keep the best.

    The pipeline step downstream of near-dup clustering
    (:func:`minhash_lsh_pairs` -> ``connected_components``): given one
    row per (doc, cluster) with a quality score attached, keep exactly
    the highest-scoring member (ties break to the smallest id — fully
    deterministic, never "whichever task finished first"). This replaces
    the naive keep-min-id rule with the quality-aware rule real corpus
    builds use: duplicates differ in boilerplate, truncation, or
    encoding damage, and the kept copy should be the cleanest.

    Returns ``members``' (id, component) plus a ``keep`` boolean — one
    row per input member, the filterable verdict shape shared by the
    other dedup surfaces.

    Scale shape: ONE map-side-combined aggregate per cluster (min_by
    over a (-score, id) struct: lexicographic min = highest score, then
    smallest id; the double is negated, never the id, so any id type
    keeps the deterministic tie-break) and one equi-join of the winner table back on the
    cluster key — both shuffles carry (cluster, id/score) pairs only,
    never text. Cluster count ~ corpus/dup-rate, so the winner table is
    corpus-sized in the worst case: it stays an equi-join, deliberately
    NOT a broadcast.
    """
    ids = members.select(
        F.col(id_col).alias("__id"),
        F.col(comp_col).alias("__comp"),
        F.col(score_col).alias("__score"),
    )
    winners = ids.groupBy("__comp").agg(
        # min over (-score, id): lexicographic min = highest score, then
        # smallest id. Negating the DOUBLE score (never the id) keeps the
        # tie-break safe for any id type — a negated string id would
        # silently cast to NULL and break determinism; a negated
        # Long.MIN_VALUE would overflow
        F.expr("min_by(__id, named_struct('s', -__score, 'i', __id))").alias("__keep_id")
    )
    return (
        ids.join(winners, "__comp")
        .select(
            F.col("__id").alias(id_col),
            F.col("__comp").alias(comp_col),
            (F.col("__id") == F.col("__keep_id")).alias("keep"),
        )
    )
