"""Corpus curation operators: deterministic sampling, stratified quota
sampling, exact descriptive statistics, and heavy-hitter token counts.

These are the training-data-pipeline ops a 10^12-document corpus needs
between ingest and dedup: thin the corpus reproducibly (uniform or
per-stratum quotas), profile numeric columns, and build the head of the
vocabulary. The reference's nearest analogs are the per-tablet partial
aggregates (``ACC/iterators/AggregatingKeyIterator.scala``,
``UniqueAttributeIterator.scala``) and the cardinality hints of
``UTL/stats/Cardinality.scala``; everything here is the Spark-native
partial+final hash-aggregate shape with NO window sorts and NO Python —
every expression is whole-stage codegen and has an exact DuckDB twin.

Determinism contract: sampling uses a two-round Lehmer permutation on the
row id (MINSTD, modulus 2^31-1), not ``rand()`` — the kept set is a pure
function of the id, so re-runs, retries, and the driver oracle all agree
bit-for-bit. ``id * 48271`` stays under 2^63 for ids up to ~1.9e14, so the
arithmetic never overflows a BIGINT at the 10^12-row target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MINSTD_A = 48271
_MINSTD_M = 2147483647  # 2^31 - 1


def hash_frac(id_col: Column, salt: int = 0) -> Column:
    """Deterministic uniform [0, 1) fraction from an integer id.

    Two Lehmer rounds decorrelate sequential ids (one round of an LCG maps
    consecutive seeds to a fixed stride). Exactly reproducible in any
    engine with 64-bit integer arithmetic.
    """
    # widen first: an INT id column would overflow at id*48271 > 2^31
    # (an ANSI-mode abort, not a wrap) — the 1.9e14 headroom claim holds
    # only in 64-bit arithmetic
    x = id_col.cast("long")
    h1 = ((x + F.lit(salt)) * _MINSTD_A) % _MINSTD_M
    h2 = (h1 * _MINSTD_A) % _MINSTD_M
    return h2.cast("double") / F.lit(float(_MINSTD_M))


def sample_uniform(
    df: DataFrame, id_col: str, rate: float, salt: int = 0
) -> DataFrame:
    """Keep ~``rate`` of rows, chosen deterministically by id.

    One codegen filter on the scan — no shuffle, no state; the sample is
    stable under retries and across engines (unlike ``df.sample``, whose
    kept set depends on partitioning).
    """
    return df.filter(hash_frac(F.col(id_col), salt) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str,
    salt: int = 0,
) -> DataFrame:
    """~``quota`` rows per stratum (language, domain, source, ...), kept
    deterministically.

    Scale shape: pass 1 is a map-side-combined count per stratum (output =
    #strata rows, broadcast back); pass 2 is a codegen filter
    ``hash_frac(id) < quota/count``. NO per-stratum window rank — an exact
    rank would total-order each stratum (one sort partition per language at
    corpus scale); the hash threshold needs no sort, no skew handling, and
    hits the quota within binomial noise (±sqrt(quota)).
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n"))
    p = F.least(F.lit(1.0), F.lit(float(quota)) / F.col("__n"))
    # null-safe equality: a NULL stratum is a real stratum (missing lang is
    # common in crawl data) — a plain equi-join would silently DROP every
    # null-stratum row instead of sampling it at its own quota
    cdf = counts.select(F.col(strata_col).alias("__s"), p.alias("__p"))
    keyed = df.join(
        F.broadcast(cdf), F.col(strata_col).eqNullSafe(F.col("__s"))
    ).drop("__s")
    return keyed.filter(hash_frac(F.col(id_col), salt) < F.col("__p")).drop("__p")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    n: int,
    broadcast_over_groups: bool = True,
) -> DataFrame:
    """Keep at most ``n`` rows per group, EXACT top-``n`` by
    ``(order_col DESC, id_col ASC)`` — the deterministic per-domain page
    cap every published web corpus applies (C4 caps pages per domain;
    Gopher dedups then caps). Complements :func:`stratified_sample`,
    which hits quotas only in expectation: here the kept set is the
    exact rank cut, reproducible bit-for-bit.

    Scale shape (10^12 rows): a naive ``row_number() OVER (PARTITION BY
    group)`` sorts the ENTIRE corpus on (group, order) — one global
    shuffle whose hottest domain lands on one task. Instead: pass 1 is a
    map-side-combined count per group; the (small, zipf-tailed) set of
    OVER-quota groups broadcasts back, splitting the corpus into

    * the long tail (groups already within quota — the vast majority of
      rows under any real domain distribution): a broadcast anti-join
      FILTER, zero exchange, rows pass through untouched;
    * the over-quota slice only: window rank + cut. Only these rows pay
      the sort, and Spark's ``WindowGroupLimit`` rewrite (pinned by
      test_scoring) applies a PARTIAL top-``n`` per partition before the
      exchange — at most ``n`` rows per (group, input-partition) ever
      shuffle, so even a single planet-sized domain moves ~``n × P``
      rows, not its full page count.

    With ``broadcast_over_groups=False`` the semi/anti joins run as
    shuffle joins for the adversarial case where even the over-quota
    group SET exceeds the broadcast budget. Union keeps both branches'
    columns identical, so downstream schemas are unchanged.

    NULL groups are one real group (missing domain is a real stratum in
    crawl data) — both joins use null-safe equality.
    """
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    over = counts.filter(F.col("__n") > n).select(F.col(group_col).alias("__g"))
    if broadcast_over_groups:
        over = F.broadcast(over)
    cond = F.col(group_col).eqNullSafe(F.col("__g"))
    under = df.join(over, cond, "left_anti")
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    capped = (
        df.join(over, cond, "left_semi")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    return under.unionByName(capped)


def descriptive_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    scale: int = 1000,
) -> DataFrame:
    """Per-group count/min/max/mean/sample-stddev, bit-reproducible.

    Floating-point ``sum``/``stddev`` aggregates are partition-order
    dependent; here the value is fixed-pointed (``floor(v * scale)``) and
    summed as DECIMAL(38,0) — exact integer partials in any order — then
    mean/variance derive from the exact sums in one fixed double-op
    sequence, so two engines (or two cluster runs) agree to the last bit.
    Mirrors the partial+final combine of
    ``ACC/iterators/AggregatingKeyIterator.scala`` with Spark's map-side
    hash aggregation.

    Returns ``(group, n, vmin, vmax, mean, std)``; ``std`` is NULL for
    singleton groups.
    """
    v = F.floor(F.col(value_col) * scale).cast("decimal(38,0)")
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n"),
        F.min(F.col(value_col)).alias("vmin"),
        F.max(F.col(value_col)).alias("vmax"),
        F.sum(v).alias("__sv"),
        F.sum(v * v).alias("__sv2"),
    )
    n = F.col("n").cast("double")
    sv = F.col("__sv").cast("double")
    mean = sv / n / scale
    # the variance cancellation (n*Σv² − (Σv)²) happens IN DECIMAL — both
    # terms are exact integers, so the subtraction never loses the small
    # difference of two huge rounded doubles (which yields NaN/garbage std
    # for constant groups with |v|·n beyond 2^53); only the exact
    # non-negative numerator converts to double
    num = (
        F.col("n").cast("decimal(38,0)") * F.col("__sv2")
        - F.col("__sv") * F.col("__sv")
    ).cast("double")
    var_v = num / (n * (n - F.lit(1.0)))
    std = F.when(F.col("n") > 1, F.sqrt(var_v) / scale)
    return agg.select("grp", "n", "vmin", "vmax", mean.alias("mean"), std.alias("std"))


def group_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    approx: bool = False,
) -> DataFrame:
    """Per-group discrete percentiles ``(group, p50, p90, ...)``.

    Exact mode uses ``percentile_disc`` — it picks an actual data value
    (no interpolation), so two engines agree bit-for-bit, but Spark's
    exact percentile buffers the group's full value multiset: fine for
    profile tables (bounded groups), a hazard when one group holds 10^11
    rows. ``approx=True`` is the corpus-scale path —
    ``approx_percentile`` keeps a bounded mergeable sketch per group
    (map-side combinable like every other aggregate here).
    """
    aggs = []
    for p in percentiles:
        name = f"p{round(p * 100)}"
        if approx:
            aggs.append(F.expr(f"approx_percentile({value_col}, {p!r})").alias(name))
        else:
            aggs.append(
                F.expr(
                    f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY {value_col})"
                ).alias(name)
            )
    return df.groupBy(F.col(group_col).alias("grp")).agg(*aggs)


def topk_tokens(
    df: DataFrame,
    text_col: str,
    k: int = 50,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` whitespace tokens by document frequency-weighted count —
    the head of the corpus vocabulary (stopword discovery, gram-DF caps
    for the dedup family, tokenizer seeding).

    Scale shape: explode → ONE map-side-combined hash aggregate on the
    token (partials shrink each partition to its distinct tokens before
    the shuffle) → ``orderBy().limit(k)``, which Spark executes as
    per-partition top-k + driver merge (TakeOrderedAndProject), never a
    global sort. Ties break on the token bytes so the result is unique.
    """
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    tok = F.explode(F.split(t, r"\s+")).alias("token")
    return (
        df.select(tok)
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )


def _alpha_pow(col: Column, alpha: float) -> Column:
    """``col ** alpha`` for dyadic alpha in {1, 0.5, 0.25, 0.125} via
    repeated ``sqrt`` — IEEE 754 requires sqrt to be correctly rounded,
    so (unlike ``pow``, whose libm error varies by engine) the chain is
    bit-identical in Spark and any oracle engine."""
    steps = {1.0: 0, 0.5: 1, 0.25: 2, 0.125: 3}
    if alpha not in steps:
        raise ValueError(
            f"alpha={alpha}: only dyadic 1/2^k values (1, 0.5, 0.25, "
            "0.125) keep the mixture bit-reproducible; arbitrary "
            "exponents need pow(), whose last-ulp rounding is libm-"
            "specific"
        )
    out = col.cast("double")
    for _ in range(steps[alpha]):
        out = F.sqrt(out)
    return out


def domain_mixture(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
    size_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled sampling weights per domain/source — the
    mixture step of GPT-3/Pile-style corpus assembly: raw share
    ``c_i / Σc`` is flattened to ``c_i^alpha / Σ c_j^alpha`` so small
    high-quality domains are upsampled relative to the crawl's natural
    skew (alpha=1 keeps raw proportions; alpha→0 approaches uniform).

    Output per domain: ``(group, n_docs, share, weight_micro, weight,
    boost)`` where ``share`` is the raw proportion, ``weight`` the
    temperature-scaled sampling probability, and ``boost`` =
    weight/share (the effective up/down-sampling factor, i.e. epochs
    per pass at a fixed token budget).

    Determinism: ``c^alpha`` uses the repeated-sqrt chain (see
    ``_alpha_pow``), fixed-pointed to integer micro-units ONCE per
    domain; both normalizing sums are exact BIGINTs, so every emitted
    double comes from one division of identical operands in any engine.

    Scale shape: one map-side-combined hash aggregate keyed by the
    domain (|domains| ~ 10^5-10^7 at web scale — the agg output fits
    one executor), then a single-row total attached as a broadcast
    cross-join. No window, no sort, no Python.
    """
    cnt = F.count("*") if size_col is None else F.sum(size_col)
    per = df.groupBy(F.col(group_col).alias("grp")).agg(
        cnt.cast("long").alias("n_docs")
    )
    per = per.withColumn(
        "weight_micro",
        F.floor(_alpha_pow(F.col("n_docs"), alpha) * F.lit(1_000_000.0)).cast("long"),
    )
    totals = per.agg(
        F.sum("n_docs").alias("__tn"), F.sum("weight_micro").alias("__tw")
    )
    return per.crossJoin(F.broadcast(totals)).select(
        F.col("grp").alias(group_col),
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("__tn").cast("double")).alias("share"),
        "weight_micro",
        (F.col("weight_micro").cast("double") / F.col("__tw").cast("double")).alias(
            "weight"
        ),
        (
            (F.col("weight_micro").cast("double") / F.col("__tw").cast("double"))
            / (F.col("n_docs").cast("double") / F.col("__tn").cast("double"))
        ).alias("boost"),
    )
