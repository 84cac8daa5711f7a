"""Relevance and language-model scoring over a document corpus: BM25
keyword scoring and a CCNet-style unigram log-probability quality signal.

These are the two ranking/quality primitives a training-data pipeline
runs after cleaning: BM25 to pull topical slices out of a crawl (the
classic "quality via relevance to a seed query" selector) and a corpus
unigram LM to score how "language-like" each document is (CCNet,
Wenzek et al. 2020 §4.3, uses an LM perplexity bucket exactly this way —
here the LM is the corpus's own unigram distribution with Laplace
smoothing, the degenerate-but-distributable case). The reference
engine's nearest surface is its per-record stats/cost machinery
(``UTL/stats/Stat.scala`` builds per-attribute frequency sketches that
feed query planning); this module is that frequency machinery re-aimed
at tokens and made a first-class scoring operator.

Determinism contract (both operators): every per-term weight is
fixed-pointed to an integer micro-unit BEFORE any per-document sum, so
the only floating-point ops happen once per *distinct term* (a division
chain and one ``ln`` in a fixed operand order) and the per-document
aggregation is exact BIGINT arithmetic — partition-order independent,
bit-identical across engines and cluster runs. A DuckDB twin reproduces
every score by running the same operand-order arithmetic.

Scale shape (10^12 docs):

* BM25 — for a seed query of up to ``codegen_terms_max`` terms (the
  common case), per-term tf is a codegen array expression — no explode,
  no per-(doc, term) rows, ZERO corpus-keyed exchange; the only
  aggregate is one single-row stats row (N, Σdl, per-term df) broadcast
  back, and scoring is a pure map over the scan. Wider term lists fall
  back to an explode filtered to query terms inside the generate stage
  (non-matching tokens never leave the scan task) with two doc-keyed
  exchanges that carry only matched occurrences.
* DSIR importance weights — the hashed-bigram bucket space is bounded
  (``16**bucket_hex``), so the distribution estimate is one map-side-
  combined aggregate whose exchange carries <= B rows per task, the
  log-ratio table broadcasts, and the only corpus-keyed exchange is the
  per-doc sum. No join ever shuffles the corpus.
* Unigram LM — two passes over the token stream: a vocabulary count
  (one map-side-combined hash aggregate, output = |vocab| rows) and a
  per-doc score join. The vocabulary join is broadcast under
  ``min_count`` pruning (prune AFTER computing the smoothing constants,
  so probabilities are unchanged; pruned tokens score as unseen via the
  Laplace floor). At web scale set ``min_count`` so the kept vocabulary
  fits the broadcast budget — the long tail of hapaxes is exactly what
  the floor is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000.0


def _tokens(text_col: str) -> F.Column:
    """Lowercased whitespace tokens; the tokenization every text operator
    in this package shares (``textstats``/``corpus`` use the same split),
    so scores compose with their signals. Empty strings are filtered IN
    THE ARRAY (``split('')`` yields ``['']``, which would give empty docs
    a phantom length-1 token and silently shift N/avgdl/T/V)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )


def _bm25_micro(
    tf_col: F.Column,
    dl_col: F.Column,
    n_col: F.Column,
    df_col: F.Column,
    sdl_col: F.Column,
    k1: float,
    b: float,
) -> F.Column:
    """One (doc, term) BM25 contribution in integer micro-units. BOTH
    bm25 execution paths build their score from this exact expression
    tree — operand order is the determinism contract the DuckDB twin
    mirrors, so the two engines (and the two paths) produce the same
    IEEE double before the fixed-point rounding."""
    n = n_col.cast("double")
    dfd = df_col.cast("double")
    idf = F.log(F.lit(1.0) + (n - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
    tfd = tf_col.cast("double")
    dl = dl_col.cast("double")
    avgdl = sdl_col.cast("double") / n
    term = idf * (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl / avgdl))
    )
    return F.round(term * F.lit(_MICRO), 0).cast("long")


def bm25(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
    codegen_terms_max: int = 16,
) -> DataFrame:
    """Okapi BM25 score of every document against ``query_terms``.

    Returns one row per document containing at least one query term:
    ``(id_col, n_hit int, dl int, bm25 double)`` where ``n_hit`` is the
    number of distinct query terms present and ``dl`` the document's
    token length. Documents matching no term are omitted (their score is
    identically 0 — at corpus scale materializing them would emit the
    whole corpus for a sparse query).

    Uses the Lucene/ATIRE idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (always positive, so stopword-heavy queries cannot produce negative
    contributions). Each (doc, term) contribution is rounded to integer
    micro-units before the per-doc sum — see the module determinism
    contract.

    Query terms are normalized like document tokens (lowercased,
    de-duplicated) — a mixed-case term would otherwise silently match
    nothing against the lowercased token stream.

    Two execution paths, identical results (same ``_bm25_micro``
    expression tree, exact integer sums in both):

    * ``len(terms) <= codegen_terms_max`` (the common seed-query case):
      per-term tf is computed IN CODEGEN as ``size(filter(tokens, =t))``
      — no explode, no per-(doc, term) rows, ZERO corpus-keyed exchange.
      The only aggregate is the single-row stats (N, Σdl, per-term df as
      ``count_if``), broadcast back; scoring is a pure map over the
      scan. At 10^12 docs the whole operator is one codegen pass plus a
      1-row shuffle.
    * larger term lists: explode filtered to query terms inside the
      generate stage (non-matching tokens never leave the scan task),
      per-(doc, term) tf aggregate, broadcast df join, per-doc sum — two
      doc-keyed exchanges carrying only matched occurrences, the right
      shape when the term list is too wide for a codegen column per
      term.
    """
    terms = sorted({t.lower().strip() for t in query_terms} - {""})
    if not terms:
        raise ValueError("bm25: query_terms is empty after normalization")
    toks = _tokens(text_col)
    docs = df.select(
        F.col(id_col), F.size(toks).alias("dl"), toks.alias("__toks")
    ).filter(F.col("dl") > 0)

    if len(terms) <= codegen_terms_max:
        return _bm25_codegen(docs, terms, id_col, k1, b, round_to)
    return _bm25_join(docs, terms, id_col, k1, b, round_to)


def _bm25_codegen(
    docs: DataFrame,
    terms: list[str],
    id_col: str,
    k1: float,
    b: float,
    round_to: int,
) -> DataFrame:
    # tf as dl - size(array_remove(tokens, term)): array_remove is a
    # plain codegen expression, measurably ~1.7x faster than the
    # equivalent higher-order `filter(tokens, x -> x = t)` (HOF lambdas
    # evaluate interpreted, outside whole-stage codegen)
    tfs = docs.select(
        id_col,
        "dl",
        *[
            (
                F.col("dl")
                - F.size(F.array_remove(F.col("__toks"), t))
            ).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    # ONE single-row aggregate carries every global: N, Σdl, and each
    # term's document frequency (count_if tf>0) — broadcast back
    stats = tfs.agg(
        F.count("*").alias("__n"),
        F.sum("dl").alias("__sdl"),
        *[
            F.count_if(F.col(f"__tf{i}") > 0).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    j = tfs.crossJoin(F.broadcast(stats))
    # a term with tf=0 contributes exactly 0 micro-units (numerator is
    # 0.0), so the straight sum equals the join path's matched-only sum
    micro_sum = None
    hits = None
    for i in range(len(terms)):
        m = _bm25_micro(
            F.col(f"__tf{i}"),
            F.col("dl"),
            F.col("__n"),
            F.col(f"__df{i}"),
            F.col("__sdl"),
            k1,
            b,
        )
        h = (F.col(f"__tf{i}") > 0).cast("int")
        micro_sum = m if micro_sum is None else micro_sum + m
        hits = h if hits is None else hits + h
    return (
        j.select(
            id_col,
            hits.alias("n_hit"),
            F.col("dl").cast("int").alias("dl"),
            F.round(
                micro_sum.cast("double") / F.lit(_MICRO), round_to
            ).alias("bm25"),
        )
        .filter(F.col("n_hit") > 0)
    )


def _bm25_join(
    docs: DataFrame,
    terms: list[str],
    id_col: str,
    k1: float,
    b: float,
    round_to: int,
) -> DataFrame:
    # corpus stats: one single-row aggregate, attached as a broadcast
    # cross-join (a 1-row build side plans as BroadcastNestedLoopJoin —
    # exempted in the plan audit's ALLOW_BNLJ because one build row is
    # just a broadcast variable; Catalyst folds any literal-key equi-join
    # to the same plan anyway)
    stats = docs.agg(
        F.count("*").alias("__n"), F.sum("dl").alias("__sdl")
    )

    # explode, keep ONLY query-term occurrences (the filter runs inside
    # the generate stage — non-matching tokens never reach the shuffle)
    occ = (
        docs.select(id_col, "dl", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(terms))
    )
    tf = occ.groupBy(id_col, "dl", "__t").agg(F.count("*").alias("tf"))

    # per-term document frequency: <= len(terms) rows -> broadcast
    dfreq = tf.groupBy("__t").agg(F.count("*").alias("__df"))

    j = tf.join(F.broadcast(dfreq), "__t").crossJoin(F.broadcast(stats))
    micro = _bm25_micro(
        F.col("tf"), F.col("dl"), F.col("__n"), F.col("__df"),
        F.col("__sdl"), k1, b,
    )

    return (
        j.groupBy(id_col)
        .agg(
            F.count("*").alias("n_hit"),
            F.max("dl").alias("dl"),
            F.sum(micro).alias("__s"),
        )
        .select(
            id_col,
            F.col("n_hit").cast("int").alias("n_hit"),
            F.col("dl").cast("int").alias("dl"),
            F.round(F.col("__s").cast("double") / F.lit(_MICRO), round_to).alias(
                "bm25"
            ),
        )
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
    round_to: int = 4,
) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's own
    Laplace-smoothed unigram LM — the distributable stand-in for CCNet's
    LM-perplexity quality bucket (higher = more typical text; boilerplate
    and keyword-stuffed spam score low).

    ``p(w) = (c(w) + 1) / (T + V + 1)`` with ``T`` total tokens and ``V``
    distinct tokens, both computed over the FULL vocabulary before any
    ``min_count`` pruning (pruning changes what is broadcast, never the
    distribution); pruned/unseen tokens take the ``c = 0`` floor.

    Returns ``(id_col, n_tokens int, n_oov int, mean_logprob double)``
    for every document with at least one token.
    """
    toks = _tokens(text_col)
    occ = (
        df.select(F.col(id_col), F.explode(toks).alias("__t"))
        .filter(F.col("__t") != "")
    )

    vocab = occ.groupBy("__t").agg(F.count("*").alias("__c"))
    totals = vocab.agg(
        F.sum("__c").alias("__tt"), F.count("*").alias("__v")
    )
    # log-prob per DISTINCT term, fixed-pointed once; denominators are
    # exact integers so the double division is identical in any engine.
    # Single-row attachments are broadcast cross-joins (see bm25's stats
    # note / the audit's ALLOW_BNLJ exemption)
    vb = vocab.crossJoin(F.broadcast(totals))
    denom = (F.col("__tt") + F.col("__v") + F.lit(1)).cast("double")
    lp = F.log((F.col("__c") + F.lit(1)).cast("double") / denom)
    kept = (
        vb.filter(F.col("__c") >= min_count)
        .select(
            "__t",
            F.round(lp * F.lit(_MICRO), 0).cast("long").alias("__lp"),
        )
    )
    floor_lp = (
        totals.select(
            F.round(
                F.log(
                    F.lit(1.0)
                    / (F.col("__tt") + F.col("__v") + F.lit(1)).cast("double")
                )
                * F.lit(_MICRO),
                0,
            )
            .cast("long")
            .alias("__floor")
        )
    )

    scored = (
        occ.join(F.broadcast(kept), "__t", "left")
        .crossJoin(F.broadcast(floor_lp))
        .select(
            id_col,
            F.coalesce(F.col("__lp"), F.col("__floor")).alias("__lp"),
            F.col("__lp").isNull().cast("int").alias("__oov"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("__oov").alias("n_oov"),
            F.sum("__lp").alias("__s"),
        )
        .select(
            id_col,
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("n_oov").cast("int").alias("n_oov"),
            F.round(
                F.col("__s").cast("double")
                / F.col("n_tokens").cast("double")
                / F.lit(_MICRO),
                round_to,
            ).alias("mean_logprob"),
        )
    )


def dsir_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
    bucket_hex: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weight per document: how much more likely
    the document's hashed-bigram bag is under the *target* distribution
    than under the raw-corpus distribution (Data Selection via
    Importance Resampling, Xie et al. 2023 — the standard recipe for
    steering a web crawl toward a high-quality target domain). Sort
    descending and take the token budget's worth to select.

    ``target_col`` is a boolean column marking the target subset (the
    target is a slice OF the corpus — e.g. a trusted source — so every
    feature seen anywhere is seen in the raw distribution). Features are
    word bigrams hashed into ``16**bucket_hex`` buckets via an md5-hex
    prefix — a cross-engine-stable hash, so the DuckDB twin reproduces
    bucket assignment exactly. Per-bucket log-ratios under Laplace
    smoothing ``alpha``:

        mu(f) = ln((ct(f)+a) / (Tt+a*B)) - ln((cr(f)+a) / (Tr+a*B))

    are fixed-pointed to integer micro-units once per DISTINCT bucket
    (<= B doubles total, fixed operand order), and each document's
    weight is the exact BIGINT sum of its occurrences' micro-units —
    partition-order independent and bit-identical across engines.

    Returns ``(id_col, n_feats int, dsir_logratio double)`` for every
    document with at least one bigram (>= 2 tokens).

    Scale shape (10^12 docs): the explode feeds ONE bucket-keyed
    aggregate whose output is bounded by B (map-side combined, so the
    exchange carries <= B rows per task); the log-ratio table (<= B
    rows) broadcasts back onto a second pass over the occurrence stream;
    the only corpus-keyed exchange is the final per-doc sum (map-side
    combinable). No join ever shuffles the corpus.
    """
    if bucket_hex < 1 or bucket_hex > 8:
        raise ValueError("bucket_hex must be in [1, 8]")
    b_total = float(16**bucket_hex)
    toks = _tokens(text_col)
    docs = df.select(
        F.col(id_col),
        F.col(target_col).cast("boolean").alias("__tgt"),
        toks.alias("__toks"),
    ).filter(F.size("__toks") >= 2)
    # word bigrams as a codegen-side array zip (no python, no join)
    big = F.zip_with(
        F.slice(F.col("__toks"), 1, F.size("__toks") - 1),
        F.slice(F.col("__toks"), 2, F.size("__toks") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    occ = docs.select(
        F.col(id_col),
        "__tgt",
        F.explode(big).alias("__bg"),
    ).select(
        F.col(id_col),
        "__tgt",
        F.substring(F.md5(F.col("__bg")), 1, bucket_hex).alias("__f"),
    )

    counts = occ.groupBy("__f").agg(
        F.count("*").alias("__cr"),
        F.count_if(F.col("__tgt")).alias("__ct"),
    )
    tot = counts.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt")
    )
    # one double division chain + two lns per distinct bucket, fixed
    # operand order (the cross-engine determinism contract); the 1-row
    # totals attachment is the documented ALLOW_BNLJ broadcast shape
    mu = F.log(
        (F.col("__ct").cast("double") + F.lit(alpha))
        / (F.col("__tt").cast("double") + F.lit(alpha * b_total))
    ) - F.log(
        (F.col("__cr").cast("double") + F.lit(alpha))
        / (F.col("__tr").cast("double") + F.lit(alpha * b_total))
    )
    ratio = counts.crossJoin(F.broadcast(tot)).select(
        "__f",
        F.round(mu * F.lit(_MICRO), 0).cast("long").alias("__mu"),
    )

    # inner join is exact: every occurrence bucket appears in `counts`
    # by construction (the raw distribution covers the whole corpus)
    scored = occ.join(F.broadcast(ratio), "__f")
    return (
        scored.groupBy(id_col)
        .agg(F.count("*").alias("n_feats"), F.sum("__mu").alias("__s"))
        .select(
            id_col,
            F.col("n_feats").cast("int").alias("n_feats"),
            # deliberately NOT rounded: an exact BIGINT divided by the
            # same constant is bit-identical in every engine, while a
            # decimal round of a half-way double is not (HALF_UP vs
            # round-half-even disagree one ulp on exact .xxxx5 sums)
            (F.col("__s").cast("double") / F.lit(_MICRO)).alias(
                "dsir_logratio"
            ),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "dsir_logratio",
    temperature: float = 1.0,
    salt: int = 0,
) -> DataFrame:
    """The "R" in DSIR: Gumbel top-k resampling of ``dsir_weights``
    output — draws ``k`` documents WITHOUT replacement with probability
    proportional to ``exp(weight / temperature)`` (the Gumbel-max trick;
    Xie et al. 2023 resample importance weights exactly this way, and
    temperature=0+ degenerates to plain top-k by weight).

    The Gumbel noise is deterministic: ``u`` comes from the package's
    two-round Lehmer permutation of the id (the same generator every
    sampling op here uses), offset to the interval midpoint
    ``(h + 0.5) / M`` so it is strictly inside (0, 1) — ``u = 0`` or
    ``u = 1`` would make ``-ln(-ln(u))`` infinite, and id 0 does hash to
    0. The sample is therefore reproducible bit-for-bit across engines,
    retries, and partitionings, unlike anything seeded from
    ``rand()``.

    Returns ``(id_col, weight_col, sample_key double)`` for the k
    selected rows. Scale shape: the key is a pure codegen map and the
    selection plans as TakeOrderedAndProject — each task keeps its local
    top-k, the driver merges K*tasks candidates; no global sort, no
    shuffle.
    """
    from geomesa_spark.operators.corpus import _MINSTD_A, _MINSTD_M

    if k < 1:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    x = F.col(id_col).cast("long")
    h1 = ((x + F.lit(salt)) * F.lit(_MINSTD_A)) % F.lit(_MINSTD_M)
    h2 = (h1 * F.lit(_MINSTD_A)) % F.lit(_MINSTD_M)
    u = (h2.cast("double") + F.lit(0.5)) / F.lit(float(_MINSTD_M))
    # fixed-pointed to micro-units like every ln in this module: JVM
    # Math.log and libc log may disagree by one ulp, so the raw double
    # key is NOT cross-engine-stable — the micro-rounded key is, and the
    # final constant division back to double is exact in both engines
    key_micro = F.round(
        (
            F.col(weight_col).cast("double") / F.lit(float(temperature))
            - F.log(-F.log(u))
        )
        * F.lit(_MICRO),
        0,
    ).cast("long")
    return (
        weights.select(
            F.col(id_col),
            F.col(weight_col),
            key_micro.alias("__k"),
        )
        .orderBy(F.col("__k").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            weight_col,
            (F.col("__k").cast("double") / F.lit(_MICRO)).alias(
                "sample_key"
            ),
        )
    )


def ppl_buckets(
    scored: DataFrame,
    score_col: str = "mean_logprob",
    id_col: str = "doc_id",
    group_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style quality bucketing: split each language's documents
    into ``n_buckets`` equal-depth bands by LM score (descending — CCNet
    labels the best-scoring third *head*, then *middle*, then *tail*,
    Wenzek et al. 2020). Feed it ``unigram_logprob``'s output joined
    with the language column.

    Exact path (this function): ``ntile`` over a window partitioned by
    language and ordered by ``(score DESC, id ASC)`` — the tiebreak
    makes the cut deterministic, and NTILE's fill rule (earlier buckets
    take the remainder) is the same in Spark and every SQL engine, so
    the oracle hash-matches. Cost is one hash exchange on the language
    plus an in-partition sort; with ~10^2 languages and web-scale skew
    (English is ~half the corpus) the hot language serializes onto one
    task, so at 10^12 rows use the threshold path instead:
    ``corpus.group_percentiles`` gives exact per-language score cuts,
    ``bucket_by_thresholds`` applies them as a broadcast join + codegen
    comparison — no sort anywhere (the bands then split *at* the
    threshold value rather than by row count, the CCNet semantics).

    Returns ``(id, group, score, bucket int, label)`` with labels
    head/middle/tail when ``n_buckets == 3``, else ``b<k>``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    b = F.ntile(n_buckets).over(w)
    if n_buckets == 3:
        label = (
            F.when(b == 1, F.lit("head"))
            .when(b == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        label = F.concat(F.lit("b"), b.cast("string"))
    return scored.select(
        id_col,
        group_col,
        score_col,
        b.alias("bucket"),
        label.alias("label"),
    )


def bucket_by_thresholds(
    scored: DataFrame,
    thresholds: DataFrame,
    score_col: str = "mean_logprob",
    group_col: str = "lang",
) -> DataFrame:
    """Sort-free bucket assignment for the 10^12-row path: ``thresholds``
    carries one row per group ``(group, head_min, middle_min)`` (e.g.
    the exact p67/p33 score cuts from ``corpus.group_percentiles``);
    assignment is a broadcast join + two codegen comparisons. Documents
    score >= head_min → head, >= middle_min → middle, else tail.
    Groups absent from ``thresholds`` (a rare language missing from the
    cut snapshot) keep their documents and fall to ``tail`` — a silent
    inner-join drop would shrink the corpus invisibly.
    """
    t = F.broadcast(thresholds)
    s = F.col(score_col)
    return scored.join(t, group_col, "left").select(
        *scored.columns,
        F.when(s >= F.col("head_min"), F.lit("head"))
        .when(s >= F.col("middle_min"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("label"),
    )


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Inverted-index postings with per-term caps — the serving-side
    artifact :func:`bm25` scores against on the fly. Search-backed data
    curation (dedup against an index, retrieval-based decontamination,
    RETRO-style neighbor lookup) stores exactly this: per term, the
    document frequency and the top documents by term frequency.

    Returns one row per retained posting: ``(term, df_term bigint,
    doc, tf bigint, rnk int)`` with ``rnk`` the 1-based rank by
    ``(tf DESC, doc ASC)`` — the doc tiebreak makes the cut
    deterministic — capped at ``k`` per term; terms with
    ``df_term < min_df`` drop entirely (hapax noise).

    Scale shape (10^12 docs): the explode emits (term, doc) pairs but the
    tf aggregate is map-side combined, so the exchange carries distinct
    (term, doc) partials. The top-``k`` cut is the WindowGroupLimit
    partial-top-k discipline (at most ``k`` rows per (term, partition)
    ever reach the window exchange — a stopword with 10^12 postings ships
    k·P rows, never its posting list). ``df_term`` comes from a SEPARATE
    map-side-combined count keyed by term — deliberately NOT a
    ``count(*) over (partition by term)`` window, which would shuffle
    every posting of the hottest term to one task — joined back to the
    already-capped rows (both sides ≤ |vocab|-bounded). Same tokenizer
    as :func:`bm25`/``textstats`` so artifacts compose.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("term", "doc").agg(F.count("*").alias("tf"))
    w = Window.partitionBy("term").orderBy(F.col("tf").desc(), F.col("doc").asc())
    topk = tf.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df_term"))
        .filter(F.col("df_term") >= min_df)
    )
    return topk.join(dfreq, "term").select("term", "df_term", "doc", "tf", "rnk")


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    orders: tuple[int, ...] = (1, 2, 3),
    min_count: int = 2,
    topk_per_order: int | None = None,
) -> DataFrame:
    """Corpus n-gram counts for LM estimation (the KenLM ``lmplz``
    counting stage): one row per retained (order, gram) with its corpus
    frequency. ``min_count`` is the standard count-pruning threshold
    (hapax-gram mass dwarfs everything at web scale and carries no LM
    signal); ``topk_per_order`` optionally caps the output to the
    most-frequent grams per order with a deterministic (count DESC,
    gram ASC) cut.

    Scale shape (10^12 docs): ALL orders ride one projection — each doc
    emits a flattened array of (order, gram) structs, so the corpus is
    scanned once, not once per order. The count aggregate is map-side
    combined (the exchange carries distinct-gram partials, never raw
    windows), and the top-k cut is the WindowGroupLimit discipline: the
    window partitions by ``order`` (a handful of groups), but the
    partial top-k pass bounds what ships to k rows per (order, input
    partition) — never the full gram table through one task. With
    ``topk_per_order=None`` there is no window at all: scan -> hash agg
    -> filter, the pure counting plan.

    Same whitespace tokenizer as :func:`bm25` / ``textstats``
    (:func:`_tokens`), so counts compose with every other text signal.
    """
    from pyspark.sql import Window

    # Materialize the token array ONCE per row before the gram transform:
    # the gram builders below reference the array O(orders * positions)
    # times, and Catalyst does not common-subexpression-eliminate the
    # split across nested lambda scopes — leaving `_tokens(text_col)`
    # inline re-tokenizes the document per reference (measured 6.7x wall
    # on the sf0.1 corpus).
    toks = F.col("__toks")

    def grams(n: int) -> F.Column:
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("order"),
                F.concat_ws(" ", F.slice(toks, i + 1, n)).alias("gram"),
            ),
        )

    all_grams = F.flatten(F.array(*[grams(int(n)) for n in orders]))
    counts = (
        df.select(_tokens(text_col).alias("__toks"))
        .select(F.explode(all_grams).alias("g"))
        .groupBy(F.col("g.order").alias("order"), F.col("g.gram").alias("gram"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    if topk_per_order is None:
        return counts
    w = Window.partitionBy("order").orderBy(F.col("n").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk_per_order)
        .drop("rnk")
    )
