"""Corpus cleaning operators: PII redaction and boilerplate-line removal.

Standard stages of a web-scale training-data pipeline (the CCNet/C4-style
cleanup that runs right after text extraction):

* :func:`redact_pii` — replace emails / IPv4s / international phone runs
  with typed placeholders. Pure ``regexp_replace`` whole-stage codegen, no
  shuffle, no python; patterns restricted to syntax that Java regex and
  RE2 (the DuckDB oracle engine) interpret identically (no backrefs, no
  lookaround).
* :func:`decontaminate` / :func:`contamination_matrix` /
  :func:`decontaminate_spans` — the benchmark-decontamination family:
  flag contaminated docs, report per-benchmark overlap, or surgically
  remove just the contaminated token spans. All three share one
  window-hash kernel (:func:`_window_hashes`) and the same plan spine:
  eval grams broadcast, the corpus streams — no corpus shuffle.
* :func:`remove_boilerplate` — drop lines that repeat across a large
  fraction of a group's documents (site headers/footers/nav). Two hash
  shuffles total: one to count distinct docs per (group, line), one to
  reassemble; group sizes ride a broadcast join. Per-(group,line) counts
  are bounded by the line vocabulary, so the shuffle carries no payload
  bytes beyond the distinct lines themselves — scale-safe at 10^12 docs
  where per-doc python or windowed sorts would not be.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java-regex / RE2 common subset (no lookaround, no backrefs)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{9,15}"


def redact_pii(text: Column) -> Column:
    """Emails -> ``<EMAIL>``, IPv4 -> ``<IP>``, +international phone runs
    -> ``<PHONE>`` (applied in that order; the email pass runs first so an
    address's host part is never half-eaten by the IP pass)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def pii_counts(text: Column) -> tuple[Column, Column, Column]:
    """Match counts per category (audit columns; same patterns)."""
    return (_count(text, EMAIL_RE), _count(text, IPV4_RE),
            _count(text, PHONE_RE))


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text: str = "text",
    bench_id: str = "bench_id",
    n: int = 13,
) -> DataFrame:
    """Flag corpus documents sharing any token-aligned ``n``-gram with a
    benchmark/eval set (the standard 13-gram decontamination rule used
    before training on web corpora).

    Shape at 10^12 docs: the benchmark side is tiny by construction
    (eval sets), so its distinct gram hashes BROADCAST; the corpus side
    streams through one projection that explodes token windows to 64-bit
    hashes — no corpus shuffle at all, one hash-aggregate on the (small)
    join output. Returns one row per CONTAMINATED doc:
    (id, n_hits, n_bench_hit) — n_hits = matching window count, n_bench_hit
    = distinct benchmark docs hit.
    """
    did = F.col(id_col)

    bgrams = (
        bench.select(
            F.col(bench_id).alias("__bid"),
            F.split(F.col(bench_text), " ").alias("__t"),
        )
        .select("__bid", F.explode(_window_hashes(F.col("__t"), n)).alias("__g"))
        .distinct()
    )
    dgrams = docs.select(
        did.alias("__id"), F.split(F.col(text_col), " ").alias("__t")
    ).select("__id", F.explode(_window_hashes(F.col("__t"), n)).alias("__g"))
    return (
        dgrams.join(F.broadcast(bgrams), "__g")
        .groupBy("__id")
        .agg(
            F.count("*").cast("int").alias("n_hits"),
            F.countDistinct("__bid").cast("int").alias("n_bench_hit"),
        )
        .select(F.col("__id").alias(id_col), "n_hits", "n_bench_hit")
    )


def _window_starts(toks: Column, n: int) -> Column:
    """0-based start offsets of the token-aligned ``n``-gram windows over a
    pre-split token array; docs shorter than ``n`` tokens yield an EMPTY
    array (a bare ``sequence(0, size-n)`` would DESCEND for negative stops
    — Spark sequences are never empty)."""
    return F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))


def _window_hashes(toks: Column, n: int) -> Column:
    """Token-aligned ``n``-gram windows as 64-bit hashes — the one window
    kernel every decontamination operator shares. Takes the token ARRAY
    (callers project ``split(text, ' ')`` into a column first): the
    transform below references the array once per window position, and
    Catalyst does not CSE a ``split()`` across lambda scopes — an inline
    split re-tokenizes the document per position (the same measured-6x
    trap fixed in ``scoring.ngram_counts``)."""
    return F.transform(
        _window_starts(toks, n),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n))),
    )


def contamination_matrix(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text: str = "text",
    bench_id: str = "bench_id",
    n: int = 13,
) -> DataFrame:
    """Per-benchmark contamination report — the audit twin of
    :func:`decontaminate`. One row per benchmark document that the corpus
    hits at all: (bench_id, n_docs_hit, n_windows_hit, n_grams_hit,
    n_bench_grams, frac_grams_hit), where frac is the share of the
    benchmark's DISTINCT n-grams found anywhere in the corpus — the
    number a decontamination run reports per eval set before training.

    Same plan spine as ``decontaminate`` (the eval grams broadcast, the
    corpus streams through one window projection, no corpus shuffle); the
    only additions are a per-benchmark distinct-gram total (tiny, computed
    on the bench side alone) and the final aggregate keyed by bench_id —
    output rows are bounded by the benchmark corpus, never the crawl.
    """
    bgrams = (
        bench.select(
            F.col(bench_id).alias("__bid"),
            F.split(F.col(bench_text), " ").alias("__t"),
        )
        .select("__bid", F.explode(_window_hashes(F.col("__t"), n)).alias("__g"))
        .distinct()
    )
    totals = bgrams.groupBy("__bid").agg(F.count("*").alias("n_bench_grams"))
    dgrams = docs.select(
        F.col(id_col).alias("__id"),
        F.split(F.col(text_col), " ").alias("__t"),
    ).select("__id", F.explode(_window_hashes(F.col("__t"), n)).alias("__g"))
    hits = (
        dgrams.join(F.broadcast(bgrams), "__g")
        .groupBy("__bid")
        .agg(
            F.countDistinct("__id").cast("long").alias("n_docs_hit"),
            F.count("*").cast("long").alias("n_windows_hit"),
            F.countDistinct("__g").cast("long").alias("n_grams_hit"),
        )
    )
    return (
        hits.join(F.broadcast(totals), "__bid")
        .select(
            F.col("__bid").alias(bench_id),
            "n_docs_hit",
            "n_windows_hit",
            "n_grams_hit",
            F.col("n_bench_grams").cast("long").alias("n_bench_grams"),
            (F.col("n_grams_hit") / F.col("n_bench_grams").cast("double")).alias(
                "frac_grams_hit"
            ),
        )
    )


def decontaminate_spans(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text: str = "text",
    bench_id: str = "bench_id",
    n: int = 13,
) -> DataFrame:
    """Exact-substring decontamination: REMOVE the contaminated spans
    instead of dropping the document (the GPT-3/Chinchilla appendix-style
    surgical variant of :func:`decontaminate` — a long web page that
    quotes one benchmark item keeps everything but the quoted window).

    A token position is contaminated if any benchmark-matching ``n``-gram
    window covers it; contaminated positions are cut and the survivors
    re-join on single spaces. Returns one row per input doc:
    (id, clean_text, n_tokens, n_removed) — docs with no hits pass
    through byte-identical.

    Scale shape: identical spine to ``decontaminate`` (bench grams
    BROADCAST, the corpus streams through the window projection — no
    corpus shuffle generating candidates), then ONE doc-keyed aggregate
    of matched window starts (ints, bounded by the doc's own window
    count) and one equi-join of that (hit-docs-only) start table back to
    the corpus — at production contamination rates (<<1% of docs hit)
    the starts table is snapshot-sized and AQE broadcasts it; the rebuild
    itself is a pure codegen array filter, no python.
    """
    did = F.col(id_col)
    dgrams = docs.select(
        did.alias("__id"), F.split(F.col(text_col), " ").alias("__t")
    ).select(
        "__id",
        F.posexplode(_window_hashes(F.col("__t"), n)).alias("__pos", "__g"),
    )
    bgrams = bench.select(
        F.split(F.col(bench_text), " ").alias("__t")
    ).select(F.explode(_window_hashes(F.col("__t"), n)).alias("__g")).distinct()
    starts = (
        dgrams.join(F.broadcast(bgrams), "__g")
        .groupBy("__id")
        .agg(F.collect_set("__pos").alias("__starts"))
    )

    # stage the token array and the surviving-token array once per row —
    # `kept` is consumed twice below (rebuild + count) and the filter's
    # exists() probe is O(tokens * |starts|) per evaluation
    joined = docs.join(starts, did == F.col("__id"), "left").select(
        did,
        F.col(text_col),
        F.col("__starts"),
        F.split(F.col(text_col), " ").alias("__toks"),
    ).select(
        did,
        F.col(text_col),
        F.col("__starts"),
        F.col("__toks"),
        # keep token i unless a matched window [s, s+n) covers it
        F.filter(
            F.col("__toks"),
            lambda t, i: ~F.exists(
                F.col("__starts"), lambda s: (i >= s) & (i < s + F.lit(n))
            ),
        ).alias("__kept"),
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


def _safe_frac(num: Column, den: Column) -> Column:
    den = den.cast("double")
    return F.when(den == 0, F.lit(0.0)).otherwise(num.cast("double") / den)


def _run_length_fold(sorted_arr: Column, finish) -> Column:
    """Fold equal-adjacent runs of a sorted string array: accumulator
    carries (prev, run, dup_c, dup_chars, best_mass); each run flushes
    its (count, count*len) tallies when the element changes."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup_c"),
        F.lit(0).cast("long").alias("dup_chars"),
        F.lit(0).cast("long").alias("best"),
    )

    def flush(acc):
        run, prev = acc["run"], acc["prev"]
        mass = run * F.length(prev).cast("long")
        is_dup = run > F.lit(1)
        return (
            acc["dup_c"] + F.when(is_dup, run).otherwise(F.lit(0)),
            acc["dup_chars"] + F.when(is_dup, mass).otherwise(F.lit(0)),
            F.greatest(acc["best"], mass),
        )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        dup_c, dup_chars, best = flush(acc)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same, acc["dup_c"]).otherwise(dup_c).alias("dup_c"),
            F.when(same, acc["dup_chars"]).otherwise(dup_chars).alias("dup_chars"),
            F.when(same, acc["best"]).otherwise(best).alias("best"),
        )

    def fin(acc):
        dup_c, dup_chars, best = flush(
            # empty array: no element was ever folded -> nothing to flush
            F.struct(
                F.coalesce(acc["prev"], F.lit("")).alias("prev"),
                acc["run"].alias("run"), acc["dup_c"].alias("dup_c"),
                acc["dup_chars"].alias("dup_chars"), acc["best"].alias("best"),
            )
        )
        return finish(dup_c, dup_chars, best)

    return F.aggregate(sorted_arr, init, step, fin)


def repetition_prep_cols(text: Column) -> dict[str, Column]:
    """Stage-0 materializations for :func:`repetition_raw_cols`: the line
    array, the newline-normalized token array, and the normalized length.
    Projecting the ARRAYS into columns before the fold stage matters
    because the bigram transform references the token array once per
    position, and Catalyst does not CSE a ``split()`` across lambda
    scopes — inline, each position re-tokenizes the document (the same
    measured-6x trap fixed in ``scoring.ngram_counts``)."""
    norm = F.regexp_replace(text, "\n", " ")
    return {
        "__rlines": F.split(text, "\n"),
        "__rtoks": F.split(norm, " "),
        "__rtlen": F.length(norm).cast("long"),
    }


def repetition_raw_cols() -> dict[str, Column]:
    """The per-row repetition tallies (line/bigram run-length folds) over
    the staged :func:`repetition_prep_cols` columns, unaliased, keyed by
    the intermediate names ``repetition_signals`` and
    ``quality.quality_filter`` stage them under before the fraction step."""
    lines_arr = F.col("__rlines")
    n_lines = F.size(lines_arr).cast("long")
    tot_chars = F.aggregate(
        lines_arr, F.lit(0).cast("long"),
        lambda a, x: a + F.length(x).cast("long"),
    )
    line_sig = _run_length_fold(
        F.array_sort(lines_arr),
        lambda dup_c, dup_chars, _best: F.struct(
            dup_c.alias("dup_c"), dup_chars.alias("dup_chars")
        ),
    )

    toks = F.col("__rtoks")
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    bigrams_arr = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2))
    )
    bg_best = _run_length_fold(
        F.array_sort(bigrams_arr), lambda _c, _ch, best: best
    )
    return {
        "__nl": n_lines,
        "__tc": tot_chars,
        "__ls": line_sig,
        "__bb": bg_best,
        "__tlen": F.col("__rtlen"),
    }


def repetition_frac_cols() -> dict[str, Column]:
    """The published repetition signals as expressions over the staged
    ``repetition_raw_cols`` columns (exact integer counts divided once in
    float64 — bit-reproducible by a SQL oracle)."""
    return {
        "n_lines": F.col("__nl").cast("int"),
        "dup_line_frac": _safe_frac(
            F.col("__ls").getField("dup_c"), F.col("__nl")
        ),
        "dup_line_char_frac": _safe_frac(
            F.col("__ls").getField("dup_chars"), F.col("__tc")
        ),
        "top_bigram_mass_frac": _safe_frac(F.col("__bb"), F.col("__tlen")),
    }


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style within-document repetition signals (the quality rules
    that catch template/spam pages): per doc,

    * ``n_lines`` — newline-split line count;
    * ``dup_line_frac`` — fraction of lines whose exact line string occurs
      more than once in the document;
    * ``dup_line_char_frac`` — character-mass fraction of those lines;
    * ``top_bigram_mass_frac`` — the largest single word-bigram's character
      mass (count x bigram length) over the whole text length.

    All ratios are exact integer counts divided once in float64, so a SQL
    oracle reproduces them bit-for-bit.

    Scale shape: ZERO exchanges. Every signal is within-document, so it
    folds over ``array_sort``-ed line/bigram arrays with higher-order
    functions (run-length counting of equal adjacent elements) entirely
    inside whole-stage codegen — a pure map job. The previous shape
    (explode lines+bigrams, two doc-id-keyed hash aggregates) shuffled
    roughly one row per corpus TOKEN; at 10^12 documents that is the
    difference between a scan and a corpus-sized shuffle. Per-doc work is
    O(n log n) in the line/bigram count (the sort), same order as the
    hash aggregate it replaces. Docs with NULL text produce no output row
    (the contract the explode-based shape established).
    """

    text = F.col(text_col)
    base = (
        df.filter(text.isNotNull())
        .select(
            F.col(id_col),
            *(v.alias(k) for k, v in repetition_prep_cols(text).items()),
        )
        .select(
            F.col(id_col),
            *(v.alias(k) for k, v in repetition_raw_cols().items()),
        )
    )
    return base.select(
        F.col(id_col),
        *(v.alias(k) for k, v in repetition_frac_cols().items()),
    )


def remove_boilerplate(
    df: DataFrame,
    text_col: str,
    group_col: str,
    id_col: str,
    min_docs: int = 3,
    max_ratio: float = 0.5,
    broadcast_boiler: bool = True,
) -> DataFrame:
    """Remove lines appearing in ``>= max(min_docs, max_ratio * group
    size)`` distinct documents of the same group (domain/site).

    Returns (id, group, clean text, n_lines_kept, n_lines_removed); empty
    documents keep an empty string. Line identity is exact (the reference
    cleanup granularity); ordering inside a document is preserved via the
    exploded position.

    Shuffle shape (the 100-TB contract): exactly TWO corpus-sized
    exchanges — the ``(group, line)`` distinct-doc count and the final
    per-document regroup. The frequent-line ("boiler") set joins back to
    the exploded lines as a BROADCAST by default (``broadcast_boiler``):
    boiler is bounded by the frequent-line *vocabulary* (lines in >=
    ``min_docs`` docs of one group), orders of magnitude smaller than the
    corpus. Callers with a pathological vocabulary that exceeds driver
    broadcast limits can pass ``broadcast_boiler=False``, which lets the
    optimizer fall back to a SortMergeJoin — that fallback re-keys every
    exploded line by ``(group, line)``, i.e. a THIRD corpus-sized shuffle,
    and is the documented cost of unbounded vocabularies.
    ``scripts/dump_plans.py`` pins the default plan: any SortMergeJoin in
    the ``boilerplate`` audit entry fails the plan gate.
    """
    did, grp = F.col(id_col), F.col(group_col)
    lines = df.select(
        did.alias("__id"), grp.alias("__grp"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )
    group_sizes = df.groupBy(grp.alias("__grp")).agg(
        F.countDistinct(did).alias("__gsize")
    )
    line_docs = lines.groupBy("__grp", "__line").agg(
        F.countDistinct("__id").alias("__ndocs")
    )
    boiler = (
        line_docs.join(F.broadcast(group_sizes), "__grp")
        .filter(
            (F.col("__ndocs") >= F.lit(min_docs))
            & (F.col("__ndocs") >= F.col("__gsize") * F.lit(max_ratio))
        )
        .select("__grp", "__line")
        .withColumn("__boiler", F.lit(True))
    )
    if broadcast_boiler:
        boiler = F.broadcast(boiler)
    tagged = lines.join(boiler, ["__grp", "__line"], "left")
    kept = F.expr(
        "sort_array(collect_list(CASE WHEN __boiler IS NULL "
        "THEN struct(__pos, __line) END))"
    )
    return (
        tagged.groupBy("__id", "__grp")
        .agg(
            kept.alias("__kept"),
            F.count("*").alias("__total"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__grp").alias(group_col),
            F.concat_ws(
                "\n", F.expr("transform(__kept, x -> x.__line)")
            ).alias(text_col),
            F.size("__kept").cast("int").alias("n_lines_kept"),
            (F.col("__total") - F.size("__kept")).cast("int").alias(
                "n_lines_removed"
            ),
        )
    )


# C0 + DEL + C1 controls, EXCLUDING the whitespace-ish ones the collapse
# pass maps to a space (\t\n\x0B\f\r and NEL U+0085 — removing those
# would merge words). C1 controls are the classic cp1252-mojibake
# artifacts. Written in the Java-regex / RE2 common subset.
_CTRL_RE = "[\\x00-\\x08\\x0E-\\x1F\\x7F-\\x84\\x86-\\x9F]"
# the full Unicode whitespace set as an EXPLICIT class (neither engine's
# \s covers it: Java's \s is ASCII-only, RE2's omits \x0B) — ASCII ws,
# NEL, NBSP, ogham, the U+2000 block, line/para separators, narrow
# no-break, medium math, ideographic space
_WS_RE = (
    "[ \t\n\r\f\x0b\u0085\u00a0\u1680"
    "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]+"
)


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ftfy-lite unicode/whitespace normalization — the canonical first
    cleaning stage after extraction: NFC-compose combining sequences
    (so `e` + U+0301 and precomposed `é` dedupe/fingerprint the same),
    strip control characters, collapse whitespace runs, trim.

    The ONLY Python stage is the NFC step (Spark has no built-in
    normalizer): one Arrow-batched ``pandas_udf`` over the text column —
    vectorized transfer, per-batch ``unicodedata.normalize``, no
    per-row pickling. Control-strip + whitespace-collapse + trim stay
    whole-stage codegen around it, and both regexes are written in the
    Java-regex / RE2 common subset so the DuckDB twin
    (``nfc_normalize`` + the same two ``regexp_replace``) matches
    byte-for-byte. Zero shuffles; trivially scale-safe.

    Stage order matters and is part of the contract: controls are
    stripped FIRST (so ``a \\x01 b`` can still collapse to one space),
    whitespace (the full Unicode set, incl. NBSP/NEL — mapped to a
    plain space, never removed, so words don't merge) collapses second,
    and NFC runs LAST — a stripped control can sit between a base and a
    combining mark, so normalizing before the strip would leave
    denormalized residue (found by the idempotence property test). The
    result is NFC by construction and a fixpoint of the whole chain.

    Returns ``(id, norm_text, changed boolean)``.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: t if t is None else unicodedata.normalize("NFC", t)
        )

    raw = F.col(text_col)
    norm = _nfc(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(raw, _CTRL_RE, ""), _WS_RE, " "
            )
        )
    )
    return df.select(
        id_col,
        norm.alias("norm_text"),
        (norm != raw).alias("changed"),
    )


def badwords_filter(
    df: DataFrame,
    words: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "flag",
) -> DataFrame:
    """C4-style banned-word filtering: count the DISTINCT lexicon words
    a document contains (word-boundary exact tokens — the C4 rule, not
    substring matching, so "scrape" never hits "rape"). The real
    pipeline plugs in the public obscenity wordlist; callers pass any
    lexicon.

    Zero shuffle: the lexicon is a sorted literal array folded into the
    whole-stage-codegen ``array_intersect`` (dedup built in), tokens
    use the package's standard lower/trim/split tokenizer, and no
    Python runs anywhere. At 10^12 docs this is one map pass; for
    lexicons beyond literal-array size (10^4+) switch to a broadcast
    join on exploded tokens — same verdict, one extra exchange of
    matching tokens only.

    ``mode="flag"`` returns every doc as ``(id, n_bad int, flagged)``;
    ``mode="drop"`` returns only clean docs' ids.
    """
    # the scoring module owns the package's standard tokenizer — reuse
    # it so badwords verdicts can never desynchronize from the
    # lm_score/bm25/dsir token streams
    from geomesa_spark.operators.scoring import _tokens

    toks = _tokens(text_col)
    bad = F.array(*[F.lit(w.lower()) for w in sorted(set(words))])
    n_bad = F.size(F.array_intersect(toks, bad))
    flagged = df.select(
        id_col,
        n_bad.cast("int").alias("n_bad"),
        (n_bad > 0).alias("flagged"),
    )
    if mode == "drop":
        return flagged.filter(~F.col("flagged")).select(id_col)
    return flagged
