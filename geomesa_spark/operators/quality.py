"""Composite document quality filter: the Gopher/C4-style keep/drop rule.

The training-data pipeline stage that consumes the per-document signals
this package already computes (:mod:`geomesa_spark.operators.textstats`
quality metrics and language-ID, :mod:`geomesa_spark.operators.textclean`
repetition signals) and turns them into a single keep/drop decision per
document, with one boolean column per rule so the drop *reason* survives
into the audit trail (the shape every published web-corpus pipeline uses:
Gopher rules in Rae et al. 2021 §A1.1, C4's heuristics in Raffel et al.
2020 §2.2). The reference engine's per-record predicate surface is its
converter/filter pipeline (``CNV/.../BasicConverter.scala`` evaluates a
filter per parsed record); this operator is that stage specialized to the
published document-quality rule set.

Scale shape (10^12 docs): ZERO exchanges. Every signal is within-document
— token/ratio arithmetic, ``array_sort`` + run-length folds for the
repetition fractions, a stopword-vote CASE chain for the language — so the
whole filter is one whole-stage-codegen map over the corpus scan: the
decision column costs nothing beyond the signal arithmetic itself, and
predicate pushdown still applies to any upstream partition/column prunes.
Rows with NULL text produce no output row (same contract as
:func:`~geomesa_spark.operators.textclean.repetition_signals`).

All thresholds compare exact-count ratios (or ratios rounded to 6 decimals
exactly as ``text_quality`` publishes them), so a SQL oracle reproduces
every boolean bit-for-bit — equality at a threshold is decided identically
on both sides because both compute the identical IEEE double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geomesa_spark.operators.textclean import (
    repetition_frac_cols,
    repetition_prep_cols,
    repetition_raw_cols,
)
from geomesa_spark.operators.textstats import lang_pred_col, quality_metric_cols


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_punct_ratio: float = 0.25,
    min_stopword_ratio: float = 0.01,
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.30,
    max_top_bigram_mass_frac: float = 0.18,
    allowed_langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """Per-document keep/drop verdict from the published quality rules.

    Returns one row per non-NULL-text document:

    ``(id_col, n_tokens int, lang_pred string, pass_length, pass_token_shape,
    pass_punct, pass_stopwords, pass_repetition, pass_lang, keep)``

    * ``pass_length`` — token count in ``[min_tokens, max_tokens]``
      (Gopher: 50..100k words; default loosened to 30 so short-form corpora
      are not degenerate-all-drop).
    * ``pass_token_shape`` — mean token length in
      ``[min_mean_token_len, max_mean_token_len]`` (Gopher: 3..10).
    * ``pass_punct`` — ``punct_ratio <= max_punct_ratio`` (C4-style symbol
      screen).
    * ``pass_stopwords`` — ``stopword_ratio >= min_stopword_ratio``
      (Gopher's stop-word floor).
    * ``pass_repetition`` — all three repetition fractions under their
      caps (Gopher: dup-line 0.30, dup-line-chars 0.20..0.30 by signal,
      top word-2gram mass 0.18).
    * ``pass_lang`` — heuristic language prediction in ``allowed_langs``.
    * ``keep`` — conjunction of all six.

    Ratio thresholds are compared against the same values the signal
    operators publish (6-decimal rounding for the ``text_quality`` ratios,
    exact count ratios for repetition), so filtering then joining back to
    the signal tables can never disagree with the verdict.
    """
    text = F.col(text_col)
    qm = quality_metric_cols(text)
    base = df.filter(text.isNotNull()).select(
        F.col(id_col),
        qm["n_tokens"].alias("n_tokens"),
        qm["mean_token_len"].alias("__mtl"),
        qm["punct_ratio"].alias("__pr"),
        qm["stopword_ratio"].alias("__sr"),
        lang_pred_col(text).alias("lang_pred"),
        *(v.alias(k) for k, v in repetition_prep_cols(text).items()),
    ).select(
        F.col(id_col),
        "n_tokens",
        "__mtl",
        "__pr",
        "__sr",
        "lang_pred",
        *(v.alias(k) for k, v in repetition_raw_cols().items()),
    )
    rep = repetition_frac_cols()
    pass_length = (F.col("n_tokens") >= min_tokens) & (
        F.col("n_tokens") <= max_tokens
    )
    pass_token_shape = (F.col("__mtl") >= min_mean_token_len) & (
        F.col("__mtl") <= max_mean_token_len
    )
    pass_punct = F.col("__pr") <= max_punct_ratio
    pass_stopwords = F.col("__sr") >= min_stopword_ratio
    pass_repetition = (
        (rep["dup_line_frac"] <= max_dup_line_frac)
        & (rep["dup_line_char_frac"] <= max_dup_line_char_frac)
        & (rep["top_bigram_mass_frac"] <= max_top_bigram_mass_frac)
    )
    pass_lang = F.col("lang_pred").isin(*allowed_langs)
    flags = {
        "pass_length": pass_length,
        "pass_token_shape": pass_token_shape,
        "pass_punct": pass_punct,
        "pass_stopwords": pass_stopwords,
        "pass_repetition": pass_repetition,
        "pass_lang": pass_lang,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return base.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("lang_pred"),
        *(v.alias(k) for k, v in flags.items()),
        keep.alias("keep"),
    )


# Declared stand-in weights for the linear quality classifier below:
# direction-plausible (stopword density up-weights, symbol/digit/caps
# noise down-weights, mild length reward) but NOT trained — the operator
# is the integration point for a real fastText/DCLM-style model, whose
# learned weights would be passed in instead. Dyadic values so the
# literals are exactly representable.
DEFAULT_CLASSIFIER_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("stopword_ratio", 2.0),
    ("punct_ratio", -1.5),
    ("digit_ratio", -1.25),
    ("upper_ratio", -0.75),
    ("mean_token_len", 0.125),
    ("len_frac", 0.5),
)


def classifier_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: tuple[tuple[str, float], ...] | None = None,
    bias: float = -0.5,
    threshold: float = 0.0,
    mode: str = "flag",
) -> DataFrame:
    """Model-based quality scoring: a linear classifier over the engineered
    text features — the pipeline slot where FineWeb-edu/DCLM put a trained
    fastText/regression quality model (vs :func:`quality_filter`'s
    hand-thresholded rules). The feature extraction, scoring plumbing, and
    keep/drop routing are real; the default weight vector is a declared
    deterministic stand-in (see ``DEFAULT_CLASSIFIER_WEIGHTS``) because no
    model training happens in this environment — swap in learned weights
    via ``weights``/``bias``.

    ``logit = round(bias + Σ w_f · feature_f, 6)`` with the features the
    already-published 6-decimal-rounded ``text_quality`` ratios plus
    ``len_frac = least(n_tokens, 1000) / 1000.0``; the sum is evaluated in
    the fixed ``weights`` order, so the double is bit-identical in any
    IEEE engine (the oracle twin chains the identical operations).
    ``keep = logit >= threshold``. Returns ``(id, logit, keep)`` in flag
    mode, the kept subset of ``df``'s rows (plus ``logit``) in drop mode.
    NULL-text rows produce no output row (same contract as
    :func:`quality_filter`).

    Scale shape (10^12 docs): ZERO exchanges — one whole-stage-codegen map
    over the scan, identical to :func:`quality_filter`; a trained
    replacement with a bounded vocabulary would broadcast its weight table
    and stay a map-only job.
    """
    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    t = F.col(text_col)
    m = quality_metric_cols(t)
    m["len_frac"] = (
        F.least(m["n_tokens"], F.lit(1000)).cast("double") / F.lit(1000.0)
    )
    expr = F.lit(float(bias))
    # `weights or ...` would silently swap an explicit empty model for the
    # defaults; only None means "use the stand-in weights"
    for name, w in DEFAULT_CLASSIFIER_WEIGHTS if weights is None else weights:
        expr = expr + F.lit(float(w)) * m[name]
    logit = F.round(expr, 6)
    scored = df.filter(t.isNotNull()).withColumn("logit", logit).withColumn(
        "keep", F.col("logit") >= F.lit(float(threshold))
    )
    if mode == "drop":
        return scored.filter("keep").drop("keep")
    return scored.select(F.col(id_col), "logit", "keep")
