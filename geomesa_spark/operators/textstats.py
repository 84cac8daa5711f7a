"""Text analysis operators: token counts, quality scoring, language ID,
document fingerprinting.

Web-scale training-data companions to the converter/filter function library
(``CNV/.../Transformers.scala``). Quality metrics and token counts are pure
built-in expressions (SQL-oracle-checkable); language-ID and the rolling-hash
fingerprint are Arrow-batched numpy UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por"],
    "pt": ["o", "a", "os", "que", "de", "um", "uma", "para"],
    "ru": ["и", "в", "не", "на", "что", "это", "как", "по"],
    "zh": ["的", "是", "在", "了", "我", "有", "和", "不"],
    "ar": ["في", "من", "على", "أن", "إلى", "هذا", "ما", "لا"],
    "hi": ["के", "में", "है", "की", "और", "से", "का", "को"],
    "ja": ["の", "に", "は", "を", "た", "が", "で", "て"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count as a built-in expression."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def word_like_token_count_col(text: Column) -> Column:
    """BPE-ish token estimate: count word/number/punct runs via regex."""
    return F.size(F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), F.lit(0)))


def quality_metric_cols(t: Column) -> dict[str, Column]:
    """The ``text_quality`` metric expressions, unaliased, keyed by their
    published column names (ratios pre-rounded to 6 decimals exactly as
    ``text_quality`` emits them, so any consumer — including the composite
    ``quality.quality_filter`` verdict — thresholds the identical values)."""
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    n_stop = F.size(
        F.filter(
            F.split(F.lower(t), r"\s+"),
            lambda w: w.isin(*_LANG_MARKERS["en"]),
        )
    )
    safe_chars = F.greatest(F.lit(1), n_chars).cast("double")
    safe_toks = F.greatest(F.lit(1), n_tokens).cast("double")
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    upper_ratio = n_upper / safe_chars
    stop_ratio = n_stop / safe_toks
    mean_tok = safe_chars / safe_toks
    score = (
        F.lit(1.0)
        - F.least(F.lit(0.5), punct_ratio)
        - F.least(F.lit(0.3), digit_ratio)
        + F.least(F.lit(0.2), stop_ratio)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": F.round(mean_tok, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "digit_ratio": F.round(digit_ratio, 6),
        "upper_ratio": F.round(upper_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def text_quality(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc quality metrics (all built-in expressions):

    n_chars, n_tokens, mean_token_len, punct_ratio, digit_ratio,
    upper_ratio, stopword_ratio (English), quality_score (weighted mix).
    """
    metrics = quality_metric_cols(F.col(text_col))
    return df.select(
        F.col(id_col), *(v.alias(k) for k, v in metrics.items())
    )


def lang_pred_col(text: Column) -> Column:
    """The ``language_id`` prediction as a single unaliased expression."""
    langs = list(_LANG_MARKERS)
    t = F.trim(F.lower(text))
    toks = F.split(t, r"\s+")
    counts = {
        lang: F.size(F.filter(toks, lambda w: w.isin(*_LANG_MARKERS[lang])))
        for lang in langs
    }
    best = F.greatest(*counts.values())
    pred = F.lit("und")
    for lang in reversed(langs):  # build CASE chain; earlier langs checked first
        pred = F.when(counts[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when((F.length(t) == 0) | (best <= 0), F.lit("und")).otherwise(pred)


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic language ID: stopword-marker vote over the profile table.

    Pure built-in expressions (whole-stage codegen, no python): one
    ``size(filter(tokens, in-markers))`` count per language, then the
    argmax with deterministic tie-break (first language in profile order
    wins, matching a fastText-style top-1). No-signal/empty -> 'und'.
    """
    return df.select(
        F.col(id_col), lang_pred_col(F.col(text_col)).alias("lang_pred")
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str, window: int = 16) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint (robust doc identity).

    Polynomial rolling hash over normalized bytes; the fingerprint is the
    min-hash of each ``window``-gram, folded to one 63-bit value. Documents
    differing only in whitespace/case share fingerprints.
    """

    @F.pandas_udf("long")
    def fp(texts: pd.Series) -> pd.Series:
        # Everything runs in uint64 (wraparound = mod 2^64) and masks to 62
        # bits at the end: mod 2^62 is a quotient ring of mod 2^64, so this
        # equals masking after every step — but each window hash is a plain
        # length-`window` correlation (window vectorized multiply-adds per
        # doc), no per-character python loop.
        mask = np.uint64((1 << 62) - 1)
        # powers of B mod 2^64 via python ints (numpy would warn on the
        # intended uint64 wraparound)
        powers = np.array(
            [pow(1000003, j, 1 << 64) for j in range(window)], dtype=np.uint64
        )
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            norm = " ".join((t or "").lower().split()).encode("utf-8")
            a = np.frombuffer(norm, dtype=np.uint8).astype(np.uint64)
            if len(a) == 0:
                continue
            w = min(window, len(a))
            n = len(a) - w + 1
            hs = np.zeros(n, dtype=np.uint64)
            for k in range(w):  # w vector ops, not len(a) scalar ops
                hs += a[k : k + n] * powers[w - 1 - k]
            out[i] = np.int64((hs & mask).min())
        return pd.Series(out)

    return df.select(F.col(id_col), fp(F.col(text_col)).alias("fingerprint"))
