"""Composite document quality filter (operators/quality.py): the
Gopher/C4-style keep/drop verdict. The DuckDB twin runs in the driver gate
(`quality_filter` in __spark_entry__); these tests pin each rule's branch
on hand-built documents where exactly one rule flips.
"""
from pyspark.sql import functions as F

from geomesa_spark.operators.quality import quality_filter

# a healthy English paragraph: >=30 tokens, stopwords present, no
# repetition, mean token length ~4
_GOOD = (
    "the quick brown fox jumps over that lazy dog and runs to the river "
    "bank where it sits down for a while to rest in quiet shade and "
    "watches the slow water drift past the old stone bridge"
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in quality_filter(df, **kw).collect()}


def test_good_doc_keeps(spark):
    out = _run(spark, [(1, _GOOD)])
    r = out[1]
    assert r["keep"] and all(
        r[c]
        for c in [
            "pass_length",
            "pass_token_shape",
            "pass_punct",
            "pass_stopwords",
            "pass_repetition",
            "pass_lang",
        ]
    )
    assert r["lang_pred"] == "en"
    assert r["n_tokens"] == len(_GOOD.split())


def test_each_rule_flips_independently(spark):
    rows = [
        (1, _GOOD),
        (2, "too short by far"),  # length
        (3, " ".join(["supercalifragilistic"] * 40)),  # mean token len > 10
        (4, _GOOD + " " + "!!! ### $$$ %%% ^^^ &&& *** " * 12),  # punct
        (5, " ".join(f"w{i}" for i in range(40))),  # no stopwords
        (6, "\n".join([_GOOD[:40]] * 3) + "\n" + _GOOD),  # dup lines
    ]
    out = _run(spark, rows)
    assert out[1]["keep"]
    assert not out[2]["pass_length"] and not out[2]["keep"]
    assert not out[3]["pass_token_shape"] and not out[3]["keep"]
    assert not out[4]["pass_punct"] and not out[4]["keep"]
    assert not out[5]["pass_stopwords"] and not out[5]["keep"]
    assert not out[6]["pass_repetition"] and not out[6]["keep"]
    # rules the planted failures do NOT touch stay green
    assert out[2]["pass_punct"] and out[5]["pass_length"]


def test_language_gate_and_allowed_langs(spark):
    de = (
        "der hund und die katze sind nicht mit dem vogel in das haus "
        "gegangen weil der regen nicht ein ende nehmen wollte und die "
        "strasse ist nass mit wasser und der wind weht stark heute"
    )
    out = _run(spark, [(1, _GOOD), (2, de)])
    assert out[1]["pass_lang"] and out[1]["keep"]
    assert out[2]["lang_pred"] == "de"
    assert not out[2]["pass_lang"] and not out[2]["keep"]
    out2 = _run(spark, [(2, de)], allowed_langs=("en", "de"))
    assert out2[2]["pass_lang"] and out2[2]["keep"]


def test_null_text_drops_row_and_thresholds_kw(spark):
    out = _run(spark, [(1, _GOOD), (2, None)])
    assert set(out) == {1}
    # tighten the length floor past the good doc's token count
    out2 = _run(spark, [(1, _GOOD)], min_tokens=1000)
    assert not out2[1]["pass_length"] and not out2[1]["keep"]


def test_verdict_consistent_with_signal_tables(spark):
    """Filtering then joining back to the signal operators can never
    disagree: the verdict thresholds the exact published values."""
    from geomesa_spark.operators.textclean import repetition_signals
    from geomesa_spark.operators.textstats import language_id, text_quality

    rows = [
        (i, t)
        for i, t in enumerate(
            [
                _GOOD,
                "short",
                "\n".join([_GOOD[:30]] * 4),
                " ".join(f"tok{i}" for i in range(50)),
            ]
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    verdict = {r["doc_id"]: r for r in quality_filter(df).collect()}
    tq = {r["doc_id"]: r for r in text_quality(df, "text", "doc_id").collect()}
    rep = {
        r["doc_id"]: r for r in repetition_signals(df, "text", "doc_id").collect()
    }
    lid = {r["doc_id"]: r for r in language_id(df, "text", "doc_id").collect()}
    for i, r in verdict.items():
        assert r["pass_length"] == (30 <= tq[i]["n_tokens"] <= 100_000)
        assert r["pass_stopwords"] == (tq[i]["stopword_ratio"] >= 0.01)
        assert r["pass_repetition"] == (
            rep[i]["dup_line_frac"] <= 0.30
            and rep[i]["dup_line_char_frac"] <= 0.30
            and rep[i]["top_bigram_mass_frac"] <= 0.18
        )
        assert r["pass_lang"] == (lid[i]["lang_pred"] == "en")
        assert r["lang_pred"] == lid[i]["lang_pred"]


def test_classifier_filter_logit_and_modes(spark):
    from geomesa_spark.operators.quality import classifier_filter

    df = spark.createDataFrame(
        [
            (0, "the quick fox and the lazy dog in the sun"),  # stopword-rich
            (1, "$$$ 111 %%% 222 ^^^ 333 &&& 444 *** 555"),    # symbol/digit noise
            (2, None),                                          # no output row
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in classifier_filter(df, "text", "doc_id").collect()}
    assert set(got) == {0, 1}
    assert got[0].keep and got[0].logit > 0
    assert not got[1].keep and got[1].logit < 0
    kept = classifier_filter(df, "text", "doc_id", mode="drop")
    assert [r.doc_id for r in kept.collect()] == [0]
    assert "text" in kept.columns and "logit" in kept.columns


def test_classifier_filter_custom_weights_and_threshold(spark):
    from geomesa_spark.operators.quality import classifier_filter

    df = spark.createDataFrame([(0, "five words of plain text")],
                               "doc_id long, text string")
    # bias-only model: logit == round(bias, 6) regardless of text
    r = classifier_filter(df, "text", "doc_id", weights=(), bias=0.25,
                          threshold=0.3).collect()[0]
    assert r.logit == 0.25 and not r.keep
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mode"):
        classifier_filter(df, mode="bogus")
