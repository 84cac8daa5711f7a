"""Planted-case tests for operators/scoring.py (BM25 + unigram LM) and
corpus.cap_per_group. Every expected number below is computed by hand /
with plain Python floats using the exact operand order the operators
document, so the tests pin the arithmetic contract the DuckDB oracle
twins rely on."""

import math

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.corpus import cap_per_group
from geomesa_spark.operators.scoring import bm25, unigram_logprob


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark join join filter"),
        (1, "filter filter filter filter"),
        (2, "window scan scan"),
        (3, "spark spark spark join window"),
        (4, ""),  # empty: excluded by both operators
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25_expected(docs_py, terms, k1=1.2, b=0.75):
    tokd = {i: t.lower().strip().split() for i, t in docs_py if t.strip()}
    n = len(tokd)
    avgdl = sum(len(v) for v in tokd.values()) / float(n)
    dfreq = {
        t: sum(1 for v in tokd.values() if t in v) for t in terms
    }
    out = {}
    for i, v in tokd.items():
        s = 0
        hits = 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            dl = float(len(v))
            term = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (dl / avgdl))
            )
            s += int(round(term * 1e6))
        if hits:
            out[i] = (hits, len(v), round(s / 1e6, 4))
    return out


def test_bm25_planted(docs):
    terms = ("spark", "join")
    got = {
        r["doc_id"]: (r["n_hit"], r["dl"], r["bm25"])
        for r in bm25(docs, terms).collect()
    }
    exp = _bm25_expected(
        [(0, "spark join join filter"), (1, "filter filter filter filter"),
         (2, "window scan scan"), (3, "spark spark spark join window"),
         (4, "")],
        terms,
    )
    assert got == exp
    assert 1 not in got and 2 not in got and 4 not in got  # no matching term
    # doc 3 has more 'spark' mass than doc 0 -> higher score
    assert got[3][2] > got[0][2]


def test_bm25_idf_positive(docs):
    # a term present in EVERY non-empty doc still gets idf > 0 under the
    # Lucene/ATIRE form (ln(1 + ...) never goes negative)
    every = docs.filter(F.col("text") != "").withColumn(
        "text", F.concat(F.col("text"), F.lit(" common"))
    )
    got = bm25(every, ("common",)).collect()
    assert len(got) == 4 and all(r["bm25"] > 0 for r in got)


def test_bm25_term_normalization(docs):
    # mixed-case + duplicate query terms normalize to the token casing;
    # an all-whitespace query is a hard error, not an empty result
    a = {r["doc_id"]: r["bm25"] for r in bm25(docs, ("SPARK", "Join")).collect()}
    b = {r["doc_id"]: r["bm25"] for r in bm25(docs, ("spark", "join", "spark")).collect()}
    assert a == b and a
    with pytest.raises(ValueError):
        bm25(docs, ("", "  "))


def test_bm25_paths_agree(docs):
    # the codegen (default) and explode+join (wide-query) paths must
    # produce identical rows — same _bm25_micro tree, exact integer sums
    terms = ("spark", "join", "scan")
    a = sorted(bm25(docs, terms).collect())
    b = sorted(bm25(docs, terms, codegen_terms_max=0).collect())
    # doc 1 is all-"filter" -> matches none of the three terms
    assert a == b and len(a) == 3


def test_bm25_codegen_plan_zero_corpus_shuffle(docs):
    # default path: no hash-partitioned exchange anywhere — the only
    # exchange is the single-row stats SinglePartition collapse
    plan = bm25(docs, ("spark", "join"))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" not in plan  # no explode


def test_unigram_logprob_planted(docs):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["mean_logprob"])
        for r in unigram_logprob(docs).collect()
    }
    # corpus: T=16 tokens, V=5 distinct -> denom 22
    counts = {"spark": 4, "join": 3, "filter": 5, "window": 2, "scan": 2}
    assert sum(counts.values()) == 16 and len(counts) == 5
    lp = {t: int(round(math.log((c + 1) / 22.0) * 1e6)) for t, c in counts.items()}
    exp = {}
    for i, text in [(0, "spark join join filter"),
                    (1, "filter filter filter filter"),
                    (2, "window scan scan"),
                    (3, "spark spark spark join window")]:
        toks = text.split()
        s = sum(lp[t] for t in toks)
        exp[i] = (len(toks), 0, round(s / len(toks) / 1e6, 4))
    assert got == exp
    # doc 1 is all-modal-token -> highest (least negative) mean logprob
    assert got[1][2] == max(v[2] for v in got.values())


def test_unigram_logprob_oov_floor(docs):
    # min_count=2 prunes nothing here (all counts >=2); min_count=3 prunes
    # window+scan -> docs 2,3 get OOV floor tokens; distribution params
    # (T=16, V=5) must NOT change under pruning
    got = {
        r["doc_id"]: (r["n_oov"], r["mean_logprob"])
        for r in unigram_logprob(docs, min_count=3).collect()
    }
    assert got[2][0] == 3 and got[3][0] == 1  # window/scan occurrences
    assert got[0][0] == 0 and got[1][0] == 0
    floor = int(round(math.log(1 / 22.0) * 1e6))
    lp = {t: int(round(math.log((c + 1) / 22.0) * 1e6))
          for t, c in {"spark": 4, "join": 3, "filter": 5}.items()}
    s3 = lp["spark"] * 3 + lp["join"] + floor
    assert got[3][1] == round(s3 / 5 / 1e6, 4)


def test_cap_per_group_exact(spark):
    rows = [
        # domain a: 4 rows (over quota 2) -> keep the 2 largest, tie by id
        ("a", 1, 100), ("a", 2, 300), ("a", 3, 300), ("a", 4, 50),
        # domain b: exactly at quota -> untouched (under branch)
        ("b", 5, 10), ("b", 6, 20),
        # NULL domain: a real group, over quota
        (None, 7, 5), (None, 8, 9), (None, 9, 7),
    ]
    df = spark.createDataFrame(rows, "dom string, id long, sz long")
    kept = {
        r["id"] for r in cap_per_group(df, "dom", "sz", "id", 2).collect()
    }
    assert kept == {2, 3, 5, 6, 8, 9}
    # non-broadcast fallback: identical result
    kept2 = {
        r["id"]
        for r in cap_per_group(
            df, "dom", "sz", "id", 2, broadcast_over_groups=False
        ).collect()
    }
    assert kept2 == kept


def test_cap_per_group_plan_two_branches(spark):
    rows = [("a", i, i) for i in range(5)] + [("b", 10, 1)]
    df = spark.createDataFrame(rows, "dom string, id long, sz long")
    plan = cap_per_group(df, "dom", "sz", "id", 2)._jdf.queryExecution().executedPlan().toString()
    # under branch must be a broadcast anti join (no exchange on its
    # corpus side); only the over slice sees a window
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Window [row_number()") == 1
    # Spark 4 inserts WindowGroupLimit: partial top-n per partition BEFORE
    # the exchange, so only <=n rows per (group, partition) ever shuffle
    assert "WindowGroupLimit" in plan


def _dsir_expected(docs_py, targets, bucket_hex=3, alpha=1.0):
    import hashlib

    b_total = float(16**bucket_hex)
    tokd = {
        i: t.lower().strip().split()
        for i, t in docs_py
        if len(t.lower().strip().split()) >= 2
    }
    occ = []
    for i, toks in tokd.items():
        for a, b in zip(toks, toks[1:]):
            f = hashlib.md5(f"{a} {b}".encode()).hexdigest()[:bucket_hex]
            occ.append((i, f))
    cr, ct = {}, {}
    for i, f in occ:
        cr[f] = cr.get(f, 0) + 1
        if i in targets:
            ct[f] = ct.get(f, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    mu = {
        f: int(
            round(
                (
                    math.log((ct.get(f, 0) + alpha) / (tt + alpha * b_total))
                    - math.log((cr[f] + alpha) / (tr + alpha * b_total))
                )
                * 1e6
            )
        )
        for f in cr
    }
    out = {}
    for i, f in occ:
        n, s = out.get(i, (0, 0))
        out[i] = (n + 1, s + mu[f])
    return {i: (n, s / 1e6) for i, (n, s) in out.items()}


def test_dsir_planted(docs):
    # target = docs 0 and 3 (the spark-y ones); doc 4 empty, excluded
    d = docs.withColumn("is_target", F.col("doc_id").isin(0, 3))
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_logratio"])
        for r in __import__(
            "geomesa_spark.operators.scoring", fromlist=["dsir_weights"]
        ).dsir_weights(d).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    exp = _dsir_expected(rows, targets={0, 3})
    assert got == exp
    # docs sharing bigrams with the target score higher than docs that
    # don't: doc 1 ("filter"x4) shares nothing with the target set
    assert got[0][1] > got[1][1] and got[3][1] > got[1][1]


def test_dsir_no_corpus_shuffle_on_ratio_join(docs):
    from geomesa_spark.operators.scoring import dsir_weights

    d = docs.withColumn("is_target", F.col("doc_id") == 0)
    plan = (
        dsir_weights(d)._jdf.queryExecution().executedPlan().toString()
    )
    # the ratio table must broadcast back — never sort-merge the
    # occurrence stream by bucket
    assert "SortMergeJoin" not in plan


def test_dsir_bucket_hex_bounds(docs):
    from geomesa_spark.operators.scoring import dsir_weights

    with pytest.raises(ValueError):
        dsir_weights(docs.withColumn("is_target", F.lit(True)), bucket_hex=0)


def _gumbel_key(doc_id, w, temperature=1.0, salt=0):
    h1 = ((doc_id + salt) * 48271) % 2147483647
    h2 = (h1 * 48271) % 2147483647
    u = (h2 + 0.5) / 2147483647.0
    raw = w / temperature - math.log(-math.log(u))
    return int(round(raw * 1e6)) / 1e6  # micro fixed-point, as the op does


def test_dsir_resample_planted(docs):
    from geomesa_spark.operators.scoring import dsir_resample, dsir_weights

    d = docs.withColumn("is_target", F.col("doc_id").isin(0, 3))
    w = dsir_weights(d)
    wrows = {r["doc_id"]: r["dsir_logratio"] for r in w.collect()}
    exp = sorted(
        ((_gumbel_key(i, wt), i) for i, wt in wrows.items()),
        key=lambda t: (-t[0], t[1]),
    )[:2]
    got = dsir_resample(w, k=2).collect()
    assert [(r["sample_key"], r["doc_id"]) for r in got] == exp
    # k >= corpus: returns everything, still keyed
    assert dsir_resample(w, k=100).count() == len(wrows)


def test_dsir_resample_plan_is_take_ordered(docs):
    from geomesa_spark.operators.scoring import dsir_resample, dsir_weights

    d = docs.withColumn("is_target", F.col("doc_id") == 0)
    plan = (
        dsir_resample(dsir_weights(d), k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # no global sort exchange


def test_dsir_resample_validation(docs):
    from geomesa_spark.operators.scoring import dsir_resample, dsir_weights

    w = dsir_weights(docs.withColumn("is_target", F.lit(True)))
    with pytest.raises(ValueError):
        dsir_resample(w, k=0)
    with pytest.raises(ValueError):
        dsir_resample(w, k=1, temperature=0.0)


def test_build_postings_cap_df_threshold_and_tiebreak(spark):
    from geomesa_spark.operators.scoring import build_postings

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana banana"),
            (3, "apple cherry"),
            (4, "Unique hapax"),       # df=1 terms drop at min_df=2
        ],
        "doc_id long, text string",
    )
    rows = build_postings(df, "text", "doc_id", k=2, min_df=2).collect()
    got = {(r.term, r.rnk): (r.doc, r.tf, r.df_term) for r in rows}
    # apple: tf 2@1, 1@2, 1@3 -> top-2 = doc1 then doc2 (doc ASC tiebreak)
    assert got[("apple", 1)] == (1, 2, 3)
    assert got[("apple", 2)] == (2, 1, 3)
    # banana: tf 2@2, 1@1
    assert got[("banana", 1)] == (2, 2, 2)
    assert got[("banana", 2)] == (1, 1, 2)
    # cherry/unique/hapax: df 1 -> gone; k caps apple at 2 rows
    assert {t for t, _ in got} == {"apple", "banana"}
    assert len([1 for (t, _) in got if t == "apple"]) == 2


def test_build_postings_plan_partial_topk(spark):
    from geomesa_spark.operators.scoring import build_postings

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        build_postings(df, "text", "doc_id", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # hot-term guard: the per-term cut must be a WindowGroupLimit
    # (partial top-k before the window exchange), and df_term must come
    # from an aggregate, never a count-over-window on raw postings
    assert "WindowGroupLimit" in plan
    assert plan.count("Window [row_number()") == 1
