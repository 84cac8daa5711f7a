"""Closing round-5 operator batch: PQ/ADC search, the decontamination
audit/surgery pair, and KenLM-style n-gram counting."""

import numpy as np
import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """200 vectors in 4 tight clusters (dim 16) — same construction as the
    ANN recall fixtures."""
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((4, 16)) * 3
    rows = []
    for i in range(200):
        v = centers[i % 4] + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.cache().count()
    return df


def test_pq_encode_shape_and_determinism(spark, clustered_emb):
    from geomesa_spark.operators.ann import encode_pq, train_pq_codebooks

    books = train_pq_codebooks(clustered_emb, m=4, k=16, iters=5)
    assert books.shape == (4, 16, 4)
    a = encode_pq(clustered_emb, books).orderBy("vec_id").collect()
    b = encode_pq(clustered_emb, books).orderBy("vec_id").collect()
    assert [r["pq_code"] for r in a] == [r["pq_code"] for r in b]
    assert all(len(r["pq_code"]) == 4 for r in a)
    assert all(0 <= c < 16 for r in a for c in r["pq_code"])


def test_pq_adc_distance_matches_numpy_lut(spark, clustered_emb):
    """The codegen ADC sum must equal the numpy LUT walk bit-for-bit
    (same float64 lookups, same left-to-right add order)."""
    from geomesa_spark.operators.ann import (
        encode_pq,
        pq_adc_topk,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(clustered_emb, m=4, k=32, iters=5)
    pdf = clustered_emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    q = list(mat[3])
    got = {
        r["vec_id"]: r["dist"]
        for r in pq_adc_topk(
            encode_pq(clustered_emb, books), [("q", q)], books, k=200
        ).collect()
    }

    m, k, dsub = books.shape
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    codes = np.empty((len(matn), m), dtype=int)
    for s in range(m):
        sub = matn[:, s * dsub : (s + 1) * dsub]
        codes[:, s] = (
            ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        )
    qn = np.array(q) / np.linalg.norm(q)
    lut = np.array(
        [((qn[s * dsub : (s + 1) * dsub][None, :] - books[s]) ** 2).sum(axis=1) for s in range(m)]
    )
    for i, vid in enumerate(pdf["vec_id"]):
        expect = 0.0
        for s in range(m):
            expect = expect + lut[s][codes[i, s]]
        assert got[int(vid)] == expect


def test_pq_planted_family_is_analytic_topk(spark):
    """Replicates the driver fixture: power-of-two copies normalize
    bit-identical to their base, so the 6-member family shares one PQ
    code; at m=4, k=32 no other vector shares it — the top-6 is exactly
    the family and rank 7 sits at strictly larger distance (the margin
    that makes the analytic `ann_pq` oracle exact, not approximate)."""
    import __spark_entry__ as entrymod
    from geomesa_spark.operators.ann import (
        encode_pq,
        pq_adc_topk,
        train_pq_codebooks,
    )

    emb = entrymod._synth_planted_embeddings(entrymod._utc(spark))
    books = train_pq_codebooks(emb, m=4, k=32, iters=10)
    qs = [
        (f"q{i}", [entrymod._emb_component(i, d) for d in range(entrymod._ANN_DIM)])
        for i in range(entrymod._ANN_QUERIES)
    ]
    got = pq_adc_topk(encode_pq(emb, books), qs, books, k=7).collect()
    for i in range(entrymod._ANN_QUERIES):
        rows = sorted(
            (r for r in got if r["query_id"] == f"q{i}"), key=lambda r: r["rank"]
        )
        family = [i] + [1000 + 10 * i + j for j in range(5)]
        assert [r["vec_id"] for r in rows[:6]] == family
        assert rows[6]["dist"] > rows[5]["dist"]
        # the family ties bit-for-bit (identical codes -> identical sums)
        assert len({r["dist"] for r in rows[:6]}) == 1


def test_pq_adc_topk_stays_in_query_cluster(spark, clustered_emb):
    """PQ is lossy WITHIN a tight blob (all 50 members are near-ties, so
    the exact top-10 is not recoverable from 16-byte codes — that is the
    quantization contract, not a bug), but across well-separated clusters
    the ADC ordering must be perfect: every top-10 hit comes from the
    query's own cluster, and the query vector itself ranks first."""
    from geomesa_spark.operators.ann import (
        encode_pq,
        pq_adc_topk,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(clustered_emb, m=4, k=32, iters=5)
    pdf = clustered_emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist())
    queries = [(f"q{i}", list(mat[i])) for i in range(4)]
    approx = pq_adc_topk(encode_pq(clustered_emb, books), queries, books, k=10).collect()
    for i in range(4):
        rows = sorted(
            (r for r in approx if r["query_id"] == f"q{i}"), key=lambda r: r["rank"]
        )
        assert len(rows) == 10
        # cluster membership is vec_id % 4 by construction
        assert all(r["vec_id"] % 4 == i for r in rows)
        assert rows[0]["vec_id"] == i  # the query's own vector wins


# ---------------------------------------------------------------------------
# decontamination: audit matrix + span surgery
# ---------------------------------------------------------------------------


def _tok(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_contamination_matrix_counts(spark):
    from geomesa_spark.operators.textclean import contamination_matrix

    bench_a = _tok(4)  # w0 w1 w2 w3 -> 2 trigram windows at n=3
    docs = spark.createDataFrame(
        [
            (1, bench_a + " tail"),            # hits both of A's windows
            (2, "x y " + " ".join(["w0", "w1", "w2"])),  # hits one window
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, bench_a), (11, "never matched gram three")],
        "bench_id long, text string",
    )
    rows = {r["bench_id"]: r for r in contamination_matrix(
        docs, bench, n=3).collect()}
    a = rows[10]
    assert a["n_docs_hit"] == 2
    assert a["n_windows_hit"] == 3  # doc1: 2 windows, doc2: 1
    assert a["n_grams_hit"] == 2
    assert a["n_bench_grams"] == 2
    assert a["frac_grams_hit"] == 1.0
    # bench 11 shares no window with the corpus -> no row at all
    assert 11 not in rows


def test_decontaminate_spans_surgery(spark):
    from geomesa_spark.operators.textclean import decontaminate_spans

    gram = "a b c"
    docs = spark.createDataFrame(
        [
            (1, f"x1 x2 {gram} x3 x4"),      # one covered span in the middle
            (2, "clean doc with no match"),  # byte-identical passthrough
            (3, f"{gram} {gram}"),           # two disjoint covered spans
            (4, f"a b {gram} c"),            # overlapping windows union
            (5, "sh ort"),                   # shorter than n -> untouched
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, gram)], "bench_id long, text string")
    got = {r["doc_id"]: r for r in decontaminate_spans(docs, bench, n=3).collect()}

    assert got[1]["clean_text"] == "x1 x2 x3 x4"
    assert (got[1]["n_tokens"], got[1]["n_removed"]) == (7, 3)
    assert got[2]["clean_text"] == "clean doc with no match"
    assert got[2]["n_removed"] == 0
    assert got[3]["clean_text"] == ""
    assert got[3]["n_removed"] == 6
    # doc 4 = "a b a b c c": windows "a b a","b a b" don't match; "a b c"
    # matches at 0-based starts 2 only? tokens: a b a b c c -> window at
    # start 2 is "a b c" -> covers tokens 2..4, leaving "a b" + "c"
    assert got[4]["clean_text"] == "a b c"
    assert got[4]["n_removed"] == 3
    assert got[5]["clean_text"] == "sh ort"
    assert got[5]["n_removed"] == 0


def test_decontaminate_spans_agrees_with_flag(spark):
    """Every doc the flagging operator marks contaminated must lose at
    least one token under span surgery, and vice versa."""
    from geomesa_spark.operators.textclean import decontaminate, decontaminate_spans

    docs = spark.createDataFrame(
        [(i, _tok(20, prefix=f"d{i % 5}_")) for i in range(30)],
        "doc_id long, text string",
    )
    toks = F.split(F.col("text"), " ")
    bench = docs.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(toks, 1, 13)).alias("text"),
    )
    flagged = {r["doc_id"] for r in decontaminate(docs, bench, n=13).collect()}
    removed = {
        r["doc_id"]
        for r in decontaminate_spans(docs, bench, n=13).collect()
        if r["n_removed"] > 0
    }
    assert flagged == removed


# ---------------------------------------------------------------------------
# n-gram counts
# ---------------------------------------------------------------------------


def test_ngram_counts_matches_python(spark):
    from collections import Counter

    from geomesa_spark.operators.scoring import ngram_counts

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "The  Cat sat",  # mixed case + double space: tokenizer folds both
        "on the mat the cat sat",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["order"], r["gram"]): r["n"]
        for r in ngram_counts(docs, orders=(1, 2), min_count=2).collect()
    }

    expect = Counter()
    for t in texts:
        toks = t.lower().split()
        for n in (1, 2):
            for i in range(len(toks) - n + 1):
                expect[(n, " ".join(toks[i : i + n]))] += 1
    expect = {k: v for k, v in expect.items() if v >= 2}
    assert got == expect


def test_ngram_counts_topk_cut_is_deterministic(spark):
    from geomesa_spark.operators.scoring import ngram_counts

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(3)], "doc_id long, text string"
    )
    rows = ngram_counts(docs, orders=(1,), min_count=1, topk_per_order=3).collect()
    # all unigrams tie at count 3 -> the (n DESC, gram ASC) cut keeps a, b, c
    assert sorted(r["gram"] for r in rows) == ["a", "b", "c"]


# ---------------------------------------------------------------------------
# exact-substring self-dedup (ExactSubstr)
# ---------------------------------------------------------------------------


def test_substr_dedup_cross_doc_surgery(spark):
    """A later doc quoting an earlier doc's window loses exactly the union
    of its duplicated windows' token coverage; the keeper and untouched
    docs pass through byte-identical."""
    from geomesa_spark.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y a b c d z w"),
            (3, "solo text here only once"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in exact_substring_dedup(df, "text", "doc_id", n=3).collect()
    }
    # doc 1 is the (min doc_id, pos) keeper for both shared windows
    assert got[1]["clean_text"] == "a b c d e f"
    assert got[1]["n_removed"] == 0
    # doc 2 shares windows "a b c"@2 and "b c d"@3 -> coverage [2,6)
    assert got[2]["clean_text"] == "x y z w"
    assert got[2]["n_removed"] == 4
    assert got[2]["n_tokens"] == 8
    assert got[3]["clean_text"] == "solo text here only once"
    assert got[3]["n_removed"] == 0


def test_substr_dedup_internal_repeat(spark):
    """Within-document repetition dedups against the doc's own earliest
    occurrence: every window class keeps its first position."""
    from geomesa_spark.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame([(7, "p q r p q r p q")], "doc_id long, text string")
    row = exact_substring_dedup(df, "text", "doc_id", n=3).collect()[0]
    # dup windows at pos 3,4,5 cover tokens [3,8) -> first period survives
    assert row["clean_text"] == "p q r"
    assert row["n_removed"] == 5
    assert row["n_tokens"] == 8


def test_substr_dedup_short_docs_pass_through(spark):
    """Docs shorter than the window length emit no windows and are
    untouched — including the empty string."""
    from geomesa_spark.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in exact_substring_dedup(df, "text", "doc_id", n=3).collect()
    }
    assert got == {1: "a b", 2: "a b", 3: ""}
