"""Corpus cleaning operators (operators/textclean.py): PII redaction and
boilerplate-line removal. Oracle twins run in the driver gate
(`redact_pii`, `boilerplate` in __spark_entry__); these tests pin the
semantics on hand-built edge cases.
"""
from pyspark.sql import functions as F

from geomesa_spark.operators.textclean import (
    pii_counts,
    redact_pii,
    remove_boilerplate,
)


def test_redact_pii_categories(spark):
    rows = [
        (1, "mail me at alice.smith+x@sub.example.org please"),
        (2, "server 10.0.255.3 answered, backup 192.168.1.1."),
        (3, "call +4915123456789 or write bob@x.co"),
        (4, "no pii here"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in df.select(
        "id", redact_pii(F.col("text")).alias("t"),
        *[c.alias(n) for c, n in zip(pii_counts(F.col("text")),
                                     ["n_email", "n_ip", "n_phone"])],
    ).collect()}
    assert out[1]["t"] == "mail me at <EMAIL> please"
    assert out[1]["n_email"] == 1
    assert out[2]["t"] == "server <IP> answered, backup <IP>."
    assert out[2]["n_ip"] == 2
    assert out[3]["t"] == "call <PHONE> or write <EMAIL>"
    assert out[3]["n_phone"] == 1 and out[3]["n_email"] == 1
    assert out[4]["t"] == "no pii here"
    assert out[5]["t"] is None


def test_redact_email_ip_interaction(spark):
    # digits in the host are fine as long as the TLD is alphabetic; a
    # bare-IP "address" is not an email by the pattern (no alpha TLD) and
    # falls through to the IP pass — both outcomes pinned here
    rows = [(1, "x@mail2.example.co ok"), (2, "x@1.2.3.44 raw ip host")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["t"] for r in
           df.select("id", redact_pii(F.col("text")).alias("t")).collect()}
    assert got[1] == "<EMAIL> ok"
    assert got[2] == "x@<IP> raw ip host"


def test_remove_boilerplate_basic(spark):
    docs = []
    for d in range(6):  # one domain, 6 docs, shared header+footer
        docs.append((d, "siteA",
                     f"HEADER\nbody text {d}\nunique {d * d}\nFOOTER"))
    docs.append((10, "siteB", "HEADER\nlonely doc"))  # group of 1: kept
    df = spark.createDataFrame(docs, "doc_id long, domain string, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate(
        df, "text", "domain", "doc_id", min_docs=3, max_ratio=0.5
    ).collect()}
    assert out[0]["text"] == "body text 0\nunique 0"
    assert out[0]["n_lines_removed"] == 2 and out[0]["n_lines_kept"] == 2
    # min_docs floor protects small groups even at ratio 1.0
    assert out[10]["text"] == "HEADER\nlonely doc"
    assert out[10]["n_lines_removed"] == 0


def test_remove_boilerplate_duplicate_line_in_one_doc(spark):
    # a line repeated INSIDE one document counts that doc once (distinct),
    # so 2-of-5 docs stays below the 50% threshold and the line survives
    rows = [(0, "g", "dup\ndup\na0"), (1, "g", "dup\na1"),
            (2, "g", "a2"), (3, "g", "a3"), (4, "g", "a4")]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate(
        df, "text", "domain", "doc_id", min_docs=2, max_ratio=0.5
    ).collect()}
    assert out[0] == "dup\ndup\na0" and out[1] == "dup\na1"


def test_remove_boilerplate_all_lines_removed(spark):
    rows = [(i, "g", "SAME") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    out = remove_boilerplate(df, "text", "domain", "doc_id",
                             min_docs=2, max_ratio=0.5).collect()
    assert all(r["text"] == "" and r["n_lines_kept"] == 0 for r in out)


def test_remove_boilerplate_plan_is_broadcast(spark):
    # Plan pin (scripts/dump_plans.py FORBID twin): with the default
    # broadcast_boiler=True the frequent-line tag join must be a
    # BroadcastHashJoin — an SMJ there re-keys every exploded line by
    # (group, line), a third corpus-sized shuffle. Opting out must
    # actually release the hint so huge vocabularies CAN fall back.
    rows = [(i, "g", f"HEAD\nbody {i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, text string")
    plan = remove_boilerplate(
        df, "text", "domain", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # group sizes + tag join
    plan_free = remove_boilerplate(
        df, "text", "domain", "doc_id", broadcast_boiler=False
    )._jdf.queryExecution().optimizedPlan().toString()
    # the only remaining broadcast HINT is the group-size join
    assert plan_free.count("ResolvedHint") <= 1


def test_decontaminate_13gram_rule(spark):
    from geomesa_spark.operators.textclean import decontaminate

    doc_a = " ".join(f"a{i}" for i in range(30))          # source of gram
    doc_b = "x " + " ".join(f"a{i}" for i in range(13)) + " y z"  # contains it
    doc_c = " ".join(f"c{i}" for i in range(30))          # clean
    doc_d = " ".join(f"a{i}" for i in range(12))          # too short (12 toks)
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b), (3, doc_c), (4, doc_d)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, " ".join(f"a{i}" for i in range(13)))],  # exactly 13 tokens
        "bench_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["n_bench_hit"])
           for r in decontaminate(docs, bench).collect()}
    # doc_a contains the gram once (window at pos 0), doc_b once at pos 1
    assert got == {1: (1, 1), 2: (1, 1)}


def test_decontaminate_substring_not_token_aligned(spark):
    """A substring match that is NOT token-aligned must NOT flag: 'aa bb'
    appears inside 'xaa bbx' textually but not as aligned tokens."""
    from geomesa_spark.operators.textclean import decontaminate

    docs = spark.createDataFrame(
        [(1, "pre xaa bb post q r")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(9, "xaa bb post")], "bench_id long, text string")
    got = decontaminate(docs, bench, n=3).collect()
    assert len(got) == 1 and got[0]["n_hits"] == 1  # aligned 3-gram matches
    bench2 = spark.createDataFrame(
        [(9, "aa bb post")], "bench_id long, text string")
    assert decontaminate(docs, bench2, n=3).collect() == []


def test_repetition_signals(spark):
    from geomesa_spark.operators.textclean import repetition_signals

    rows = [
        # 4 lines, "dup" twice: dup_line_frac=0.5; chars: dup=3+3 of 3+3+5+7
        (1, "dup\ndup\nabcde\nabcdefg"),
        (2, "solo line one\nsolo line two"),      # no dup lines
        (3, "a b a b a b"),                        # dominant bigram "a b"
        (4, ""),                                   # empty text edge
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["n_lines"] == 4
    assert got[1]["dup_line_frac"] == 0.5
    assert got[1]["dup_line_char_frac"] == 6 / 18
    assert got[2]["dup_line_frac"] == 0.0
    # "a b" occurs 3x among the 5 bigrams of doc 3; mass = 3*3 over 11 chars
    assert abs(got[3]["top_bigram_mass_frac"] - 9 / 11) < 1e-15
    assert got[4]["n_lines"] == 1 and got[4]["dup_line_char_frac"] == 0.0
    assert got[4]["top_bigram_mass_frac"] == 0.0
