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
