"""Canonical-document selection (dedup.select_canonical): per duplicate
cluster keep exactly the highest-scoring member, ties to the smallest id.

Pinned here on hand-built inputs: the argmax rule, the deterministic
tie-break, the one-row-per-member verdict shape, and invariance to input
partitioning (the verdict must never depend on task order).
"""

from __future__ import annotations

from geomesa_spark.operators.dedup import select_canonical


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, component long, quality_score double"
    )


def test_keeps_highest_score_per_cluster(spark):
    rows = [
        (1, 100, 0.2),
        (2, 100, 0.9),
        (3, 100, 0.5),
        (10, 200, 0.7),
    ]
    res = select_canonical(_df(spark, rows)).collect()
    got = {r["doc_id"]: (r["component"], r["keep"]) for r in res}
    assert got == {1: (100, False), 2: (100, True), 3: (100, False), 10: (200, True)}


def test_score_ties_break_to_smallest_id(spark):
    rows = [(5, 1, 0.8), (3, 1, 0.8), (9, 1, 0.8), (4, 1, 0.1)]
    res = select_canonical(_df(spark, rows)).collect()
    keepers = sorted(r["doc_id"] for r in res if r["keep"])
    assert keepers == [3]


def test_one_row_per_member_one_keep_per_cluster(spark):
    rows = [(i, i % 7, float((i * 31) % 13) / 13.0) for i in range(200)]
    res = select_canonical(_df(spark, rows)).collect()
    assert len(res) == 200
    per_comp = {}
    for r in res:
        per_comp.setdefault(r["component"], 0)
        per_comp[r["component"]] += int(r["keep"])
    assert all(v == 1 for v in per_comp.values())


def test_partitioning_invariance(spark):
    rows = [(i, i % 5, float((i * 17) % 11) / 11.0) for i in range(100)]
    a = select_canonical(_df(spark, rows)).collect()
    b = select_canonical(_df(spark, rows).repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_custom_column_names(spark):
    df = spark.createDataFrame(
        [(1, 9, 0.5), (2, 9, 0.6)], "uid long, cluster long, score double"
    )
    res = select_canonical(
        df, id_col="uid", comp_col="cluster", score_col="score"
    ).collect()
    got = {r["uid"]: r["keep"] for r in res}
    assert got == {1: False, 2: True}
    assert set(res[0].asDict()) == {"uid", "cluster", "keep"}
