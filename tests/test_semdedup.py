"""Semantic dedup (operators/ann.semantic_dedup): SemDeDup-style
cluster-then-prune over embedding columns.

Pinned here: the triangular drop rule (drop iff a SAME-CELL member with a
smaller id reaches the cosine threshold — including members that were
themselves dropped), cell assignment = argmax cosine over the provided
centroids with lowest-index tie-break, the blocked-Gram kernel's
equivalence to the unblocked matmul, and the cell_cap sub-sharding
guard's within-shard semantics.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pytest

from geomesa_spark.operators.ann import semantic_dedup


def _vec(vid: int, dim: int = 8) -> list[float]:
    # deterministic pseudo-random components, same Lehmer mix family as
    # the planted ANN fixtures
    return [
        ((vid * 73856093 + d * 19349663 + 7) * 48271 % 2147483647) % 2000 / 1000.0
        - 1.0
        for d in range(dim)
    ]


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _brute_force(rows, cents, thr):
    """Driver-side reference: argmax-cosine assignment + triangular rule."""
    ids = np.array([r[0] for r in rows])
    m = np.array([r[1] for r in rows], dtype=np.float64)
    mn = m / np.maximum(1e-12, np.linalg.norm(m, axis=1, keepdims=True))
    cn = cents / np.maximum(1e-12, np.linalg.norm(cents, axis=1, keepdims=True))
    cell = (mn @ cn.T).argmax(axis=1)
    out = {}
    for c in np.unique(cell):
        sel = np.where(cell == c)[0]
        order = sel[np.argsort(ids[sel])]
        sub = mn[order]
        g = np.tril(sub @ sub.T, -1)
        keep = ~(g >= thr).any(axis=1)
        for i, idx in enumerate(order):
            out[int(ids[idx])] = (int(c), bool(keep[i]))
    return out


def test_scaled_copies_drop_bases_keep(spark):
    base = [(i, _vec(i)) for i in range(20)]
    copies = [(1000 + i, [2.0 * v for v in _vec(i)]) for i in range(5)]
    cents = np.array([_vec(i) for i in range(4)], dtype=np.float64)
    res = semantic_dedup(
        _emb_df(spark, base + copies), cents, threshold=0.995
    ).collect()
    got = {r["vec_id"]: (r["cell"], r["keep"]) for r in res}
    assert len(got) == 25
    # every base row keeps (the Lehmer fixture's closest natural pair sits
    # at cos 0.9903, below the 0.995 cut; the planted 2x copies sit at 1.0)
    for i in range(20):
        assert got[i][1] is True
    # every 2x copy shares its base's cell (cosine is scale-invariant,
    # bit-exactly for power-of-two scales) and drops against it
    for i in range(5):
        assert got[1000 + i][0] == got[i][0]
        assert got[1000 + i][1] is False


def test_matches_brute_force_reference(spark):
    rows = [(i, _vec(i, dim=12)) for i in range(60)] + [
        (2000 + i, [4.0 * v for v in _vec(i, dim=12)]) for i in range(10)
    ]
    cents = np.array([_vec(100 + k, dim=12) for k in range(5)], dtype=np.float64)
    res = semantic_dedup(_emb_df(spark, rows), cents, threshold=0.9).collect()
    expect = _brute_force(rows, cents, 0.9)
    got = {r["vec_id"]: (r["cell"], r["keep"]) for r in res}
    assert got == expect


def test_triangular_rule_drops_whole_chain(spark):
    # a(0 deg) - b(25 deg) - c(50 deg): cos(a,b)=cos(b,c)=cos(25deg)>=thr,
    # cos(a,c)=cos(50deg)<thr. Greedy-vs-kept would re-admit c; the
    # triangular rule (documented, SQL-expressible) drops it via b.
    def at(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r), 0.0]

    rows = [(1, at(0)), (2, at(25)), (3, at(50))]
    cents = np.array([[1.0, 0.0, 0.0]])  # single cell
    thr = math.cos(math.radians(30))
    res = semantic_dedup(_emb_df(spark, rows), cents, threshold=thr).collect()
    got = {r["vec_id"]: r["keep"] for r in res}
    assert got == {1: True, 2: False, 3: False}


def test_blocked_gram_equals_unblocked(spark):
    rows = [(i, _vec(i, dim=6)) for i in range(40)] + [
        (500 + i, [0.5 * v for v in _vec(i, dim=6)]) for i in range(8)
    ]
    cents = np.array([_vec(300 + k, dim=6) for k in range(3)], dtype=np.float64)
    a = semantic_dedup(
        _emb_df(spark, rows), cents, threshold=0.9, block_rows=1
    ).collect()
    b = semantic_dedup(
        _emb_df(spark, rows), cents, threshold=0.9, block_rows=4096
    ).collect()
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
        map(tuple, b), key=lambda t: t[0]
    )


def test_cell_cap_subshards_prune_within_shard(spark):
    # 6 identical vectors in one cell with cell_cap=2 -> 3 crc32 shards;
    # within each shard the min id keeps, everything else drops. The
    # cross-shard pairs are the documented recall trade.
    v = [1.0, 2.0, 3.0, 4.0]
    ids = [10, 11, 12, 13, 14, 15]
    rows = [(i, v) for i in ids]
    cents = np.array([v])
    res = semantic_dedup(
        _emb_df(spark, rows), cents, threshold=0.99, cell_cap=2
    ).collect()
    got = {r["vec_id"]: r["keep"] for r in res}
    n_shards = 3  # ceil(6 / 2)
    shards = {}
    for i in ids:
        shards.setdefault(zlib.crc32(str(i).encode()) % n_shards, []).append(i)
    expect = {i: (i == min(members)) for members in shards.values() for i in members}
    assert got == expect
    # uncapped: one keeper total
    res2 = semantic_dedup(_emb_df(spark, rows), cents, threshold=0.99).collect()
    assert sum(r["keep"] for r in res2) == 1


def test_empty_cells_and_singletons_keep(spark):
    # singletons trivially keep; centroids with no members produce no rows
    rows = [(7, [1.0, 0.0]), (9, [0.0, 1.0])]
    cents = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]])
    res = semantic_dedup(_emb_df(spark, rows), cents, threshold=0.9).collect()
    got = {r["vec_id"]: (r["cell"], r["keep"]) for r in res}
    assert got == {7: (0, True), 9: (1, True)}


# --- incremental semantic dedup (snapshot vs corpus) -----------------------

from geomesa_spark.operators.ann import assign_ivf_cells, incremental_semantic_dedup


def test_incremental_dup_new_verdicts(spark):
    corpus = _emb_df(spark, [(i, _vec(i)) for i in range(30)])
    cents = np.array([_vec(i) for i in range(4)], dtype=np.float64)
    snap = _emb_df(
        spark,
        [(900 + i, [0.5 * v for v in _vec(i)]) for i in range(5)]  # dups
        + [(950 + i, [-v for v in _vec(10 + i)]) for i in range(5)],  # new
    )
    res = incremental_semantic_dedup(snap, corpus, cents, threshold=0.995).collect()
    got = {r["vec_id"]: (r["verdict"], r["match_id"], r["n_matches"]) for r in res}
    assert len(got) == 10
    for i in range(5):
        v, mid, n = got[900 + i]
        assert v == "dup" and mid == i and n >= 1
    for i in range(5):
        v, mid, n = got[950 + i]
        assert v == "new" and mid is None and n == 0


def test_incremental_persisted_cell_col_matches_computed(spark):
    corpus_rows = [(i, _vec(i, dim=10)) for i in range(40)]
    cents = np.array([_vec(200 + k, dim=10) for k in range(3)], dtype=np.float64)
    corpus = _emb_df(spark, corpus_rows)
    # RAW (non-unit) centroids on purpose: assign_ivf_cells normalizes
    # internally, so a layout built from the same raw array the
    # incremental call gets must cell identically — the regression here
    # was a layout argmax over raw dot products disagreeing with the
    # snapshot's cosine argmax
    laid_out = assign_ivf_cells(corpus, cents, cell_col="cell_id")
    snap = _emb_df(spark, [(700 + i, [2.0 * v for v in _vec(i, dim=10)]) for i in range(6)])
    a = incremental_semantic_dedup(snap, corpus, cents, threshold=0.99).collect()
    b = incremental_semantic_dedup(
        snap, laid_out, cents, threshold=0.99, corpus_cell_col="cell_id"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_incremental_empty_cell_is_new(spark):
    # corpus occupies cell 0 only; the snapshot vector lands in cell 1
    # (no corpus members) and must still get a row: verdict new, 0 matches
    corpus = _emb_df(spark, [(1, [1.0, 0.0]), (2, [0.9, 0.1])])
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    snap = _emb_df(spark, [(50, [0.0, 1.0])])
    res = incremental_semantic_dedup(snap, corpus, cents, threshold=0.9).collect()
    assert len(res) == 1
    r = res[0]
    assert (r["vec_id"], r["cell"], r["verdict"], r["match_id"], r["n_matches"]) == (
        50, 1, "new", None, 0,
    )
