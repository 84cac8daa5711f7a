"""Connected components (operators/components.py) vs a union-find
reference on random graphs, chain worst cases, and the dedup-family
integration. The driver oracle (`dedup_components`) cross-checks the
closed-form chain answer at sf0.01."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from geomesa_spark.operators.components import (
    assign_components,
    connected_components,
)


def _union_find(edges, nodes=None):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for n in nodes or parent:
        out[n] = find(n)
    return out


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df, **kw).collect()
    }


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 300
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
        edges = [e for e in edges if e[0] != e[1]]
        got = _cc(spark, edges)
        want = _union_find(edges)
        assert got == want


def test_cc_long_chain_converges(spark):
    """A 400-node chain is the label-propagation worst case; the
    star-contraction rounds must still hit the fixpoint within max_iter."""
    edges = [(i, i + 1) for i in range(399)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(400)}


def test_cc_duplicate_reversed_and_self_edges(spark):
    edges = [(1, 2), (2, 1), (2, 2), (2, 3), (10, 11)]
    got = _cc(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_assign_components_with_singletons(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "a long, b long")
    out = {r["doc_id"]: r["component"]
           for r in assign_components(df, pairs, "doc_id").collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    # survivor filter: one representative per cluster
    survivors = {k for k, v in out.items() if k == v}
    assert survivors == {0, 3, 4}


def test_cc_from_minhash_pairs(spark):
    """End-to-end with the dedup family: MinHash candidate pairs on a
    planted corpus collapse each near-dup group into one component."""
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "completely different text about spark partitions and shuffle plans",
        "a third unrelated document mentioning warc records and arrow chunks",
    ]
    rows = []
    for g, t in enumerate(base):
        for v in range(3):  # 3 near-identical variants per group
            suffix = "" if v == 0 else f" v{v}"
            rows.append((g * 10 + v, t + suffix))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, "text", "doc_id")
    cc = {r["node"]: r["component"]
          for r in connected_components(pairs, "id_a", "id_b").collect()}
    for g in range(3):
        members = [g * 10 + v for v in range(3) if g * 10 + v in cc]
        assert len(members) >= 2  # group got linked at all
        assert len({cc[m] for m in members}) == 1  # ...into ONE component
    # no cross-group merges
    assert len({cc[m] for m in cc}) >= 3 or len(cc) < 9


def test_simhash_subsplit_recovers_pairs_in_mega_buckets(spark):
    """Two docs (4,5) at hamming 1 sit in over-cap buckets on BOTH their
    shared chunks, far from each hub. The star-link alone would lose the
    pair (hub edges fail the hamming verify); the sub-split must recover
    it via their shared (chunk0, chunk1) sub-bucket."""
    from geomesa_spark.operators.dedup import simhash_near_pairs

    def sig(c0, c1, c2, c3):
        return c0 | (c1 << 16) | (c2 << 32) | (c3 << 48)

    rows = [
        # family A: 6 docs share chunk0=0x1111 (over cap=4); hub id0 far
        (0, sig(0x1111, 0xAAAA, 0xAAAA, 0x2AAA)),
        (1, sig(0x1111, 0x0001, 0x0011, 0x0111)),
        (2, sig(0x1111, 0x0002, 0x0022, 0x0222)),
        (3, sig(0x1111, 0x0003, 0x0033, 0x0333)),
        (4, sig(0x1111, 0x2222, 0x3333, 0x0444)),   # X
        (5, sig(0x1111, 0x2222, 0x3332, 0x0444)),   # Y = X with 1 bit off
        # family B: 5 more docs make chunk1=0x2222 over cap too; hub id6 far
        (6, sig(0x5555, 0x2222, 0x1555, 0x1555)),
        (7, sig(0x0007, 0x2222, 0x0077, 0x0777)),
        (8, sig(0x0008, 0x2222, 0x0088, 0x0888)),
        (9, sig(0x0009, 0x2222, 0x0099, 0x0999)),
        (10, sig(0x000A, 0x2222, 0x00AA, 0x0AAA)),
    ]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    dummy = sigs.select("doc_id", F.lit("x").alias("text"))
    out = simhash_near_pairs(dummy, "text", "doc_id", max_hamming=3,
                             bucket_cap=4, precomputed_sigs=sigs)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert got == {(4, 5): 1}


def test_cc_both_paths_agree(spark):
    """The bounded driver collapse and the distributed star-contraction
    must emit identical (node, min-id) rows (driver_edge_cap=0 forces the
    distributed path; the tiny cap forces collapse-eligible graphs down
    the distributed path too)."""
    rng = random.Random(23)
    for trial in range(2):
        n = 200
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
        edges = [e for e in edges if e[0] != e[1]]
        fast = _cc(spark, edges)                        # default cap: driver
        dist = _cc(spark, edges, driver_edge_cap=0)     # forced distributed
        assert fast == dist == _union_find(edges)


def test_cc_cap_boundary_routes_to_distributed(spark):
    """One more edge than the cap -> distributed path (same answer)."""
    edges = [(i, i + 1) for i in range(20)]
    got = _cc(spark, edges, driver_edge_cap=5)  # 20 canonical edges > 5
    assert got == {i: 0 for i in range(21)}


def test_cc_long_chain_converges_distributed(spark):
    """Chain worst case through the star-contraction rounds explicitly
    (the default-cap test above now exercises the driver collapse)."""
    edges = [(i, i + 1) for i in range(399)]
    got = _cc(spark, edges, driver_edge_cap=0)
    assert got == {i: 0 for i in range(400)}
