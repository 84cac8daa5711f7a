"""Distributed connected components: candidate pairs -> duplicate
clusters.

The dedup family (MinHash/SimHash/embedding LSH, ``operators/dedup.py``)
emits candidate *pairs*; corpus curation needs the *cluster id* per
document (keep one representative per component). Pair lists don't
compose transitively — a~b and b~c must collapse to one cluster — so the
missing step is connected components over the candidate graph.

Implementation is the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014 — public): each round is two hash-shuffled groupBy/join passes that
monotonically hang nodes under smaller labels; converges in O(log^2 n)
rounds on any graph (a handful in practice — dedup graphs are near-stars
already, thanks to the bucket-cap star linking upstream). Per round only
``(node, label)`` longs shuffle — never payloads — and the frontier
shrinks monotonically, the same discipline as the kNN ring expansion
(``operators/knn.py``). No vertex ever needs its full component in
memory, unlike label-collect approaches.

The driver-side loop is bounded by ``max_iter`` with an exact
convergence check (edge-set fixpoint via count of changed rows — a
scalar per round, not a collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (big, small) with self-loops dropped."""
    a, b = F.col("a"), F.col("b")
    return (
        edges.select(
            F.greatest(a, b).alias("u"), F.least(a, b).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    j = sym.join(m, "u")
    return (
        j.filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller-or-equal neighbor of u to min(N(u) ∪ {u})."""
    # edges already canonical (u > v): all neighbors v of u here are smaller
    m = edges.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    j = edges.join(m, "u")
    out_nbrs = j.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    out_self = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        out_nbrs.union(out_self)
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )


def _driver_union_find(rows) -> list[tuple[int, int]]:
    """Exact union-find with path compression; merged roots always attach
    under the smaller id, so ``find(x)`` IS the component minimum — the
    same (node, min-id) contract as the distributed fixpoint."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        ra, rb = find(r["u"]), find(r["v"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((x, find(x)) for x in parent)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
    driver_edge_cap: int = 1_000_000,
) -> DataFrame:
    """Pairs -> ``(node, component)`` where component is the minimum node
    id in the connected component. Nodes absent from ``pairs`` are absent
    from the output (singletons keep themselves; union externally).

    Adaptive small-graph collapse: iterative star-contraction costs one
    Spark job per round (~0.5 s of pure scheduling each at any scale), so
    when the deduplicated edge set fits a hard cap it is collected ONCE
    (bounded: ``driver_edge_cap`` x 16 B = 16 MB default) and solved with
    exact union-find — the same move as broadcasting a small join side.
    The distributed path is unchanged and runs whenever the graph exceeds
    the cap (the 100 TB regime; pass ``driver_edge_cap=0`` to force it).
    Both paths produce the identical (node, min-id) rows.
    """
    edges = _canonical(
        pairs.select(F.col(a_col).cast("long").alias("a"),
                     F.col(b_col).cast("long").alias("b"))
    )
    if driver_edge_cap:
        head = edges.limit(driver_edge_cap + 1).collect()  # one bounded job
        if len(head) <= driver_edge_cap:
            out = _driver_union_find(head)
            return pairs.sparkSession.createDataFrame(
                out, "node long, component long"
            )
    # localCheckpoint truncates the lineage every round — without it the
    # logical plan doubles per iteration (union+join on its own output)
    # and planning alone OOMs after ~10 rounds. On a cluster with a
    # checkpoint dir, swap for reliable checkpoint() to keep fault
    # tolerance; the materialized state is only (node, label) longs.
    edges = edges.localCheckpoint(eager=True)
    for _ in range(max_iter):
        ls = _large_star(edges)
        # lazy checkpoint: the convergence check below is the action that
        # materializes it, so each round costs ONE job (materialize+diff
        # fused), and the lineage still truncates
        nxt = _small_star(ls).localCheckpoint(eager=False)
        # fixpoint: the canonical edge sets are identical
        changed = (
            nxt.union(edges).groupBy("u", "v").agg(F.count("*").alias("c"))
            .filter(F.col("c") == 1).limit(1).count()
        )
        edges = nxt
        if changed == 0:
            break
    # at the fixpoint every edge is (node, component-min)
    out = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return out.union(roots).distinct()


def assign_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Attach ``component`` to every row of ``df``: the cluster id from
    the pair graph, or the row's own id for singletons. The survivor rule
    "keep component == id" then drops all duplicates in one filter."""
    cc = connected_components(pairs, a_col, b_col, max_iter)
    joined = df.join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    )
    return joined.withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
