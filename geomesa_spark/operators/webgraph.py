"""Host-level web-graph analytics: link aggregation, degrees, PageRank.

Common-Crawl-scale curation ranks hosts by link authority (the public
CC webgraph releases ship exactly this: host→host edges + PageRank /
harmonic ranks) and uses the rank as a quality prior when sampling
training data.  The reference engine has no graph operators, but its
iterative-scan discipline (GeoMesa's kNN ring expansion,
``KNearestNeighborSearchProcess.scala``: bounded rounds, per-round
frontier-only shuffles) is the model here, the same way
``operators/components.py`` applied it to connected components.

Three operators:

``host_graph``
    page-level links → weighted host→host edge list.  One hash
    aggregation on ``(src, dst)``; self-loops dropped.  At 10^12 pages
    the (src,dst) key space is |hosts|^2-bounded (~10^9 for 10^5 hosts)
    and partial aggregation collapses the page fanout map-side, so the
    shuffle carries host-pair partials, not page rows.

``degree_stats``
    in/out degree + link counts per host in ONE aggregation: edges are
    unioned as (host, is_out) tagged rows first, so there is a single
    hash shuffle keyed by host instead of two aggs + an outer join.

``pagerank``
    fixed-iteration PageRank in **pure int64 fixed point**.  Total mass
    is ``SCALE`` micro-units; each round a node's share is
    ``rank // out_degree`` (integer division) and the damping step is
    ``(d_pct * x) // 100``.  Integer sums are associative, so the
    result is bit-identical regardless of partitioning, parallelism, or
    engine — the DuckDB oracle unrolls the same iterations in SQL and
    hash-matches exactly.  (Float PageRank can NOT be oracle-checked
    this way: summation order changes the last ulp.)

    Scale shape per iteration: one join ``edges ⋈ ranks`` on ``src``
    (both sides pre-hash-partitioned on the key, the edge side persisted
    once — the exchange is reused every round) and one hash agg keyed by
    ``dst``; only ``(node, long)`` pairs shuffle, never adjacency lists.
    Dangling mass is a lazy single-row aggregate attached back by
    broadcast (never a driver collect).  Lineage is truncated with
    ``localCheckpoint`` every round so plan depth stays O(1) — in a
    production run this would be a real checkpoint to the Iceberg
    lineage table for mid-run resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1.0 of total rank mass, in micro-units


def anchor_terms(
    links: DataFrame,
    dst_col: str = "dst",
    anchor_col: str = "anchor",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` anchor-text terms per link target — the Common-Crawl
    anchor-corpus build (CC publishes exactly this: the text other sites
    use when linking to a host is a relevance/label signal search and
    LLM pipelines consume alongside the page text itself).

    Input is a page-level link table with (``dst_col``, ``anchor_col``);
    output is one row per retained term: ``(host, term, n bigint,
    rnk int)`` with ``rnk`` the 1-based rank by ``(n DESC, term ASC)``
    (the term tiebreak makes the cut deterministic) and ``rnk <= k``.
    Anchors are lower-cased and whitespace-tokenized; empty tokens drop.

    Scale shape (10^12 links): the explode emits (dst, term) pairs but
    the first aggregation is map-side combined, so the one corpus-sized
    exchange carries ``(dst, term, partial_count)`` — hot targets
    (everyone links to the same few hosts, with the same few words)
    collapse on the map side precisely *because* they repeat.  The
    top-``k`` cut then runs over already-aggregated (dst, term, n) rows,
    and Spark's WindowGroupLimit rewrite (rank predicate pushdown,
    pinned by test_webgraph) applies a partial top-``k`` per partition
    before the window exchange, so even a target with millions of
    distinct anchor terms ships at most ``k`` rows per input partition.
    No driver collects, no Python.
    """
    terms = (
        links.select(
            F.col(dst_col).alias("host"),
            F.explode(
                F.split(F.lower(F.trim(F.col(anchor_col))), r"\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("host", "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("host").orderBy(F.col("n").desc(), F.col("term").asc())
    return (
        terms.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("host", "term", "n", "rnk")
    )


def host_graph(links: DataFrame, src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Aggregate page-level links into a weighted host edge list.

    Returns ``(src, dst, n_links bigint)`` with self-loops removed.
    """
    return (
        links.filter(F.col(src_col) != F.col(dst_col))
        .groupBy(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .agg(F.count("*").alias("n_links"))
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """Per-host degree summary from a weighted edge list.

    Input ``(src, dst, n_links)``; output one row per host appearing on
    either side: ``(host, out_deg, in_deg, out_links, in_links)``.
    Single hash aggregation over a tagged union — no outer join.
    """
    out_side = edges.select(
        F.col("src").alias("host"),
        F.lit(1).alias("__od"),
        F.lit(0).alias("__id"),
        F.col("n_links").alias("__ol"),
        F.lit(0).cast("long").alias("__il"),
    )
    in_side = edges.select(
        F.col("dst").alias("host"),
        F.lit(0).alias("__od"),
        F.lit(1).alias("__id"),
        F.lit(0).cast("long").alias("__ol"),
        F.col("n_links").alias("__il"),
    )
    return (
        out_side.unionByName(in_side)
        .groupBy("host")
        .agg(
            F.sum("__od").cast("long").alias("out_deg"),
            F.sum("__id").cast("long").alias("in_deg"),
            F.sum("__ol").cast("long").alias("out_links"),
            F.sum("__il").cast("long").alias("in_links"),
        )
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 4,
    damping_pct: int = 85,
    partitions: int | None = None,
) -> DataFrame:
    """Fixed-point integer PageRank over a host edge list.

    ``edges`` is ``(src, dst, ...)``; edge weights are ignored (each
    distinct src→dst pair counts once, matching the classic unweighted
    formulation the Common Crawl ranks use).  Returns
    ``(host, rank_micro bigint, rank double)`` where ``rank`` is
    ``rank_micro / SCALE`` — one division from identical operands, so it
    is reproducible bit-for-bit in any IEEE engine.

    Update rule per iteration, all in int64 (``//`` = integer division):

        share(u)   = rank(u) // out_deg(u)
        contrib(v) = Σ_{u→v} share(u)
        dang       = Σ_{out_deg(u)=0} rank(u)
        rank'(v)   = ((100-d) * SCALE // 100) // n
                     + (d * (contrib(v) + dang // n)) // 100

    Mass lost to integer truncation stays lost (deterministically);
    ranks are lower bounds within n/SCALE of the rational fixpoint
    iterate, identical across engines and partitionings.
    """
    spark = edges.sparkSession
    nparts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    pairs = edges.select("src", "dst").distinct()
    nodes = (
        pairs.select(F.col("src").alias("host"))
        .unionByName(pairs.select(F.col("dst").alias("host")))
        .distinct()
        .repartition(nparts, "host")
        .persist()
    )
    n = nodes.count()  # bounded scalar: |hosts|, needed for the base term
    if n == 0:
        return nodes.select(
            F.col("host"),
            F.lit(0).cast("long").alias("rank_micro"),
            F.lit(0.0).alias("rank"),
        )

    outdeg = pairs.groupBy(F.col("src").alias("host")).agg(
        F.count("*").alias("out_deg")
    )
    # src-keyed adjacency with out_deg attached once; persisted so the
    # hash partitioning on src is produced once and reused every round.
    adj = (
        pairs.join(outdeg, pairs["src"] == outdeg["host"])
        .select("src", "dst", "out_deg")
        .repartition(nparts, "src")
        .persist()
    )
    danglers = nodes.join(
        outdeg.select(F.col("host")), "host", "left_anti"
    ).persist()

    d = int(damping_pct)
    base = ((100 - d) * SCALE // 100) // n

    ranks = nodes.select("host", F.lit(SCALE // n).cast("long").alias("rank_micro"))
    for it in range(iterations):
        # dangling mass as a lazy 1-row aggregate attached by broadcast —
        # never a driver collect (a per-round collect would re-run the
        # whole rank lineage as a separate job every iteration)
        dang = (
            danglers.join(ranks, "host")
            .agg(F.coalesce(F.sum("rank_micro"), F.lit(0)).cast("long").alias("__dg"))
        )
        contribs = (
            adj.join(ranks.withColumnRenamed("host", "src"), "src")
            .select(
                "dst",
                # int64 DIV — never a double division: quotients and the
                # damping product below exceed 2^53, where float would
                # round across integer boundaries nondeterministically
                F.expr("rank_micro DIV out_deg").alias("__s"),
            )
            .groupBy("dst")
            .agg(F.sum("__s").alias("__c"))
        )
        ranks = (
            nodes.join(contribs, nodes["host"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                F.expr(
                    f"CAST({base} AS BIGINT) + "
                    f"(CAST({d} AS BIGINT) * (coalesce(__c, CAST(0 AS BIGINT)) "
                    f"+ __dg DIV CAST({n} AS BIGINT))) DIV 100"
                ).alias("rank_micro"),
            )
        )
        # per-round lineage truncation: the dangling and contribution
        # branches BOTH read `ranks`, so an unchecked plan doubles per
        # iteration (2^k copies of round 0 — measured 115s vs ~5s at
        # 480 hosts / 4 rounds). Materializing (host, long) each round
        # is the standard Pregel discipline; a production run
        # checkpoints this to the Iceberg lineage table for mid-run
        # resume.
        ranks = ranks.localCheckpoint()

    # the final round is checkpointed too, so the returned plan reads
    # materialized (host, long) rows and the three cached inputs can be
    # released — otherwise every pagerank() call in a long session
    # (bench runs ~100 queries in one JVM) pins executor storage forever
    out = ranks.select(
        "host",
        "rank_micro",
        (F.col("rank_micro").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )
    for cached in (nodes, adj, danglers):
        cached.unpersist()
    return out


def resolve_redirects(
    edges: DataFrame,
    src_col: str = "url",
    dst_col: str = "target",
    max_chain: int = 64,
    on_duplicate: str = "error",
) -> DataFrame:
    """Resolve redirect chains to their final landing url — the WAT
    post-processing step that canonicalizes a crawl's 3xx records
    before URL dedup / frontier scheduling (a fetched url's identity is
    its chain END, not its first hop).

    ``edges`` is one row per redirecting url: ``(src_col, dst_col)`` —
    a FUNCTIONAL graph (at most one target per source; crawlers record
    one Location per fetch). ``on_duplicate`` makes that precondition
    enforceable rather than silently corrupting (a duplicated source
    would fan the self-join out quadratically): ``"error"`` (default)
    raises on the first duplicate source; ``"min"`` deterministically
    keeps the smallest target per source. Returns one row per SOURCE
    url: ``(url, final_url, hops, unresolved)`` where resolved rows
    carry the terminal landing url and exact hop count, and
    ``unresolved`` marks chains longer than ``max_chain`` and redirect
    loops — surfaced, never silently dropped, because a production
    pipeline quarantines them (browsers and crawlers cap chains the
    same way; RFC 2068 suggested 5, browsers allow ~20).

    Algorithm: pointer doubling with a shrinking frontier. Each round
    the ACTIVE rows join the full pointer lookup — ``u -> p`` and
    ``p -> q`` become ``u -> q`` with summed hop counts — so an L-hop
    chain resolves in ceil(log2 L) rounds, not L: the distributed
    shape that makes 10^8-long pathological chains irrelevant and
    typical crawl chains (2-5 hops) a 3-round job. Rows whose pointer
    lands on a terminal (no outgoing edge) settle OUT of the join's
    probe side — only the still-moving frontier is joined, shuffled,
    and checkpointed each round (settled rows remain in the lookup
    side, where later-resolving chains jump through them); the loop
    exits early once the frontier is empty, and otherwise runs
    ceil(log2(max_chain)) + 1 rounds so every chain within contract
    is resolved before the over-cap flag applies.

    Scale shape (10^9 redirect records): per-round state is one
    (u, p, hops) row per STILL-ACTIVE source — with typical 2-5 hop
    chains the frontier collapses after round 3 and the tail rounds
    are near-free; the join shuffles pointer triples only, never page
    data. Each round's stepped frontier is ``localCheckpoint``ed
    (settled slices were checkpointed the round they settled, so plan
    depth stays bounded by the fixed round budget — the pagerank
    discipline; a production run checkpoints to the lineage table for
    mid-run resume). Driver scalars are the per-round frontier
    emptiness probe only.
    """
    import math

    if on_duplicate == "min":
        edges = edges.groupBy(F.col(src_col).alias("u")).agg(
            F.min(F.col(dst_col)).alias("p")
        )
    else:
        if on_duplicate != "error":
            raise ValueError(f"on_duplicate must be 'error' or 'min': {on_duplicate}")
        dup = (
            edges.groupBy(src_col).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError(
                f"duplicate {src_col} rows: redirect input must be functional "
                "(one target per source); pass on_duplicate='min' to keep the "
                "smallest target deterministically"
            )
        edges = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("p"))

    active = edges.select(
        "u", "p", F.lit(1).cast("long").alias("hops"), F.lit(True).alias("moved")
    ).localCheckpoint()
    settled = []  # checkpointed slices, one per round that settled rows

    rounds = max(1, int(math.ceil(math.log2(max(2, max_chain)))) + 1)
    for _ in range(rounds):
        lookup = active
        for s in settled:
            lookup = lookup.unionByName(s)
        hop = lookup.select(
            F.col("u").alias("p2"), F.col("p").alias("q"), F.col("hops").alias("g")
        )
        stepped = (
            active.drop("moved")
            .join(hop, F.col("p") == F.col("p2"), "left")
            .select(
                "u",
                F.coalesce(F.col("q"), F.col("p")).alias("p"),
                F.when(F.col("q").isNotNull(), F.col("hops") + F.col("g"))
                .otherwise(F.col("hops"))
                .alias("hops"),
                F.col("q").isNotNull().alias("moved"),
            )
            .localCheckpoint()
        )
        settled.append(stepped.filter(~F.col("moved")))
        active = stepped.filter(F.col("moved"))
        if active.limit(1).count() == 0:
            break

    out = active
    for s in settled:
        out = out.unionByName(s)
    # unresolved = still walking after the round budget (loop, or chain
    # past the resolvable horizon) OR resolved past the contract cap —
    # the same verdict a hop-capped sequential walk (the oracle's
    # recursive CTE) reaches
    bad = F.col("moved") | (F.col("hops") > max_chain)
    return out.select(
        F.col("u").alias("url"),
        F.when(~bad, F.col("p")).alias("final_url"),
        F.when(~bad, F.col("hops")).alias("hops"),
        bad.alias("unresolved"),
    )
