"""Approximate-nearest-neighbor search over embedding columns.

Training-data-pipeline companion to the spatial kNN operator: similarity
search over ``array<float>`` embeddings.

* :func:`cosine_topk` — exact brute-force baseline: broadcast the query set,
  one numpy matmul per Arrow batch (the probe side streams; nothing but
  (vec_id, sim) shuffles for the final window).
* :func:`lsh_cosine_topk` — the scale path: random-hyperplane signatures
  (seeded, deterministic), band-bucket candidate join, exact cosine on
  candidates only. Recall is tested against the brute-force baseline.
* :func:`ivf_cosine_topk` — the other classic scale path: a coarse
  quantizer (distributed spherical k-means, a few Lloyd rounds) partitions
  vectors into cells; queries probe only the ``nprobe`` nearest centroids.
* :func:`embedding_near_pairs` — embedding-cosine near-duplicate pairs:
  hyperplane-band bucket self-join (never all-pairs) + exact cosine verify.
* :func:`train_pq_codebooks` / :func:`encode_pq` / :func:`pq_adc_topk` —
  product quantization: the 10^12-vector memory path. Vectors compress to
  ``m`` tinyint codes (one per subspace, k <= 128); search is an
  asymmetric-distance (ADC) scan that never touches the original vectors —
  per query a tiny ``m x k`` lookup table of subspace distances is folded
  into a pure codegen expression, so the scan side is whole-stage-codegen
  over the code column only (m bytes/vector instead of 8*dim float64).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _topk_window(df: DataFrame, k: int, id_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _empty_topk(emb: DataFrame, id_col: str) -> DataFrame:
    """Schema-stable empty result for an empty query list."""
    id_type = emb.schema[id_col].dataType.simpleString()
    return emb.sparkSession.createDataFrame(
        [], f"query_id string, {id_col} {id_type}, sim double, rank int"
    )


def _cos_udf():
    """Exact pairwise cosine (row vector vs attached query vector) — the
    ONE verify kernel shared by the LSH, IVF, and near-pair paths."""

    @F.pandas_udf("double")
    def cos(vecs: pd.Series, qvecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        q = np.array(qvecs.tolist(), dtype=np.float64)
        num = (m * q).sum(axis=1)
        den = np.maximum(1e-12, np.linalg.norm(m, axis=1) * np.linalg.norm(q, axis=1))
        return pd.Series(num / den)

    return cos


def _band_hashes(bits_row: np.ndarray, bands: int, rows_per_band: int) -> list[int]:
    """Sign bits -> per-band bucket ids (band index folded into the key).
    Single source of truth for the band-hash layout, used by both the
    vectorized UDF and the driver-side query twin."""
    out = []
    for b in range(bands):
        seg = bits_row[b * rows_per_band : (b + 1) * rows_per_band]
        out.append(int((seg.astype(np.int64) << np.arange(len(seg))).sum()) + (b << 32))
    return out


def cosine_topk(
    emb: DataFrame,
    queries: list[tuple[str, list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity per query vector.

    Returns (query_id, vec_id, sim, rank). One batched matmul per Arrow
    batch against the whole (broadcast) query matrix.
    """
    if not queries:
        return _empty_topk(emb, id_col)
    qids = [q[0] for q in queries]
    qmat = np.array([q[1] for q in queries], dtype=np.float64)
    qnorm = qmat / np.maximum(1e-12, np.linalg.norm(qmat, axis=1, keepdims=True))

    @F.pandas_udf("array<double>")
    def sims(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(1e-12, np.linalg.norm(m, axis=1, keepdims=True))
        s = m @ qnorm.T  # (batch, n_queries)
        return pd.Series(list(s))

    with_sims = emb.select(F.col(id_col), sims(F.col(vec_col)).alias("sims"))
    exploded = with_sims.select(
        id_col,
        F.posexplode("sims").alias("qidx", "sim"),
    ).withColumn(
        "query_id",
        F.element_at(F.array(*[F.lit(q) for q in qids]), F.col("qidx") + 1),
    )
    return _topk_window(exploded, k, id_col).select("query_id", id_col, "sim", "rank")


def hyperplane_signatures(
    emb: DataFrame, dim: int, n_planes: int = 63,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42,
) -> DataFrame:
    """Sign-random-projection signature bits packed into a long."""
    if n_planes > 63:
        raise ValueError("n_planes must be <= 63 (bits pack into one signed long)")
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf("long")
    def sig(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        bits = (m @ planes) > 0
        vals = (bits.astype(np.int64) << np.arange(bits.shape[1])).sum(axis=1)
        return pd.Series(vals)

    return emb.withColumn("lsh_sig", sig(F.col(vec_col)))


def lsh_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[str, list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH bucket prefilter + exact cosine on candidates.

    A vector is a candidate for a query if any of the ``bands`` signature
    bands matches exactly. Recall < 1 by construction; tested >= 0.9 vs
    brute force on clustered data.
    """
    if not queries:
        return _empty_topk(emb, id_col)
    dim = len(queries[0][1])
    rng = np.random.RandomState(seed)
    n_planes = min(n_planes, 63)
    planes = rng.standard_normal((dim, n_planes))
    rows_per_band = n_planes // bands

    spark = emb.sparkSession
    qrows = []
    for qid, qvec in queries:
        bits = (np.asarray(qvec, dtype=np.float64) @ planes) > 0
        for bucket in _band_hashes(bits, bands, rows_per_band):
            qrows.append((qid, bucket, [float(v) for v in qvec]))
    qdf = spark.createDataFrame(qrows, "query_id string, bucket long, q_vec array<double>")

    # probe side: explode each vector to its band buckets (same kernel as
    # the embedding near-pair path — one band-hash implementation)
    bucket_udf = _sig_bucket_udf(planes, bands, rows_per_band)
    probe = emb.select(id_col, vec_col, F.explode(bucket_udf(F.col(vec_col))).alias("bucket"))
    cand = probe.join(F.broadcast(qdf), "bucket").dropDuplicates([id_col, "query_id"])

    scored = cand.withColumn("sim", _cos_udf()(F.col(vec_col), F.col("q_vec")))
    return _topk_window(scored, k, id_col).select("query_id", id_col, "sim", "rank")


def _sig_bucket_udf(planes: np.ndarray, bands: int, rows_per_band: int):
    @F.pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        bits = (m @ planes) > 0
        vals = [
            np.array(_band_hashes(row, bands, rows_per_band), dtype=np.int64)
            for row in bits
        ]
        return pd.Series(vals)

    return buckets


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 8,
    seed: int = 42,
    bucket_cap: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim), id_a < id_b.

    The dedup-family member for embedding columns: hyperplane-LSH band
    buckets generate candidates (only (id, bucket) rides the self-join —
    vectors re-attach by id for the exact cosine verify), so the all-pairs
    comparison never materializes. Like the MinHash path, buckets beyond
    ``bucket_cap`` switch to star-shape linking (connected components are
    preserved; the O(B^2) pair explosion is not).

    Recall caveat (documented, tested): a pair is found only if it shares
    at least one band — probability rises steeply with cosine, which is the
    standard LSH near-dup contract.
    """
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("embedding_near_pairs: input table is empty")
    dim = len(first[0])
    rng = np.random.RandomState(seed)
    n_planes = min(n_planes, 63)
    planes = rng.standard_normal((dim, n_planes))
    rows_per_band = n_planes // bands

    buckets = _sig_bucket_udf(planes, bands, rows_per_band)
    exploded = emb.select(
        F.col(id_col), F.explode(buckets(F.col(vec_col))).alias("bucket")
    )
    # window count, same shuffle diet as the minhash path
    keyed = exploded.withColumn(
        "__bn", F.count("*").over(Window.partitionBy("bucket"))
    )

    small = keyed.filter((F.col("__bn") >= 2) & (F.col("__bn") <= bucket_cap)).drop("__bn")
    l, r = small.alias("l"), small.alias("r")
    cand_small = l.join(
        r,
        (F.col("l.bucket") == F.col("r.bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    ).select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))

    big = keyed.filter(F.col("__bn") > bucket_cap).drop("__bn")
    reps = big.groupBy("bucket").agg(F.min(id_col).alias("id_a"))
    cand_big = big.join(reps, "bucket").filter(F.col(id_col) > F.col("id_a")).select(
        "id_a", F.col(id_col).alias("id_b")
    )

    cand = cand_small.unionByName(cand_big).dropDuplicates(["id_a", "id_b"])
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    paired = cand.join(va, "id_a").join(vb, "id_b")
    return (
        paired.withColumn("sim", _cos_udf()(F.col("__va"), F.col("__vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = 20_000,
    block_rows: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster, then prune within clusters.

    The missing member of the dedup family (exact hash / MinHash-lexical /
    SimHash / n-gram Jaccard / pairwise-embedding): duplicates that are
    *semantic* rewrites rather than lexical near-copies. Published recipe
    (Abbas et al. 2023, "SemDeDup"): k-means the embeddings into cells,
    then inside each cell drop every vector whose cosine to a
    higher-priority cell member reaches ``threshold``. Priority here is
    ascending ``id_col`` (deterministic; the paper's
    distance-to-centroid ordering is a one-line swap), so the verdict is
    exactly SQL-expressible: drop(d) iff EXISTS e in the same cell with
    e.id < d.id and cos(e, d) >= threshold.

    Returns (id_col, cell int, keep boolean) — one row per input vector.

    Scale shape (the 100 TB contract):
    * ``centroids`` are the one-time SAMPLED k-means artifact
      (:func:`train_ivf_centroids`), passed in like the IVF query path —
      training is index-build cost, never per-run.
    * Assignment is an Arrow map stage; the only corpus shuffle is the
      groupBy(cell) for :meth:`applyInPandas`. Cell sizes ride a
      broadcast join (tiny: one row per cell), never a window over the
      corpus. The sizes branch re-runs the scan+assign subtree (same
      recompute-vs-persist trade as the boilerplate group sizes); at
      warehouse scale persist the cell id as a layout column
      (:func:`assign_ivf_cells`) and both passes become column reads.
    * Within a cell the verdict is a blocked Gram matmul
      (``block_rows`` x n_cell, never n^2 resident), so a 20k-row cell
      peaks at ~160 MB. Cells beyond ``cell_cap`` sub-shard
      deterministically (crc32(id) mod ceil(n/cap)) and prune within
      each shard — the same hot-key recall trade every capped candidate
      generator in this repo makes (minhash bucket_cap, jaccard
      max_gram_df): a monster cell degrades recall, never blows memory.
      Size n_cells so cells land well under the cap (the paper runs
      ~2k-row clusters).
    """
    # assign_ivf_cells normalizes the centroids (argmax cosine, matching
    # the spherical trainer and the SQL twin) — exactly once, there
    assigned = assign_ivf_cells(emb.select(id_col, vec_col), centroids, vec_col)

    sizes = assigned.groupBy("__cell").agg(F.count("*").alias("__n"))
    sharded = (
        assigned.join(F.broadcast(sizes), "__cell")
        .withColumn(
            "__shard",
            F.when(F.col("__n") <= cell_cap, F.lit(0)).otherwise(
                F.pmod(
                    F.crc32(F.col(id_col).cast("string")),
                    F.ceil(F.col("__n") / F.lit(cell_cap)).cast("long"),
                ).cast("int")
            ),
        )
        .drop("__n")
    )

    thr = float(threshold)
    blk = int(block_rows)
    id_type = emb.schema[id_col].dataType.simpleString()

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        mn = m / np.maximum(1e-12, np.linalg.norm(m, axis=1, keepdims=True))
        n = len(mn)
        keep = np.ones(n, dtype=bool)
        # blocked lower-triangular Gram: row i checks columns j < i only,
        # independent of other rows' verdicts (the triangular rule), so
        # blocks are embarrassingly independent and memory is O(blk * n)
        for i0 in range(0, n, blk):
            i1 = min(i0 + blk, n)
            g = mn[i0:i1] @ mn[:i1].T  # (blk, i1)
            cols = np.arange(i1)
            rows = np.arange(i0, i1)[:, None]
            g[cols[None, :] >= rows] = -2.0  # mask j >= i (incl. self)
            keep[i0:i1] = ~(g >= thr).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "cell": pdf["__cell"].astype("int32").values,
                "keep": keep,
            }
        )

    return sharded.groupBy("__cell", "__shard").applyInPandas(
        prune, f"{id_col} {id_type}, cell int, keep boolean"
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    iters: int = 3,
    seed: int = 42,
    sample_fraction: float = 1.0,
) -> np.ndarray:
    """Distributed spherical k-means coarse quantizer (a few Lloyd rounds).

    Each round is one ``mapInPandas`` pass emitting per-partition partial
    (sum, count) per cell — the classic map-side-combine shape; only
    n_cells x dim floats per partition reach the driver. Deterministic:
    centroids init from a seeded RNG, ties break on cell index.

    Spherical k-means accumulates the NORMALIZED vectors (assignment is by
    cosine, so a high-magnitude vector must not dominate the mean direction
    of its cell).
    """
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("train_ivf_centroids: input table is empty")
    dim = len(first[0])
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((n_cells, dim))
    cents /= np.maximum(1e-12, np.linalg.norm(cents, axis=1, keepdims=True))

    src = emb.select(vec_col)
    if sample_fraction < 1.0:
        src = src.sample(fraction=sample_fraction, seed=seed)

    for _ in range(iters):
        c = cents  # bind for closure

        def partials(batches, _c=c):
            import pandas as _pd

            sums = np.zeros_like(_c)
            counts = np.zeros(len(_c), dtype=np.int64)
            for pdf in batches:
                m = np.array(pdf.iloc[:, 0].tolist(), dtype=np.float64)
                mn = m / np.maximum(1e-12, np.linalg.norm(m, axis=1, keepdims=True))
                assign = (mn @ _c.T).argmax(axis=1)
                for cell in np.unique(assign):
                    sel = assign == cell
                    sums[cell] += mn[sel].sum(axis=0)
                    counts[cell] += int(sel.sum())
            # LONG format (cell, pos, v): the final aggregate is a plain
            # groupBy(cell, pos) sum — plan size stays O(1) in the
            # embedding dimension, where a dim-wide array-of-F.sum
            # expression tree blows up analysis/codegen at 1024+ dims.
            # pos == -1 carries the count row.
            cells = np.repeat(np.arange(len(_c)), dim)
            yield _pd.DataFrame({
                "cell": np.concatenate([cells, np.arange(len(_c))]),
                "pos": np.concatenate([
                    np.tile(np.arange(dim), len(_c)),
                    np.full(len(_c), -1),
                ]).astype(np.int32),
                "v": np.concatenate([
                    sums.astype(np.float64).ravel(),
                    counts.astype(np.float64),
                ]),
            })

        agg = (
            src.mapInPandas(partials, "cell int, pos int, v double")
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("v"))
            .collect()
        )
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.float64)
        for row in agg:
            if row["pos"] < 0:
                counts[row["cell"]] = row["v"]
            else:
                sums[row["cell"], row["pos"]] = row["v"]
        new = cents.copy()
        for cell in range(len(cents)):
            if counts[cell] > 0:
                v = sums[cell] / counts[cell]
                nv = np.linalg.norm(v)
                if nv > 1e-12:
                    new[cell] = v / nv
        cents = new
    return cents


def assign_ivf_cells(
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding",
    cell_col: str = "__cell",
) -> DataFrame:
    """Attach the IVF cell id (nearest spherical centroid) as a column.

    This is the layout step: persist the result partitioned/sorted by
    ``cell_col`` once, and every subsequent IVF query scans only its probed
    cells (partition pruning) instead of re-assigning the corpus.

    Centroids are normalized HERE (argmax must be over cosine, not raw
    dot product) so every assignment path — the persisted layout, the
    per-call IVF query, semantic_dedup, incremental_semantic_dedup —
    cells identically for the same centroid array; a layout built from
    non-unit centroids can never silently disagree with a later probe.
    """
    cents = np.asarray(centroids, dtype=np.float64)
    cents = cents / np.maximum(1e-12, np.linalg.norm(cents, axis=1, keepdims=True))

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        mn = m / np.maximum(1e-12, np.linalg.norm(m, axis=1, keepdims=True))
        return pd.Series((mn @ cents.T).argmax(axis=1).astype(np.int32))

    return emb.withColumn(cell_col, assign(F.col(vec_col)))


def ivf_cosine_topk(
    emb: DataFrame,
    queries: list[tuple[str, list[float]]],
    k: int,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 3,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    sample_fraction: float = 1.0,
    cell_col: str | None = None,
) -> DataFrame:
    """IVF ANN: coarse-quantizer cell assignment + probe-nearest-cells search.

    Index side: every vector is assigned to its nearest (spherical) centroid
    — one map pass, an equi-join key. Query side: each query probes its
    ``nprobe`` nearest cells; candidates come from a broadcast equi-join on
    the cell id and are verified with exact cosine.

    Scale contract (the 100 TB shape): training is a one-time, SAMPLED cost
    (``sample_fraction`` — k-means quality needs only ~100s of points per
    cell, not the corpus), and the assignment is a persisted layout column —
    pass precomputed ``centroids`` plus ``cell_col`` naming an existing cell
    column (see :func:`assign_ivf_cells`) and the query plan is just a
    broadcast equi-join on the cell id over a cell-pruned scan, touching
    ~nprobe/n_cells of the table. The train-per-call default exists only
    for small/ad-hoc inputs.
    """
    if not queries:
        return _empty_topk(emb, id_col)
    if cell_col is not None and centroids is None:
        # a persisted cell column is only meaningful with the centroids
        # that produced it — probing freshly-trained centroids against a
        # foreign assignment silently returns wrong candidates
        raise ValueError("cell_col requires the matching precomputed centroids")
    cents = centroids if centroids is not None else train_ivf_centroids(
        emb, n_cells, vec_col, iters=iters, seed=seed,
        sample_fraction=sample_fraction,
    )
    # normalize for the driver-side probe ORDERING (argsort must rank by
    # cosine): assign_ivf_cells normalizes independently, so assignment
    # and probe agree even for non-unit centroid arrays
    cents = np.asarray(cents, dtype=np.float64)
    cents = cents / np.maximum(1e-12, np.linalg.norm(cents, axis=1, keepdims=True))

    if cell_col is not None:
        assigned = emb.withColumnRenamed(cell_col, "__cell")
    else:
        assigned = assign_ivf_cells(emb, cents, vec_col)

    spark = emb.sparkSession
    qrows = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64)
        qn = q / max(1e-12, np.linalg.norm(q))
        order = np.argsort(-(cents @ qn))
        for cell in order[:nprobe]:
            qrows.append((qid, int(cell), [float(v) for v in qvec]))
    qdf = spark.createDataFrame(qrows, "query_id string, __cell int, q_vec array<double>")

    cand = assigned.join(F.broadcast(qdf), "__cell").drop("__cell")
    scored = cand.withColumn("sim", _cos_udf()(F.col(vec_col), F.col("q_vec")))
    return _topk_window(scored, k, id_col).select("query_id", id_col, "sim", "rank")


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    iters: int = 10,
    seed: int = 42,
    sample_fraction: float = 1.0,
    max_train_rows: int = 100_000,
) -> np.ndarray:
    """Train product-quantization codebooks: ``m`` independent k-means
    codebooks of ``k`` centroids each, one per contiguous subspace of the
    NORMALIZED vector (PQ over unit vectors, matching the cosine contract
    of every other ANN path here). Returns ``(m, k, dim//m)`` float64.

    Training is a one-time INDEX-BUILD cost on a BOUNDED sample — k-means
    needs ~100s of points per centroid, never the corpus (the FAISS
    training discipline): ``sample_fraction`` then a hard ``max_train_rows``
    cut ride one bounded toPandas. Deterministic: the cut is a TakeOrdered
    on the vector value (NOT a bare limit, whose row set depends on
    partition layout), so the training set, its order, the seeded
    distinct-row init, and argmin low-index tie-breaks are all fixed for a
    given input table regardless of parallelism; an emptied centroid keeps
    its previous position.
    """
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("train_pq_codebooks: input table is empty")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m

    src = emb.select(vec_col)
    if sample_fraction < 1.0:
        src = src.sample(fraction=sample_fraction, seed=seed)
    rows = src.orderBy(F.col(vec_col)).limit(max_train_rows).toPandas()
    mat = np.array(rows.iloc[:, 0].tolist(), dtype=np.float64)
    mat = mat / np.maximum(1e-12, np.linalg.norm(mat, axis=1, keepdims=True))
    if len(mat) < k:
        raise ValueError(f"need >= k={k} training rows, got {len(mat)}")

    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        # distinct-row init: duplicate init points would pin two centroids
        # to the same position and orphan one of them forever
        uniq = np.unique(sub, axis=0)
        if len(uniq) >= k:
            cents = uniq[rng.permutation(len(uniq))[:k]].copy()
        else:
            cents = sub[rng.permutation(len(sub))[:k]].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                sel = assign == c
                if sel.any():
                    cents[c] = sub[sel].mean(axis=0)
        books[s] = cents
    return books


def encode_pq(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Attach the PQ code column: per subspace, the index of the nearest
    (squared-L2) codebook centroid of the NORMALIZED vector.

    This is the layout step (the analog of :func:`assign_ivf_cells`):
    persist the result once and every ADC query scans codes only — codes
    are ``array<tinyint>`` (k <= 128 centroids per subspace), so at
    ``m=16`` that is 16 bytes per vector regardless of dimension, the
    compression that makes 10^12-vector search RAM-feasible. One Arrow map
    stage, no shuffle. Ties in the argmin take the lowest centroid index
    (numpy first-min) so re-encoding is bit-stable.
    """
    books = np.asarray(codebooks, dtype=np.float64)
    m, k, dsub = books.shape
    if k > 128:
        raise ValueError(f"encode_pq: k={k} > 128 does not fit tinyint codes")

    @F.pandas_udf("array<tinyint>")
    def enc(vecs: pd.Series) -> pd.Series:
        mat = np.array(vecs.tolist(), dtype=np.float64)
        mat = mat / np.maximum(1e-12, np.linalg.norm(mat, axis=1, keepdims=True))
        codes = np.empty((len(mat), m), dtype=np.int8)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = d.argmin(axis=1)
        return pd.Series(list(codes))

    return emb.withColumn(code_col, enc(F.col(vec_col)))


def pq_adc_topk(
    encoded: DataFrame,
    queries: list[tuple[str, list[float]]],
    codebooks: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over PQ codes.

    Per query the driver builds the classic ``m x k`` lookup table of
    squared subspace distances from the NORMALIZED query to every codebook
    centroid; each row's distance is the left-to-right sum of ``m`` literal
    array lookups — pure whole-stage codegen over the code column, zero
    python on the scan, nothing but (query_id, id, dist) reaching the
    final top-k window (WindowGroupLimit keeps at most k rows per input
    partition in flight). Returns (query_id, vec_id, dist, rank) with
    rank ties broken on ``id_col`` ascending.
    """
    if not queries:
        id_type = encoded.schema[id_col].dataType.simpleString()
        return encoded.sparkSession.createDataFrame(
            [], f"query_id string, {id_col} {id_type}, dist double, rank int"
        )
    books = np.asarray(codebooks, dtype=np.float64)
    m, kcent, dsub = books.shape

    per_query = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64)
        qn = q / max(1e-12, np.linalg.norm(q))
        # LUT[s][c] = ||q_sub(s) - centroid(s, c)||^2
        lut = np.array([
            ((qn[s * dsub : (s + 1) * dsub][None, :] - books[s]) ** 2).sum(axis=1)
            for s in range(m)
        ])
        dist = F.lit(0.0)
        for s in range(m):
            sub_lut = F.array(*[F.lit(float(v)) for v in lut[s]])
            dist = dist + F.element_at(sub_lut, F.element_at(F.col(code_col), s + 1) + 1)
        per_query.append(F.struct(F.lit(qid).alias("query_id"), dist.alias("dist")))

    exploded = encoded.select(
        F.col(id_col), F.explode(F.array(*per_query)).alias("qd")
    ).select(id_col, F.col("qd.query_id").alias("query_id"), F.col("qd.dist").alias("dist"))
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "dist", "rank")
    )


def incremental_semantic_dedup(
    snapshot: DataFrame,
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_cell_col: str | None = None,
) -> DataFrame:
    """Incremental SEMANTIC dedup: classify a snapshot against a corpus.

    The embedding twin of the lexical ``incremental_dedup`` (MinHash
    band match): each new vector is checked only against corpus members
    of its own centroid cell — exactly an IVF probe (nprobe=1) batched
    over the snapshot — then verified with exact cosine. Returns one row
    per snapshot vector: (id, cell, verdict 'dup'|'new', match_id,
    n_matches), where match_id is the SMALLEST matching corpus id (an
    integer-deterministic choice: best-by-similarity would hinge on FP
    ordering between near-equal sims).

    Scale shape: the corpus side is the one-time cell layout — pass
    ``corpus_cell_col`` naming a persisted assignment column (see
    :func:`assign_ivf_cells`) and a daily snapshot never re-assigns or
    re-shuffles the corpus: the plan is snapshot-assign (Arrow map) +
    cell equi-join + candidate-only cosine verify + one snapshot-keyed
    aggregate. Candidates per snapshot row = its cell's occupancy, so
    size the centroid count for the cell occupancy you can afford —
    identical to the IVF search contract.
    """
    # assign_ivf_cells normalizes the centroids exactly once, so the
    # snapshot assignment, a per-call corpus assignment, AND a layout
    # persisted earlier from the SAME raw array all cell identically
    sn = assign_ivf_cells(snapshot.select(id_col, vec_col), centroids, vec_col)
    if corpus_cell_col is not None:
        co = corpus.select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cvec"),
            F.col(corpus_cell_col).alias("__cell"),
        )
    else:
        co = assign_ivf_cells(corpus.select(id_col, vec_col), centroids, vec_col).select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cvec"),
            "__cell",
        )

    thr = float(threshold)
    if thr <= 0.0:
        # the empty-cell placeholder below scores exactly 0, so a
        # non-positive threshold would count phantom matches
        raise ValueError("incremental_semantic_dedup: threshold must be > 0")
    cand = sn.join(co, "__cell", "left")
    # a snapshot row whose cell holds no corpus members keeps its row via
    # the left join; the Arrow kernel can't take NULL vectors, so missing
    # corpus vectors become the zero vector (cosine exactly 0 — never a
    # hit) while __cid stays NULL and can never become a match_id
    scored = cand.withColumn(
        "__sim",
        _cos_udf()(
            F.coalesce(
                F.col("__cvec"), F.transform(F.col(vec_col), lambda x: x * F.lit(0.0))
            ),
            F.col(vec_col),
        ),
    )
    hit = F.when(F.col("__sim") >= thr, F.lit(1)).otherwise(F.lit(0))
    agg = scored.groupBy(id_col, "__cell").agg(
        F.sum(hit).cast("long").alias("n_matches"),
        F.min(F.when(F.col("__sim") >= thr, F.col("__cid"))).alias("match_id"),
    )
    return agg.select(
        id_col,
        F.col("__cell").alias("cell"),
        F.when(F.col("n_matches") > 0, F.lit("dup"))
        .otherwise(F.lit("new"))
        .alias("verdict"),
        "match_id",
        "n_matches",
    )
