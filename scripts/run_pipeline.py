"""spark-submit entry point: the full resumable ingest->layout->join->tiles
pipeline with per-stage checkpoints, per-partition lineage, and query audits.

Ship and run (local example; on a cluster swap --master):

    scripts/package.sh   # builds dist/geomesa_spark.zip
    spark-submit --master local[32] \\
        --py-files dist/geomesa_spark.zip \\
        scripts/run_pipeline.py --docs 1000000 --work /tmp/gm_pipeline

Re-running the same command RESUMES: stages whose checkpoint + metrics
marker exist are skipped (kill it mid-run and start it again to see).
Per-stage metrics land in ``<work>/<stage>.metrics.json`` with
per-partition row counts (the lineage record); per-query audit rows append
to ``<work>/_meta/query_stats.jsonl`` (the reference's QueryStat analog,
``ACC/stats/QueryStat.scala:25-60``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--work", default="/tmp/gm_pipeline")
    ap.add_argument("--polys", type=int, default=48)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("geomesa-spark-pipeline")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from geomesa_spark.functions.zexpr import tile_id_expr
    from geomesa_spark.sources.polygons import reference_polygons
    from geomesa_spark.operators.spatial_join import spatial_join
    from geomesa_spark.plans.compiler import GeoTable
    from geomesa_spark.runtime.metrics import checkpoint_stage, write_query_stat
    from geomesa_spark.sources.layout import enrich_geo
    from geomesa_spark.sources.webpages import extract_text, geoparse, synth_webpages

    work = args.work
    meta = os.path.join(work, "_meta")
    # resume safety: checkpoints are keyed by stage name, so a work dir is
    # only valid for ONE parameter set — re-running with different --docs
    # against existing checkpoints would silently serve stale data labeled
    # with the new parameters
    params = {"docs": args.docs, "polys": args.polys}
    os.makedirs(meta, exist_ok=True)
    ppath = os.path.join(meta, "params.json")
    if os.path.exists(ppath):
        prev = json.load(open(ppath))
        if prev != params:
            raise SystemExit(
                f"work dir {work} holds checkpoints for {prev}, requested "
                f"{params}; use a fresh --work dir (or delete this one)"
            )
    else:
        with open(ppath, "w") as fh:
            json.dump(params, fh)
    t_all = time.perf_counter()

    # stage 1: raw page table (stands in for the external crawl source)
    pages = synth_webpages(spark, args.docs)
    pages = checkpoint_stage(pages, work, "pages")

    # stage 2: ingest transform -> point layout with index keys
    pts = geoparse(
        pages.select("doc_id", "warc_ts", extract_text(F.col("html")).alias("text")),
        "doc_id",
    ).select("doc_id", "warc_ts", "lon", "lat", F.length("text").alias("text_len"))
    enriched = enrich_geo(pts, lon="lon", lat="lat", dtg="warc_ts",
                          fid="doc_id", engine="expr")
    layout = checkpoint_stage(enriched, work, "layout", partition_by=["week"])

    # stage 3: spatial join + tile assignment
    t = GeoTable(layout, lon="lon", lat="lat", dtg="warc_ts", fid="doc_id")
    t0 = time.perf_counter()
    joined = spatial_join(t, reference_polygons()[: args.polys])
    tiles = joined.select(
        "poly_id",
        tile_id_expr(F.col("lon"), F.col("lat"), 8).alias("tile_id"),
        "text_len",
    ).groupBy("poly_id", "tile_id").agg(
        F.count("*").alias("n"), F.sum("text_len").alias("text_bytes")
    )
    ran_join = not os.path.exists(os.path.join(work, "poly_tiles", "_SUCCESS"))
    result = checkpoint_stage(tiles, work, "poly_tiles")
    n_result = result.count()
    if ran_join:
        # audit only executions: a resumed run skipped the join entirely, so
        # a wall_s row here would record checkpoint-read time as join cost
        write_query_stat(meta, {
            "query": "spatial_join+tile_assign",
            "n_polys": args.polys,
            "wall_s": round(time.perf_counter() - t0, 3),
            "out_rows": n_result,
        })

    # stages 4-5: the training-data text pipeline over the same pages —
    # quality/lang scoring then two-level dedup (exact + MinHash near-dup),
    # each checkpointed/resumable like the geo stages
    from geomesa_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from geomesa_spark.operators.textstats import language_id, text_quality

    docs = pages.select("doc_id", extract_text(F.col("html")).alias("text"))
    quality = text_quality(docs, "text", "doc_id").join(
        language_id(docs, "text", "doc_id"), "doc_id"
    )
    # checkpoint: quality feeds the clean filter AND both sides of the
    # canonical-selection join below — unmaterialized it would re-run
    # the extract_text + scoring UDF chain over the full corpus 3x
    quality = checkpoint_stage(quality, work, "docs_quality")
    clean_ids = quality.filter(F.col("quality_score") >= 0.5).select("doc_id")
    clean = docs.join(clean_ids, "doc_id")
    clean = checkpoint_stage(clean, work, "docs_clean")

    reps = exact_dedup(clean, "text", "doc_id").select("doc_id")
    exact_unique = clean.join(reps, "doc_id")
    # near-dup pairs -> clusters -> QUALITY-AWARE canonical selection: the
    # kept copy per cluster is the highest-scoring member (ties to the
    # smallest id), not whichever side of the pair happened to be id_b.
    # Docs outside every cluster are implicit keepers (left_anti on drops).
    from geomesa_spark.operators.components import connected_components
    from geomesa_spark.operators.dedup import select_canonical

    near_pairs = minhash_lsh_pairs(
        exact_unique, "text", "doc_id", threshold=0.8
    ).select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    members = connected_components(near_pairs).join(
        quality.select(F.col("doc_id").alias("node"), "quality_score"), "node"
    )
    near_drop = (
        select_canonical(members, id_col="node", comp_col="component")
        .filter(~F.col("keep"))
        .select(F.col("node").alias("doc_id"))
    )
    deduped = exact_unique.join(near_drop, "doc_id", "left_anti")
    deduped = checkpoint_stage(deduped, work, "docs_dedup")

    # stage 6: final curation — unicode/whitespace normalization, the
    # C4 banned-word drop, then temperature-scaled per-host mixture
    # weights over the survivors (the hand-off artifact a sampler
    # consumes); checkpointed/resumable like everything above
    from geomesa_spark.functions.urls import url_host
    from geomesa_spark.operators.corpus import domain_mixture
    from geomesa_spark.operators.textclean import badwords_filter, normalize_text

    norm = normalize_text(deduped, "text", "doc_id").select(
        "doc_id", F.col("norm_text").alias("text")
    )
    # checkpoint BEFORE the filter: kept_ids is derived from norm, so an
    # unmaterialized norm would run the NFC pandas UDF twice (once per
    # join branch) over the full corpus
    norm = checkpoint_stage(norm, work, "docs_norm")
    kept_ids = badwords_filter(norm, ["error", "fatal"], mode="drop")
    final = norm.join(kept_ids, "doc_id")
    final = checkpoint_stage(final, work, "docs_final")
    mixture = domain_mixture(
        pages.join(final.select("doc_id"), "doc_id").select(
            url_host(F.col("url")).alias("host")
        ),
        "host",
        alpha=0.5,
    )
    mixture = checkpoint_stage(mixture, work, "mixture")

    # NOTE: the synthetic page corpus is intentionally duplicate-heavy
    # (~17 distinct texts per 20k pages), so the dedup stages collapse it
    # almost entirely — which is exactly the load profile they exist for.
    print(json.dumps({
        "docs": args.docs,
        "result_rows": n_result,
        "docs_clean": deduped.sparkSession.read.parquet(
            os.path.join(work, "docs_clean")
        ).count(),
        "docs_exact_unique": exact_unique.count(),
        "docs_deduped": deduped.count(),
        "docs_final": final.count(),
        "mixture_domains": mixture.count(),
        "total_wall_s": round(time.perf_counter() - t_all, 2),
        "stages": sorted(
            f for f in os.listdir(work) if f.endswith(".metrics.json")
        ),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
