"""Physical-plan audit: dump .explain("formatted") evidence for the
headline queries to BENCH/PLANS.md.

What to look for (and what this script extracts per query):
* ``PushedFilters`` on the parquet scan — predicates reached the reader
  (row-group min/max skipping at 100 TB);
* ``PartitionFilters`` — week-partition pruning on the z3 layout;
* ``WholeStageCodegen`` spans — the expression pipeline stays JVM-side;
* ``BroadcastHashJoin`` / absence of ``CartesianProduct`` /
  ``SortMergeJoin`` where a broadcast was intended;
* ``ArrowEvalPython`` / ``MapInPandas`` stages — every Python stage is
  deliberate (PIP residual, signature kernels), never in a pre-filter hot
  path.

Usage: python scripts/dump_plans.py [sf_dir] (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-query plan shapes that must NEVER appear (beyond the global BAD
# flags below): e.g. the boilerplate tag join must stay a broadcast — a
# SortMergeJoin there means a third corpus-sized shuffle re-keying every
# exploded line by (group, line).
FORBID = {
    "boilerplate": ["SortMergeJoin"],
    "blocklist": ["SortMergeJoin"],
    "decontaminate": ["SortMergeJoin"],
    # the signals fold per-row: any aggregate means the explode+groupBy
    # corpus shuffle crept back in
    "repetition": ["HashAggregate", "SortMergeJoin"],
    "quality_filter": ["HashAggregate", "SortMergeJoin"],
    # the packing law must come from range partitions + cumsum, never a
    # global window (one unpartitioned sort task at corpus scale)
    "pack_shards": ["Window", "SortMergeJoin"],
    # every single-row/stats attachment must be a broadcast hash join —
    # an SMJ would re-shuffle the matched-token (bm25) or token-occurrence
    # (lm_score) stream by a join key; cap_domain's count/semi/anti joins
    # must broadcast so the under-quota branch stays exchange-free
    # bm25's default (codegen) path must have ZERO corpus-keyed
    # exchanges and no explode — per-term tf is an array expression; the
    # only exchange is the single-row stats SinglePartition collapse
    "bm25": ["SortMergeJoin", "Exchange hashpartitioning", "Generate"],
    "lm_score": ["SortMergeJoin"],
    "cap_domain": ["SortMergeJoin"],
    # dsir's ratio table is bounded by the bucket space (4096 rows) and
    # must broadcast back onto the occurrence stream — an SMJ would
    # re-shuffle every bigram occurrence by bucket
    "dsir_weights": ["SortMergeJoin"],
    # the top-k must be TakeOrderedAndProject (per-task partial top-k),
    # never a range-partitioned global sort
    "dsir_resample": ["SortMergeJoin", "Exchange rangepartitioning"],
    # pure-aggregation web-graph surfaces: any join or window means the
    # single-hash-agg shape regressed
    "link_graph": ["SortMergeJoin", "Window", "Exchange rangepartitioning"],
    "host_degrees": ["SortMergeJoin", "Window", "Exchange rangepartitioning"],
    "domain_mixture": ["SortMergeJoin", "Window", "Exchange rangepartitioning"],
    # cell sizes must ride the explicit broadcast; a window over the
    # corpus (or an SMJ re-keying it) means the skew guard regressed to
    # a second corpus shuffle
    "semdedup": ["SortMergeJoin", "Window"],
    # the verdict must come from the min_by agg + join, never a
    # row_number window over the corpus
    "dedup_select": ["Window"],
    # verdict/match come from one grouped aggregate, never a
    # row_number-over-candidates window
    "incr_semdedup": ["Window"],
    # bench grams and per-bench totals both broadcast; an SMJ means a
    # corpus-sized gram shuffle crept into the decontamination spine
    "contamination_matrix": ["SortMergeJoin"],
    # one gram-count hash agg + the WindowGroupLimit cut; never a join
    # or a range-partitioned global sort
    "ngram_counts": ["SortMergeJoin", "Exchange rangepartitioning"],
    # the ADC scan is joinless: literal LUT lookups + explode + top-k
    "ann_pq": ["SortMergeJoin", "BroadcastHashJoin"],
}

# Queries where BroadcastNestedLoopJoin is the CORRECT plan: their build
# side is a single-row aggregate (corpus stats / vocab totals / the OOV
# floor). The operators join on a literal key; Catalyst constant-folds the
# equality to `true` and plans the 1-row attachment as a broadcast
# nested-loop — which for one build row is exactly a broadcast variable,
# zero loop cost. Everywhere else BNLJ stays a BAD flag (it means an
# accidental cartesian over real relations).
ALLOW_BNLJ = {"bm25", "lm_score", "dsir_weights", "dsir_resample",
              "domain_mixture", "ppl_buckets", "pagerank"}

AUDIT = [
    # name -> what the plan must show
    ("bbox_time_indexed", "week PartitionFilters + z3 PushedFilters"),
    ("bbox_indexed", "z2 PushedFilters on the ST copy"),
    ("bbox_s2", "ONE ArrowEvalPython (S2 leaf encode) + codegen BETWEEN-range prefilter + exact residual; no shuffle"),
    ("attr_filter_indexed", "event_type PushedFilters on the attr copy"),
    ("spatial_join_poly", "BroadcastHashJoin on cover cells, no cartesian"),
    ("knn", "broadcast cell equi-join, no NestedLoop"),
    ("dedup_exact", "hash aggregate on (md5,id) only"),
    ("minhash_lsh", "band/bucket shuffle without signature payload"),
    ("ann_ivf", "broadcast probe join on __cell"),
    ("text_quality", "single WholeStageCodegen over the scan"),
    ("mosaic", "tile_id IN prune before the grouped composite"),
    ("url_dedup", "one max_by hash aggregate on the canonical key, no window/sort"),
    ("sessionize", "ONE exchange on user_id shared by window sort + rollup"),
    ("sample_stratified", "broadcast of stratum counts + codegen hash filter"),
    ("topk_tokens", "TakeOrderedAndProject (per-partition top-k), no global sort"),
    ("descriptive_stats", "decimal-sum partial aggregate, pure codegen"),
    ("warc_roundtrip", "pack aggregate then a single MapInPandas parse stage"),
    # round-4 corpus-cleaning ops
    ("redact_pii", "single WholeStageCodegen regexp chain, no shuffle"),
    ("boilerplate", "broadcast group sizes AND broadcast tag join (SMJ forbidden); two hash aggregates"),
    ("decontaminate", "BroadcastHashJoin on gram hash, corpus side unshuffled"),
    ("repetition", "ZERO exchanges: per-row array_sort + run-length folds, pure codegen"),
    ("span_dedup", "two span-hash exchanges (keeper agg + tag join), no window"),
    ("quality_filter", "ZERO exchanges: composite verdict is one codegen map over the scan"),
    ("pack_shards", "ONE range exchange + per-partition Arrow cumsum; no Window, no global sort"),
    ("blocklist", "K broadcast suffix-depth joins, ZERO corpus shuffle"),
    # round-5 scoring/cap trio
    ("bm25", "codegen per-term tf (no explode); single-row stats broadcast; ZERO corpus-keyed exchange"),
    ("lm_score", "vocab + totals broadcast; occurrence stream joins without shuffle; ONE doc-keyed exchange"),
    ("cap_domain", "broadcast anti/semi split; WindowGroupLimit partial top-n before the over-slice exchange"),
    ("dsir_weights", "bucket agg bounded by 16^3; log-ratio broadcast; ONE doc-keyed exchange"),
    ("dsir_resample", "codegen Gumbel key + TakeOrdered partial top-k; no global sort"),
    # late-r5 web-graph + mixture family
    ("link_graph", "ONE map-side-combined hash aggregate on (src,dst); no join"),
    ("host_degrees", "tagged union -> ONE host-keyed hash aggregate; no outer join"),
    ("pagerank", "per-round (node,long) equi-joins + dst-keyed agg; int64 DIV codegen; no cartesian"),
    ("ppl_buckets", "lang-partitioned ntile window (exact path); vocab broadcast from lm_score"),
    ("domain_mixture", "ONE domain-keyed hash aggregate + single-row totals broadcast; no sort"),
    ("crawl_delta", "ONE full-outer equi-join on the unique url key; (url,fp) pairs only; no window"),
    ("bloom_seen", "probe runs once inside the checkpointed snapshot (ExistingRDD scans); LeftAnti fed by the maybe-seen slice only; definitely-new branch join-free union arm"),
    ("hll_domains", "per-delta map-side-combined sketch aggregates, union, ONE host-keyed hll_union merge; no join, no sort"),
    ("sitemaps", "pure codegen: two regexp_extract_all + ONE explode; ZERO exchanges, no Python"),
    ("redirects", "pointer-doubling rounds: (u,ptr,hops) equi-joins on checkpointed triples; no cartesian, no window"),
    ("hex_density", "ONE codegen map (axial transform + cube round) + ONE (q,r)-keyed hash aggregate; no Python, no join"),
    ("knn_hex", "per-round broadcast hex-disk equi-join + bounded top-k window; no cartesian, no full-table NLJ"),
    ("normalize_text", "ONE ArrowEvalPython (NFC) inside a codegen regex chain; ZERO shuffles"),
    ("badwords", "literal-array intersect in ONE WholeStageCodegen map; ZERO shuffles, no Python"),
    ("anchor_terms", "map-side-combined (host,term) agg then WindowGroupLimit partial top-k; ONE window"),
    ("incr_dedup", "hash/band equi-joins only (exact join, band match, verify re-attach); no cartesian, no global sort"),
    ("crawl_frontier", "broadcast rank join over the delta full-outer; cap_per_group split (broadcast pass-through + WindowGroupLimit over-slice)"),
    ("classifier_score", "ZERO exchanges: weighted feature sum is one codegen map over the scan"),
    ("extract_outlinks", "ZERO exchanges: cast + two regexp_extract_all + explode, one codegen map"),
    ("postings", "map-side-combined tf agg; WindowGroupLimit partial top-k; df from a term-keyed agg, never a window over raw postings"),
    ("semdedup", "Arrow assign stage; cell sizes broadcast (never a corpus window); ONE (cell,shard)-keyed FlatMapGroupsInPandas"),
    ("dedup_select", "ONE component-keyed min_by hash agg + winner equi-join on the same key (deliberately NOT broadcast: winner table ~ cluster count); no window"),
    ("incr_semdedup", "snapshot Arrow assign; cell equi-join (corpus side = persisted layout at scale); candidate-only cosine verify; ONE snapshot-keyed agg"),
    # closing r5 batch
    ("contamination_matrix", "bench grams + totals broadcast (SMJ forbidden); per-bench agg output bounded by the eval set; ZERO corpus shuffle"),
    ("decontaminate_spans", "bench grams broadcast; ONE doc-keyed starts agg; starts re-attach equi-join (AQE broadcasts at real contamination rates); rebuild pure codegen"),
    ("ngram_counts", "ONE map-side-combined (order,gram) hash agg over a single corpus scan; WindowGroupLimit partial top-k; no join"),
    ("ann_pq", "Arrow encode (one-time layout stage); ADC scan = literal-LUT codegen lookups, JOINLESS; WindowGroupLimit top-k"),
]

FLAGS = [
    ("CartesianProduct", "BAD"),
    ("BroadcastNestedLoopJoin", "BAD"),
    ("BroadcastHashJoin", "ok"),
    ("SortMergeJoin", "note"),
    ("ArrowEvalPython", "note"),
    ("MapInPandas", "note"),
    ("FlatMapGroupsInPandas", "note"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # AQE off: adaptive plans hide codegen ids until execution; the
        # audit wants the static physical plan with codegen annotations
        .config("spark.sql.adaptive.enabled", "false")
        .appName("dump_plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    lines = [
        "# Physical-plan audit (generated by scripts/dump_plans.py)",
        "",
        f"sf_dir: `{sf_dir}` — per-query: scan pushdown, join strategy,",
        "codegen spans, and every Python stage, extracted from",
        '`.explain("formatted")`. Flags: BAD = plan shape that must never',
        "appear (cartesian/nested-loop); note = deliberate Python stage.",
        "",
    ]
    bad = 0
    for name, expect in AUDIT:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        lines.append(f"## {name}")
        lines.append(f"_expect: {expect}_")
        lines.append("")
        pushed = sorted(set(re.findall(r"PushedFilters: \[[^\]]*\]", plan)))
        parts = sorted(set(re.findall(r"PartitionFilters: \[[^\]]*\]", plan)))
        for p in parts:
            if p != "PartitionFilters: []":
                lines.append(f"- `{p}`")
        for p in pushed:
            if p != "PushedFilters: []":
                lines.append(f"- `{p[:200]}`")
        # formatted mode marks codegen operators with a leading '*'
        n_codegen = len(re.findall(r"^\s*\(\d+\)\s+\S.*\[codegen id", plan, re.M)) or len(
            re.findall(r"\[codegen id : \d+\]", plan)
        )
        lines.append(f"- operators in WholeStageCodegen: {n_codegen}")
        for flag, kind in FLAGS:
            c = plan.count(flag)
            if c:
                if flag == "BroadcastNestedLoopJoin" and name in ALLOW_BNLJ:
                    lines.append(
                        f"- {flag}: {c} (ok: single-row aggregate build side"
                        " — see ALLOW_BNLJ)"
                    )
                    continue
                lines.append(f"- {flag}: {c} ({kind})")
                if kind == "BAD":
                    bad += 1
        for flag in FORBID.get(name, []):
            if plan.count(flag):
                lines.append(f"- {flag}: FORBIDDEN for {name} (BAD)")
                bad += 1
        lines.append("")
    out = os.path.join("BENCH", "PLANS.md")
    os.makedirs("BENCH", exist_ok=True)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}; BAD plan shapes: {bad}")
    spark.stop()
    raise SystemExit(1 if bad else 0)


if __name__ == "__main__":
    main()
