"""Decompose the transform stage: time each sub-pipeline at two core
counts to locate the non-scaling component.

Usage: python scripts/scale_decomp.py [lo] [hi] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F


def variants():
    from geomesa_spark.sources.layout import enrich_geo
    from geomesa_spark.sources.webpages import extract_text, geoparse

    def scan_only(spark):
        df = spark.read.parquet(bench.PAGES).select(
            "doc_id", "warc_ts", F.length("html").alias("n")
        )
        bench._noop(df)

    def scan_extract(spark):
        df = spark.read.parquet(bench.PAGES).select(
            "doc_id", "warc_ts",
            F.length(extract_text(F.col("html"))).alias("n"),
        )
        bench._noop(df)

    def no_extract(spark):
        # geoparse + enrich over scan WITHOUT the string path
        pages = spark.read.parquet(bench.PAGES).select(
            "doc_id", "warc_ts", F.length("html").alias("text_len")
        )
        pts = geoparse(pages, "doc_id")
        bench._noop(enrich_geo(pts, lon="lon", lat="lat", dtg="warc_ts",
                               fid="doc_id", engine="expr"))

    def full(spark):
        bench.transform_job(spark)

    return [("scan_only", scan_only), ("scan_extract", scan_extract),
            ("no_extract", no_extract), ("full", full)]


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    results = {}
    for cores in (hi, lo):
        spark = bench._session(cores)
        spark.sparkContext.setLogLevel("ERROR")
        try:
            bench._ensure_pages(spark)
            for name, job in variants():
                r = bench._timed(job, spark, reps=reps)
                results.setdefault(name, {})[cores] = r
                print(f"  {name}@{cores}: t={r['t']:.3f} spread={r['spread']}")
        finally:
            spark.stop()
    print("\nefficiency (min-based, lo->hi, ratio %d):" % (hi // lo))
    for name, by in results.items():
        t_lo = by[lo]["spread"][0]
        t_hi = by[hi]["spread"][0]
        print(f"  {name}: eff={(t_lo / t_hi) / (hi / lo):.3f}  t{lo}={t_lo} t{hi}={t_hi}")


if __name__ == "__main__":
    main()
