"""Ad-hoc scaling probe: run the bench transform stage under an arbitrary
master (local[N] or local-cluster[w,c,mem]) and print the timings.

Usage: python scripts/scale_probe.py MASTER TOTAL_CORES [REPS] [JAVA_OPTS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    master = sys.argv[1]
    cores = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    java_opts = sys.argv[4] if len(sys.argv) > 4 else ""

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(master)
        .appName(f"probe-{master}")
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.driver.memory", os.environ.get("PROBE_DRIVER_MEM", "12g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("PROBE_MPB", "134217728"))
        .config("spark.memory.offHeap.enabled", os.environ.get("PROBE_OFFHEAP", "false"))
        .config("spark.memory.offHeap.size", "8g")
        .config("spark.sql.parquet.columnarReaderBatchSize", os.environ.get("PROBE_BATCH", "4096"))
    )
    if master.startswith("local-cluster"):
        b = b.config("spark.executor.memory", os.environ.get("PROBE_EXEC_MEM", "3g"))
    if java_opts:
        b = (b.config("spark.driver.extraJavaOptions", java_opts)
              .config("spark.executor.extraJavaOptions", java_opts))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bench._ensure_pages(spark)
        r = bench._timed(bench.transform_job, spark, reps=reps)
        print(f"PROBE {master} cores={cores} t={r['t']:.3f} spread={r['spread']}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
