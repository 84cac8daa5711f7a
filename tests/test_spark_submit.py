"""spark-submit --py-files shipping + resumable-pipeline integration.

The north-rule deployment shape is "ship via spark-submit --py-files and
resume from checkpoint". These tests drive it for real:

* the dist zip built by scripts/package.sh is the ONLY source of the
  package for a driver launched from a scratch cwd with a scrubbed
  PYTHONPATH — both the driver-side import and an executor-side import
  (inside a pandas UDF worker) must come from the shipped artifact;
* scripts/run_pipeline.py run twice against one work dir must do the
  heavy work once: checkpointed stages are served from parquet on the
  second run (metrics markers untouched) and the query-audit log gains
  no duplicate row (the resumed run never re-executes the join).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBMIT = os.path.join(
    os.path.dirname(os.path.dirname(sys.executable)),
    "lib",
    f"python{sys.version_info.major}.{sys.version_info.minor}",
    "site-packages",
    "pyspark",
    "bin",
    "spark-submit",
)
if not os.path.exists(_SUBMIT):
    _SUBMIT = "spark-submit"

_DRIVER = """
import pandas as pd
from pyspark.sql import SparkSession, functions as F

import geomesa_spark  # driver-side import
# the package must resolve from INSIDE the shipped --py-files zip, not
# from any checkout that happens to be importable
assert ".zip" in geomesa_spark.__file__, geomesa_spark.__file__

spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .getOrCreate())


@F.pandas_udf("long")
def z2k(lon: pd.Series, lat: pd.Series) -> pd.Series:
    # executor-side import: the python worker must resolve the package
    # from the --py-files zip, not from any repo checkout
    from geomesa_spark.cells.zcurve import Z2
    return pd.Series(Z2.encode(lon.to_numpy(), lat.to_numpy()).astype("int64"))


df = spark.range(0, 1000, 1, 2).select(
    ((F.col("id") % 360) - 180.0).alias("lon"),
    ((F.col("id") % 180) - 90.0).alias("lat"),
)
n = df.select(z2k("lon", "lat").alias("z")).where(F.col("z") >= 0).count()
print("ZIP_SHIP_OK", n)
"""


def test_py_files_zip_ships_package(tmp_path):
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package.sh")],
        check=True, capture_output=True, cwd=REPO,
    )
    zip_path = os.path.join(REPO, "dist", "geomesa_spark.zip")
    assert os.path.exists(zip_path)
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [_SUBMIT, "--master", "local[2]", "--py-files", zip_path, str(driver)],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "ZIP_SHIP_OK 1000" in out.stdout


def test_run_pipeline_resumes_from_checkpoints(tmp_path):
    work = str(tmp_path / "work")
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--docs", "4000", "--polys", "8", "--work", work,
    ]
    env = dict(os.environ, PYSPARK_SUBMIT_ARGS="--master local[4] pyspark-shell")
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                        cwd=REPO, env=env)
    assert r1.returncode == 0, r1.stderr[-3000:]
    markers = [f for f in os.listdir(work) if f.endswith(".metrics.json")]
    assert {"pages.metrics.json", "layout.metrics.json",
            "poly_tiles.metrics.json"} <= set(markers)
    # lineage record: per-partition row counts present and consistent
    m = json.load(open(os.path.join(work, "pages.metrics.json")))
    assert sum(m["extra"]["per_partition_rows"].values()) == m["rows"] == 4000
    stats = os.path.join(work, "_meta", "query_stats.jsonl")
    assert len(open(stats).readlines()) == 1
    mtimes = {f: os.path.getmtime(os.path.join(work, f)) for f in markers}

    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                        cwd=REPO, env=env)
    assert r2.returncode == 0, r2.stderr[-3000:]
    # resumed run: no stage re-ran (markers untouched), no duplicate audit
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(work, f)) == t, f
    assert len(open(stats).readlines()) == 1
