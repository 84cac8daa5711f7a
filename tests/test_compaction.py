"""Layout compaction (sources/layout.compact_layout + CLI `compact`):
file-count reduction, data identity, restored z-sort, atomic swap
semantics (crash leftovers rebuilt, readers gate on _LAYOUT_SUCCESS)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources.layout import compact_layout, read_layout, write_layout


def _pts(spark, n=400):
    return spark.range(n).select(
        F.format_string("f%d", F.col("id")).alias("id"),
        ((F.col("id") % 360) - 175.5).cast("double").alias("lon"),
        ((F.col("id") % 170) - 84.5).cast("double").alias("lat"),
        F.timestamp_seconds(1704067200 + F.col("id") * 3600).alias("dtg"),
        (F.col("id") % 5).cast("string").alias("kind"),
    )


def _files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_compact_reduces_files_keeps_rows_and_sort(spark, tmp_path):
    path = str(tmp_path / "layout")
    df = _pts(spark)
    write_layout(df, path, fid="id", target_partitions=24,
                 attr_indexes=["kind"], st_copy=True)
    before_files = len(_files(path))
    before = sorted(r["id"] for r in spark.read.parquet(path).collect())

    compact_layout(spark, path, fid="id", target_partitions=2,
                   attr_indexes=["kind"], st_copy=True)
    after_files = len(_files(path))
    assert after_files < before_files
    after = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert after == before
    # sub-tables survive and the layout marker is present
    t = read_layout(spark, path, fid="id", attr_indexes=["kind"], st_copy=True)
    assert t.attr_tables["kind"].count() == 400
    assert t.st_table.count() == 400
    # z-sort within each main file is restored
    one = [f for f in _files(path) if "_attr" not in f and "_st" not in f][0]
    z3s = [r["z3"] for r in spark.read.parquet(one).select("z3").collect()]
    assert z3s == sorted(z3s)


def test_compact_refuses_incomplete_and_cleans_leftovers(spark, tmp_path):
    path = str(tmp_path / "layout2")
    write_layout(_pts(spark, 50), path, fid="id")
    # a crashed previous compaction left a half-written sibling
    leftover = path + "__compacting"
    os.makedirs(leftover)
    (lambda p: open(p, "w").close())(os.path.join(leftover, "junk"))
    compact_layout(spark, path, fid="id", target_partitions=1)
    assert not os.path.exists(leftover)
    assert spark.read.parquet(path).count() == 50

    with pytest.raises(ValueError, match="not a complete layout"):
        compact_layout(spark, str(tmp_path / "nope"), fid="id")


def test_cli_compact_command(spark, tmp_path, capsys):
    from geomesa_spark.cli import main

    catalog = str(tmp_path / "cat")
    assert main(["create", "--catalog", catalog, "--name", "t",
                 "--lon", "lon", "--lat", "lat", "--dtg", "dtg",
                 "--fid", "id"]) == 0
    data = os.path.join(catalog, "t", "data")
    write_layout(_pts(spark, 100), data, fid="id", target_partitions=16)
    n_before = len(_files(data))
    assert main(["compact", "--catalog", catalog, "--name", "t",
                 "--target-partitions", "2"]) == 0
    assert "compacted t" in capsys.readouterr().out
    assert len(_files(data)) < n_before
    assert spark.read.parquet(data).count() == 100


def test_compact_recovers_from_crash_between_renames(spark, tmp_path):
    """Crash window: path renamed to __old but the new layout not yet
    moved in. The next compaction must restore the intact __old layout
    and proceed."""
    path = str(tmp_path / "layout3")
    write_layout(_pts(spark, 80), path, fid="id", target_partitions=8)
    os.rename(path, path + "__old")  # simulate dying mid-swap
    compact_layout(spark, path, fid="id", target_partitions=1)
    assert not os.path.exists(path + "__old")
    assert spark.read.parquet(path).count() == 80

    # crash after the swap, before cleanup: __old AND path both complete
    write_layout(_pts(spark, 30), path + "__old", fid="id")
    compact_layout(spark, path, fid="id", target_partitions=1)
    assert not os.path.exists(path + "__old")
    assert spark.read.parquet(path).count() == 80  # current layout wins
