"""Round-4 CLI command parity (TLS/commands/): deletecatalog, tableconf,
ingestraster/deleteraster — the four reference commands round 3 lacked.
The ingested raster chunks must be queryable through the SAME engine path
(operators/tiling.raster_query) the WMS analog uses.
"""
import json
import os

import pytest

from geomesa_spark.cli import main


def test_deletecatalog_requires_force(tmp_path, capsys):
    catalog = str(tmp_path / "cat")
    assert main(["create", "--catalog", catalog, "--name", "t1"]) == 0
    with pytest.raises(SystemExit, match="--force"):
        main(["deletecatalog", "--catalog", catalog])
    assert main(["deletecatalog", "--catalog", catalog, "--force"]) == 0
    assert not os.path.exists(catalog)


def test_tableconf_list_describe_update(tmp_path, capsys):
    catalog = str(tmp_path / "cat")
    assert main(["create", "--catalog", catalog, "--name", "t1",
                 "--dtg", "ts"]) == 0
    main(["tableconf", "list", "--catalog", catalog, "--name", "t1"])
    out = capsys.readouterr().out
    assert 'dtg="ts"' in out and 'lon="lon"' in out

    main(["tableconf", "describe", "--catalog", catalog, "--name", "t1",
          "--param", "dtg"])
    assert 'dtg="ts"' in capsys.readouterr().out

    assert main(["tableconf", "update", "--catalog", catalog, "--name", "t1",
                 "--param", "st_copy", "--value", "true"]) == 0
    schema = json.load(open(tmp_path / "cat" / "t1" / "_schema.json"))
    assert schema["st_copy"] is True

    with pytest.raises(SystemExit, match="not an updatable key"):
        main(["tableconf", "update", "--catalog", catalog, "--name", "t1",
              "--param", "attr_indexes", "--value", "x"])


def test_ingestraster_and_query_and_delete(tmp_path, capsys, spark):
    from geomesa_spark.operators.tiling import raster_query

    catalog = str(tmp_path / "cat")
    chunk1 = tmp_path / "c1.bin"
    chunk1.write_bytes(b"\x10" * 64)
    chunk2 = tmp_path / "c2.bin"
    chunk2.write_bytes(b"\x20" * 64)

    assert main(["ingestraster", "--catalog", catalog, "--name", "ras",
                 "--file", str(chunk1), "--bounds", "10,40,12,42",
                 "--level", "6"]) == 0
    assert main(["ingestraster", "--catalog", catalog, "--name", "ras",
                 "--file", str(chunk2), "--bounds=-80,-10,-78,-8",
                 "--level", "6"]) == 0

    meta = json.load(open(tmp_path / "cat" / "ras" / "_raster.json"))
    assert meta["levels"] == [6]

    chunks = spark.read.parquet(str(tmp_path / "cat" / "ras" / "raster" /
                                    "level=6"))
    assert chunks.count() == 2
    # engine query path: only the chunk overlapping the bbox comes back
    got = raster_query(chunks, (9.0, 39.0, 13.0, 43.0), 6, meta["levels"])
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["source"] == "c1.bin"
    assert bytes(rows[0]["payload"]) == b"\x10" * 64

    with pytest.raises(SystemExit, match="--force"):
        main(["deleteraster", "--catalog", catalog, "--name", "ras"])
    assert main(["deleteraster", "--catalog", catalog, "--name", "ras",
                 "--force"]) == 0
    assert not os.path.exists(tmp_path / "cat" / "ras" / "raster")


def test_ingest_tsv_format(tmp_path, capsys, spark):
    catalog = str(tmp_path / "cat_tsv")
    assert main(["create", "--catalog", catalog, "--name", "t",
                 "--fid", "fid"]) == 0
    tsv = tmp_path / "in.tsv"
    tsv.write_text("\n".join(f"f{i}\t{i * 1.0}\t{i * 2.0}" for i in range(5)))
    assert main(["ingest", "--catalog", catalog, "--name", "t",
                 "--file", str(tsv), "--format", "tsv",
                 "--fields", "fid,lon,lat",
                 "--cast", "lon:double", "--cast", "lat:double"]) == 0
    assert "ingested 5 features" in capsys.readouterr().out
