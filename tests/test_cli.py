"""Command-line tools (cli.py): the full create -> ingest -> describe ->
explain -> export -> removeschema loop in-process, driving the same engine
APIs as the Python surface (the test session is reused via getOrCreate)."""

from __future__ import annotations

import json

import pytest

from geomesa_spark.cli import main


@pytest.fixture()
def catalog(tmp_path, spark):
    # spark fixture keeps the session alive so get_session() reuses it
    return str(tmp_path / "catalog")


def _csv(tmp_path):
    p = tmp_path / "pts.csv"
    rows = [f"f{i},{(i % 36) * 10 - 175.0},{(i % 17) * 10 - 80.0},2024-01-{i % 27 + 1:02d}T00:00:00Z,k{i % 3}"
            for i in range(60)]
    p.write_text("\n".join(rows))
    return str(p)


def test_cli_full_loop(catalog, tmp_path, capsys):
    # create
    assert main(["create", "--catalog", catalog, "--name", "pts",
                 "--lon", "lon", "--lat", "lat", "--dtg", "dtg",
                 "--fid", "fid", "--attr-index", "kind"]) == 0
    # list shows it without data
    main(["list", "--catalog", catalog])
    out = capsys.readouterr().out
    assert "pts\tno-data" in out

    # ingest csv through the converter DSL (cast via --cast)
    assert main([
        "ingest", "--catalog", catalog, "--name", "pts",
        "--file", _csv(tmp_path), "--format", "csv", "--delimiter", ",",
        "--fields", "fid,lon,lat,dtg,kind",
        "--cast", "lon:double", "--cast", "lat:double",
        "--cast", "dtg:timestamp",
    ]) == 0
    out = capsys.readouterr().out
    assert "ingested 60 features" in out

    # describe reports a complete layout
    main(["describe", "--catalog", catalog, "--name", "pts"])
    out = capsys.readouterr().out
    assert "layout: complete" in out and '"attr_indexes"' in out

    # explain picks the z-indexed strategy for a bbox+time query
    cql = ("BBOX(geom, -50, -40, 50, 40) AND dtg DURING "
           "2024-01-01T00:00:00Z/2024-01-20T00:00:00Z")
    assert main(["explain", "--catalog", catalog, "--name", "pts",
                 "--cql", cql]) == 0
    out = capsys.readouterr().out
    assert "strategy: z3" in out

    # export the bbox query as csv and geojson
    out_csv = str(tmp_path / "out_csv")
    assert main(["export", "--catalog", catalog, "--name", "pts",
                 "--cql", "BBOX(geom, -50, -40, 50, 40)",
                 "--format", "csv", "--out", out_csv]) == 0
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    got = spark.read.option("header", True).csv(out_csv)
    n_box = got.count()
    assert 0 < n_box < 60
    assert {"fid", "lon", "lat", "kind"} <= set(got.columns)

    out_gj = str(tmp_path / "out_gj")
    assert main(["export", "--catalog", catalog, "--name", "pts",
                 "--cql", "BBOX(geom, -50, -40, 50, 40)",
                 "--format", "geojson", "--out", out_gj,
                 "--properties", "kind"]) == 0
    feats = [json.loads(ln) for ln in
             (r["value"] for r in spark.read.text(out_gj).collect())]
    assert len(feats) == n_box
    assert all(f["type"] == "Feature" and "coordinates" in f["geometry"]
               for f in feats)

    # removeschema needs --force
    with pytest.raises(SystemExit):
        main(["removeschema", "--catalog", catalog, "--name", "pts"])
    assert main(["removeschema", "--catalog", catalog, "--name", "pts",
                 "--force"]) == 0
    capsys.readouterr()  # drain the "removed pts" confirmation line
    main(["list", "--catalog", catalog])
    assert "pts" not in capsys.readouterr().out


def test_cli_version_and_missing_table(catalog, capsys):
    assert main(["version"]) == 0
    assert "geomesa_spark" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="no such feature table"):
        main(["describe", "--catalog", catalog, "--name", "nope"])


def test_cli_shp_pipeline_roundtrip(catalog, tmp_path, capsys):
    """The reference's tools-level integration (TLS/FeatureExporter.scala:62-96
    driven through the command surface): create -> ingest csv -> CQL query ->
    export shp -> RE-ingest the shapefile into a second table -> export csv ->
    compare against a direct csv export of the same query. cli.py only; no
    engine APIs touched directly."""
    assert main(["create", "--catalog", catalog, "--name", "src",
                 "--lon", "lon", "--lat", "lat", "--dtg", "dtg",
                 "--fid", "fid"]) == 0
    assert main([
        "ingest", "--catalog", catalog, "--name", "src",
        "--file", _csv(tmp_path), "--format", "csv",
        "--fields", "fid,lon,lat,dtg,kind",
        "--cast", "lon:double", "--cast", "lat:double",
        "--cast", "dtg:timestamp",
    ]) == 0

    cql = "BBOX(geom, -50, -40, 50, 40)"
    shp = str(tmp_path / "box.shp")
    assert main(["export", "--catalog", catalog, "--name", "src",
                 "--cql", cql, "--format", "shp", "--out", shp,
                 "--properties", "fid,lon,lat,kind"]) == 0
    import os

    assert all(os.path.exists(shp[:-4] + ext) for ext in (".shp", ".shx", ".dbf"))

    # reference truth: the same query exported as csv
    ref_csv = str(tmp_path / "ref_csv")
    assert main(["export", "--catalog", catalog, "--name", "src",
                 "--cql", cql, "--format", "csv", "--out", ref_csv,
                 "--properties", "fid,lon,lat,kind"]) == 0

    # re-ingest the shapefile (dbf attribute names are uppercased <=10-char
    # per the dBASE spec; values come back as strings -> cast coordinates)
    assert main(["create", "--catalog", catalog, "--name", "copy",
                 "--lon", "LON", "--lat", "LAT", "--fid", "FID"]) == 0
    assert main(["ingest", "--catalog", catalog, "--name", "copy",
                 "--file", shp, "--format", "shp",
                 "--cast", "LON:double", "--cast", "LAT:double"]) == 0

    copy_csv = str(tmp_path / "copy_csv")
    assert main(["export", "--catalog", catalog, "--name", "copy",
                 "--format", "csv", "--out", copy_csv,
                 "--properties", "FID,LON,LAT,KIND"]) == 0
    capsys.readouterr()

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()

    def rows(path, fid, lon, lat, kind):
        df = spark.read.option("header", True).csv(path)
        return {
            (r[fid], float(r[lon]), float(r[lat]), r[kind])
            for r in df.collect()
        }

    ref = rows(ref_csv, "fid", "lon", "lat", "kind")
    got = rows(copy_csv, "FID", "LON", "LAT", "KIND")
    assert ref and got == ref  # exact: str(float) is shortest-roundtrip
