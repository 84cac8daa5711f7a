"""SFT spec-string parser (sources/sft.py) — the reference's canonical
schema surface (UTL/geotools/SimpleFeatureTypes.scala:540-584 SpecParser
grammar), including the reference's own doc example, plus CLI integration
(create --spec -> describe echoes the normalized spec back).
"""
import json

import pytest

from geomesa_spark.sources.sft import (
    SpecError,
    parse_spec_string,
    schema_from_spec,
    spark_type,
    to_spec_string,
)


def test_reference_doc_example():
    # the example from the SpecParser scaladoc, verbatim
    spec = ("id:Integer:opt1=v1:opt2=v2,*geom:Geometry:srid=4326,"
            "ct:List[String]:index=true,mt:Map[String,Double]:index=false")
    p = parse_spec_string(spec)
    a = {x["name"]: x for x in p["attributes"]}
    assert a["id"]["type"] == "Integer"
    assert a["id"]["options"] == {"opt1": "v1", "opt2": "v2"}
    assert a["geom"]["kind"] == "geometry" and a["geom"]["default"]
    assert a["geom"]["options"]["srid"] == "4326"
    assert a["ct"]["type"] == "List[String]" and a["ct"]["element_type"] == "String"
    # bare boolean index values mean join coverage (optionToIndexCoverage)
    assert a["ct"]["options"]["index"] == "join"
    assert a["mt"]["type"] == "Map[String,Double]"
    assert a["mt"]["key_type"] == "String" and a["mt"]["value_type"] == "Double"
    assert a["mt"]["options"]["index"] == "none"


def test_type_aliases_and_defaults():
    p = parse_spec_string(
        "a:string,b:int,c:0,d:0.0,e:0.0f,f:true,g:java.lang.Long,"
        "h:List,i:Map,j:Date"
    )
    types = [x["type"] for x in p["attributes"]]
    assert types == ["String", "Integer", "Integer", "Double", "Float",
                     "Boolean", "Long", "List[String]", "Map[String,String]",
                     "Date"]


def test_spark_types():
    p = parse_spec_string(
        "s:String,n:Integer,t:Date,g:Point,l:List[Double],m:Map[String,Long]"
    )
    assert [spark_type(a) for a in p["attributes"]] == [
        "string", "int", "timestamp", "string",
        "array<double>", "map<string,bigint>",
    ]


def test_whitespace_stripped_and_first_geometry_is_default():
    p = parse_spec_string(" name : String ,\n dtg : Date,  geom : Point ")
    assert [a["name"] for a in p["attributes"]] == ["name", "dtg", "geom"]
    assert p["attributes"][2]["default"]  # single geometry implicitly default


def test_index_coverage_normalization():
    p = parse_spec_string("a:String:index=full,b:String:index=join,"
                          "c:String:index=FALSE,d:String:index=none")
    opts = [x["options"]["index"] for x in p["attributes"]]
    assert opts == ["full", "join", "none", "none"]


def test_feature_level_splitter_options():
    spec = ("id:String,*geom:Point:srid=4326;"
            "table.splitter=org.locationtech.geomesa.data.DigitSplitter,"
            "table.splitter.options=fmt:%02d,min:0")
    p = parse_spec_string(spec)
    fo = p["feature_options"]
    assert fo["table.splitter"].endswith("DigitSplitter")
    assert fo["table.splitter.options"] == {"fmt": "%02d", "min": "0"}
    # round-trip keeps the suffix
    assert ";table.splitter=" in to_spec_string(p)


def test_roundtrip_normalized():
    spec = "id:String:index=true,dtg:Date,*geom:Point:srid=4326"
    rendered = to_spec_string(parse_spec_string(spec))
    assert rendered == "id:String:index=join,dtg:Date,*geom:Point:srid=4326"
    # idempotent once normalized
    assert to_spec_string(parse_spec_string(rendered)) == rendered


def test_errors():
    # note: "bad option=1" would be VALID (whitespace is stripped pre-parse)
    for bad in ["", "noType", "a:NotAType", "x:String:bad/option=1",
                "*id:String", "g1:Point,*g2:Point,*g3:Point",
                "m:Map[String]", "l:List[String"]:
        with pytest.raises(SpecError):
            parse_spec_string(bad)


def test_schema_from_spec_mapping():
    s = schema_from_spec(
        "tracks",
        "track_id:String:index=full:cardinality=HIGH,score:Double,"
        "dtg:Date,*geom:Point:srid=4326",
    )
    assert s["dtg"] == "dtg"
    assert s["attr_indexes"] == ["track_id"]
    assert s["cardinality"] == {"track_id": "high"}
    assert s["geom"] == "geom" and s["geom_type"] == "Point"
    assert s["srid"] == 4326 and s["st_copy"]
    assert s["spec"].startswith("track_id:String:index=full")


def test_cli_create_from_spec(tmp_path, capsys):
    from geomesa_spark.cli import main

    catalog = str(tmp_path / "cat")
    assert main([
        "create", "--catalog", catalog, "--name", "obs",
        "--spec", "fid:String,kind:String:index=true,dtg:Date,"
                  "*geom:Point:srid=4326",
        "--fid", "fid",
    ]) == 0
    main(["describe", "--catalog", catalog, "--name", "obs"])
    out = capsys.readouterr().out
    schema = json.loads(out[out.index("{"):out.rindex("}") + 1])
    assert schema["dtg"] == "dtg" and schema["fid"] == "fid"
    assert schema["attr_indexes"] == ["kind"]
    assert schema["spec"] == ("fid:String,kind:String:index=join,dtg:Date,"
                              "*geom:Point:srid=4326")


def test_cli_export_shapefile(tmp_path, capsys, spark):
    """create --spec -> ingest -> export --format shp -> read back."""
    from geomesa_spark.cli import main
    from geomesa_spark.sources.shapefile import read_shapefile

    catalog = str(tmp_path / "cat2")
    assert main(["create", "--catalog", catalog, "--name", "pts",
                 "--spec", "fid:String,kind:String,dtg:Date,"
                           "*geom:Point:srid=4326",
                 "--fid", "fid"]) == 0
    csv = tmp_path / "in.csv"
    csv.write_text("\n".join(
        f"f{i},{i * 10 - 170.0},{i * 5 - 80.0},2024-01-0{i % 8 + 1}T00:00:00Z,k{i % 2}"
        for i in range(8)))
    assert main(["ingest", "--catalog", catalog, "--name", "pts",
                 "--file", str(csv), "--format", "csv",
                 "--fields", "fid,lon,lat,dtg,kind",
                 "--cast", "lon:double", "--cast", "lat:double",
                 "--cast", "dtg:timestamp"]) == 0
    out = str(tmp_path / "exp.shp")
    assert main(["export", "--catalog", catalog, "--name", "pts",
                 "--format", "shp", "--out", out,
                 "--properties", "fid,kind",
                 "--cql", "BBOX(geom, -180, -90, 0, 90)"]) == 0
    back = read_shapefile(spark, out)
    rows = {r["FID"]: r for r in back.collect()}
    # lon < 0 -> i*10-170 < 0 -> i <= 16 (all 8 rows have lon in [-170,-100])
    assert len(rows) == 8
    assert rows["f3"]["KIND"] == "k1"
    assert rows["f3"]["wkt"] == "POINT (-140.0 -65.0)"


def test_cli_export_tsv_and_bin(tmp_path, capsys, spark):
    """Reference Formats parity: tsv (delimited) and bin (packed 16-byte
    records, byte-verified against the public BIN layout)."""
    import struct

    from geomesa_spark.cli import main

    catalog = str(tmp_path / "cat3")
    assert main(["create", "--catalog", catalog, "--name", "trk",
                 "--spec", "fid:String,dtg:Date,*geom:Point:srid=4326",
                 "--fid", "fid"]) == 0
    csv = tmp_path / "trk.csv"
    csv.write_text("\n".join(
        f"t{i % 2},{i * 1.0},{i * 2.0},2024-01-01T0{i}:00:00Z"
        for i in range(4)))
    assert main(["ingest", "--catalog", catalog, "--name", "trk",
                 "--file", str(csv), "--format", "csv",
                 "--fields", "fid,lon,lat,dtg",
                 "--cast", "lon:double", "--cast", "lat:double",
                 "--cast", "dtg:timestamp"]) == 0

    tsv_out = str(tmp_path / "out_tsv")
    assert main(["export", "--catalog", catalog, "--name", "trk",
                 "--format", "tsv", "--out", tsv_out,
                 "--properties", "fid,lon,lat"]) == 0
    got = spark.read.option("header", True).option("sep", "\t").csv(tsv_out)
    assert got.count() == 4 and got.columns == ["fid", "lon", "lat"]

    json_out = str(tmp_path / "out_json")
    assert main(["export", "--catalog", catalog, "--name", "trk",
                 "--format", "json", "--out", json_out]) == 0  # GeoJson alias
    line = spark.read.text(json_out).first()["value"]
    assert '"type":"Feature"' in line

    bin_out = str(tmp_path / "out.bin")
    assert main(["export", "--catalog", catalog, "--name", "trk",
                 "--format", "bin", "--out", bin_out]) == 0
    raw = open(bin_out, "rb").read()
    assert len(raw) == 4 * 16  # four 16-byte records
    recs = [struct.unpack("<iiff", raw[i:i + 16]) for i in range(0, 64, 16)]
    # per-track blobs concatenated track-sorted; each time-sorted inside
    assert recs[0][0] == recs[1][0] and recs[2][0] == recs[3][0]  # hashes
    assert recs[0][1] < recs[1][1] and recs[2][1] < recs[3][1]    # time order
    assert {r[3] for r in recs} == {0.0, 1.0, 2.0, 3.0}           # lons
