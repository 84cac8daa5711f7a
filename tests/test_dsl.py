"""Converter expression DSL + transform surface.

Test cases mirror the reference's ``TransformersTest.scala`` shapes: casts,
string functions, nested calls, predicates, composite dispatch via string
predicates, and the Query.properties transform path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions.dsl import parse_expr, parse_properties, parse_spec
from geomesa_spark.plans.compiler import GeoTable, query
from geomesa_spark.sources.convert import apply_converter, composite, delimited_text


@pytest.fixture(scope="module")
def raw(spark):
    lines = spark.createDataFrame(
        [("1|'hello'|2.5",), ("2|'WORLD'|3.5",), ("x|'bad'|oops",)], "line string"
    )
    return delimited_text(lines, "line", "|", ["f0", "f1", "f2"])


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_string_spec_cast_and_strings(raw):
    spec = parse_spec(
        ["id = toLong($1)", "word = lowercase(stripQuotes($2))", "v = toDouble($3)"],
        fields=["line", "f0", "f1", "f2"],
    )
    got = sorted(_rows(apply_converter(raw, spec)), key=lambda t: (t[0] is None, t[0]))
    # malformed row -> NULLs (drop-bad-record try_cast semantics), never abort
    assert got == [(1, "hello", 2.5), (2, "world", 3.5), (None, "bad", None)]


def test_nested_calls_and_literals(raw):
    spec = parse_spec(
        ["tag = concat('id-', $1)", "sub = substr(stripQuotes($2), 0, 3)"],
        fields=["line", "f0", "f1", "f2"],
    )
    got = set(_rows(apply_converter(raw, spec)))
    assert ("id-1", "hel") in got and ("id-2", "WOR") in got


def test_name_refs_without_positions(raw):
    spec = parse_spec(["n = strlen($f1)"])
    assert {r[0] for r in _rows(apply_converter(raw, spec))} == {7, 5}


def test_predicates(spark, raw):
    p_num = parse_expr("intLT(toInt($1), 2)", fields=["line", "f0", "f1", "f2"])
    p_str = parse_expr("strEq(stripQuotes($2), 'WORLD')", fields=["line", "f0", "f1", "f2"])
    p_and = parse_expr(
        "and(intGTEq(toInt($1), 1), not(strEq(stripQuotes($2), 'bad')))",
        fields=["line", "f0", "f1", "f2"],
    )
    cols = {c: F.col(c) for c in raw.columns}
    assert raw.filter(p_num(cols)).count() == 1
    assert raw.filter(p_str(cols)).count() == 1
    assert raw.filter(p_and(cols)).count() == 2


def test_composite_with_string_predicates(spark):
    """CompositeConverter with predicate-dispatched string specs."""
    lines = spark.createDataFrame(
        [("csv", "5", "50"), ("swap", "7", "70"), ("junk", "9", "90")],
        "fmt string, a string, b string",
    )
    fields = ["fmt", "a", "b"]  # no raw-record column: $0 is the first field
    spec_a = parse_spec(["x = toInt($1)", "y = toInt($2)"], fields=fields)
    spec_b = parse_spec(["x = toInt($2)", "y = toInt($1)"], fields=fields)
    cols = {c: F.col(c) for c in lines.columns}
    pred_a = parse_expr("strEq($0, 'csv')", fields=fields)(cols)
    pred_b = parse_expr("strEq($0, 'swap')", fields=fields)(cols)
    out = composite(lines, [(pred_a, spec_a), (pred_b, spec_b)])
    assert sorted(_rows(out)) == [(5, 50), (70, 7)]


def test_query_transform_properties(spark):
    rows = [(i, -10.0 + i, 0.0, f"k{i % 2}") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, lon double, lat double, kind string")
    t = GeoTable(df=df, lon="lon", lat="lat", dtg=None, fid="id")
    out = query(
        t, "BBOX(geom, -10, -5, 5, 5)",
        properties=["id", "tag=strConcat(kind, '-x')", "lon2=toDouble(lon)"],
        sort_by=[("id", True)],
    )
    assert out.columns == ["id", "tag", "lon2"]
    first = out.first()
    assert first["tag"] in ("k0-x", "k1-x")


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_expr("toInt($1,")  # unbalanced
    with pytest.raises(ValueError):
        parse_spec(["no_equals_here"])
    with pytest.raises(KeyError, match="no converter function"):
        cols = {"a": F.lit(1)}
        parse_expr("nosuchfn(a)")(cols)


def test_list_string_and_geohash_functions(spark):
    from geomesa_spark.functions.dsl import parse_spec
    from geomesa_spark.sources.convert import apply_converter

    df = spark.createDataFrame(
        [("a,b,c", None, -0.1, 51.5)], "csv string, missing string, lon double, lat double"
    )
    spec = parse_spec([
        "second = listItem(toList($csv, ','), 1)",
        "n = listLen(toList($csv, ','))",
        "joined = mkstring(toList($csv, ','), '-')",
        "dflt = withDefault($missing, 'fallback')",
        "lbl = printf('%s/%s', $csv, 'x')",
        "gh = geohash($lon, $lat, 7)",
    ])
    row = apply_converter(df, spec).first()
    assert row["second"] == "b" and row["n"] == 3 and row["joined"] == "a-b-c"
    assert row["dflt"] == "fallback" and row["lbl"] == "a,b,c/x"
    # London (51.5N, 0.1W): verified against an independent textbook
    # implementation of the public geohash algorithm
    assert row["gh"] == "gcpuvxr"


def test_empty_to_null(spark):
    from geomesa_spark.functions.registry import resolve_function

    df = spark.createDataFrame([("  ",), ("x",)], "s string")
    out = df.select(resolve_function("emptyToNull")(F.col("s")).alias("v")).collect()
    assert [r["v"] for r in out] == [None, "x"]
