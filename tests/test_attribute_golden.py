"""Attribute-predicate golden tests.

Replicates the shape of the reference's AttributeIndexStrategyTest
(``geomesa-accumulo/.../index/AttributeIndexStrategyTest.scala:40-43`` —
every comparison operator exercised per attribute type against a small
hand-built feature set with exact expected ID sets).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from geomesa_spark.plans.compiler import GeoTable, compile_query


@pytest.fixture(scope="module")
def attrs(spark):
    rows = []
    names = ["alice", "bill", "bob", "charles"]
    for i in range(4):
        rows.append((
            str(i), names[i], 20 + i * 5, float(10 + i), 100 + i,
            datetime(2014, 1, 1 + i, 12, 30, tzinfo=timezone.utc),
            45.0 + i, 49.0,
        ))
    df = spark.createDataFrame(
        rows,
        "id string, name string, age int, height double, count long, "
        "dtg timestamp, lon double, lat double",
    )
    return GeoTable(df, lon="lon", lat="lat", dtg="dtg", fid="id")


CASES = [
    # string
    ("name = 'bill'", {"1"}),
    ("name <> 'bill'", {"0", "2", "3"}),
    ("name < 'bill'", {"0"}),
    ("name <= 'bill'", {"0", "1"}),
    ("name > 'bill'", {"2", "3"}),
    ("name >= 'bill'", {"1", "2", "3"}),
    ("name LIKE 'b%'", {"1", "2"}),
    ("name IS NOT NULL", {"0", "1", "2", "3"}),
    ("name IN ('alice', 'charles')", {"0", "3"}),
    # int
    ("age = 25", {"1"}),
    ("age < 30", {"0", "1"}),
    ("age BETWEEN 25 AND 30", {"1", "2"}),
    # double
    ("height > 11.5", {"2", "3"}),
    ("height <= 11.0", {"0", "1"}),
    # long
    ("count >= 102", {"2", "3"}),
    # temporal on attribute (During inclusive per predicates.py)
    ("dtg DURING 2014-01-01T00:00:00Z/2014-01-02T23:59:59Z", {"0", "1"}),
    ("dtg BETWEEN 2014-01-02T00:00:00Z AND 2014-01-03T23:00:00Z", {"1", "2"}),
    # conjunction and negation
    ("age > 20 AND height < 13.0", {"1", "2"}),
    ("NOT name = 'bob'", {"0", "1", "3"}),
    ("name = 'bob' OR age = 35", {"2", "3"}),
]


@pytest.mark.parametrize("cql,expected", CASES)
def test_attribute_predicates(attrs, cql, expected):
    q = compile_query(attrs, cql)
    got = {r["id"] for r in q.df.collect()}
    assert got == expected, f"{cql}: {got} != {expected}"


def test_list_attribute_semantics(spark):
    """Multi-valued (List) attributes: equality matches any element
    (AttributeTable.scala:259-270 one-index-row-per-element semantics)."""
    rows = [("0", ["red", "blue"], 1.0, 1.0), ("1", ["green"], 2.0, 2.0),
            ("2", ["blue", "yellow"], 3.0, 3.0), ("3", [], 4.0, 4.0)]
    df = spark.createDataFrame(rows, "id string, tags array<string>, lon double, lat double")
    t = GeoTable(df, lon="lon", lat="lat", dtg=None, fid="id")
    assert {r["id"] for r in compile_query(t, "tags = 'blue'").df.collect()} == {"0", "2"}
    assert {r["id"] for r in compile_query(t, "tags IN ('green', 'yellow')").df.collect()} == {"1", "2"}
