"""Property-based tests for the round-4 surfaces: the SFT spec-string
parser (render∘parse is a fixpoint, parse∘render preserves structure) and
the general shapefile writer (write∘read preserves every coordinate bit
for every supported geometry kind).

Pure driver-side code — no SparkSession needed for the SFT properties;
the shapefile property drives the byte writer/parser directly
(write_shapefile's DataFrame plumbing is covered by the example tests).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_spark.sources.sft import (
    GEOMETRY_TYPES,
    SIMPLE_TYPES,
    parse_spec_string,
    to_spec_string,
)

names = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz_0123456789"),
    min_size=1, max_size=12,
).filter(lambda s: not s[0].isdigit())

opt_values = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789._-"),
    min_size=1, max_size=8,
)

simple_types = st.sampled_from(sorted(SIMPLE_TYPES))
geom_types = st.sampled_from(GEOMETRY_TYPES)


@st.composite
def attributes(draw):
    kind = draw(st.sampled_from(["simple", "geometry", "list", "map"]))
    name = draw(names)
    if kind == "simple":
        t = draw(simple_types)
    elif kind == "geometry":
        t = draw(geom_types)
    elif kind == "list":
        t = f"List[{draw(simple_types)}]"
    else:
        t = f"Map[{draw(simple_types)},{draw(simple_types)}]"
    opts = draw(st.dictionaries(
        st.sampled_from(["cardinality", "srid", "keep", "precision"]),
        opt_values, max_size=2,
    ))
    tok = f"{name}:{t}" + "".join(f":{k}={v}" for k, v in opts.items())
    return tok, kind


@settings(max_examples=150, deadline=None)
@given(attrs=st.lists(attributes(), min_size=1, max_size=8))
def test_sft_render_parse_fixpoint(attrs):
    spec = ",".join(tok for tok, _ in attrs)
    parsed = parse_spec_string(spec)
    assert len(parsed["attributes"]) == len(attrs)
    rendered = to_spec_string(parsed)
    reparsed = parse_spec_string(rendered)
    # render∘parse is a fixpoint after one normalization pass
    assert to_spec_string(reparsed) == rendered
    # structure is preserved: names, kinds, option dicts
    for a, b in zip(parsed["attributes"], reparsed["attributes"]):
        assert (a["name"], a["kind"], a["type"], a["options"]) == (
            b["name"], b["kind"], b["type"], b["options"])


coords = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False,
                   allow_subnormal=False)


@st.composite
def geometries(draw):
    kind = draw(st.sampled_from(
        ["POINT", "MULTIPOINT", "LINESTRING", "MULTILINESTRING", "POLYGON"]))
    def pts(n_min, n_max, close=False):
        n = draw(st.integers(n_min, n_max))
        ps = [(draw(coords), draw(coords)) for _ in range(n)]
        if close:
            ps.append(ps[0])
        return ps

    def fmt(ps):
        return ", ".join(f"{x!r} {y!r}" for x, y in ps)

    if kind == "POINT":
        return f"POINT ({fmt(pts(1, 1))})"
    if kind == "MULTIPOINT":
        return f"MULTIPOINT ({fmt(pts(1, 5))})"
    if kind == "LINESTRING":
        return f"LINESTRING ({fmt(pts(2, 6))})"
    if kind == "MULTILINESTRING":
        k = draw(st.integers(1, 3))
        return "MULTILINESTRING (" + ", ".join(
            f"({fmt(pts(2, 4))})" for _ in range(k)) + ")"
    rings = [f"({fmt(pts(3, 5, close=True))})"
             for _ in range(draw(st.integers(1, 3)))]
    return "POLYGON (" + ", ".join(rings) + ")"


@settings(max_examples=100, deadline=None)
@given(wkts=st.lists(geometries(), min_size=1, max_size=6))
def test_shapefile_bytes_roundtrip_exact(tmp_path_factory, wkts):
    """Every coordinate survives WKT -> shp record bytes -> WKT bit-exactly
    (float64 repr/parse round-trips are exact, struct.pack is IEEE)."""
    import struct

    from geomesa_spark.geom.wkt import parse_wkt
    from geomesa_spark.sources.shapefile import _parse_shp, _shape_body

    # shapefiles are single-type: keep only geometries mapping to the first
    # one's shape type (the writer raises on mixes — tested by example)
    first_stype = _shape_body(parse_wkt(wkts[0]))[0]
    kept = [w for w in wkts if _shape_body(parse_wkt(w))[0] == first_stype]

    shp_records = b""
    for i, w in enumerate(kept):
        _, body = _shape_body(parse_wkt(w))
        shp_records += struct.pack(">ii", i + 1, len(body) // 2) + body
    header = (struct.pack(">i", 9994) + b"\x00" * 20
              + struct.pack(">i", (100 + len(shp_records)) // 2)
              + struct.pack("<ii", 1000, first_stype)
              + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0))
    d = tmp_path_factory.mktemp("shp_prop")
    path = str(d / "prop.shp")
    with open(path, "wb") as f:
        f.write(header + shp_records)

    back = _parse_shp(path)
    assert len(back) == len(kept)
    for orig_wkt, back_wkt in zip(kept, back):
        a, b = parse_wkt(orig_wkt), parse_wkt(back_wkt)
        rings_a = a.rings if not a.parts else [r for p in a.parts for r in p.rings]
        rings_b = b.rings if not b.parts else [r for p in b.parts for r in p.rings]
        assert len(rings_a) == len(rings_b)
        for ra, rb in zip(rings_a, rings_b):
            assert np.array_equal(ra, rb)
