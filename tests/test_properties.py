"""Property-based tests (hypothesis) for the pure kernels.

The reference leans on deterministic fixtures; these add randomized
invariant checks over the same kernels — the properties that make the
prune/residual architecture sound: covers are supersets, round-trips are
inverse, residuals agree with geometry.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

lons = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False,
                 allow_subnormal=False)
lats = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False,
                 allow_subnormal=False)


@st.composite
def boxes(draw):
    x0, x1 = sorted((draw(lons), draw(lons)))
    y0, y1 = sorted((draw(lats), draw(lats)))
    return (x0, y0, x1, y1)


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats)
def test_z2_roundtrip_bbox_contains_point(lon, lat):
    from geomesa_spark.cells.zcurve import Z2

    z = Z2.encode(np.array([lon]), np.array([lat]))
    dlon, dlat = Z2.decode(z)
    # decode returns the cell's representative corner; a 31-bit cell is
    # < 1.7e-7 degrees wide
    assert abs(dlon[0] - lon) <= 360.0 / (1 << 31) + 1e-9
    assert abs(dlat[0] - lat) <= 180.0 / (1 << 31) + 1e-9


@settings(max_examples=100, deadline=None)
@given(box=boxes(), lon=lons, lat=lats)
def test_z2_ranges_superset(box, lon, lat):
    """Any point inside the box has its z2 key inside some cover range."""
    from geomesa_spark.cells.zcurve import Z2

    x0, y0, x1, y1 = box
    if not (x0 <= lon <= x1 and y0 <= lat <= y1):
        return
    z = int(Z2.encode(np.array([lon]), np.array([lat]))[0])
    ranges = Z2.ranges(x0, y0, x1, y1, max_ranges=16)
    assert any(lo <= z <= hi for lo, hi in ranges)


@settings(max_examples=100, deadline=None)
@given(box=boxes(), lon=lons, lat=lats,
       secs=st.integers(min_value=0, max_value=604799))
def test_z3_ranges_superset(box, lon, lat, secs):
    from geomesa_spark.cells.zcurve import Z3

    x0, y0, x1, y1 = box
    if not (x0 <= lon <= x1 and y0 <= lat <= y1):
        return
    z = int(Z3.encode(np.array([lon]), np.array([lat]), np.array([secs]))[0])
    ranges = Z3.ranges(x0, y0, x1, y1, 0, 604799, max_ranges=16)
    assert any(lo <= z <= hi for lo, hi in ranges)


@settings(max_examples=200, deadline=None)
@given(lon=lons, lat=lats)
def test_tile_bbox_contains_its_point(lon, lat):
    from geomesa_spark.cells.tiles import tile_bbox, tile_xy

    for level in (2, 6, 10):
        x, y = tile_xy(np.array([lon]), np.array([lat]), level)
        bx0, by0, bx1, by1 = tile_bbox(level, int(x[0]), int(y[0]))
        eps = 1e-9
        assert bx0 - eps <= lon <= bx1 + eps
        assert by0 - eps <= lat <= by1 + eps


seg_xs = st.floats(-200, 200, allow_subnormal=False)
seg_ys = st.floats(-100, 100, allow_subnormal=False)


@settings(max_examples=150, deadline=None)
@given(box=boxes(), x0=seg_xs, y0=seg_ys, x1=seg_xs, y1=seg_ys)
def test_segment_box_consistent_with_sampling(box, x0, y0, x1, y1):
    """If any sampled point of the segment is CLEARLY in the box, the clip
    test must say True (one-sided check — the clip is exact, sampling is
    not). Sampled points within a margin of the box boundary are dropped:
    the sampling arithmetic x0+(x1-x0)*t rounds, so a truly-outside point
    can land exactly on the boundary (denormal/ulp artifacts), which would
    invert the one-sided invariant."""
    from geomesa_spark.geom.kernels import _segment_intersects_box

    t = np.linspace(0.0, 1.0, 33)
    xs = x0 + (x1 - x0) * t
    ys = y0 + (y1 - y0) * t
    bx0, by0, bx1, by1 = box
    eps = 1e-9
    sampled_in = bool(
        ((xs >= bx0 + eps) & (xs <= bx1 - eps)
         & (ys >= by0 + eps) & (ys <= by1 - eps)).any()
    )
    if sampled_in:
        assert _segment_intersects_box(x0, y0, x1, y1, box)


@settings(max_examples=100, deadline=None)
@given(lon=lons, lat=lats, lon2=lons, lat2=lats)
def test_haversine_vincenty_agree_to_half_percent(lon, lat, lon2, lat2):
    """Sphere vs WGS84 differ by < ~0.56% for non-degenerate pairs."""
    from geomesa_spark.geom.kernels import haversine_m, vincenty_m

    h = float(haversine_m(np.array([lon]), np.array([lat]),
                          np.array([lon2]), np.array([lat2]))[0])
    v = float(vincenty_m(np.array([lon]), np.array([lat]),
                         np.array([lon2]), np.array([lat2]))[0])
    if h < 1000.0 or h > 19_000_000.0:  # degenerate / near-antipodal
        return
    assert abs(v - h) / h < 0.0056


@settings(max_examples=100, deadline=None)
@given(lon=lons, lat=lats)
def test_geohash_decode_contains_encoded_point(lon, lat):
    from geomesa_spark.cells.geohash import geohash_decode_bbox, geohash_encode

    gh = str(geohash_encode(np.array([lon]), np.array([lat]), 7)[0])
    x0, y0, x1, y1 = geohash_decode_bbox(gh)
    eps = 1e-9
    assert x0 - eps <= lon <= x1 + eps and y0 - eps <= lat <= y1 + eps


@settings(max_examples=60, deadline=None)
@given(box=boxes(), lon=lons, lat=lats)
def test_box_within_polygon_implies_points_inside(box, lon, lat):
    """If a box is classified wholly-inside a polygon, every point of the
    box (sampled) must test inside — the invariant that lets interior
    cells skip the exact PIP residual."""
    from geomesa_spark.geom.kernels import box_within_polygon, points_in_polygon
    from geomesa_spark.geom.wkt import parse_wkt

    tri = parse_wkt("POLYGON ((-90 -45, 90 -45, 0 80, -90 -45))")
    if not box_within_polygon(box, tri):
        return
    x0, y0, x1, y1 = box
    xs = np.linspace(x0, x1, 5)
    ys = np.linspace(y0, y1, 5)
    gx, gy = np.meshgrid(xs, ys)
    assert points_in_polygon(gx.ravel(), gy.ravel(), tri).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "fid": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
        "label": st.text(max_size=40),
        "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "maybe": st.one_of(st.none(), st.text(max_size=10)),
        "tags": st.lists(st.text(max_size=8), max_size=5),
    }),
    min_size=1, max_size=20,
))
def test_avro_container_roundtrip_property(records):
    """Arbitrary records survive encode->decode bit-exactly, both codecs
    (zigzag longs across the full range, UTF-8 strings, unions, arrays)."""
    from geomesa_spark.sources.avro_codec import iter_container, write_container

    schema = {
        "type": "record", "name": "R",
        "fields": [
            {"name": "fid", "type": "long"},
            {"name": "label", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "maybe", "type": ["null", "string"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
    for codec in ("null", "deflate"):
        assert list(iter_container(write_container(schema, records, codec))) == records
