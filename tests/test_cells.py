"""Kernel round-trip and cover-correctness tests for the cell library.

Mirrors the reference's curve unit tests (geomesa-z3/src/test/.../Z3Test.scala,
Z3RangeTest.scala, GeoHashTest.scala) in spirit: encode/decode round-trips,
ordering, and the superset guarantee of range covers.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from geomesa_spark.cells.zcurve import Z2, Z3, SECONDS_PER_WEEK, epoch_week, seconds_in_week
from geomesa_spark.cells.geohash import (
    geohash_encode,
    geohash_decode_bbox,
    geohash_neighbors,
    geohash_cover_bbox,
)
from geomesa_spark.cells.tiles import tile_id, tile_xy, tiles_for_bbox, tile_bbox


def test_z3_roundtrip_grid():
    lon = np.linspace(-179.9, 179.9, 101)
    lat = np.linspace(-89.9, 89.9, 101)
    t = np.linspace(0, SECONDS_PER_WEEK - 1, 101).astype(np.int64)
    z = Z3.encode(lon, lat, t)
    dlon, dlat, dt = Z3.decode(z)
    # bin width: 360/2^21 deg lon, 180/2^21 lat, ~0.58 s time
    assert np.all(np.abs(dlon - lon) <= 360.0 / (1 << 21))
    assert np.all(np.abs(dlat - lat) <= 180.0 / (1 << 21))
    assert np.all(np.abs(dt - t) <= 1)


def test_z2_roundtrip_grid():
    lon = np.linspace(-180, 180, 101)
    lat = np.linspace(-90, 90, 101)
    z = Z2.encode(lon, lat)
    dlon, dlat = Z2.decode(z)
    assert np.all(np.abs(dlon - lon) <= 360.0 / (1 << 31) + 1e-9)
    assert np.all(np.abs(dlat - lat) <= 180.0 / (1 << 31) + 1e-9)


def test_z3_locality():
    # nearby points share long prefixes more often than distant ones
    z1 = Z3.encode(np.array([10.0]), np.array([10.0]), np.array([1000]))[0]
    z2 = Z3.encode(np.array([10.0001]), np.array([10.0001]), np.array([1000]))[0]
    z3 = Z3.encode(np.array([-170.0]), np.array([-80.0]), np.array([600000]))[0]
    assert bin(int(z1) ^ int(z2)).count("1") < bin(int(z1) ^ int(z3)).count("1")


def test_week_binning():
    # 1970-01-01 is week 0; exactly one week later is week 1
    assert epoch_week(np.array([0]))[0] == 0
    assert epoch_week(np.array([SECONDS_PER_WEEK]))[0] == 1
    assert seconds_in_week(np.array([SECONDS_PER_WEEK + 5]))[0] == 5


@settings(max_examples=200, deadline=None)
@given(
    lon0=st.floats(-180, 179), lat0=st.floats(-90, 89),
    dlon=st.floats(0.001, 30), dlat=st.floats(0.001, 30),
    t0=st.integers(0, SECONDS_PER_WEEK - 2), dt=st.integers(1, SECONDS_PER_WEEK),
    plon=st.floats(0, 1), plat=st.floats(0, 1), pt=st.floats(0, 1),
)
def test_z3_ranges_cover_is_superset(lon0, lat0, dlon, dlat, t0, dt, plon, plat, pt):
    """Any point inside the query box must fall inside some emitted z-range."""
    lon1 = min(180.0, lon0 + dlon)
    lat1 = min(90.0, lat0 + dlat)
    t1 = min(SECONDS_PER_WEEK - 1, t0 + dt)
    ranges = Z3.ranges(lon0, lat0, lon1, lat1, t0, t1)
    assert ranges, "cover must be non-empty for a non-empty box"
    lon = lon0 + plon * (lon1 - lon0)
    lat = lat0 + plat * (lat1 - lat0)
    t = int(t0 + pt * (t1 - t0))
    z = int(Z3.encode(np.array([lon]), np.array([lat]), np.array([t]))[0])
    assert any(lo <= z <= hi for lo, hi in ranges)


def test_z3_ranges_selective():
    """A small box must not cover the whole z space."""
    ranges = Z3.ranges(9.99, 9.99, 10.01, 10.01, 1000, 2000)
    covered = sum(hi - lo + 1 for lo, hi in ranges)
    assert covered < (1 << 63) / 1e6


def test_z2_ranges_superset():
    ranges = Z2.ranges(-10, -10, 10, 10)
    for lon, lat in [(-10, -10), (0, 0), (10, 10), (-9.99, 9.99)]:
        z = int(Z2.encode(np.array([lon]), np.array([lat]))[0])
        assert any(lo <= z <= hi for lo, hi in ranges)


def test_geohash_known_values():
    # public reference point: (lat 57.64911, lon 10.40744) -> u4pruydqqvj
    gh = geohash_encode(np.array([10.40744]), np.array([57.64911]), 11)
    assert gh[0] == "u4pruydqqvj"
    # and a coarse one
    gh2 = geohash_encode(np.array([-5.6]), np.array([42.6]), 5)
    assert gh2[0] == "ezs42"


def test_geohash_bbox_contains_point():
    b = geohash_decode_bbox("u4pru")
    assert b[0] <= 10.40744 <= b[2] and b[1] <= 57.64911 <= b[3]


def test_geohash_neighbors():
    nbrs = geohash_neighbors("u4pru")
    assert len(nbrs) == 8
    assert all(len(n) == 5 for n in nbrs)


def test_geohash_cover_bbox():
    cells = geohash_cover_bbox(10.0, 57.0, 11.0, 58.0, 4)
    p = geohash_encode(np.array([10.40744]), np.array([57.64911]), 4)[0]
    assert p in cells


def test_tile_assignment_and_enumeration():
    tid = tile_id(np.array([0.1]), np.array([0.1]), 4)[0]
    assert tid in tiles_for_bbox(-1, -1, 1, 1, 4)
    x, y = tile_xy(np.array([0.1]), np.array([0.1]), 4)
    b = tile_bbox(4, int(x[0]), int(y[0]))
    assert b[0] <= 0.1 <= b[2] and b[1] <= 0.1 <= b[3]


def test_tile_id_is_sql_arithmetic():
    lon, lat, r = 12.34, -45.6, 8
    n = 1 << r
    x = min(n - 1, max(0, int(np.floor((lon + 180.0) / 360.0 * n))))
    y = min(n - 1, max(0, int(np.floor((90.0 - lat) / 180.0 * n))))
    assert tile_id(np.array([lon]), np.array([lat]), r)[0] == r * (1 << 52) + x * (1 << 26) + y
