"""S2 cell kernel invariants (cells/s2.py).

The module is written from scratch against the published S2 cell-id
scheme, so the tests pin the *defining properties* of that scheme rather
than library-specific vectors: face layout, hierarchy containment,
Hilbert-curve continuity, signed-int64 range monotonicity, and the cover's
superset guarantee (the property the query plan's correctness rests on —
the residual filter only fixes precision, never recall).
"""

import math

import numpy as np
import pytest

from geomesa_spark.cells import s2


def _rng():
    return np.random.default_rng(42)


def test_leaf_roundtrip_precision():
    rng = _rng()
    lon = rng.uniform(-180, 180, 50000)
    lat = rng.uniform(-90, 90, 50000)
    leaf = s2.lonlat_to_leaf(lon, lat)
    assert leaf.dtype == np.int64
    assert (s2.level_of(leaf) == 30).all()
    lo2, la2 = s2.cell_center_lonlat(leaf)
    # leaf cells are ~6e-8 deg wide; decode must land inside the leaf
    assert np.abs(la2 - lat).max() < 1e-6
    dlon = np.abs((lo2 - lon + 180) % 360 - 180) * np.cos(np.radians(lat))
    assert dlon.max() < 1e-6


def test_face_assignment():
    # the 6 cube-face centers, nudged off the exact boundary
    pts = [(0.001, 0.001, 0), (90.001, 0.001, 1), (0.001, 89.9, 2),
           (179.9, 0.001, 3), (-89.9, 0.001, 4), (0.001, -89.9, 5)]
    for lon, lat, want in pts:
        got = s2.lonlat_to_leaf(np.array([lon]), np.array([lat]))
        assert int(got.view(np.uint64)[0] >> np.uint64(61)) == want


def test_parent_containment_and_levels():
    rng = _rng()
    leaf = s2.lonlat_to_leaf(rng.uniform(-180, 180, 5000),
                             rng.uniform(-90, 90, 5000))
    for lvl in (0, 3, 10, 20, 29):
        p = s2.parent(leaf, lvl)
        assert (s2.level_of(p) == lvl).all()
        lo, hi = s2.cell_range(p)
        assert ((leaf >= lo) & (leaf <= hi)).all()
        # parent at a deeper level stays inside the coarser ancestor
        q = s2.parent(leaf, min(lvl + 3, 30))
        lo2, hi2 = s2.cell_range(q)
        assert ((lo2 >= lo) & (hi2 <= hi)).all()


def test_level1_partitions_sphere_into_24():
    rng = _rng()
    leaf = s2.lonlat_to_leaf(rng.uniform(-180, 180, 40000),
                             np.degrees(np.arcsin(rng.uniform(-1, 1, 40000))))
    assert len(np.unique(s2.parent(leaf, 1))) == 24


def test_hilbert_continuity():
    """Consecutive positions at one level are spatially adjacent — the
    property that makes per-cell leaf ranges contiguous and covers merge."""
    lvl = 8
    shift = np.uint64(2 * (30 - lvl) + 1)
    marker = np.uint64(1) << np.uint64(2 * (30 - lvl))
    for face in (0, 3, 5):
        pos = np.arange(0, 4 ** lvl, dtype=np.uint64)
        ids = ((np.uint64(face) << np.uint64(61)) | (pos << shift) | marker)
        lon, lat = s2.cell_center_lonlat(ids.view(np.int64))
        x = np.cos(np.radians(lat)) * np.cos(np.radians(lon))
        y = np.cos(np.radians(lat)) * np.sin(np.radians(lon))
        z = np.sin(np.radians(lat))
        step = np.arccos(np.clip(
            x[:-1] * x[1:] + y[:-1] * y[1:] + z[:-1] * z[1:], -1, 1))
        cell_w = (math.pi / 2) / 2 ** lvl
        assert step.max() < 2.5 * cell_w


def test_ranges_monotonic_within_face_signed():
    """uint64 -> int64 view keeps per-face order, so BETWEEN stays valid
    even for faces 4-5 (negative ids)."""
    rng = _rng()
    for face_lon, face_lat in ((-89.0, 1.0), (1.0, -85.0)):  # faces 4, 5
        lon = face_lon + rng.uniform(-2, 2, 2000)
        lat = face_lat + rng.uniform(-2, 2, 2000)
        leaf = s2.lonlat_to_leaf(lon, lat)
        assert (leaf < 0).all()
        cell = s2.parent(leaf, 7)
        lo, hi = s2.cell_range(cell)
        assert ((leaf >= lo) & (leaf <= hi)).all()


@pytest.mark.parametrize("trial", range(8))
def test_cover_is_superset(trial):
    rng = np.random.default_rng(100 + trial)
    lo1, lo2 = sorted(rng.uniform(-180, 180, 2))
    la1, la2 = sorted(rng.uniform(-90, 90, 2))
    lvl = int(rng.integers(2, 11))
    ranges = s2.cover_rect(lo1, la1, lo2, la2, lvl)
    assert ranges
    plon = rng.uniform(lo1, lo2, 1000)
    plat = rng.uniform(la1, la2, 1000)
    leaf = s2.lonlat_to_leaf(plon, plat)
    hit = np.zeros(leaf.shape, bool)
    for a, b in ranges:
        hit |= (leaf >= a) & (leaf <= b)
    assert hit.all()
    # merged output: sorted, non-overlapping
    flat = [v for ab in ranges for v in ab]
    assert flat == sorted(flat)


def test_cover_idl_and_pole():
    rng = _rng()
    # antimeridian-crossing rect (lon_min > lon_max convention)
    r = s2.cover_rect(170, -10, -170, 10, 6)
    leaf = s2.lonlat_to_leaf(np.array([179.9, -179.9, 171.0]),
                             np.array([0.0, 9.0, -9.5]))
    hit = np.zeros(3, bool)
    for a, b in r:
        hit |= (leaf >= a) & (leaf <= b)
    assert hit.all()
    # polar cap rect
    r = s2.cover_rect(-180, 80, 180, 90, 5)
    leaf = s2.lonlat_to_leaf(rng.uniform(-180, 180, 500),
                             rng.uniform(80, 90, 500))
    hit = np.zeros(500, bool)
    for a, b in r:
        hit |= (leaf >= a) & (leaf <= b)
    assert hit.all()


def test_cover_prunes():
    """The cover must actually prune: a modest rect's cover keeps far less
    than the whole sphere (superset, but a useful one)."""
    rng = _rng()
    lon = rng.uniform(-180, 180, 100000)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 100000)))
    leaf = s2.lonlat_to_leaf(lon, lat)
    ranges = s2.cover_rect(-50, -20, 30, 45, 6, max_cells=32)
    hit = np.zeros(leaf.shape, bool)
    for a, b in ranges:
        hit |= (leaf >= a) & (leaf <= b)
    exact = ((lon >= -50) & (lon <= 30) & (lat >= -20) & (lat <= 45)).mean()
    assert hit.mean() < 3.0 * exact  # <=3x overfetch at level 6


def test_bbox_s2_matches_plain_bbox(spark, sf_dir):
    import __spark_entry__ as entry

    got = {r.event_id for r in entry.queries()["bbox_s2"](spark, sf_dir).collect()}
    want = {r.event_id for r in entry.queries()["bbox"](spark, sf_dir).collect()}
    assert got == want and got
