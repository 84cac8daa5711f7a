"""Vectorized geohash kernels (encode / decode / bbox / neighbors / cover).

Capability parity with the reference's geohash library
(``geomesa-utils/.../geohash/GeoHash.scala:82-395``, ``BoundingBox.scala``,
``GeohashUtils.scala`` decomposition) rebuilt from the public geohash spec:
lon/lat bisection with longitude taking the first (most significant) bit,
base-32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``.

Cells are represented two ways:
* string geohashes (for API/debug parity), and
* uint64 "cell ids" = ``(bits-interleaved value << 6) | precision_bits`` so a
  DataFrame can carry cells of mixed precision in one sortable integer column.
"""

from __future__ import annotations

import numpy as np

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_U = np.uint64


def _interleave_lonlat(lon: np.ndarray, lat: np.ndarray, bits: int) -> np.ndarray:
    """Geohash bit pattern: lon gets bit 0, 2, 4... counted from the MSB.

    For ``bits`` total bits, lon uses ceil(bits/2) bits and lat floor(bits/2).
    """
    nlon = (bits + 1) // 2
    nlat = bits // 2
    x = np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * (1 << nlon)).astype(np.int64)
    y = np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * (1 << nlat)).astype(np.int64)
    x = np.clip(x, 0, (1 << nlon) - 1).astype(np.uint64)
    y = np.clip(y, 0, (1 << nlat) - 1).astype(np.uint64)
    # spread and interleave with lon in the higher bit of each pair
    from geomesa_spark.cells.zcurve import _split1

    # lon takes the most-significant bit; with even total bits that places lon
    # on odd bit positions, with odd total bits on even positions
    if bits % 2 == 0:
        return (_split1(x) << _U(1)) | _split1(y)
    return _split1(x) | (_split1(y) << _U(1))


def geohash_int(lon, lat, precision: int) -> np.ndarray:
    """uint64 cell id at `precision` chars: (value << 6) | bits.

    Max precision 11 (55 bits + the 6 tag bits fit a uint64); precision
    12 would need 66 bits and silently wrap, colliding distant cells.
    """
    if precision > 11:
        raise ValueError(
            "geohash_int supports precision <= 11 (60+6 bits overflows "
            "uint64); use geohash_encode strings for precision 12"
        )
    bits = precision * 5
    v = _interleave_lonlat(lon, lat, bits)
    return (v << _U(6)) | _U(bits)


def geohash_encode(lon, lat, precision: int) -> np.ndarray:
    """Vectorized string geohash at `precision` characters."""
    bits = precision * 5
    v = _interleave_lonlat(lon, lat, bits)
    chars = np.empty((precision, len(v)), dtype="U1")
    lut = np.array(list(_BASE32))
    for i in range(precision):
        shift = _U(bits - 5 * (i + 1))
        chars[i] = lut[((v >> shift) & _U(0x1F)).astype(np.int64)]
    out = chars[0]
    for i in range(1, precision):
        out = np.char.add(out, chars[i])
    return out


def geohash_decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lon_min, lat_min, lon_max, lat_max) of one geohash string."""
    lon = [-180.0, 180.0]
    lat = [-90.0, 90.0]
    even = True
    for ch in gh:
        cd = _BASE32.index(ch)
        for bit in (16, 8, 4, 2, 1):
            rng = lon if even else lat
            mid = (rng[0] + rng[1]) / 2
            if cd & bit:
                rng[0] = mid
            else:
                rng[1] = mid
            even = not even
    return (lon[0], lat[0], lon[1], lat[1])


def geohash_neighbors(gh: str) -> list[str]:
    """The 8 neighbors of a geohash cell (by center-point re-encode)."""
    lon0, lat0, lon1, lat1 = geohash_decode_bbox(gh)
    dlon, dlat = lon1 - lon0, lat1 - lat0
    clon, clat = (lon0 + lon1) / 2, (lat0 + lat1) / 2
    out = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            lon = clon + dx * dlon
            lat = clat + dy * dlat
            if lat < -90.0 or lat > 90.0:
                continue
            if lon < -180.0:
                lon += 360.0
            elif lon > 180.0:
                lon -= 360.0
            out.append(str(geohash_encode(np.array([lon]), np.array([lat]), len(gh))[0]))
    return sorted(set(out) - {gh})


def geohash_cover_bbox(lon_min, lat_min, lon_max, lat_max, precision: int,
                       max_cells: int = 4096) -> list[str]:
    """All geohash cells at `precision` intersecting the bbox.

    Used as the coarse prefilter cell enumeration (mirrors the reference's
    ``RectangleGeoHashIterator``); falls back to a shorter precision if the
    enumeration would exceed ``max_cells``.
    """
    while precision > 1:
        cells = _enumerate_bbox(lon_min, lat_min, lon_max, lat_max, precision,
                                max_cells)
        if cells is not None and len(cells) <= max_cells:
            return cells
        precision -= 1
    return _enumerate_bbox(lon_min, lat_min, lon_max, lat_max, 1, max_cells) or []


def _enumerate_bbox(lon_min, lat_min, lon_max, lat_max, precision: int,
                    max_cells: int = 1 << 22):
    bits = precision * 5
    nlon = (bits + 1) // 2
    nlat = bits // 2
    x0 = int(np.clip(np.floor((lon_min + 180.0) / 360.0 * (1 << nlon)), 0, (1 << nlon) - 1))
    x1 = int(np.clip(np.floor((lon_max + 180.0) / 360.0 * (1 << nlon)), 0, (1 << nlon) - 1))
    y0 = int(np.clip(np.floor((lat_min + 90.0) / 180.0 * (1 << nlat)), 0, (1 << nlat) - 1))
    y1 = int(np.clip(np.floor((lat_max + 90.0) / 180.0 * (1 << nlat)), 0, (1 << nlat) - 1))
    # count-first bail: a rejected precision must cost arithmetic, not a
    # multi-million-cell meshgrid + string encode that the caller discards
    n = (x1 - x0 + 1) * (y1 - y0 + 1)
    if n > max_cells:
        return None
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    # decode cell centers then re-encode as strings
    lon = -180.0 + (gx.ravel() + 0.5) * (360.0 / (1 << nlon))
    lat = -90.0 + (gy.ravel() + 0.5) * (180.0 / (1 << nlat))
    return list(geohash_encode(lon, lat, precision))
