"""Vectorized Z-order (Morton) space and space-time curves.

Capability parity with the reference's ``Z3`` curve
(``geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/Z3.scala:51-255``,
``SpaceFillingCurve.scala:28-44``, week binning
``geomesa-accumulo/.../data/tables/Z3Table.scala:40-51``): 21-bit lon, 21-bit
lat, 20-bit seconds-in-week, interleaved x,y,t from the least-significant bit
of each group; datasets are binned by epoch week (weeks since 1970-01-01).

The implementation here is written from scratch with the standard public
magic-mask bit-spreading construction (Morton codes, "Bit Twiddling Hacks" /
libmorton) and a prefix-tree range decomposition in the spirit of
Tropf & Herzog (1981) — the same public algorithm family the reference uses.

Everything operates on numpy arrays (uint64) so encode/decode run vectorized
inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SECONDS_PER_WEEK = 7 * 24 * 60 * 60  # 604800 < 2**20

_U = np.uint64

# ---------------------------------------------------------------------------
# bit spreading / compaction (public magic-mask construction)
# ---------------------------------------------------------------------------


def _split1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each value so consecutive bits land 2 apart."""
    x = x.astype(np.uint64) & _U(0xFFFFFFFF)
    x = (x | (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x3333333333333333)
    x = (x | (x << _U(1))) & _U(0x5555555555555555)
    return x


def _combine1(z: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_split1` — gather every 2nd bit."""
    z = z.astype(np.uint64) & _U(0x5555555555555555)
    z = (z | (z >> _U(1))) & _U(0x3333333333333333)
    z = (z | (z >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    z = (z | (z >> _U(4))) & _U(0x00FF00FF00FF00FF)
    z = (z | (z >> _U(8))) & _U(0x0000FFFF0000FFFF)
    z = (z | (z >> _U(16))) & _U(0x00000000FFFFFFFF)
    return z


def _split2(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of each value so consecutive bits land 3 apart."""
    x = x.astype(np.uint64) & _U(0x1FFFFF)
    x = (x | (x << _U(32))) & _U(0x1F00000000FFFF)
    x = (x | (x << _U(16))) & _U(0x1F0000FF0000FF)
    x = (x | (x << _U(8))) & _U(0x100F00F00F00F00F)
    x = (x | (x << _U(4))) & _U(0x10C30C30C30C30C3)
    x = (x | (x << _U(2))) & _U(0x1249249249249249)
    return x


def _combine2(z: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_split2` — gather every 3rd bit."""
    z = z.astype(np.uint64) & _U(0x1249249249249249)
    z = (z | (z >> _U(2))) & _U(0x10C30C30C30C30C3)
    z = (z | (z >> _U(4))) & _U(0x100F00F00F00F00F)
    z = (z | (z >> _U(8))) & _U(0x1F0000FF0000FF)
    z = (z | (z >> _U(16))) & _U(0x1F00000000FFFF)
    z = (z | (z >> _U(32))) & _U(0x1FFFFF)
    return z


# ---------------------------------------------------------------------------
# dimension normalization
# ---------------------------------------------------------------------------


def _normalize(values: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Map [lo, hi] -> [0, 2**bits - 1] integers (clamped, floor binning)."""
    n = (np.asarray(values, dtype=np.float64) - lo) / (hi - lo)
    scaled = np.floor(n * (1 << bits)).astype(np.int64)
    return np.clip(scaled, 0, (1 << bits) - 1).astype(np.uint64)


def _denormalize(cells: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Integer bin -> bin-center float value."""
    width = (hi - lo) / float(1 << bits)
    return lo + (cells.astype(np.float64) + 0.5) * width


def epoch_week(unix_seconds: np.ndarray) -> np.ndarray:
    """Weeks since 1970-01-01 (the reference's Z3 epoch-week short prefix)."""
    return np.floor_divide(np.asarray(unix_seconds, dtype=np.int64), SECONDS_PER_WEEK)


def seconds_in_week(unix_seconds: np.ndarray) -> np.ndarray:
    """Seconds offset inside the epoch week, in [0, 604800)."""
    return np.mod(np.asarray(unix_seconds, dtype=np.int64), SECONDS_PER_WEEK)


# ---------------------------------------------------------------------------
# curve definitions
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Dim:
    lo: float
    hi: float
    bits: int


class Z2:
    """2-D Morton curve over (lon, lat), 31 bits per dimension (62-bit keys)."""

    BITS = 31
    DIMS = 2
    TOTAL_BITS = 62

    dims = (_Dim(-180.0, 180.0, BITS), _Dim(-90.0, 90.0, BITS))

    @classmethod
    def encode(cls, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        x = _normalize(lon, -180.0, 180.0, cls.BITS)
        y = _normalize(lat, -90.0, 90.0, cls.BITS)
        return cls.encode_ints(x, y)

    @classmethod
    def encode_ints(cls, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return _split1(x) | (_split1(y) << _U(1))

    @classmethod
    def decode_ints(cls, z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        z = np.asarray(z, dtype=np.uint64)
        return _combine1(z), _combine1(z >> _U(1))

    @classmethod
    def decode(cls, z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        x, y = cls.decode_ints(z)
        return (
            _denormalize(x, -180.0, 180.0, cls.BITS),
            _denormalize(y, -90.0, 90.0, cls.BITS),
        )

    @classmethod
    def ranges(cls, lon_min, lat_min, lon_max, lat_max, max_ranges: int = 200,
               max_recurse: int = 32) -> list[tuple[int, int]]:
        qmin = (
            int(_normalize(np.array([lon_min]), -180.0, 180.0, cls.BITS)[0]),
            int(_normalize(np.array([lat_min]), -90.0, 90.0, cls.BITS)[0]),
        )
        qmax = (
            int(_normalize(np.array([lon_max]), -180.0, 180.0, cls.BITS)[0]),
            int(_normalize(np.array([lat_max]), -90.0, 90.0, cls.BITS)[0]),
        )
        return _zranges(cls.DIMS, cls.BITS, qmin, qmax, max_ranges, max_recurse)


class Z3:
    """3-D Morton curve over (lon, lat, seconds-in-week): 21/21/20 bits.

    Matches the reference's dimension split
    (``geomesa-z3/.../curve/Z3.scala:51``: x,y 21 bits, t 20 bits) so key
    density / prefix behavior is comparable; keys fit in the low 63 bits of
    an int64 and sort identically as signed or unsigned.
    """

    BITS = 21
    DIMS = 3
    TOTAL_BITS = 63

    @classmethod
    def encode(cls, lon, lat, t_seconds) -> np.ndarray:
        """(lon, lat, seconds-in-week) -> z3 uint64."""
        x = _normalize(lon, -180.0, 180.0, cls.BITS)
        y = _normalize(lat, -90.0, 90.0, cls.BITS)
        t = np.asarray(t_seconds, dtype=np.int64)
        t = np.clip(t, 0, SECONDS_PER_WEEK - 1).astype(np.uint64)
        return cls.encode_ints(x, y, t)

    @classmethod
    def encode_ints(cls, x, y, t) -> np.ndarray:
        return _split2(x) | (_split2(y) << _U(1)) | (_split2(t) << _U(2))

    @classmethod
    def decode_ints(cls, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        z = np.asarray(z, dtype=np.uint64)
        return _combine2(z), _combine2(z >> _U(1)), _combine2(z >> _U(2))

    @classmethod
    def decode(cls, z) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        x, y, t = cls.decode_ints(z)
        return (
            _denormalize(x, -180.0, 180.0, cls.BITS),
            _denormalize(y, -90.0, 90.0, cls.BITS),
            t.astype(np.int64),  # raw seconds bin (1-second-ish resolution lost: bin floor)
        )

    @classmethod
    def ranges(cls, lon_min, lat_min, lon_max, lat_max, t_min: int, t_max: int,
               max_ranges: int = 200, max_recurse: int = 21) -> list[tuple[int, int]]:
        """Covering z-ranges for a (bbox, seconds-in-week interval) query.

        Returns inclusive (lo, hi) uint64 ranges; a guaranteed superset of the
        z-keys of matching points (the residual exact filter removes the rest),
        mirroring ``Z3.zranges`` (`geomesa-z3/.../Z3.scala:111-154`).
        """
        qmin = (
            int(_normalize(np.array([lon_min]), -180.0, 180.0, cls.BITS)[0]),
            int(_normalize(np.array([lat_min]), -90.0, 90.0, cls.BITS)[0]),
            max(0, min(int(t_min), SECONDS_PER_WEEK - 1)),
        )
        qmax = (
            int(_normalize(np.array([lon_max]), -180.0, 180.0, cls.BITS)[0]),
            int(_normalize(np.array([lat_max]), -90.0, 90.0, cls.BITS)[0]),
            max(0, min(int(t_max), SECONDS_PER_WEEK - 1)),
        )
        return _zranges(cls.DIMS, cls.BITS, qmin, qmax, max_ranges, max_recurse)


# ---------------------------------------------------------------------------
# prefix-tree range cover
# ---------------------------------------------------------------------------


def _zranges(dims: int, bits: int, qmin: tuple, qmax: tuple,
             max_ranges: int, max_recurse: int) -> list[tuple[int, int]]:
    """Cover the integer box [qmin, qmax] with z-key ranges.

    Prefix-tree decomposition: starting from the root cell (all of z space),
    recursively split into 2**dims children (one bit per dimension per level);
    a child fully inside the query box emits its whole z range, a disjoint
    child is dropped, a partial child recurses until ``max_recurse`` levels or
    the range budget is hit (then it emits its covering range). Guarantees a
    superset cover. Adjacent/overlapping ranges are merged at the end.
    """
    out: list[tuple[int, int]] = []
    # stack entries: (prefix, depth, mins, maxs) where mins/maxs are the
    # per-dimension integer extents of the cell at `depth` consumed bits.
    full = (1 << bits) - 1
    stack = [(0, 0, tuple(0 for _ in range(dims)), tuple(full for _ in range(dims)))]
    budget = max_ranges * 4  # soft cap on emitted (pre-merge) ranges

    while stack:
        prefix, depth, mins, maxs = stack.pop()
        rem = dims * (bits - depth)
        lo = prefix << rem
        hi = ((prefix + 1) << rem) - 1

        inside = all(qmin[d] <= mins[d] and maxs[d] <= qmax[d] for d in range(dims))
        if inside:
            out.append((lo, hi))
            continue
        disjoint = any(maxs[d] < qmin[d] or mins[d] > qmax[d] for d in range(dims))
        if disjoint:
            continue
        if depth >= min(bits, max_recurse) or len(out) >= budget:
            out.append((lo, hi))  # give up refining: still a superset
            continue

        half = 1 << (bits - depth - 1)
        for child in range(1 << dims):
            cmins = []
            cmaxs = []
            for d in range(dims):
                bit = (child >> d) & 1
                if bit:
                    cmins.append(mins[d] + half)
                    cmaxs.append(maxs[d])
                else:
                    cmins.append(mins[d])
                    cmaxs.append(mins[d] + half - 1)
            stack.append(((prefix << dims) | child, depth + 1, tuple(cmins), tuple(cmaxs)))

    out.sort()
    merged: list[list[int]] = []
    for lo, hi in out:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    # if still over budget, coalesce the closest-gap pairs until under
    while len(merged) > max_ranges:
        gaps = [(merged[i + 1][0] - merged[i][1], i) for i in range(len(merged) - 1)]
        _, i = min(gaps)
        merged[i][1] = merged[i + 1][1]
        del merged[i + 1]
    return [(lo, hi) for lo, hi in merged]
