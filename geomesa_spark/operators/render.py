"""Density-surface rendering (the WMS heatmap endpoint's core).

The reference renders density query results to colored map tiles
(``ACC/process/temporalDensity``/WMS plumbing around ``DensityIterator``
output). Rebuilt without any imaging dependency: the distributed part is
the density grid aggregation (``operators/aggregations.density`` — cells
only, never pixels, shuffled); rendering collects the SMALL (W x H) grid,
maps weights through a color ramp in numpy, and writes a real PNG with
nothing but ``zlib`` + ``struct`` (the public PNG format: IHDR/IDAT/IEND
chunks, filter-byte-0 scanlines).

At scale the heavy side stays in Spark — a 4096x4096 tile is 16M cells
(~128 MB collected at most, usually far sparser); everything upstream of
the collect is the same partial/final hash agg as every other aggregation.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame

# simple blue -> yellow -> red heat ramp (anchor points, RGBA)
_RAMP = np.array(
    [
        [0, 0, 64, 0],        # empty: transparent dark blue
        [0, 64, 255, 180],
        [0, 255, 255, 210],
        [255, 255, 0, 235],
        [255, 0, 0, 255],
    ],
    dtype=np.float64,
)


def colorize(weights: np.ndarray, gamma: float = 0.5) -> np.ndarray:
    """(H, W) weights -> (H, W, 4) uint8 RGBA via the heat ramp.

    Weights normalize to [0, 1] by the max (gamma-compressed so sparse
    heatmaps stay visible — the reference applies the same trick via its
    styling); zero cells stay transparent.
    """
    w = np.asarray(weights, dtype=np.float64)
    mx = w.max()
    t = np.zeros_like(w) if mx <= 0 else np.power(w / mx, gamma)
    pos = t * (len(_RAMP) - 1)
    i0 = np.clip(np.floor(pos).astype(int), 0, len(_RAMP) - 2)
    frac = (pos - i0)[..., None]
    rgba = _RAMP[i0] * (1.0 - frac) + _RAMP[i0 + 1] * frac
    rgba[w <= 0] = [0, 0, 0, 0]
    return np.clip(rgba, 0, 255).astype(np.uint8)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgba: np.ndarray) -> bytes:
    """(H, W, 4) uint8 -> PNG bytes (8-bit RGBA, filter 0 scanlines)."""
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def render_density_png(
    grid: DataFrame, width: int, height: int, gamma: float = 0.5
) -> bytes:
    """Density-grid DataFrame (i, j, weight) -> PNG bytes.

    Row 0 of the image is the TOP (j = height-1), per map-tile convention.
    The grid is the output of :func:`aggregations.density` /
    ``density_geometries`` — already aggregated, small, safe to collect.
    """
    img = np.zeros((height, width), dtype=np.float64)
    for r in grid.select("i", "j", "weight").collect():
        i, j = int(r["i"]), int(r["j"])
        if 0 <= i < width and 0 <= j < height:
            img[height - 1 - j, i] = float(r["weight"])
    return encode_png(colorize(img, gamma=gamma))
