"""Minimal WKT geometry model (pure numpy, no JTS/GEOS dependency).

Covers the geometry types the reference supports
(``geomesa-utils/.../geotools/SimpleFeatureTypes.scala:401-425``): Point,
LineString, Polygon and their Multi* variants. Geometries are small,
driver-side objects (query constants / polygon build sides); per-row point
data stays as plain ``lon``/``lat`` double columns (the reference likewise
derives x/y for points).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Geometry:
    kind: str  # POINT | LINESTRING | POLYGON | MULTIPOLYGON | MULTIPOINT | MULTILINESTRING
    # for POLYGON: rings[0] is the shell, rest are holes; each ring (N,2) float64
    # for MULTIPOLYGON: parts is a list of Geometry(POLYGON)
    rings: list = field(default_factory=list)
    parts: list = field(default_factory=list)

    def bbox(self) -> tuple[float, float, float, float]:
        # branch on how the geometry is STORED, not on its kind string:
        # MULTIPOINT/MULTILINESTRING live in rings with parts=[] — a
        # kind-based MULTI* test would min() over an empty sequence
        if self.parts:
            boxes = [p.bbox() for p in self.parts]
            return (
                min(b[0] for b in boxes),
                min(b[1] for b in boxes),
                max(b[2] for b in boxes),
                max(b[3] for b in boxes),
            )
        pts = np.vstack(self.rings)
        return (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )

    def polygons(self) -> list["Geometry"]:
        """Flatten to a list of simple POLYGONs (for PIP kernels)."""
        if self.kind == "POLYGON":
            return [self]
        if self.kind == "MULTIPOLYGON":
            return [q for p in self.parts for q in p.polygons()]
        raise ValueError(f"not a polygonal geometry: {self.kind}")

    def to_wkt(self) -> str:
        def ring(r):
            return "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in r) + ")"

        if self.kind == "POINT":
            x, y = self.rings[0][0]
            return f"POINT ({x:.10g} {y:.10g})"
        if self.kind == "LINESTRING":
            return "LINESTRING " + ring(self.rings[0])
        if self.kind == "POLYGON":
            return "POLYGON (" + ", ".join(ring(r) for r in self.rings) + ")"
        if self.kind == "MULTIPOLYGON":
            return "MULTIPOLYGON (" + ", ".join(
                "(" + ", ".join(ring(r) for r in p.rings) + ")" for p in self.parts
            ) + ")"
        if self.kind == "MULTIPOINT":
            pts = self.rings[0]
            return "MULTIPOINT (" + ", ".join(
                f"{x:.10g} {y:.10g}" for x, y in pts) + ")"
        if self.kind == "MULTILINESTRING":
            return "MULTILINESTRING (" + ", ".join(ring(r) for r in self.rings) + ")"
        if self.kind == "GEOMETRYCOLLECTION":
            return ("GEOMETRYCOLLECTION ("
                    + ", ".join(p.to_wkt() for p in self.parts) + ")")
        raise ValueError(self.kind)


_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _parse_ring(text: str) -> np.ndarray:
    pairs = re.findall(rf"({_NUM})\s+({_NUM})", text)
    return np.array([[float(a), float(b)] for a, b in pairs], dtype=np.float64)


def parse_wkt(wkt: str) -> Geometry:
    s = wkt.strip()
    head = s.split("(", 1)[0].strip().upper().replace(" ", "")
    body = s[s.index("(") :]

    if head == "POINT":
        return Geometry("POINT", rings=[_parse_ring(body)])
    if head == "LINESTRING":
        return Geometry("LINESTRING", rings=[_parse_ring(body)])
    if head == "POLYGON":
        rings = [_parse_ring(r) for r in re.findall(r"\(([^()]+)\)", body)]
        return Geometry("POLYGON", rings=rings)
    if head == "MULTIPOLYGON":
        parts = []
        for poly_body in re.findall(r"\((?:\s*\([^()]+\)\s*,?)+\)", body[1:-1]):
            rings = [_parse_ring(r) for r in re.findall(r"\(([^()]+)\)", poly_body)]
            parts.append(Geometry("POLYGON", rings=rings))
        return Geometry("MULTIPOLYGON", parts=parts)
    if head == "MULTIPOINT":
        ring = _parse_ring(body)
        return Geometry("MULTIPOINT", rings=[ring])
    if head == "MULTILINESTRING":
        rings = [_parse_ring(r) for r in re.findall(r"\(([^()]+)\)", body)]
        return Geometry("MULTILINESTRING", rings=rings)
    if head == "GEOMETRYCOLLECTION":
        # heterogeneous members, each a full WKT geometry: split the inner
        # text on commas at paren-depth 0 and recurse
        inner = body.strip()[1:-1]
        parts, depth, start = [], 0, 0
        for i, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(inner[start:i])
                start = i + 1
        parts.append(inner[start:])
        return Geometry(
            "GEOMETRYCOLLECTION", parts=[parse_wkt(p) for p in parts if p.strip()]
        )
    raise ValueError(f"unsupported WKT: {head}")


def box(lon_min: float, lat_min: float, lon_max: float, lat_max: float) -> Geometry:
    """Axis-aligned box polygon (the BBOX predicate geometry)."""
    ring = np.array(
        [
            [lon_min, lat_min],
            [lon_max, lat_min],
            [lon_max, lat_max],
            [lon_min, lat_max],
            [lon_min, lat_min],
        ],
        dtype=np.float64,
    )
    return Geometry("POLYGON", rings=[ring])
