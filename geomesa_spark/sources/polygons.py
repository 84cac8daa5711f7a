"""Deterministic reference polygon sets (boxes + triangles).

The stand-in for a real reference polygon layer (admin boundaries, AOIs):
reproducible everywhere (no external data), corners at *.005 so synthetic
grid points never sit exactly on an edge. Used by bench.py and the
spark-submit pipeline.
"""

from __future__ import annotations


def reference_polygons(n_boxes: int = 32, n_tris: int = 16) -> list[tuple[str, str]]:
    polys = []
    for i in range(n_boxes):
        x0 = -170.005 + (i % 8) * 42.0
        y0 = -60.005 + (i // 8) * 28.0
        x1, y1 = x0 + 10.0, y0 + 8.0
        polys.append(
            (f"b{i}", f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))")
        )
    for i in range(n_tris):
        x = -160.005 + (i % 16) * 20.0
        y = -40.005 + (i % 5) * 15.0
        polys.append(
            (f"t{i}", f"POLYGON(({x} {y}, {x + 12.0} {y + 2.0}, {x + 5.0} {y + 14.0}, {x} {y}))")
        )
    return polys
