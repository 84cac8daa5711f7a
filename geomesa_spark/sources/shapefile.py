"""Native shapefile I/O (no geopandas/fiona — pure ``struct`` over the
public ESRI shapefile + dBASE specs).

The reference's shapefile ingest/export
(``UTL/geotools/GeneralShapefileIngest.scala``,
``TLS/FeatureExporter.scala`` shapefile path) handled small reference
layers (admin boundaries, query regions) — never the big side. Same here:
the parse/write happens driver-side and the rows land in / come from a
DataFrame; supported shapes are Point (1), PolyLine (3), Polygon (5),
with .dbf character/numeric attributes.

Layout notes (ESRI spec): .shp = 100-byte header (big-endian file code
9994 + little-endian shape type + bbox) then records of
(BE record#, BE content words, LE shape ...); .shx = same header + 8-byte
(offset, length) index records; .dbf = dBASE III header + fixed-width
ASCII records.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession


def _read_dbf(path: str) -> tuple[list[str], list[list]]:
    with open(path, "rb") as f:
        data = f.read()
    n_records = struct.unpack("<I", data[4:8])[0]
    header_size, record_size = struct.unpack("<HH", data[8:12])
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fdec = data[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows = []
    pos = header_size
    for _ in range(n_records):
        rec = data[pos:pos + record_size]
        pos += record_size
        if rec[:1] == b"*":  # deleted: placeholder keeps .shp index alignment
            rows.append(None)
            continue
        off, vals = 1, []
        for name, ftype, flen, fdec in fields:
            raw = rec[off:off + flen].decode("ascii", "replace").strip()
            off += flen
            if ftype == "N":
                if raw == "":
                    vals.append(None)
                elif fdec or "." in raw:
                    vals.append(float(raw))
                else:
                    vals.append(int(raw))
            else:
                vals.append(raw)
        rows.append(vals)
    return [f[0] for f in fields], rows


def _ring_wkt(pts: list[tuple[float, float]]) -> str:
    return "(" + ", ".join(f"{x!r} {y!r}" for x, y in pts) + ")"


def _parse_shp(path: str) -> list[str]:
    with open(path, "rb") as f:
        data = f.read()
    file_words = struct.unpack(">I", data[24:28])[0]
    end = file_words * 2
    out = []
    pos = 100
    while pos < end:
        _, content_words = struct.unpack(">II", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + content_words * 2]
        pos += 8 + content_words * 2
        stype = struct.unpack("<i", body[:4])[0]
        if stype == 0:  # null shape
            out.append(None)
        elif stype == 1:  # point
            x, y = struct.unpack("<2d", body[4:20])
            out.append(f"POINT ({x!r} {y!r})")
        elif stype in (3, 5):  # polyline / polygon
            n_parts, n_points = struct.unpack("<2i", body[36:44])
            parts = list(struct.unpack(f"<{n_parts}i", body[44:44 + 4 * n_parts]))
            coords_off = 44 + 4 * n_parts
            pts = [
                struct.unpack("<2d", body[coords_off + 16 * i:coords_off + 16 * i + 16])
                for i in range(n_points)
            ]
            bounds = parts + [n_points]
            rings = [pts[bounds[i]:bounds[i + 1]] for i in range(n_parts)]
            if stype == 3:
                if n_parts == 1:
                    out.append("LINESTRING " + _ring_wkt(rings[0]))
                else:
                    out.append(
                        "MULTILINESTRING ("
                        + ", ".join(_ring_wkt(r) for r in rings) + ")"
                    )
            else:
                out.append("POLYGON (" + ", ".join(_ring_wkt(r) for r in rings) + ")")
        else:
            raise ValueError(f"unsupported shapefile shape type {stype}")
    return out


def read_shapefile(spark: SparkSession, path: str) -> DataFrame:
    """``.shp`` (+ optional sibling ``.dbf``) -> DataFrame with a ``wkt``
    column plus the dbf attribute columns."""
    wkts = _parse_shp(path)
    base = path[:-4] if path.lower().endswith(".shp") else path
    dbf = base + ".dbf"
    if os.path.exists(dbf):
        names, rows = _read_dbf(dbf)
        # deleted .dbf records keep a None placeholder so attributes stay
        # paired with THEIR geometry; the pair is dropped together here
        data = [tuple(r) + (w,) for r, w in zip(rows, wkts) if r is not None]
        cols = names + ["wkt"]
    else:
        data = [(w,) for w in wkts]
        cols = ["wkt"]
    if not data:
        # empty shapefile: all-None rows defeat type inference — return an
        # explicitly-typed (all-string) empty frame
        schema = ", ".join(f"`{c}` string" for c in cols)
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(data, cols)


def write_shapefile_points(
    df: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    attrs: list[str] | None = None,
) -> None:
    """Point-feature shapefile export (.shp/.shx/.dbf). ``df`` is collected
    — shapefile export targets are small result sets by design (the
    reference's FeatureExporter streams to one local file too)."""
    rows = df.select(lon, lat, *(attrs or [])).collect()
    xs = [float(r[0]) for r in rows] or [0.0]
    ys = [float(r[1]) for r in rows] or [0.0]
    bbox = (min(xs), min(ys), max(xs), max(ys))

    def header(file_words: int, shape_type: int) -> bytes:
        return (
            struct.pack(">i", 9994) + b"\x00" * 20
            + struct.pack(">i", file_words)
            + struct.pack("<ii", 1000, shape_type)
            + struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0)
        )

    rec_words = (4 + 16) // 2  # shape type + x + y
    shp_records = b""
    shx_records = b""
    offset_words = 50
    for i, r in enumerate(rows):
        content = struct.pack("<i2d", 1, float(r[0]), float(r[1]))
        shp_records += struct.pack(">ii", i + 1, rec_words) + content
        shx_records += struct.pack(">ii", offset_words, rec_words)
        offset_words += 4 + rec_words

    base = path[:-4] if path.lower().endswith(".shp") else path
    with open(base + ".shp", "wb") as f:
        f.write(header(50 + len(shp_records) // 2, 1) + shp_records)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + len(shx_records) // 2, 1) + shx_records)

    attrs = attrs or []
    widths = []
    for j, a in enumerate(attrs):
        vals = [str(r[2 + j]) if r[2 + j] is not None else "" for r in rows]
        widths.append(min(254, max(1, max((len(v) for v in vals), default=1))))
    if not attrs:  # dbf needs >= 1 field
        attrs_meta = [("FID", "N", 9)]
        recs = [[str(i)] for i in range(len(rows))]
    else:
        attrs_meta = [(a[:10].upper(), "C", w) for a, w in zip(attrs, widths)]
        recs = [
            [str(r[2 + j]) if r[2 + j] is not None else "" for j in range(len(attrs))]
            for r in rows
        ]
    record_size = 1 + sum(w for _, _, w in attrs_meta)
    header_size = 32 + 32 * len(attrs_meta) + 1
    dbf = struct.pack("<B3BIHH20x", 3, 95, 1, 1, len(rows), header_size, record_size)
    for name, ftype, w in attrs_meta:
        dbf += struct.pack(
            "<11sc4xBB14x", name.encode("ascii"), ftype.encode("ascii"), w, 0
        )
    dbf += b"\x0d"
    for rec in recs:
        line = b" "
        for (name, ftype, w), v in zip(attrs_meta, rec):
            enc = v.encode("ascii", "replace")[:w]
            line += enc.rjust(w) if ftype == "N" else enc.ljust(w)
        dbf += line
    dbf += b"\x1a"
    with open(base + ".dbf", "wb") as f:
        f.write(dbf)
