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
        elif stype == 8:  # multipoint
            (n_points,) = struct.unpack("<i", body[36:40])
            pts = [
                struct.unpack("<2d", body[40 + 16 * i:40 + 16 * i + 16])
                for i in range(n_points)
            ]
            out.append(
                "MULTIPOINT (" + ", ".join(f"{x!r} {y!r}" for x, y in pts) + ")"
            )
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
    _write_dbf(base, attrs or [], [list(r[2:]) for r in rows])


def _write_dbf(base: str, attrs: list[str], recs_vals: list[list]) -> None:
    """dBASE III sidecar: one "C" field per attr (stringified values), or a
    synthetic numeric FID field when no attrs were requested (dbf requires
    at least one field)."""
    n = len(recs_vals)
    if not attrs:
        attrs_meta = [("FID", "N", 9)]
        recs = [[str(i)] for i in range(n)]
    else:
        recs = [
            [str(v) if v is not None else "" for v in vals] for vals in recs_vals
        ]
        widths = [
            min(254, max(1, max((len(r[j]) for r in recs), default=1)))
            for j in range(len(attrs))
        ]
        attrs_meta = [(a[:10].upper(), "C", w) for a, w in zip(attrs, widths)]
    record_size = 1 + sum(w for _, _, w in attrs_meta)
    header_size = 32 + 32 * len(attrs_meta) + 1
    dbf = struct.pack("<B3BIHH20x", 3, 95, 1, 1, n, header_size, record_size)
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


_KIND_TO_STYPE = {
    "POINT": 1,
    "LINESTRING": 3,
    "MULTILINESTRING": 3,
    "POLYGON": 5,
    "MULTIPOLYGON": 5,
    "MULTIPOINT": 8,
}


def _shape_body(geom) -> tuple[int, bytes]:
    """One geometry -> (shape type, little-endian record content) per the
    ESRI spec. Rings/parts are written in the order the WKT gives them
    (the round-trip-exact choice; ring winding is the caller's concern,
    as in the reference exporter which writes the geometry as-is)."""
    if geom.kind == "POINT":
        x, y = (float(v) for v in geom.rings[0][0])
        return 1, struct.pack("<i2d", 1, x, y)
    stype = _KIND_TO_STYPE[geom.kind]
    if geom.kind == "MULTIPOLYGON":
        rings = [r for p in geom.parts for r in p.rings]
    else:
        rings = geom.rings
    x0, y0, x1, y1 = geom.bbox()
    pts = [(float(x), float(y)) for r in rings for x, y in r]
    if stype == 8:  # multipoint: bbox + npoints + points (no parts array)
        body = struct.pack("<i4di", 8, x0, y0, x1, y1, len(pts))
        for x, y in pts:
            body += struct.pack("<2d", x, y)
        return 8, body
    offsets, acc = [], 0
    for r in rings:
        offsets.append(acc)
        acc += len(r)
    body = struct.pack("<i4d2i", stype, x0, y0, x1, y1, len(rings), len(pts))
    body += struct.pack(f"<{len(offsets)}i", *offsets)
    for x, y in pts:
        body += struct.pack("<2d", x, y)
    return stype, body


def write_shapefile(
    df: DataFrame,
    path: str,
    wkt: str = "wkt",
    attrs: list[str] | None = None,
) -> None:
    """General shapefile export (.shp/.shx/.dbf) from a WKT column.

    Parity with the reference's shapefile FeatureExporter
    (``TLS/FeatureExporter.scala:62-96``), which exports arbitrary geometry
    types: Point (1), PolyLine (3), Polygon (5), MultiPoint (8) records,
    null (0) records for NULL wkt rows, attributes to the .dbf sidecar.
    One shape type per file (ESRI spec); mixing non-null kinds that map to
    different shape types raises. ``df`` is collected — export targets are
    small result sets by design (the reference streams to one local file
    too)."""
    from geomesa_spark.geom.wkt import parse_wkt

    rows = df.select(wkt, *(attrs or [])).collect()
    geoms = [parse_wkt(r[0]) if r[0] is not None else None for r in rows]
    shaped = [(_shape_body(g) if g is not None else (0, struct.pack("<i", 0)))
              for g in geoms]
    stypes = {s for s, _ in shaped if s != 0}
    if len(stypes) > 1:
        raise ValueError(f"mixed shape types in one shapefile: {sorted(stypes)}")
    file_stype = stypes.pop() if stypes else 0
    boxes = [g.bbox() for g in geoms if g is not None]
    if boxes:
        bbox = (
            min(b[0] for b in boxes), min(b[1] for b in boxes),
            max(b[2] for b in boxes), max(b[3] for b in boxes),
        )
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)

    def header(file_words: int) -> bytes:
        return (
            struct.pack(">i", 9994) + b"\x00" * 20
            + struct.pack(">i", file_words)
            + struct.pack("<ii", 1000, file_stype)
            + struct.pack("<8d", bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0)
        )

    shp_records = b""
    shx_records = b""
    offset_words = 50
    for i, (_, body) in enumerate(shaped):
        rec_words = len(body) // 2
        shp_records += struct.pack(">ii", i + 1, rec_words) + body
        shx_records += struct.pack(">ii", offset_words, rec_words)
        offset_words += 4 + rec_words

    base = path[:-4] if path.lower().endswith(".shp") else path
    with open(base + ".shp", "wb") as f:
        f.write(header(50 + len(shp_records) // 2) + shp_records)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + len(shx_records) // 2) + shx_records)
    _write_dbf(base, attrs or [], [list(r[1:]) for r in rows])
