"""Minimal pure-python Avro Object Container File codec.

Closes the last environment gate on the Avro ingest path
(``CNV/geomesa-convert-avro/.../AvroSimpleFeatureConverter.scala`` and the
AvroPath field access in ``AvroPath.scala``): when the spark-avro module is
not deployed, :func:`geomesa_spark.sources.convert.avro_ingest` falls back
to ``binaryFile`` + this decoder inside ``mapInPandas`` — fully
distributed (one task per container file, the reference's per-file ingest
granularity), no external libraries. The implementation follows the public
Avro 1.11 specification (format: zigzag-varint primitives, blocked
arrays/maps, union indices, OCF header/blocks/sync markers; codecs null +
deflate via raw zlib).

The encoder half exists for test fixtures only — the engine never needs to
WRITE Avro, but the tests must create real container files without
external dependencies.

Fallback-supported type subset: null, boolean, int, long, float, double,
string, enum, record, array, map, and unions of null with one branch.
``bytes``/``fixed`` require the spark-avro fast path (the fallback ships
rows as JSON, which has no lossless bytes representation).
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterator

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# primitive decode
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro long/int wire format)."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        v = b[0]
        acc |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


# ---------------------------------------------------------------------------
# schema-driven decode
# ---------------------------------------------------------------------------


def _resolve(schema: Any, named: dict) -> Any:
    if isinstance(schema, str) and schema in named:
        return named[schema]
    return schema


def _register(schema: Any, named: dict) -> None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        name = schema.get("name")
        if name:
            named[name] = schema
            ns = schema.get("namespace")
            if ns:
                named[f"{ns}.{name}"] = schema


def _register_all(schema: Any, named: dict) -> None:
    """Pre-walk a schema and register EVERY named type it defines.

    Registration during decode is lazy — a record first defined inside a
    ``["null", Rec]`` union branch would never register when the first
    value takes the null branch, and a later by-name reference ("Rec")
    would fail on a spec-valid file. Entry points call this once up
    front so name resolution never depends on data order.
    """
    if isinstance(schema, list):
        for b in schema:
            _register_all(b, named)
        return
    if isinstance(schema, dict):
        _register(schema, named)
        t = schema.get("type")
        if t == "record":
            for f in schema.get("fields", []):
                _register_all(f["type"], named)
        elif t == "array":
            _register_all(schema.get("items"), named)
        elif t == "map":
            _register_all(schema.get("values"), named)
        elif isinstance(t, (dict, list)):
            _register_all(t, named)


def _decode(buf: io.BytesIO, schema: Any, named: dict) -> Any:
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(buf, schema[idx], named)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _register(schema, named)
            return {
                f["name"]: _decode(buf, f["type"], named) for f in schema["fields"]
            }
        if t == "enum":
            _register(schema, named)
            return schema["symbols"][_read_long(buf)]
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)  # block byte size, unused
                    n = -n
                for _ in range(n):
                    out.append(_decode(buf, schema["items"], named))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(buf, schema["values"], named)
            return out
        if t == "fixed":
            _register(schema, named)
            return buf.read(schema["size"])
        return _decode(buf, t, named)  # {"type": "long", "logicalType": ...}
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported avro type: {schema!r}")


# ---------------------------------------------------------------------------
# container file
# ---------------------------------------------------------------------------


def read_header(data: bytes) -> tuple[Any, str, bytes, int]:
    """Parse the OCF header: (schema, codec, sync marker, body offset)."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, buf.tell()


def iter_container(data: bytes) -> Iterator[Any]:
    """Decode every record of an OCF byte string (codecs: null, deflate)."""
    schema, codec, sync, off = read_header(data)
    named: dict = {}
    _register_all(schema, named)
    buf = io.BytesIO(data)
    buf.seek(off)
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt container)")
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        bbuf = io.BytesIO(block)
        for _ in range(count):
            yield _decode(bbuf, schema, named)


# ---------------------------------------------------------------------------
# spark schema mapping
# ---------------------------------------------------------------------------

_PRIMITIVE_DDL = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "null": "string",  # all-null field; string is the least-surprising carrier
    "enum": "string",
}


def _type_ddl(schema: Any, named: dict) -> str:
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union: nullable single branch
        branches = [s for s in schema if s != "null"]
        if len(branches) != 1:
            raise ValueError(
                "fallback supports unions of null with one branch only "
                "(deploy spark-avro for general unions)"
            )
        return _type_ddl(branches[0], named)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _register(schema, named)
            inner = ", ".join(
                f"{f['name']}: {_type_ddl(f['type'], named)}" for f in schema["fields"]
            )
            return f"struct<{inner}>"
        if t == "enum":
            return "string"
        if t == "array":
            return f"array<{_type_ddl(schema['items'], named)}>"
        if t == "map":
            return f"map<string, {_type_ddl(schema['values'], named)}>"
        if t in ("bytes", "fixed"):
            raise ValueError(
                "bytes/fixed need the spark-avro fast path (JSON fallback "
                "has no lossless bytes carrier)"
            )
        return _type_ddl(t, named)
    if schema in ("bytes", "fixed"):
        raise ValueError(
            "bytes/fixed need the spark-avro fast path (JSON fallback has "
            "no lossless bytes carrier)"
        )
    if schema in _PRIMITIVE_DDL:
        return _PRIMITIVE_DDL[schema]
    raise ValueError(f"unsupported avro type: {schema!r}")


def schema_to_ddl(schema: Any) -> str:
    """Top-level record schema -> Spark DDL column list."""
    named: dict = {}
    _register_all(schema, named)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        raise ValueError("container schema must be a record at top level")
    return ", ".join(
        f"{f['name']} {_type_ddl(f['type'], named)}" for f in schema["fields"]
    )


# ---------------------------------------------------------------------------
# encoder (test-fixture writer)
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag (python ints: arithmetic shift is fine)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


def _encode(out: io.BytesIO, schema: Any, value: Any, named: dict) -> None:
    schema = _resolve(schema, named)
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            if (branch == "null") == (value is None):
                _write_long(out, i)
                _encode(out, branch, value, named)
                return
        raise ValueError("no matching union branch")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _register(schema, named)
            for f in schema["fields"]:
                _encode(out, f["type"], value[f["name"]], named)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    _encode(out, schema["items"], v, named)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(out, schema["values"], v, named)
            _write_long(out, 0)
            return
        if t == "fixed":
            out.write(value)
            return
        _encode(out, t, value, named)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif schema in ("int", "long"):
        _write_long(out, value)
    elif schema == "float":
        out.write(struct.pack("<f", value))
    elif schema == "double":
        out.write(struct.pack("<d", value))
    elif schema == "bytes":
        _write_bytes(out, value)
    elif schema == "string":
        _write_bytes(out, value.encode("utf-8"))
    else:
        raise ValueError(f"unsupported avro type: {schema!r}")


def write_container(schema: Any, records: list, codec: str = "null") -> bytes:
    """Serialize records into one OCF byte string (test-fixture writer)."""
    sync = bytes(range(16))  # deterministic fixtures
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)

    named: dict = {}
    _register_all(schema, named)
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec, named)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")
    _write_long(out, len(records))
    _write_long(out, len(block))
    out.write(block)
    out.write(sync)
    return out.getvalue()
