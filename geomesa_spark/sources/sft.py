"""SimpleFeatureType spec-string parser.

The reference's canonical schema surface is a one-line spec string
(``UTL/geotools/SimpleFeatureTypes.scala:540-584`` SpecParser)::

    "id:Integer:index=true,dtg:Date,*geom:Point:srid=4326,
     ct:List[String],mt:Map[String,Double];table.splitter=...,
     table.splitter.options=k1:v1,k2:v2"

* attributes separated by ``,`` (bracket-aware: ``Map[String,Double]``),
  fields within an attribute by ``:``
* a ``*`` name prefix marks the default geometry
* per-attribute options are ``key=value`` pairs (``index=true|full|join|
  none``, ``cardinality=high|low``, ``srid=4326``, ...)
* an optional ``;``-suffix carries feature-level options
  (``table.splitter`` + ``table.splitter.options`` with ``k:v`` entries)
* ALL whitespace is stripped before parsing (reference ``strip``)

``parse_spec_string`` returns the attribute list plus the engine-schema
fields the CLI's ``_schema.json`` needs (default geometry, dtg candidate,
attr indexes, cardinalities); ``to_spec_string`` re-renders a parsed spec
(normalized round-trip, used by ``describe``).
"""

from __future__ import annotations

import re

# reference simpleTypeMap (SimpleFeatureTypes.scala:400-426), normalized to
# one canonical name per type; values are the Spark DDL type used at ingest
SIMPLE_TYPES = {
    "String": "string",
    "Integer": "int",
    "Long": "bigint",
    "Double": "double",
    "Float": "float",
    "Boolean": "boolean",
    "UUID": "string",
    "Date": "timestamp",
    "Bytes": "binary",
}

_SIMPLE_ALIASES = {
    "string": "String", "java.lang.String": "String",
    "int": "Integer", "Int": "Integer", "0": "Integer",
    "java.lang.Integer": "Integer",
    "long": "Long", "java.lang.Long": "Long",
    "double": "Double", "java.lang.Double": "Double", "0.0": "Double",
    "float": "Float", "java.lang.Float": "Float", "0.0f": "Float",
    "boolean": "Boolean", "java.lang.Boolean": "Boolean",
    "true": "Boolean", "false": "Boolean",
}

GEOMETRY_TYPES = [
    "Geometry", "Point", "LineString", "Polygon", "MultiPoint",
    "MultiLineString", "MultiPolygon", "GeometryCollection",
]

_LIST_ALIASES = {"list", "List", "java.util.List"}
_MAP_ALIASES = {"map", "Map", "java.util.Map"}

_OPT_KEY = re.compile(r"^[a-zA-Z0-9_.\-]+$")


class SpecError(ValueError):
    pass


def _canon_simple(t: str) -> str:
    if t in SIMPLE_TYPES:
        return t
    if t in _SIMPLE_ALIASES:
        return _SIMPLE_ALIASES[t]
    raise SpecError(f"unknown simple type: {t!r}")


def _split_top(s: str, sep: str) -> list[str]:
    """Split on `sep` outside [] brackets (Map[String,Double] is one token)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth < 0:
                raise SpecError(f"unbalanced ']' in {s!r}")
        if ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if depth:
        raise SpecError(f"unbalanced '[' in {s!r}")
    out.append("".join(cur))
    return out


def _parse_type(t: str) -> dict:
    """One attribute type token -> {kind, type[, key_type, value_type]}."""
    if t in GEOMETRY_TYPES:
        return {"kind": "geometry", "type": t}
    if t in SIMPLE_TYPES or t in _SIMPLE_ALIASES:
        return {"kind": "simple", "type": _canon_simple(t)}
    m = re.match(r"^([A-Za-z.]+)(?:\[(.*)\])?$", t)
    if not m:
        raise SpecError(f"bad type token: {t!r}")
    outer, inner = m.group(1), m.group(2)
    if outer in _LIST_ALIASES:
        elem = _canon_simple(inner) if inner else "String"
        return {"kind": "list", "type": f"List[{elem}]", "element_type": elem}
    if outer in _MAP_ALIASES:
        if inner:
            kv = [x.strip() for x in inner.split(",")]
            if len(kv) != 2:
                raise SpecError(f"Map takes two type params: {t!r}")
            kt, vt = _canon_simple(kv[0]), _canon_simple(kv[1])
        else:
            kt = vt = "String"
        return {"kind": "map", "type": f"Map[{kt},{vt}]",
                "key_type": kt, "value_type": vt}
    if inner is not None:
        raise SpecError(f"only List/Map take type params: {t!r}")
    return {"kind": "simple", "type": _canon_simple(t)}


def spark_type(attr: dict) -> str:
    """Spark DDL type for a parsed attribute (geometries carry WKT)."""
    kind = attr["kind"]
    if kind == "simple":
        return SIMPLE_TYPES[attr["type"]]
    if kind == "geometry":
        return "string"  # WKT column (points additionally get lon/lat)
    if kind == "list":
        return f"array<{SIMPLE_TYPES[attr['element_type']]}>"
    if kind == "map":
        return (f"map<{SIMPLE_TYPES[attr['key_type']]},"
                f"{SIMPLE_TYPES[attr['value_type']]}>")
    raise SpecError(f"unknown kind {kind!r}")


def parse_spec_string(spec: str) -> dict:
    """Parse a full SFT spec string.

    Returns ``{"attributes": [...], "feature_options": {...}}`` where each
    attribute is ``{name, kind, type, default, options}`` (+ list/map type
    params). Mirrors SpecParser semantics: whitespace stripped everywhere,
    ``index=`` values normalized to full/join/none (bare booleans mean
    join-coverage, SpecParser.optionToIndexCoverage), unknown option keys
    preserved verbatim.
    """
    s = re.sub(r"\s+", "", spec)
    if not s:
        raise SpecError("empty spec")
    attr_part, _, feat_part = s.partition(";")
    attributes = []
    for token in _split_top(attr_part, ","):
        if not token:
            raise SpecError(f"empty attribute in spec: {spec!r}")
        fields = _split_top(token, ":")
        if len(fields) < 2:
            raise SpecError(f"attribute needs name:type, got {token!r}")
        name, type_tok = fields[0], fields[1]
        default = name.startswith("*")
        if default:
            name = name[1:]
        if not name:
            raise SpecError(f"empty attribute name in {token!r}")
        attr = _parse_type(type_tok)
        opts = {}
        for opt in fields[2:]:
            k, eq, v = opt.partition("=")
            if not eq or not _OPT_KEY.match(k):
                raise SpecError(f"bad option {opt!r} in {token!r}")
            opts[k] = v
        if "index" in opts:
            v = opts["index"].lower()
            if v in ("full", "join", "none"):
                opts["index"] = v
            else:
                opts["index"] = "join" if v == "true" else "none"
        if default and attr["kind"] != "geometry":
            raise SpecError(f"'*' marks the default geometry, not {token!r}")
        attr.update(name=name, default=default, options=opts)
        attributes.append(attr)
    geoms = [a for a in attributes if a["kind"] == "geometry"]
    defaults = [a for a in geoms if a["default"]]
    if len(defaults) > 1:
        raise SpecError("more than one *default geometry")
    if not defaults and geoms:
        geoms[0]["default"] = True  # reference: single geometry is implicit default

    feature_options = {}
    if feat_part:
        # "table.splitter=CLASS,table.splitter.options=k1:v1,k2:v2"
        m = re.match(r"^table\.splitter=([^,]*)"
                     r"(?:,table\.splitter\.options=(.*))?$", feat_part)
        if not m:
            raise SpecError(f"bad feature options: {feat_part!r}")
        feature_options["table.splitter"] = m.group(1)
        if m.group(2):
            kvs = {}
            for pair in m.group(2).split(","):
                k, colon, v = pair.partition(":")
                if not colon:
                    raise SpecError(f"bad splitter option {pair!r}")
                kvs[k] = v
            feature_options["table.splitter.options"] = kvs
    return {"attributes": attributes, "feature_options": feature_options}


def to_spec_string(parsed: dict) -> str:
    """Re-render a parsed spec (normalized: canonical type names, option
    order preserved as parsed)."""
    toks = []
    for a in parsed["attributes"]:
        star = "*" if a["kind"] == "geometry" and a["default"] else ""
        t = f"{star}{a['name']}:{a['type']}"
        for k, v in a["options"].items():
            t += f":{k}={v}"
        toks.append(t)
    out = ",".join(toks)
    fo = parsed.get("feature_options") or {}
    if fo:
        out += ";table.splitter=" + fo.get("table.splitter", "")
        opts = fo.get("table.splitter.options")
        if opts:
            out += ",table.splitter.options=" + ",".join(
                f"{k}:{v}" for k, v in opts.items()
            )
    return out


def schema_from_spec(name: str, spec: str, lon: str = "lon",
                     lat: str = "lat") -> dict:
    """SFT spec string -> the CLI's ``_schema.json`` dict.

    Engine mapping: the default Point geometry is stored as (lon, lat)
    double columns (the reference likewise derives x/y for points); the
    first Date attribute becomes the dtg; ``index=full|join|true`` options
    become attribute-index copies; ``cardinality=`` options carry through
    to the planner's cost hints.
    """
    parsed = parse_spec_string(spec)
    attrs = parsed["attributes"]
    geom = next((a for a in attrs if a["kind"] == "geometry" and a["default"]),
                None)
    dtg = next((a["name"] for a in attrs
                if a["kind"] == "simple" and a["type"] == "Date"), None)
    attr_indexes = [a["name"] for a in attrs
                    if a["options"].get("index") in ("full", "join")
                    and a["kind"] != "geometry"]
    cardinality = {a["name"]: a["options"]["cardinality"].lower()
                   for a in attrs if "cardinality" in a["options"]}
    return {
        "name": name,
        "lon": lon,
        "lat": lat,
        "dtg": dtg,
        "fid": None,
        "attr_indexes": attr_indexes,
        "st_copy": bool(geom),
        "cardinality": cardinality,
        "geom": geom["name"] if geom else None,
        "geom_type": geom["type"] if geom else None,
        "srid": int(geom["options"].get("srid", "4326")) if geom else None,
        "spec": to_spec_string(parsed),
        "attributes": attrs,
        "feature_options": parsed["feature_options"],
    }
