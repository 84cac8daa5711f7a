"""ECQL-ish predicate AST + parser.

The query surface of the reference is OGC ECQL filters
(accepted geometry predicates: ``geomesa-filter/.../package.scala:275-287``;
temporal extraction: ``FilterHelper.scala:153-229``; attribute predicates:
``ACC/index/AttributeIdxStrategy.scala:189-296``). This module rebuilds the
subset the reference's planner understands as a small recursive-descent
parser producing a typed AST that the compiler lowers to Spark plans.

Temporal semantics: DURING / BETWEEN are inclusive at both endpoints, which
is what the reference's golden strategy tests assume
(``ACCT/index/Z3IdxStrategyTest.scala:80-150``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from geomesa_spark.geom.wkt import Geometry, parse_wkt

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Pred:
    pass


@dataclass
class Include(Pred):
    """Trivially-true filter (full scan)."""


@dataclass
class BBox(Pred):
    field: str
    lon_min: float
    lat_min: float
    lon_max: float
    lat_max: float


@dataclass
class Intersects(Pred):
    field: str
    geom: Geometry


@dataclass
class Within(Pred):
    """Row geometry WITHIN the literal geometry."""

    field: str
    geom: Geometry


@dataclass
class Contains(Pred):
    """Row geometry CONTAINS the literal geometry."""

    field: str
    geom: Geometry


@dataclass
class Touches(Pred):
    field: str
    geom: Geometry


@dataclass
class Crosses(Pred):
    field: str
    geom: Geometry


@dataclass
class Overlaps(Pred):
    field: str
    geom: Geometry


@dataclass
class Disjoint(Pred):
    field: str
    geom: Geometry


@dataclass
class DWithin(Pred):
    field: str
    geom: Geometry  # point
    distance: float
    units: str  # meters | degrees


@dataclass
class During(Pred):
    field: str
    start: datetime
    end: datetime


@dataclass
class AttrCmp(Pred):
    field: str
    op: str  # = <> < <= > >= like isnotnull
    value: object = None


@dataclass
class AttrBetween(Pred):
    field: str
    lo: object
    hi: object


@dataclass
class AttrIn(Pred):
    field: str
    values: list


@dataclass
class And(Pred):
    children: list


@dataclass
class Or(Pred):
    children: list


@dataclass
class Not(Pred):
    child: Pred


# ---------------------------------------------------------------------------
# tokenizer / parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""\s*(?:
      (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,) |
      (?P<op><=|>=|<>|=|<|>) |
      (?P<string>'(?:[^']|'')*') |
      (?P<iso>\d{4}-\d{2}-\d{2}T[\d:.]+Z?) |
      (?P<number>[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?) |
      (?P<word>[A-Za-z_][A-Za-z0-9_.]*) |
      (?P<slash>/)
    )""",
    re.X,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "BBOX", "INTERSECTS", "WITHIN", "CONTAINS", "DWITHIN",
    "TOUCHES", "CROSSES", "OVERLAPS", "DISJOINT",
    "DURING", "BETWEEN", "LIKE", "IS", "NULL", "IN", "INCLUDE",
    "POINT", "POLYGON", "MULTIPOLYGON", "LINESTRING", "MULTIPOINT", "MULTILINESTRING",
}


def _tokenize(s: str):
    out = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize at: {s[pos:pos+30]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(m.lastgroup)
        if kind == "word" and text.upper() in _KEYWORDS:
            out.append((text.upper(), text))
        else:
            out.append((kind, text))
    out.append(("eof", ""))
    return out


def parse_iso(ts: str) -> datetime:
    t = ts.rstrip("Z")
    if "." in t:
        dt = datetime.strptime(t, "%Y-%m-%dT%H:%M:%S.%f")
    elif t.count(":") == 2:
        dt = datetime.strptime(t, "%Y-%m-%dT%H:%M:%S")
    elif t.count(":") == 1:
        dt = datetime.strptime(t, "%Y-%m-%dT%H:%M")
    else:
        dt = datetime.strptime(t, "%Y-%m-%dT%H")
    return dt.replace(tzinfo=timezone.utc)


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise ValueError(f"expected {kind}, got {k} {v!r}")
        return v

    # expr := term (OR term)*
    def expr(self) -> Pred:
        node = self.term()
        children = [node]
        while self.peek()[0] == "OR":
            self.next()
            children.append(self.term())
        return children[0] if len(children) == 1 else Or(children)

    # term := factor (AND factor)*
    def term(self) -> Pred:
        node = self.factor()
        children = [node]
        while self.peek()[0] == "AND":
            self.next()
            children.append(self.factor())
        return children[0] if len(children) == 1 else And(children)

    def factor(self) -> Pred:
        k, v = self.peek()
        if k == "NOT":
            self.next()
            return Not(self.factor())
        if k == "lparen":
            self.next()
            node = self.expr()
            self.expect("rparen")
            return node
        return self.leaf()

    def _geom_literal(self) -> Geometry:
        k, v = self.next()
        if k not in ("POINT", "POLYGON", "MULTIPOLYGON", "LINESTRING", "MULTIPOINT", "MULTILINESTRING"):
            raise ValueError(f"expected WKT geometry, got {v!r}")
        # re-assemble the parenthesized coordinate text
        depth = 0
        parts = [v]
        while True:
            kk, vv = self.next()
            if kk == "lparen":
                depth += 1
                parts.append("(")
            elif kk == "rparen":
                depth -= 1
                if depth < 0:
                    # the predicate's own closer: a parenthesis-free WKT
                    # (e.g. POINT EMPTY) must be a parse error here, not a
                    # token-stream overrun
                    raise ValueError(
                        f"malformed geometry literal in predicate: {' '.join(parts)!r}"
                    )
                parts.append(")")
                if depth == 0:
                    break
            elif kk == "comma":
                parts.append(",")
            else:
                parts.append(" " + vv)
        return parse_wkt("".join(parts))

    def _literal(self):
        k, v = self.next()
        if k == "string":
            return v[1:-1].replace("''", "'")
        if k == "number":
            f = float(v)
            return int(f) if f.is_integer() and "." not in v and "e" not in v.lower() else f
        if k == "iso":
            return parse_iso(v)
        raise ValueError(f"expected literal, got {v!r}")

    def leaf(self) -> Pred:
        k, v = self.next()
        if k == "INCLUDE":
            return Include()
        if k == "BBOX":
            self.expect("lparen")
            field = self.expect("word")
            args = []
            for _ in range(4):
                self.expect("comma")
                args.append(float(self.expect("number")))
            self.expect("rparen")
            return BBox(field, *args)
        if k in ("INTERSECTS", "WITHIN", "CONTAINS", "TOUCHES", "CROSSES",
                 "OVERLAPS", "DISJOINT"):
            self.expect("lparen")
            field = self.expect("word")
            self.expect("comma")
            geom = self._geom_literal()
            self.expect("rparen")
            cls = {
                "INTERSECTS": Intersects, "WITHIN": Within, "CONTAINS": Contains,
                "TOUCHES": Touches, "CROSSES": Crosses, "OVERLAPS": Overlaps,
                "DISJOINT": Disjoint,
            }[k]
            return cls(field, geom)
        if k == "DWITHIN":
            self.expect("lparen")
            field = self.expect("word")
            self.expect("comma")
            geom = self._geom_literal()
            self.expect("comma")
            dist = float(self.expect("number"))
            self.expect("comma")
            units = self.next()[1].strip("'").lower()
            self.expect("rparen")
            return DWithin(field, geom, dist, units)
        if k != "word":
            raise ValueError(f"unexpected token {v!r}")
        field = v
        k2, v2 = self.next()
        if k2 == "DURING":
            start = parse_iso(self.expect("iso"))
            self.expect("slash")
            end = parse_iso(self.expect("iso"))
            return During(field, start, end)
        if k2 == "BETWEEN":
            lo = self._literal()
            self.expect("AND")
            hi = self._literal()
            return AttrBetween(field, lo, hi)
        if k2 == "LIKE":
            pat = self._literal()
            return AttrCmp(field, "like", pat)
        if k2 == "IS":
            if self.peek()[0] == "NOT":
                self.next()
                self.expect("NULL")
                return AttrCmp(field, "isnotnull")
            self.expect("NULL")
            return Not(AttrCmp(field, "isnotnull"))
        if k2 == "IN":
            self.expect("lparen")
            vals = [self._literal()]
            while self.peek()[0] == "comma":
                self.next()
                vals.append(self._literal())
            self.expect("rparen")
            return AttrIn(field, vals)
        if k2 == "op":
            return AttrCmp(field, v2, self._literal())
        raise ValueError(f"unexpected token after field {field!r}: {v2!r}")


def parse_cql(cql: str) -> Pred:
    p = _Parser(_tokenize(cql))
    node = p.expr()
    p.expect("eof")
    return node
