"""Converter/transform expression DSL (string specs).

Rebuilds the reference's transformer expression language
(``CNV/geomesa-convert-common/.../Transformers.scala:34-95`` — a parboiled
grammar over function calls, ``$``-field references, literals, and predicate
functions ``strEq``/``intLT``/``and``/``or``/``not``) as a small
recursive-descent parser producing Column-builder closures resolved through
the :mod:`geomesa_spark.functions.registry`. The same parser powers the
query transform surface (``Query.properties`` derived expressions,
``ACC/index/QueryPlanner.scala:234-297``), where bare identifiers reference
attribute columns.

Everything still lowers to built-in Column expressions — the DSL only
changes how specs are *written* (strings instead of python lambdas), not
what executes.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from geomesa_spark.functions.registry import resolve_function

_TOK = re.compile(
    r"""\s*(?:
      (?P<num>[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?) |
      (?P<str>'(?:[^']|'')*') |
      (?P<ref>\$[A-Za-z_0-9]+) |
      (?P<name>[A-Za-z_][A-Za-z0-9_]*) |
      (?P<lp>\() | (?P<rp>\)) | (?P<comma>,)
    )""",
    re.X,
)


def _tokenize(s: str):
    out, pos = [], 0
    while pos < len(s):
        m = _TOK.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize expression at: {s[pos:pos+30]!r}")
        pos = m.end()
        out.append((m.lastgroup, m.group(m.lastgroup)))
    out.append(("eof", ""))
    return out


class _P:
    def __init__(self, toks):
        self.toks, self.i = toks, 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind):
        k, v = self.next()
        if k != kind:
            raise ValueError(f"expected {kind}, got {v!r}")
        return v

    def expr(self):
        k, v = self.next()
        if k == "num":
            f = float(v)
            return ("lit", int(f) if f.is_integer() and "." not in v and "e" not in v.lower() else f)
        if k == "str":
            return ("lit", v[1:-1].replace("''", "'"))
        if k == "ref":
            return ("ref", v[1:])
        if k == "name":
            if self.peek()[0] == "lp":
                self.next()
                args = []
                if self.peek()[0] != "rp":
                    args.append(self.expr())
                    while self.peek()[0] == "comma":
                        self.next()
                        args.append(self.expr())
                self.expect("rp")
                return ("func", v, args)
            return ("col", v)
        raise ValueError(f"unexpected token {v!r}")


def parse_expr(
    text: str, fields: list[str] | None = None
) -> Callable[[dict[str, Column]], Column]:
    """Parse one expression into a builder over the raw-column dict.

    ``$N`` references resolve positionally through ``fields`` (the
    reference's ``$0`` = whole record, ``$1..n`` = split fields — pass the
    raw-record column first); ``$name`` and bare identifiers resolve by
    column name.
    """
    p = _P(_tokenize(text))
    node = p.expr()
    p.expect("eof")

    def build(n, cols: dict[str, Column]):
        kind = n[0]
        if kind == "lit":
            return n[1]
        if kind in ("ref", "col"):
            key = n[1]
            if kind == "ref" and key.isdigit():
                if fields is None:
                    raise ValueError(f"positional ref ${key} needs a fields list")
                key = fields[int(key)]
            if key not in cols:
                raise KeyError(f"unknown field {key!r}; have {sorted(cols)}")
            return cols[key]
        if kind == "func":
            fn = resolve_function(n[1])
            return fn(*[build(a, cols) for a in n[2]])
        raise AssertionError(n)

    def builder(cols: dict[str, Column]) -> Column:
        out = build(node, cols)
        return out if isinstance(out, Column) else F.lit(out)

    return builder


_SPEC_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*=(?!=)\s*(.+)$", re.S)


def parse_spec(entries: list[str], fields: list[str] | None = None):
    """Parse ``["name = expr", ...]`` into a converter Spec
    (list of (name, builder)) for :func:`sources.convert.apply_converter`."""
    out = []
    for e in entries:
        m = _SPEC_RE.match(e)
        if not m:
            raise ValueError(f"spec entry must be 'name = expr': {e!r}")
        out.append((m.group(1), parse_expr(m.group(2), fields)))
    return out


def parse_properties(props: list[str]):
    """Query-transform properties: either a plain column name or
    ``derived=expr`` (``Query.properties`` semantics)."""
    out = []
    for p in props:
        m = _SPEC_RE.match(p)
        if m:
            out.append((m.group(1), parse_expr(m.group(2))))
        else:
            name = p.strip()
            out.append((name, lambda cols, _n=name: cols[_n]))
    return out
