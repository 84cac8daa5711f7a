"""Accumulo-style visibility label expressions.

Rebuilds the reference's visibility filtering
(``geomesa-security/.../VisibilityFilter.scala`` wrapping Accumulo's
``VisibilityEvaluator``, applied at ``ACC/index/QueryPlanner.scala:319-324``)
for boolean label expressions: ``a``, ``a&b``, ``a|b``, ``(a|b)&c``.
Per Accumulo's grammar, ``&`` and ``|`` may not mix at one nesting level
without parentheses, and an empty/NULL expression is visible to everyone.

Spark-first evaluation: rather than a per-row Python UDF, the engine
collects the DISTINCT label expressions (security markings are a small,
bounded vocabulary — thousands at most on a 10^12-row table), evaluates
each once on the driver, and filters with a plain ``isin`` against the
visible set — the hot path stays whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(r'\s*(?:(?P<label>[A-Za-z0-9_.:+-]+|"[^"]*")|(?P<op>[&|])|(?P<lp>\()|(?P<rp>\)))')


class _VisParser:
    def __init__(self, s: str):
        self.toks = self._tokenize(s)
        self.i = 0

    @staticmethod
    def _tokenize(s: str):
        out, pos = [], 0
        while pos < len(s):
            m = _TOKEN.match(s, pos)
            if not m:
                if s[pos:].strip() == "":
                    break
                raise ValueError(f"bad visibility expression at: {s[pos:]!r}")
            pos = m.end()
            out.append((m.lastgroup, m.group(m.lastgroup)))
        out.append(("eof", ""))
        return out

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expr(self):
        """term ((& term)* | (| term)*) — mixing requires parentheses."""
        node = self.term()
        k, v = self.peek()
        if k != "op":
            return node
        op = v
        children = [node]
        while self.peek() == ("op", op):
            self.next()
            children.append(self.term())
        if self.peek()[0] == "op":
            raise ValueError("cannot mix & and | without parentheses")
        return (op, children)

    def term(self):
        k, v = self.next()
        if k == "lp":
            node = self.expr()
            if self.next()[0] != "rp":
                raise ValueError("unbalanced parentheses in visibility expression")
            return node
        if k == "label":
            return ("label", v.strip('"'))
        raise ValueError(f"unexpected token {v!r} in visibility expression")


def evaluate_visibility(expr: str | None, auths: set[str]) -> bool:
    """True iff the caller's auths satisfy the label expression."""
    if expr is None or expr.strip() == "":
        return True  # unlabeled data is visible to everyone
    p = _VisParser(expr)
    node = p.expr()
    if p.next()[0] != "eof":
        raise ValueError(f"trailing tokens in visibility expression: {expr!r}")

    def ev(n) -> bool:
        kind = n[0]
        if kind == "label":
            return n[1] in auths
        if kind == "&":
            return all(ev(c) for c in n[1])
        return any(ev(c) for c in n[1])

    return ev(node)


def _visible_or_false(expr: str, auths: set[str]) -> bool:
    """Accumulo semantics: an unparseable marking is NOT VISIBLE, never an
    error — one malformed label anywhere in a 10^12-row table must not
    abort the scan (VisibilityEvaluator treats bad/unauthorized as
    filtered-out)."""
    try:
        return evaluate_visibility(expr, auths)
    except ValueError:
        return False


def visibility_filter(
    df: DataFrame, vis_col: str, auths: set[str], max_vocabulary: int = 100_000
) -> DataFrame:
    """Filter rows whose visibility expression the auth set satisfies.

    One small distinct-aggregation job resolves the marking vocabulary;
    the row filter itself is a codegen ``isin``. Malformed expressions are
    classified not-visible (Accumulo behavior), not raised.

    The distinct collection is capped at ``max_vocabulary``: markings are a
    small bounded vocabulary in practice, but if the column turns out to be
    high-cardinality the driver must not OOM — beyond the cap the operator
    falls back to evaluating per distinct value within the rows' own
    partitions via a join against the lazily-evaluated distinct table
    (still one evaluation per distinct marking, no per-row Python).
    """
    c: Column = F.col(vis_col)
    # ONE distinct aggregation, persisted: the overflow probe and the
    # fallback path below both read it — recomputing the distinct (a full
    # shuffle of the table's vis column) just because the cap tripped
    # would double the heaviest pass
    distinct_df = df.select(c.alias("__vis")).distinct().persist()
    distinct = [r[0] for r in distinct_df.limit(max_vocabulary + 1).collect()]
    if len(distinct) <= max_vocabulary:
        distinct_df.unpersist()
        visible = [
            v for v in distinct
            if v not in (None, "") and _visible_or_false(v, auths)
        ]
        return df.filter(c.isNull() | (c == "") | c.isin(visible))
    # high-cardinality fallback: evaluate each distinct marking exactly once
    # in an Arrow-batched UDF over the (distinct) marking table, then
    # semi-join rows to the visible set — the big table never runs Python.
    # no annotations on the kernel: module-level `from __future__ import
    # annotations` stringifies hints and pandas is not a module-level import
    def _eval_batch(exprs):
        return exprs.map(
            lambda v: True if v in (None, "") else _visible_or_false(v, auths)
        )

    vis_udf = F.pandas_udf(_eval_batch, "boolean")

    vocab = distinct_df.filter(vis_udf(F.col("__vis")))
    # no broadcast hint: this branch only runs when the vocabulary exceeded
    # the cap, so the visible set may itself be too large to broadcast
    # (distinct_df stays persisted for the join; it is the visible-set
    # source and re-deriving it would repeat the distinct shuffle)
    return df.join(vocab, c.eqNullSafe(F.col("__vis")), "left_semi")
