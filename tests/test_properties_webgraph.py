"""Property-based tests for the late-round-5 surfaces.

Each property drives the REAL Spark operator against a pure-python
reference of the declared contract, with one Spark job per hypothesis
example (examples carry whole input lists, so example counts stay low
while input coverage stays wide — the same budget discipline as the
round-4 property file).

* pagerank: the distributed int64 loop equals a sequential dict-based
  implementation of the same update rule on arbitrary digraphs —
  THE associativity/determinism claim, not just the hand example.
* normalize_text: idempotent (normalize∘normalize == normalize) and
  output is always NFC with collapsed whitespace.
* domain_mixture: weights are a probability vector (sum within
  truncation slack), and the sqrt flattening preserves count order
  while shrinking ratios.
"""

from __future__ import annotations

import unicodedata

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geomesa_spark.operators.corpus import domain_mixture
from geomesa_spark.operators.textclean import normalize_text
from geomesa_spark.operators.webgraph import SCALE, pagerank

# Py4J's callback thread adjusts sys.recursionlimit, so hypothesis warns
# it won't reset it — inherent to driving Spark inside @given, benign
# (nothing here recurses), and scoped to this module only.
pytestmark = pytest.mark.filterwarnings(
    "ignore:The recursion limit will not be reset"
)

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _pagerank_ref(edges, iterations=3, d=85):
    """Sequential twin of webgraph.pagerank's int64 update rule."""
    pairs = sorted(set(edges))
    nodes = sorted({x for e in pairs for x in e})
    n = len(nodes)
    if n == 0:
        return {}
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    base = ((100 - d) * SCALE // 100) // n
    r = {v: SCALE // n for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if v not in out)
        contrib = {}
        for s, t in pairs:
            contrib[t] = contrib.get(t, 0) + r[s] // out[s]
        r = {
            v: base + (d * (contrib.get(v, 0) + dang // n)) // 100
            for v in nodes
        }
    return r


edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
        lambda p: (f"h{p[0]}", f"h{p[1]}")
    ),
    min_size=1,
    max_size=25,
).map(lambda es: [e for e in es if e[0] != e[1]])


@_slow
@given(edge_lists)
def test_pagerank_matches_sequential_reference(spark, edges):
    if not edges:
        return
    df = spark.createDataFrame(
        [(s, t, 1) for s, t in edges], "src string, dst string, n_links long"
    )
    got = {r.host: r.rank_micro for r in pagerank(df, iterations=3).collect()}
    assert got == _pagerank_ref(edges, iterations=3)


texts = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            categories=("L", "N", "P", "Zs", "Mn", "Cc"),
        ),
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


@_slow
@given(texts)
def test_normalize_text_idempotent_and_nfc(spark, batch):
    df = spark.createDataFrame(
        list(enumerate(batch)), "doc_id long, text string"
    )
    once = normalize_text(df)
    rows = {r.doc_id: r.norm_text for r in once.collect()}
    twice = normalize_text(
        spark.createDataFrame(
            [(k, v) for k, v in rows.items()], "doc_id long, text string"
        )
    )
    again = {r.doc_id: (r.norm_text, r.changed) for r in twice.collect()}
    for k, v in rows.items():
        assert again[k] == (v, False)  # fixpoint after one pass
        assert unicodedata.is_normalized("NFC", v)
        assert "  " not in v and v == v.strip()


counts = st.lists(st.integers(1, 10_000), min_size=1, max_size=12)


@_slow
@given(counts)
def test_domain_mixture_probability_vector(spark, ns):
    # per-domain sizes via size_col, so no need to materialize n rows
    df = spark.createDataFrame(
        [(f"d{i}", n) for i, n in enumerate(ns)], "host string, sz long"
    )
    got = {
        r.host: r
        for r in domain_mixture(df, "host", alpha=0.5, size_col="sz").collect()
    }
    assert abs(sum(r.weight for r in got.values()) - 1.0) < 1e-9
    assert abs(sum(r.share for r in got.values()) - 1.0) < 1e-9
    # sqrt flattening: weight ratios are the sqrt of share ratios (within
    # fixed-point truncation), so ordering by count is preserved
    order_by_n = sorted(got, key=lambda h: (got[h].n_docs, h))
    order_by_w = sorted(got, key=lambda h: (got[h].weight_micro, h))
    assert [got[h].n_docs for h in order_by_n] == [
        got[h].n_docs for h in order_by_w
    ]
