"""Deterministic training-shard packing (operators/shards.py). The DuckDB
twin runs in the driver gate (`pack_shards` in __spark_entry__); these
tests pin the packing law against a brute-force single-process oracle and
prove the result is independent of parallelism.
"""
import pandas as pd

from geomesa_spark.operators.shards import pack_shards

_A, _M = 48271, 2147483647


def _brute(rows, shard_tokens, salt=0):
    """Single-process reference: sort by Lehmer key then id, lay tokens
    end-to-end, assign each doc the shard of its first token."""
    docs = [
        (i, len(t.split()))
        for i, t in rows
        if t is not None
    ]
    key = lambda it: ((((it[0] + salt) * _A) % _M) * _A % _M, it[0])
    out, off = {}, 0
    for i, n in sorted(docs, key=key):
        out[i] = (n, off // shard_tokens, off % shard_tokens)
        off += n
    return out


def _rows(n=60):
    return [
        (i, None) if i % 17 == 0 else (i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 23)))
        for i in range(n)
    ]


def test_matches_brute_force(spark):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"], r["offset_in_shard"])
        for r in pack_shards(df, "text", "doc_id", 32).collect()
    }
    assert got == _brute(rows, 32)


def test_parallelism_invariance(spark):
    """Range boundaries move with num_ranges; the packing must not."""
    rows = _rows(80)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, pack_shards(df, "text", "doc_id", 64, num_ranges=2).collect()))
    b = sorted(map(tuple, pack_shards(df, "text", "doc_id", 64, num_ranges=7).collect()))
    assert a == b


def test_contiguous_token_layout(spark):
    """Offsets are gapless: within the global order, each start equals the
    previous start plus the previous doc's tokens."""
    rows = [(i, " ".join(["x"] * (1 + i % 5))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_shards(df, "text", "doc_id", 7).collect()
    starts = sorted(r["shard_id"] * 7 + r["offset_in_shard"] for r in out)
    total = 0
    ns = {r["shard_id"] * 7 + r["offset_in_shard"]: r["n_tokens"] for r in out}
    for s in starts:
        assert s == total
        total += ns[s]
    assert total == sum(1 + i % 5 for i in range(30))


def test_salt_changes_order_not_totals(spark):
    rows = [(i, "a b c") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["shard_id"] for r in pack_shards(df, "text", "doc_id", 9).collect()}
    b = {r["doc_id"]: r["shard_id"] for r in pack_shards(df, "text", "doc_id", 9, salt=5).collect()}
    assert a != b  # different permutation
    assert sorted(a.values()) == sorted(b.values())  # same shard fill
