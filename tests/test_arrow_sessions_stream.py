"""Arrow IPC export/import (sources/arrow_io.py) and streaming
sessionization (streaming/sessions_stream.py).

Arrow chunks must be independently readable by a plain pyarrow client;
the streaming session rollup must agree with the batch operator on any
corpus whose gaps avoid the >= / > boundary difference documented in the
module."""

from __future__ import annotations

import json
import os

import pyarrow as pa
from pyspark.sql import functions as F

from geomesa_spark.sources.arrow_io import from_arrow_ipc, to_arrow_ipc


def test_arrow_ipc_roundtrip(spark):
    df = spark.range(1000).select(
        F.col("id"),
        F.format_string("row-%d", F.col("id")).alias("s"),
        (F.col("id") * 1.5).alias("v"),
    )
    chunks = to_arrow_ipc(df, max_rows_per_chunk=64)
    back = from_arrow_ipc(chunks, "id long, s string, v double")
    got = sorted((r["id"], r["s"], r["v"]) for r in back.collect())
    want = [(i, f"row-{i}", i * 1.5) for i in range(1000)]
    assert got == want


def test_arrow_chunks_standalone_and_sized(spark):
    df = spark.range(500).select(F.col("id"), (F.col("id") % 7).alias("m"))
    rows = to_arrow_ipc(df, max_rows_per_chunk=100).collect()
    assert sum(r["n_rows"] for r in rows) == 500
    assert max(r["n_rows"] for r in rows) <= 100
    # every chunk is a complete IPC stream a bare pyarrow client can read
    total = 0
    for r in rows:
        with pa.ipc.open_stream(pa.BufferReader(bytes(r["ipc"]))) as rd:
            t = rd.read_all()
            assert t.schema.names == ["id", "m"]
            assert t.num_rows == r["n_rows"]
            total += t.num_rows
    assert total == 500


def test_streaming_session_rollup_matches_batch(spark, tmp_path):
    from geomesa_spark.operators.sessions import session_rollup
    from geomesa_spark.streaming.sessions_stream import streaming_session_rollup

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "sess_src"
    os.makedirs(src)
    base = "2024-01-01T00:00:"
    rows = []
    eid = 0
    # user 1: two sessions (gap 3000 > 1800); user 2: one session
    for u, secs in [(1, [0, 10, 500]), (1, [3500, 3600]), (2, [100, 200, 900])]:
        for s in secs:
            rows.append({"event_id": eid, "user_id": u, "event_type": f"t{eid % 2}",
                         "ts": f"2024-01-01T{s // 3600:02d}:{(s % 3600) // 60:02d}:{s % 60:02d}.000Z"})
            eid += 1
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = "event_id long, user_id long, event_type string, ts timestamp"

    stream = spark.readStream.schema(schema).json(str(src))
    out = streaming_session_rollup(stream, gap_s=1800, watermark="10 minutes",
                                   type_col=None)
    q = (
        out.writeStream.format("memory").queryName("sess_stream")
        .outputMode("complete").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["entity"], r["start_sec"]): (r["end_sec"], r["duration_s"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }

    batch = spark.read.schema(schema).json(str(src))
    want = {
        (r["entity"], r["start_sec"]): (r["end_sec"], r["duration_s"], r["n_events"])
        for r in session_rollup(batch, gap_s=1800, type_col=None).collect()
    }
    assert got == want and len(got) == 3
