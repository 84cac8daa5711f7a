"""Arrow IPC export/import: query results as a stream of self-describing
Arrow IPC chunks.

The reference exports query results in wire formats clients consume
directly — BIN chunks (``ACC/iterators/BinAggregatingIterator.scala``),
GeoJSON/GML (``geomesa-web``); the modern analog for analytics clients
is Arrow IPC. ``mapInArrow`` already hands the engine its data as Arrow
record batches, so export is a zero-copy re-frame: each batch serializes
to one self-contained IPC stream (schema header + batch), one output row
per chunk. No row-wise work, no driver collect — a 10^12-row result
exports as distributed chunk rows that a sink can ship independently,
and any Arrow client (pyarrow, arrow-js, DuckDB) reads each chunk
standalone.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

CHUNK_SCHEMA = "ipc binary, n_rows long"


def to_arrow_ipc(df: DataFrame, max_rows_per_chunk: int | None = None) -> DataFrame:
    """DataFrame -> one row per Arrow IPC chunk ``(ipc: binary, n_rows)``.

    Each chunk is a complete IPC *stream* (schema + one batch) so chunks
    are independently readable — the property the reference's BIN chunk
    export relies on. ``max_rows_per_chunk`` re-slices oversized input
    batches; by default chunks follow Spark's Arrow batch size
    (``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """
    import pyarrow as pa

    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            slices = [b]
            if max_rows_per_chunk and b.num_rows > max_rows_per_chunk:
                slices = [
                    b.slice(o, max_rows_per_chunk)
                    for o in range(0, b.num_rows, max_rows_per_chunk)
                ]
            out_ipc, out_n = [], []
            for s in slices:
                sink = pa.BufferOutputStream()
                with pa.ipc.new_stream(sink, s.schema) as w:
                    w.write_batch(s)
                out_ipc.append(sink.getvalue().to_pybytes())
                out_n.append(s.num_rows)
            yield pa.RecordBatch.from_pydict({"ipc": out_ipc, "n_rows": out_n})

    return df.mapInArrow(enc, CHUNK_SCHEMA)


def from_arrow_ipc(df: DataFrame, ddl_schema: str, ipc_col: str = "ipc") -> DataFrame:
    """Rows of IPC chunk bytes -> the original rows.

    ``ddl_schema`` declares the payload row schema (IPC chunks are
    self-describing, but Spark needs the output schema at plan time).
    """
    import pyarrow as pa

    def dec(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            col = b.column(b.schema.get_field_index(ipc_col))
            for buf in col:
                with pa.ipc.open_stream(pa.BufferReader(buf.as_py())) as r:
                    for batch in r:
                        yield batch

    return df.select(ipc_col).mapInArrow(dec, ddl_schema)
