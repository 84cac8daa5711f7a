"""Generic streaming source + converter pipeline.

The reference's generic stream ingestion (camel-routed text streams fed
through the converter framework into a datastore) re-expressed as
Structured Streaming: any streaming text source (file drop directory,
Kafka value column, socket) flows through the SAME converter operators the
batch path uses — :func:`sources.convert.delimited_text` /
``apply_converter`` are narrow transformations, so they compose with
``readStream`` unchanged. Late/ordering semantics come from the downstream
sink (``streaming/live.py`` live view for upsert-with-TTL, or an
append-mode table write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geomesa_spark.functions.dsl import parse_spec
from geomesa_spark.sources.convert import apply_converter, delimited_text


def text_stream_converter(
    spark: SparkSession,
    path: str,
    delimiter: str,
    field_names: list[str],
    spec_strings: list[str],
) -> DataFrame:
    """File-drop directory -> delimited converter -> typed streaming frame.

    ``spec_strings`` use the converter expression DSL; ``$0`` is the raw
    line, ``$1..n`` the split fields. Returns an unstarted streaming
    DataFrame — attach a sink (`.writeStream` / live view) to run.
    """
    lines = spark.readStream.text(path).withColumnRenamed("value", "line")
    raw = delimited_text(lines, "line", delimiter, field_names)
    spec = parse_spec(spec_strings, fields=["line", *field_names])
    return apply_converter(raw, spec)
