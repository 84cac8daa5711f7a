"""Ingest/convert pipeline: converter specs over delimited / fixed-width /
JSON-ish text, DMS coordinate parsing, composite dispatch, GeoJSON export.

Rebuilds the reference's converter framework as pure Column-expression
pipelines (no per-row python):

* delimited text  — ``CNV/geomesa-convert-text/.../DelimitedTextConverter.scala``
* fixed width     — ``CNV/geomesa-convert-fixedwidth/.../FixedWidthConverters.scala``
* composite       — ``CNV/geomesa-convert-common/.../CompositeConverter.scala``
  (predicate-dispatched chain -> ``when/otherwise``)
* DMS coordinates — ``geomesa-accumulo/.../csv/DMS.scala`` (degrees-minutes-
  seconds with hemisphere letter -> signed decimal degrees)
* GeoJSON export  — ``TLS/FeatureExporter.scala:34-46``

A converter spec is ``[(out_name, builder)]`` where builder maps a dict of
already-parsed raw columns to a Column (use
:mod:`geomesa_spark.functions.registry` functions for the reference's
expression language). Everything lowers to whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Spec = Sequence[tuple[str, Callable[[dict[str, Column]], Column]]]


def apply_converter(raw: DataFrame, spec: Spec) -> DataFrame:
    """Apply a converter spec: each output field is an expression over the
    raw columns (the reference's field-expression list)."""
    cols = {c: F.col(c) for c in raw.columns}
    return raw.select(*[builder(cols).alias(name) for name, builder in spec])


def delimited_text(
    lines: DataFrame,
    line_col: str,
    delimiter: str,
    field_names: list[str],
) -> DataFrame:
    """Split delimited lines into named raw string fields.

    ``spark.read.csv`` is the fast path for files; this operator covers the
    reference's converter-over-arbitrary-stream case (lines already in a
    DataFrame — Kafka values, archive members, ...).
    """
    parts = F.split(F.col(line_col), F.lit("\\Q" + delimiter + "\\E"))
    return lines.select(
        *lines.columns,
        *[parts.getItem(i).alias(n) for i, n in enumerate(field_names)],
    )


def fixed_width(
    lines: DataFrame,
    line_col: str,
    fields: list[tuple[str, int, int]],
) -> DataFrame:
    """Byte-offset field extraction: fields = [(name, start, end)] 0-based,
    end exclusive (``FixedWidthConverters`` semantics)."""
    c = F.col(line_col)
    return lines.select(
        *lines.columns,
        *[F.substring(c, start + 1, end - start).alias(name) for name, start, end in fields],
    )


def composite(
    raw: DataFrame,
    branches: list[tuple[Column, Spec]],
) -> DataFrame:
    """Predicate-dispatched converter chain: the first branch whose predicate
    holds converts the row (``CompositeConverter`` -> ``when/otherwise``).
    All branch specs must produce the same output fields. Rows no branch
    claims are dropped (the reference's CompositeConverter discards records
    no delegate converter matches)."""
    names = [n for n, _ in branches[0][1]]
    cols = {c: F.col(c) for c in raw.columns}
    out = []
    for name in names:
        expr = None
        for pred, spec in branches:
            builder = dict(spec)[name]
            expr = F.when(pred, builder(cols)) if expr is None else expr.when(pred, builder(cols))
        out.append(expr.alias(name))
    claimed = None
    for pred, _ in branches:
        claimed = pred if claimed is None else (claimed | pred)
    return raw.filter(claimed).select(*out)


_DMS_RE = r"^\s*(\d+)[:d°]\s*(\d+)[:m']\s*(\d+(?:\.\d+)?)[s\"]?\s*([NSEW])\s*$"


def dms_to_decimal(c: Column) -> Column:
    """Degrees-minutes-seconds string -> signed decimal degrees.

    Accepts ``49:30:15N`` / ``49d30m15sN`` / ``49°30'15"N`` forms (the
    reference's ``DMS.scala`` grammar). Pure regexp_extract arithmetic.
    """
    # try_cast: a non-matching line extracts "" which would *fail the job*
    # under ANSI mode (Spark 4 default) — malformed input must yield NULL
    # (the reference converter's drop-bad-record semantics), never abort a
    # 100 TB ingest.
    deg = F.regexp_extract(c, _DMS_RE, 1).try_cast("double")
    mins = F.regexp_extract(c, _DMS_RE, 2).try_cast("double")
    secs = F.regexp_extract(c, _DMS_RE, 3).try_cast("double")
    hemi = F.regexp_extract(c, _DMS_RE, 4)
    value = deg + mins / 60.0 + secs / 3600.0
    # no-match (empty hemi) falls through both branches -> NULL
    return F.when(hemi.isin("S", "W"), -value).when(hemi.isin("N", "E"), value)


def shapefile_ingest(spark, path: str) -> DataFrame:
    """Shapefile -> DataFrame (``UTL/geotools/GeneralShapefileIngest.scala``).

    Backed by the engine's native pure-``struct`` reader
    (:mod:`geomesa_spark.sources.shapefile`; Point/PolyLine/Polygon + .dbf
    attributes) — shapefiles are small reference layers, parsed driver-side
    and handed to Spark as a (attributes..., wkt) frame.
    """
    from geomesa_spark.sources.shapefile import read_shapefile

    return read_shapefile(spark, path)


def kafka_geomessage_sink(df: DataFrame, brokers: str, topic: str):
    """Configured (unstarted) Kafka writer for GeoMessage streams
    (``KFK/KafkaProducerFeatureStore.scala`` -> ``writeStream.format("kafka")``).

    Caller starts it; building the writer needs no broker. The value is the
    JSON-encoded message; the feature id is the Kafka key, so per-id ordering
    is preserved per partition exactly like the reference's keyed topic.
    """
    payload = df.select(
        F.col("id").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
    )


def avro_ingest(spark, path: str) -> DataFrame:
    """Avro container ingest (``CNV/geomesa-convert-avro`` ingest path;
    field access via :func:`avro_path`).

    Fast path: Spark's native avro reader when the spark-avro module is
    deployed (``--packages org.apache.spark:spark-avro_2.13:<version>``).
    Fallback (this sandbox): ``binaryFile`` scan + the pure-python OCF
    decoder (:mod:`geomesa_spark.sources.avro_codec`) inside
    ``mapInPandas`` — fully distributed at one task per container file
    (the reference's per-file ingest granularity), records shipped as JSON
    lines and parsed JVM-side with ``from_json`` against the DDL derived
    from the container's embedded writer schema. The schema probe reads one
    file's HEADER driver-side; record decoding runs on executors only.
    """
    try:
        return spark.read.format("avro").load(path)
    except Exception as e:  # AnalysisException: data source not found
        if "avro" not in str(e).lower():
            raise

    import json as _json

    import pandas as _pd

    from geomesa_spark.sources.avro_codec import iter_container, read_header, schema_to_ddl

    files = spark.read.format("binaryFile").load(path)

    # probe EVERY file's header ON EXECUTORS and collect only the distinct
    # DDLs: each container decodes with its own embedded writer schema, but
    # the JSON records are parsed against ONE DDL — a silently differing
    # schema would null/drop fields instead of erroring. (Driver sees a
    # handful of (ddl, example path) rows, never file bytes.)
    def probe(batches):
        for pdf in batches:
            yield _pd.DataFrame({
                "path": pdf["path"],
                "ddl": [schema_to_ddl(read_header(bytes(b))[0])
                        for b in pdf["content"]],
            })

    ddls = (
        files.select("path", "content")
        .mapInPandas(probe, "path string, ddl string")
        .groupBy("ddl").agg(F.min("path").alias("example"))
        .collect()
    )
    if not ddls:
        raise ValueError(f"no avro files at {path}")
    if len(ddls) > 1:
        detail = "; ".join(f"{r['example']}: {r['ddl']}" for r in ddls)
        raise ValueError(
            f"avro containers disagree on writer schema: {detail}"
        )
    ddl = ddls[0]["ddl"]

    def parse(batches):
        for pdf in batches:
            rows = []
            for data in pdf["content"]:
                for rec in iter_container(bytes(data)):
                    rows.append(_json.dumps(rec))
            yield _pd.DataFrame({"json": rows})

    parsed = files.select("content").mapInPandas(parse, "json string")
    return parsed.select(F.from_json(F.col("json"), ddl).alias("r")).select("r.*")


def avro_path(col: Column, path: str) -> Column:
    """AvroPath expression -> nested Column access.

    The reference's AvroPath language
    (``CNV/geomesa-convert-avro/.../AvroPath.scala``: ``/field`` descent and
    ``[n]`` array indexing over decoded records) maps directly onto Spark's
    nested struct/array accessors once ``from_avro``/the native Avro reader
    has decoded the record — the path compiles to a getField/getItem chain
    (whole-stage codegen, no python). Union-type ``$type=`` filters are not
    supported: Spark's Avro decoding already resolves unions to typed
    members, so select the member field instead.
    """
    import re as _re

    out = col
    for part in path.strip("/").split("/"):
        if not part:
            continue
        m = _re.fullmatch(r"([A-Za-z_][A-Za-z0-9_]*)((?:\[\d+\])*)", part)
        if not m:
            raise ValueError(f"bad AvroPath segment: {part!r}")
        out = out.getField(m.group(1))
        for idx in _re.findall(r"\[(\d+)\]", m.group(2)):
            out = out.getItem(int(idx))
    return out


def to_gml(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str | None = None,
    props: list[str] | None = None,
    type_name: str = "feature",
) -> Column:
    """One GML 2 featureMember string per row
    (``TLS/FeatureExporter.scala:48-96`` GML path) — pure string-expression
    composition, JVM-side."""
    parts = [F.lit(f"<gml:featureMember><{type_name}")]
    if id_col:
        parts += [F.lit(' fid="'), F.col(id_col).cast("string"), F.lit('"')]
    parts += [
        F.lit("><geometry><gml:Point><gml:coordinates>"),
        F.col(lon).cast("string"), F.lit(","), F.col(lat).cast("string"),
        F.lit("</gml:coordinates></gml:Point></geometry>"),
    ]
    for p in props or []:
        # coalesce each nullable part: F.concat null-propagates, and ONE
        # null property would blank the row's entire featureMember line
        parts += [
            F.lit(f"<{p}>"),
            F.coalesce(F.col(p).cast("string"), F.lit("")),
            F.lit(f"</{p}>"),
        ]
    parts.append(F.lit(f"</{type_name}></gml:featureMember>"))
    safe = [
        F.coalesce(x, F.lit("")) if isinstance(x, Column) else x for x in parts
    ]
    return F.concat(*safe)


def to_geojson(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    id_col: str | None = None,
    props: list[str] | None = None,
) -> Column:
    """One GeoJSON Feature string per row (``FeatureExporter`` GeoJSON path),
    via ``to_json`` over a properly-shaped struct — JVM-side, no python."""
    geometry = F.struct(
        F.lit("Point").alias("type"),
        F.array(F.col(lon), F.col(lat)).alias("coordinates"),
    )
    fields = [F.lit("Feature").alias("type"), geometry.alias("geometry")]
    if id_col:
        fields.append(F.col(id_col).alias("id"))
    if props:
        fields.append(F.struct(*[F.col(p) for p in props]).alias("properties"))
    return F.to_json(F.struct(*fields))
