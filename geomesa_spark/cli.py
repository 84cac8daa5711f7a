"""Command-line tools: the `geomesa-tools` analog (`python -m geomesa_spark`).

Mirrors the reference's command set
(``TLS/src/main/scala/.../tools/commands/``): create / describe / list /
ingest / export / explain / querystats / removeschema / deletecatalog /
tableconf / ingestraster / deleteraster / version — with a
filesystem catalog replacing the Accumulo connection: a catalog is a
directory, a feature table is ``<catalog>/<name>/`` holding
``_schema.json`` (column roles + index config, the SimpleFeatureType
analog) next to the layout parquet written by
``sources/layout.write_layout``. Every command that touches data builds
one SparkSession and drives the same engine APIs the Python surface
uses — the CLI adds no second code path.

At cluster scale the catalog directory lives on the shared filesystem /
object store and the session builder swaps ``local[*]`` for the real
master (or run via ``spark-submit --py-files dist/geomesa_spark.zip
-m geomesa_spark ...``); every data operation is fully distributed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

VERSION = "0.4.0"

SCHEMA_FILE = "_schema.json"


def _table_dir(catalog: str, name: str) -> str:
    return os.path.join(catalog, name)


def _load_schema(catalog: str, name: str) -> dict:
    p = os.path.join(_table_dir(catalog, name), SCHEMA_FILE)
    if not os.path.exists(p):
        raise SystemExit(f"no such feature table: {name} (missing {p})")
    with open(p) as f:
        return json.load(f)


def _session(args):
    from geomesa_spark.runtime.session import get_session

    return get_session(master=getattr(args, "master", None) or "local[*]")


def _open_table(spark, catalog: str, name: str):
    from geomesa_spark.sources.layout import read_layout

    schema = _load_schema(catalog, name)
    data = os.path.join(_table_dir(catalog, name), "data")
    if not os.path.exists(os.path.join(data, "_LAYOUT_SUCCESS")):
        raise SystemExit(f"table {name} has no complete layout (run ingest)")
    return read_layout(
        spark,
        data,
        lon=schema["lon"],
        lat=schema["lat"],
        dtg=schema.get("dtg"),
        fid=schema.get("fid"),
        attr_indexes=schema.get("attr_indexes") or [],
        cardinality=schema.get("cardinality") or {},
        st_copy=bool(schema.get("st_copy")),
    ), schema


# ---------------------------------------------------------------------------
# commands
# ---------------------------------------------------------------------------

def cmd_create(args) -> int:
    d = _table_dir(args.catalog, args.name)
    if args.spec:
        # reference-parity surface: the SFT spec string grammar
        # (UTL/geotools/SimpleFeatureTypes.scala:540-584), e.g.
        # "id:String:index=true,dtg:Date,*geom:Point:srid=4326"
        from geomesa_spark.sources.sft import schema_from_spec

        schema = schema_from_spec(args.name, args.spec,
                                  lon=args.lon, lat=args.lat)
        # explicit flags override / extend the spec-derived fields
        if args.dtg:
            schema["dtg"] = args.dtg
        if args.fid:
            schema["fid"] = args.fid
        for a in args.attr_index or []:
            if a not in schema["attr_indexes"]:
                schema["attr_indexes"].append(a)
        if args.st_copy:
            schema["st_copy"] = True
        schema["cardinality"].update(
            dict(kv.split("=", 1) for kv in (args.cardinality or []))
        )
    else:
        schema = {
            "name": args.name,
            "lon": args.lon,
            "lat": args.lat,
            "dtg": args.dtg,
            "fid": args.fid,
            "attr_indexes": args.attr_index or [],
            "st_copy": bool(args.st_copy),
            "cardinality": dict(kv.split("=", 1) for kv in (args.cardinality or [])),
        }
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, SCHEMA_FILE), "w") as f:
        json.dump(schema, f, indent=2)
    print(f"created feature table {args.name} in {args.catalog}")
    return 0


def cmd_list(args) -> int:
    if not os.path.isdir(args.catalog):
        print("(empty catalog)")
        return 0
    for name in sorted(os.listdir(args.catalog)):
        if os.path.exists(os.path.join(args.catalog, name, SCHEMA_FILE)):
            ready = os.path.exists(
                os.path.join(args.catalog, name, "data", "_LAYOUT_SUCCESS")
            )
            print(f"{name}\t{'ready' if ready else 'no-data'}")
    return 0


def cmd_describe(args) -> int:
    schema = _load_schema(args.catalog, args.name)
    print(json.dumps(schema, indent=2))
    data = os.path.join(_table_dir(args.catalog, args.name), "data")
    if os.path.exists(os.path.join(data, "_LAYOUT_SUCCESS")):
        weeks = sorted(
            e.split("=", 1)[1] for e in os.listdir(data) if e.startswith("week=")
        )
        print(f"layout: complete, {len(weeks)} week partitions")
    else:
        print("layout: none")
    return 0


def cmd_remove_schema(args) -> int:
    d = _table_dir(args.catalog, args.name)
    if not os.path.exists(os.path.join(d, SCHEMA_FILE)):
        raise SystemExit(f"no such feature table: {args.name}")
    if not args.force:
        raise SystemExit("refusing to delete without --force")
    shutil.rmtree(d)
    print(f"removed {args.name}")
    return 0


def cmd_ingest(args) -> int:
    from geomesa_spark.functions.dsl import parse_spec
    from geomesa_spark.sources.convert import apply_converter, delimited_text
    from geomesa_spark.sources.layout import write_layout

    spark = _session(args)
    schema = _load_schema(args.catalog, args.name)
    fmt = args.format
    if fmt == "parquet":
        df = spark.read.parquet(args.file)
    elif fmt in ("csv", "tsv"):  # IngestCommand.scala:29 CSV | TSV
        raw = spark.read.text(args.file)  # .gz/.bz2 decompress transparently
        fields = args.fields.split(",") if args.fields else None
        if fields is None:
            raise SystemExit("--fields a,b,c is required for csv/tsv ingest")
        delim = "\t" if fmt == "tsv" else args.delimiter
        lines = delimited_text(raw, "value", delim, fields)
        if args.spec:
            # DSL convention: $0 = the whole raw record, $1..n = the split
            # fields — the raw-record column leads the positional list
            df = apply_converter(lines, parse_spec(args.spec, ["value"] + fields))
        else:
            df = lines.drop("value")
    elif fmt == "shp":
        from geomesa_spark.sources.convert import shapefile_ingest

        df = shapefile_ingest(spark, args.file)
    elif fmt == "avro":
        from geomesa_spark.sources.convert import avro_ingest

        df = avro_ingest(spark, args.file)
    else:
        raise SystemExit(f"unknown ingest format {fmt}")
    from pyspark.sql import functions as F

    for col, typ in (kv.split(":", 1) for kv in (args.cast or [])):
        # try_cast: one malformed cell must yield NULL, not abort a 100 TB
        # ingest under ANSI mode (the converter library's convention)
        df = df.withColumn(col, F.expr(f"try_cast({col} AS {typ})"))
    data = os.path.join(_table_dir(args.catalog, args.name), "data")
    write_layout(
        df,
        data,
        lon=schema["lon"],
        lat=schema["lat"],
        dtg=schema.get("dtg"),
        fid=schema.get("fid"),
        attr_indexes=schema.get("attr_indexes") or [],
        st_copy=bool(schema.get("st_copy")),
    )
    n = spark.read.parquet(data).count()
    print(f"ingested {n} features into {args.name}")
    return 0


def _export_df(args, df, schema):
    from pyspark.sql import functions as F

    fmt = args.format
    props = args.properties.split(",") if args.properties else None
    if fmt == "csv":
        out = df.select(*(props or df.columns))
        out.write.mode("overwrite").option("header", True).csv(args.out)
    elif fmt in ("geojson", "json"):  # ExportCommand.scala:39: JSON == GeoJson
        from geomesa_spark.sources.convert import to_geojson

        line = to_geojson(df, lon=schema["lon"], lat=schema["lat"],
                          id_col=schema.get("fid"), props=props)
        df.select(line.alias("value")).write.mode("overwrite").text(args.out)
    elif fmt == "gml":
        from geomesa_spark.sources.convert import to_gml

        line = to_gml(df, lon=schema["lon"], lat=schema["lat"],
                      id_col=schema.get("fid"), props=props,
                      type_name=args.name)
        df.select(line.alias("value")).write.mode("overwrite").text(args.out)
    elif fmt == "arrow":
        from geomesa_spark.sources.arrow_io import to_arrow_ipc

        out = df.select(*(props or df.columns))
        to_arrow_ipc(out).write.mode("overwrite").parquet(args.out)
    elif fmt == "parquet":
        out = df.select(*(props or df.columns))
        out.write.mode("overwrite").parquet(args.out)
    elif fmt == "tsv":
        out = df.select(*(props or df.columns))
        out.write.mode("overwrite").option("header", True).option(
            "sep", "\t").csv(args.out)
    elif fmt == "bin":
        # BinFileExport (TLS/FeatureExporter.scala BinFileExport object):
        # packed 16-byte (hash, secs, lat, lon) records, time-sorted per
        # track, concatenated into ONE local file (the reference streams
        # to one file too; export result sets are small by design)
        from geomesa_spark.operators.bin_export import bin_pack
        from geomesa_spark.plans.compiler import GeoTable

        track = (getattr(args, "bin_track", None) or schema.get("fid")
                 or (schema.get("attr_indexes") or [None])[0])
        if not track:
            raise SystemExit("bin export needs --bin-track (schema has no "
                             "fid or attribute index to track by)")
        if not schema.get("dtg"):
            raise SystemExit("bin export needs a dtg column in the schema")
        t = GeoTable(df, lon=schema["lon"], lat=schema["lat"],
                     dtg=schema["dtg"], fid=schema.get("fid"))
        blobs = bin_pack(t, track).select("track", "record_bytes").collect()
        with open(args.out, "wb") as f:
            for r in sorted(blobs, key=lambda r: r["track"]):
                f.write(bytes(r["record_bytes"]))
    elif fmt == "shp":
        # FeatureExporter shapefile path (TLS/FeatureExporter.scala:62-96):
        # point features + .dbf attributes; export targets are small result
        # sets (collected driver-side by the writer)
        from geomesa_spark.sources.shapefile import write_shapefile

        attrs = props or [c for c in df.columns
                          if c not in (schema["lon"], schema["lat"])]
        wkt = F.format_string(
            "POINT (%s %s)", F.col(schema["lon"]), F.col(schema["lat"])
        )
        write_shapefile(df.select(wkt.alias("wkt"), *attrs), args.out,
                        wkt="wkt", attrs=attrs)
    else:
        raise SystemExit(f"unknown export format {fmt}")


def cmd_export(args) -> int:
    from geomesa_spark.plans.compiler import query

    spark = _session(args)
    table, schema = _open_table(spark, args.catalog, args.name)
    df = query(
        table,
        args.cql or "INCLUDE",
        limit=args.max_features,
        auths=set(args.auths.split(",")) if args.auths else None,
    )
    _export_df(args, df, schema)
    print(f"exported to {args.out} ({args.format})")
    return 0


def cmd_explain(args) -> int:
    from geomesa_spark.plans.compiler import compile_query

    spark = _session(args)
    table, _ = _open_table(spark, args.catalog, args.name)
    cq = compile_query(table, args.cql)
    s = cq.stats
    print(f"strategy: {s.strategy}")
    print(f"planning_ms: {s.planning_ms:.1f}")
    print(f"z_ranges: {s.n_z_ranges}  weeks: {s.n_weeks}")
    for note in s.notes:
        print(f"note: {note}")
    if args.plan:
        print(cq.df._jdf.queryExecution().executedPlan().toString())
    return 0


def cmd_compact(args) -> int:
    from geomesa_spark.sources.layout import compact_layout

    spark = _session(args)
    schema = _load_schema(args.catalog, args.name)
    data = os.path.join(_table_dir(args.catalog, args.name), "data")
    compact_layout(
        spark,
        data,
        lon=schema["lon"],
        lat=schema["lat"],
        dtg=schema.get("dtg"),
        fid=schema.get("fid"),
        target_partitions=args.target_partitions,
        attr_indexes=schema.get("attr_indexes") or [],
        st_copy=bool(schema.get("st_copy")),
    )
    print(f"compacted {args.name}")
    return 0


def cmd_query_stats(args) -> int:
    p = os.path.join(args.catalog, "_meta", "query_stats.jsonl")
    if not os.path.exists(p):
        print("(no query stats recorded)")
        return 0
    with open(p) as f:
        for ln in f:
            print(ln.rstrip())
    return 0


def cmd_version(args) -> int:
    print(f"geomesa_spark {VERSION}")
    return 0


def cmd_delete_catalog(args) -> int:
    """Delete an entire catalog (every table). Reference
    ``TLS/commands/DeleteCatalogCommand.scala`` (PromptConfirm -> --force)."""
    if not os.path.isdir(args.catalog):
        raise SystemExit(f"no such catalog: {args.catalog}")
    if not args.force:
        raise SystemExit("refusing to delete a whole catalog without --force")
    shutil.rmtree(args.catalog)
    print(f"deleted catalog {args.catalog}")
    return 0


# schema keys tableconf may update, with their coercions (the reference's
# TableConfCommand list/describe/update over table properties)
_TABLECONF_KEYS = {
    "lon": str, "lat": str, "dtg": str, "fid": str,
    "st_copy": lambda v: v.lower() in ("true", "1", "yes"),
    "target_partitions": int,
}


def cmd_tableconf(args) -> int:
    schema = _load_schema(args.catalog, args.name)
    if args.action == "list":
        for k in sorted(schema):
            print(f"{k}={json.dumps(schema[k])}")
        return 0
    if not args.param:
        raise SystemExit("describe/update need --param")
    if args.action == "describe":
        print(f"{args.param}={json.dumps(schema.get(args.param))}")
        return 0
    # update
    if args.param not in _TABLECONF_KEYS:
        raise SystemExit(
            f"not an updatable key: {args.param} "
            f"(updatable: {sorted(_TABLECONF_KEYS)})"
        )
    if args.value is None:
        raise SystemExit("update needs --value")
    schema[args.param] = _TABLECONF_KEYS[args.param](args.value)
    with open(os.path.join(_table_dir(args.catalog, args.name),
                           SCHEMA_FILE), "w") as f:
        json.dump(schema, f, indent=2)
    print(f"updated {args.param}")
    return 0


RASTER_META = "_raster.json"


def cmd_ingest_raster(args) -> int:
    """Ingest one raster chunk file into a raster table
    (``TLS/commands/IngestRasterCommand.scala`` / ``ingest/RasterIngest``).

    The payload is stored as an opaque binary column (GeoTIFF/DTED decode
    needs imaging libs this sandbox lacks — same declared seam as
    ``operators/multimodal``); tile keying, bbox metadata, level registry
    and the query path (``operators/tiling.raster_query``) are real."""
    from geomesa_spark.cells.tiles import tile_id

    bounds = [float(x) for x in args.bounds.split(",")]
    if len(bounds) != 4 or bounds[0] >= bounds[2] or bounds[1] >= bounds[3]:
        raise SystemExit("--bounds must be lon_min,lat_min,lon_max,lat_max")
    with open(args.file, "rb") as f:
        payload = f.read()
    d = os.path.join(_table_dir(args.catalog, args.name), "raster")
    meta_path = os.path.join(_table_dir(args.catalog, args.name), RASTER_META)
    meta = {"levels": []}
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
    os.makedirs(d, exist_ok=True)

    spark = _session(args)
    cx = (bounds[0] + bounds[2]) / 2.0
    cy = (bounds[1] + bounds[3]) / 2.0
    tid = int(tile_id(cx, cy, args.level))
    row = [(tid, bounds[0], bounds[1], bounds[2], bounds[3],
            os.path.basename(args.file), payload)]
    df = spark.createDataFrame(
        row,
        "tile_id long, c_lon_min double, c_lat_min double, "
        "c_lon_max double, c_lat_max double, source string, payload binary",
    )
    df.write.mode("append").parquet(os.path.join(d, f"level={args.level}"))
    if args.level not in meta["levels"]:
        meta["levels"] = sorted(meta["levels"] + [args.level])
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    print(f"ingested raster chunk into {args.name} at level {args.level} "
          f"(tile {tid})")
    return 0


def cmd_delete_raster(args) -> int:
    d = os.path.join(_table_dir(args.catalog, args.name), "raster")
    meta_path = os.path.join(_table_dir(args.catalog, args.name), RASTER_META)
    if not os.path.isdir(d):
        raise SystemExit(f"no raster table for {args.name}")
    if not args.force:
        raise SystemExit("refusing to delete raster data without --force")
    shutil.rmtree(d)
    if os.path.exists(meta_path):
        os.remove(meta_path)
    print(f"deleted raster data for {args.name}")
    return 0


# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="geomesa_spark",
        description="PySpark-native spatio-temporal engine command-line tools",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, data=False):
        p.add_argument("--catalog", required=True)
        if data:
            p.add_argument("--master", default=None)

    p = sub.add_parser("create", help="register a feature table schema")
    common(p)
    p.add_argument("--name", required=True)
    p.add_argument("--spec", default=None,
                   help="SFT spec string, e.g. "
                        "'id:String:index=true,dtg:Date,*geom:Point:srid=4326'")
    p.add_argument("--lon", default="lon")
    p.add_argument("--lat", default="lat")
    p.add_argument("--dtg", default=None)
    p.add_argument("--fid", default=None)
    p.add_argument("--attr-index", action="append")
    p.add_argument("--st-copy", action="store_true")
    p.add_argument("--cardinality", action="append",
                   help="col=high|low cost hints")
    p.set_defaults(fn=cmd_create)

    p = sub.add_parser("list", help="list feature tables")
    common(p)
    p.set_defaults(fn=cmd_list)

    p = sub.add_parser("describe", help="show a table's schema + layout state")
    common(p)
    p.add_argument("--name", required=True)
    p.set_defaults(fn=cmd_describe)

    p = sub.add_parser("removeschema", help="delete a feature table")
    common(p)
    p.add_argument("--name", required=True)
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_remove_schema)

    p = sub.add_parser("ingest", help="ingest a file into a table's layout")
    common(p, data=True)
    p.add_argument("--name", required=True)
    p.add_argument("--file", required=True)
    p.add_argument("--format", default="csv",
                   choices=["csv", "tsv", "parquet", "shp", "avro"])
    p.add_argument("--delimiter", default=",")
    p.add_argument("--fields", default=None, help="comma-separated raw field names")
    p.add_argument("--spec", action="append",
                   help="converter entries 'out = expr' (registry DSL)")
    p.add_argument("--cast", action="append", help="col:type casts after convert")
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("export", help="query a table and export features")
    common(p, data=True)
    p.add_argument("--name", required=True)
    p.add_argument("--cql", default=None)
    p.add_argument("--format", default="csv",
                   choices=["csv", "tsv", "geojson", "json", "gml", "arrow",
                            "parquet", "shp", "bin"])
    p.add_argument("--out", required=True)
    p.add_argument("--bin-track", default=None,
                   help="track column for --format bin (default: fid)")
    p.add_argument("--max-features", type=int, default=None)
    p.add_argument("--properties", default=None, help="comma-separated projection")
    p.add_argument("--auths", default=None, help="visibility authorizations")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("explain", help="show the plan for a CQL query")
    common(p, data=True)
    p.add_argument("--name", required=True)
    p.add_argument("--cql", required=True)
    p.add_argument("--plan", action="store_true", help="print the physical plan")
    p.set_defaults(fn=cmd_explain)

    p = sub.add_parser("compact", help="rewrite a layout at new file granularity")
    common(p, data=True)
    p.add_argument("--name", required=True)
    p.add_argument("--target-partitions", type=int, default=None)
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("querystats", help="print the query audit log")
    common(p)
    p.set_defaults(fn=cmd_query_stats)

    p = sub.add_parser("deletecatalog", help="delete an entire catalog")
    common(p)
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_delete_catalog)

    p = sub.add_parser("tableconf", help="list/describe/update table config")
    common(p)
    p.add_argument("action", choices=["list", "describe", "update"])
    p.add_argument("--name", required=True)
    p.add_argument("--param", default=None)
    p.add_argument("--value", default=None)
    p.set_defaults(fn=cmd_tableconf)

    p = sub.add_parser("ingestraster", help="ingest a raster chunk file")
    common(p, data=True)
    p.add_argument("--name", required=True)
    p.add_argument("--file", required=True)
    p.add_argument("--bounds", required=True,
                   help="lon_min,lat_min,lon_max,lat_max "
                        "(use --bounds=-80,... when lon_min is negative)")
    p.add_argument("--level", type=int, required=True)
    p.set_defaults(fn=cmd_ingest_raster)

    p = sub.add_parser("deleteraster", help="delete a table's raster data")
    common(p)
    p.add_argument("--name", required=True)
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_delete_raster)

    p = sub.add_parser("version", help="print the engine version")
    p.set_defaults(fn=cmd_version)
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
