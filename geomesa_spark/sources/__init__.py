from geomesa_spark.sources.layout import enrich_geo, write_layout, read_layout  # noqa: F401
