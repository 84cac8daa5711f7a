"""geomesa_spark — a PySpark-native spatio-temporal analytics engine.

A from-scratch rebuild of the capabilities of the GeoMesa reference
(2015-era LocationTech GeoMesa 1.1.x, see /root/reference) expressed
Spark-first: space-filling-curve cell columns + partition pruning replace
Accumulo key-range scans, Catalyst replaces the iterator stack, and all
custom kernels are vectorized numpy over Arrow batches (no per-row Python).

Layers
------
cells      : Z2/Z3 Morton curves, geohash, XYZ tiles (numpy kernels)
geom       : pure-numpy geometry kernels (point-in-polygon, bbox, distance, WKT)
plans      : ECQL-ish predicate AST + compiler -> (partition prune, z-ranges, residual)
operators  : spatial join, kNN, tube, density, unique, BIN, dedup, ANN, text stats
sources    : ingest converters (delimited / fixed-width), exporters, webpages synth
functions  : converter expression-function registry (Spark Column expressions)
streaming  : live upsert view with TTL, replay reconstruction
runtime    : query stats / lineage metrics, session helpers
"""

from geomesa_spark.runtime.session import get_session  # noqa: F401

__version__ = "0.1.0"
