"""Space-filling-curve / discrete-global-grid cell kernels.

All kernels are vectorized numpy over uint64 arrays so they can run inside
Arrow-batched pandas UDFs with zero per-row Python.

Mirrors the capability surface of the reference's curve modules
(geomesa-z3/src/main/scala/org/locationtech/geomesa/curve/Z3.scala,
geomesa-utils/.../geohash/GeoHash.scala) without porting their code: the
bit-interleaving uses the standard public magic-mask Morton construction and
the range cover uses prefix-octree decomposition (Tropf & Herzog 1981 style).
"""

from geomesa_spark.cells.zcurve import (  # noqa: F401
    SECONDS_PER_WEEK,
    Z2,
    Z3,
    epoch_week,
    seconds_in_week,
)
from geomesa_spark.cells.geohash import geohash_encode, geohash_decode_bbox, geohash_neighbors  # noqa: F401
from geomesa_spark.cells.tiles import tile_xy, tile_id  # noqa: F401
