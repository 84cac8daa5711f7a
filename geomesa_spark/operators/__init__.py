from geomesa_spark.operators.spatial_join import spatial_join, polygon_covers  # noqa: F401
from geomesa_spark.operators.knn import knn_join, knn_ring_expansion  # noqa: F401
from geomesa_spark.operators.aggregations import (  # noqa: F401
    density,
    temporal_density,
    unique_histogram,
    bounds,
)
from geomesa_spark.operators.tiling import assign_tiles, tile_counts  # noqa: F401
