from geomesa_spark.geom.wkt import parse_wkt, Geometry  # noqa: F401
from geomesa_spark.geom.kernels import (  # noqa: F401
    points_in_polygon,
    points_in_bbox,
    haversine_m,
    meters_to_degrees,
)
