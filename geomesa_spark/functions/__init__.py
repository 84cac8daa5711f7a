from geomesa_spark.functions.zexpr import z3_expr, z2_expr, week_expr, seconds_in_week_expr, tile_id_expr  # noqa: F401
from geomesa_spark.functions.registry import FUNCTIONS, resolve_function  # noqa: F401
