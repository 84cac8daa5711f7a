from geomesa_spark.plans.predicates import parse_cql  # noqa: F401
from geomesa_spark.plans.compiler import GeoTable, compile_query  # noqa: F401
