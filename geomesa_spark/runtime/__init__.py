from geomesa_spark.runtime.session import get_session  # noqa: F401
