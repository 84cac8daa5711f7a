from geomesa_spark.streaming.live import live_view, replay_snapshot  # noqa: F401
