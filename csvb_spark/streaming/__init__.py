from csvb_spark.streaming.events import run_windowed_aggregation  # noqa: F401
