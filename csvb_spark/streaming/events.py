"""Structured Streaming demonstration over the events fixture.

The reference has NO streaming surface (SURVEY.md §2.B.10 — verified:
no watermark/window/state code anywhere), so nothing here is required
for parity. This module exists because a real 100 TB training-data
pipeline ingests continuously: it shows the engine's batch operators
(time-bucket aggregation) re-expressed as an incremental streaming
query with watermarked late-data handling — same logical result as
q33_time_bucket, incrementally maintained.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csvb_spark.sources.catalog import normalize_event_ts_for_stream


def run_windowed_aggregation(
    spark: SparkSession,
    sf_dir: str,
    window: str = "15 minutes",
    watermark: str = "1 hour",
    query_name: str = "events_stream_agg",
) -> DataFrame:
    """Drive a file-source stream over events.parquet to completion
    (one micro-batch per file) and return the materialized result.

    Plan: readStream(parquet) → watermark → window+type groupBy →
    complete-mode memory sink. At scale the source is Kafka/object
    store and the sink a Delta/parquet table — the middle is identical.
    """
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file stream source lists a directory; pathGlobFilter narrows it
    # to the events table
    stream = (
        normalize_event_ts_for_stream(
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
