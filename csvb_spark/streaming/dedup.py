"""Streaming exact-dedup: watermark-bounded duplicate drop over an
append stream.

The reference has NO streaming surface (SURVEY.md §2.B.10); this is
the streaming twin of the batch exact-dedup operator
(``csvb_spark.operators.dedup``), the shape a continuously-ingesting
corpus build needs: duplicates arriving in LATER micro-batches are
dropped against keyed state, and the watermark bounds that state —
dedup memory is O(events within the reordering window), not O(corpus).

``dropDuplicatesWithinWatermark`` semantics: an exact duplicate
carries the SAME event time as its original, so it is always inside
the original's watermark window — the delay only has to cover the
out-of-orderness of the feed (how late a duplicate can arrive), never
the corpus time span. State for a key is evicted once the watermark
passes its event time + delay: bounded, scale-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csvb_spark.sources.catalog import normalize_event_ts_for_stream


def run_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "45 days",
    query_name: str = "events_stream_dedup",
) -> DataFrame:
    """Drive a file-source stream over ``source_dir`` (one micro-batch
    per file — duplicate FILES model duplicates arriving later) to
    completion; return the deduplicated append-mode result.

    Plan: readStream(parquet, maxFilesPerTrigger=1) → watermark →
    dropDuplicatesWithinWatermark(keys) → append-mode memory sink. At
    scale the source is Kafka/object-store notifications and the sink
    a Delta/parquet table; the middle is identical.
    """
    first = spark.read.parquet(source_dir)
    schema = first.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .transform(normalize_event_ts_for_stream)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
