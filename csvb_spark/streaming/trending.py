"""Streaming trending-terms (windowed heavy hitters) over a document
stream.

A continuously-ingesting corpus pipeline wants to see WHAT is arriving
— the terms spiking inside each event-time window drive boilerplate
alarms (a template suddenly dominating a crawl), topic drift
dashboards, and hot-key warnings for the downstream dedup shuffles.

Plan: readStream → watermark → explode(tokens) → incremental
groupBy(window, token) count. The state store holds one counter per
(window, token) — bounded by the watermark horizon, NOT stream length
(expired windows are evicted). Ranking (top-k per window) is NOT part
of the incremental aggregation: rank-k is not incrementally
maintainable under updates without sorting state, so it runs as an
ordinary window function over the materialized counts at read time —
the standard split between what streams (counts) and what the reader
computes (order).

The reference has no streaming surface (SURVEY.md §2.B.10); this
composes the same tokenizer the batch operators use
(``text.tokens``), so stream and batch agree term-for-term — proven by
the equivalence test in tests/test_streaming_trending.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window

from csvb_spark.operators.text import tokens


def trending_counts_stream(
    spark: SparkSession,
    src_dir: str,
    schema: StructType,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """The unstarted streaming DataFrame: per-(window, token) counts
    with watermarked late-data handling. Caller picks the sink."""
    return (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        # watermarks require TIMESTAMP; parquet written without a tz
        # annotation arrives as TIMESTAMP_NTZ (session tz is UTC, so
        # the cast is value-preserving)
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col), F.explode_outer(tokens(text_col)).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy(F.window(ts_col, window).alias("w"), F.col("token"))
        .agg(F.count("*").alias("n"))
    )


def rank_trending(counts: DataFrame, k: int = 5) -> DataFrame:
    """Top-k tokens per window over materialized counts (batch side).
    The partition key is the window, so the sort is per-window local —
    never a global single-partition order."""
    w = Window.partitionBy("w").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("w.start").alias("bucket_start"),
            "token",
            "n",
            "rank",
        )
    )


def run_trending_terms(
    spark: SparkSession,
    src_dir: str,
    schema: StructType,
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 5,
    ts_col: str = "ts",
    text_col: str = "text",
    query_name: str = "trending_terms",
) -> DataFrame:
    """Drive the trending-terms stream over all files currently in
    ``src_dir`` (one micro-batch per file-listing pass) and return the
    ranked top-k per window.

    complete-mode memory sink for the demo; at scale the counts land
    in a keyed table (Delta/upsert sink) and ``rank_trending`` is the
    reader's query."""
    counts = trending_counts_stream(
        spark, src_dir, schema, window, watermark, ts_col, text_col
    )
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return rank_trending(spark.sql(f"SELECT * FROM {query_name}"), k)
