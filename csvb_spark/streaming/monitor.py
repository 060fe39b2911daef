"""Streaming data-quality monitoring: evaluate the batch
expectation contracts (``operators/expectations.py``) on EVERY
micro-batch of an arriving stream and append the per-batch report to
a metrics table.

This is the observability half of the ingest story: the ingest
pipeline gates documents, the monitor watches the gate — null-rate
spikes, id-uniqueness breaks inside a batch, out-of-set values — with
per-batch granularity, so a bad upstream push is localized to the
batch that carried it instead of discovered in a corpus-wide audit.

Same single-pass economics as batch: every check is a conditional
aggregate fused into ONE aggregation over the micro-batch; the
metrics sink grows by |checks| rows per batch (tiny). foreachBatch
because the expectation aggregate is a batch plan; the checkpoint
makes re-delivery idempotent-enough for an append metrics sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from csvb_spark.operators.expectations import Expectation, check_expectations


def run_expectation_monitor(
    spark: SparkSession,
    source_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    checks: list[Expectation],
    query_name: str = "expectation_monitor",
) -> DataFrame:
    """Drive the monitor over all files currently in ``source_dir``
    (one micro-batch per file) and return the accumulated metrics
    table ``(batch_id, check_name, metric, threshold, passed)``."""
    schema = spark.read.parquet(source_dir).schema

    def _report(batch: DataFrame, batch_id: int) -> None:
        (
            check_expectations(batch, checks)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .select("batch_id", "check_name", "metric", "threshold", "passed")
            .write.mode("append")
            .parquet(metrics_dir)
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_report)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(metrics_dir)


def run_drift_monitor(
    spark: SparkSession,
    source_dir: str,
    reference_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    k: int = 20,
    query_name: str = "drift_monitor",
) -> DataFrame:
    """Per-micro-batch token-distribution drift against a REFERENCE
    corpus snapshot: each arriving batch reports its top-``k`` KL
    drift contributions (``operators.lm.token_drift``), so vocabulary
    shift — a crawl source going spammy, an upstream language mix
    change — is localized to the batch that carried it, the drift
    twin of the expectation monitor above.

    The reference token counts depend only on ``reference_dir``
    contents, so they are aggregated ONCE before the stream starts
    and persisted — per-batch cost is one count aggregation over the
    BATCH plus the (vocabulary-bounded) full-outer join against the
    cached reference counts, independent of reference size. Metrics
    sink grows by ``k`` rows per batch. Returns the accumulated
    ``(batch_id, token, n_old, n_new, contrib)`` table.
    """
    from csvb_spark.operators.lm import token_counts, token_drift_from_counts

    schema = spark.read.parquet(source_dir).schema
    # count the fixed side once; materialize eagerly so no micro-batch
    # pays the reference scan (vocabulary-bounded, so caching is cheap)
    ref_counts = (
        token_counts(spark.read.parquet(reference_dir), text_col)
        .withColumnRenamed("n", "n_old")
        .persist()
    )
    ref_counts.count()

    def _report(batch: DataFrame, batch_id: int) -> None:
        nc = token_counts(batch, text_col).withColumnRenamed("n", "n_new")
        (
            token_drift_from_counts(ref_counts, nc, k=k)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .select("batch_id", "token", "n_old", "n_new", "contrib")
            .write.mode("append")
            .parquet(metrics_dir)
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_report)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.read.parquet(metrics_dir)
    finally:
        q.stop()
        ref_counts.unpersist()
