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
