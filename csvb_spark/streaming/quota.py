"""Streaming per-domain admission quota: the crawl-frontier twin of
``csvb_spark.operators.web.domain_quota_sample``.

A live ingest cannot rank the whole corpus before admitting documents,
so the streaming gate enforces the quota as an ADMISSION policy:
across micro-batches, first-arrived wins; within a micro-batch, the
same deterministic priority as the batch operator (Knuth
multiplicative hash of the id) breaks the tie. Consequences, stated
rather than hidden:

- a single-micro-batch source is EXACTLY the batch operator's
  selection (the test asserts row-for-row equality);
- across batches the gate never evicts an admitted document (an
  earlier batch's keeper stays kept — the property an append-only
  sink needs), so the multi-batch result can differ from re-ranking
  the union in batch. That is the standard frontier-cap semantics,
  not an approximation bug.

Shape: URL canonicalization and domain extraction run as ordinary
Column expressions BEFORE the stateful operator (JVM-side, no Python
in that part of the row path); the per-domain kept-count lives in
``applyInPandasWithState`` state (one bigint per domain), and each
micro-batch's group folds in Arrow batches. The stateful closure
captures only stdlib/ints — never csvb_spark names — so executors
need nothing importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from csvb_spark.operators.web import (
    quota_priority,
    registered_domain,
    url_normalize,
)

OUTPUT_SCHEMA = (
    "doc_id bigint, url_norm string, domain string, pick_rank int"
)
STATE_SCHEMA = "n bigint"


def run_streaming_quota(
    spark: SparkSession,
    source_dir: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    quota: int = 10,
    query_name: str = "docs_stream_quota",
) -> DataFrame:
    """Drive a file-source stream over ``source_dir`` (one micro-batch
    per file) through the per-domain admission quota to completion;
    return the admitted rows. ``pick_rank`` is the domain's cumulative
    admission rank (1-based), so an append-only sink of this output is
    directly comparable to the batch operator's.
    """
    if quota < 1:
        raise ValueError(f"run_streaming_quota: quota must be >= 1, got {quota}")
    schema = spark.read.parquet(source_dir).schema
    names = [f.name for f in schema.fields]
    for col in (url_col, id_col):
        if col not in names:
            raise ValueError(
                f"run_streaming_quota: column {col!r} not in source"
                f" (have: {', '.join(names)})"
            )

    def gate(key, pdfs, state):
        import pandas as _pd

        (domain,) = key
        rows = _pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["_prio", "doc_id"])
        n = state.get[0] if state.exists else 0
        room = quota - n
        kept = rows.head(max(room, 0))
        state.update((n + len(kept),))
        yield _pd.DataFrame(
            {
                "doc_id": kept["doc_id"].astype("int64"),
                "url_norm": kept["url_norm"],
                "domain": domain,
                "pick_rank": _pd.array(
                    range(n + 1, n + 1 + len(kept)), dtype="int32"
                ),
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .select(
            F.col(id_col).alias("doc_id"),
            url_normalize(url_col).alias("url_norm"),
        )
        .withColumn("domain", registered_domain(F.col("url_norm")))
        .withColumn("_prio", quota_priority("doc_id"))
        .groupBy("domain")
        .applyInPandasWithState(
            gate,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
