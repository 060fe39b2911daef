"""SparkSession factory for the csvb_spark engine.

Mirrors the reference engine's session construction
(``CsvbCore::new``, reference csvb_engine/src/lib.rs:19-31): a session
with a catalog, information-schema introspection, and a bounded
memory budget (greedy pool, default 10 GiB — reference
csvb/src/bin/csvb.rs:16-18). In Spark the analogous knobs are driver
memory (local mode) and the unified memory manager, which spills
sort/agg/join state to disk instead of aborting — a strict upgrade.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace any hand-tuned plan.
- ``spark.sql.shuffle.partitions`` defaults to the local core count
  here; on a real cluster it should be ~2-3x total cores or left to
  AQE's coalescing with a high initial value.
- Arrow enabled so any pandas/UDF boundary is columnar, not pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_MEMORY_POOL_BYTES = 10 * 1024**3  # reference csvb/src/bin/csvb.rs:16-18


def get_session(
    app_name: str = "csvb_spark",
    master: str | None = None,
    memory_pool_bytes: int | None = DEFAULT_MEMORY_POOL_BYTES,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    scheduler_mode: str = "FIFO",
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``memory_pool_bytes`` maps the reference's ``--memory-pool-bytes``
    greedy-pool budget onto driver memory in local mode, and DEFAULTS
    to the reference's 10 GiB default (Spark's own 1g driver heap is
    far below the parity contract, and broadcast builds at sf1 hit
    it). Pass ``None`` to keep Spark's default. It only takes effect
    if no JVM is up yet (Spark can't resize a live JVM).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # SURVEY §3.2: the pgwire serve path is multi-client — FAIR
        # scheduling + a scheduler pool per connection (server/pgwire)
        # stops one long query from head-of-line-blocking every other
        # session's jobs. NOT the default: a round-12 A/B (3 process
        # pairs, 13-query headline set at sf0.1, per-query medians —
        # SCALE.md §FAIR) measured a consistent 4-22% per-query cost
        # for FAIR on single-user batch work (pool bookkeeping on
        # every task-set), so batch keeps FIFO and only the serve CLI
        # paths opt in via scheduler_mode="FAIR".
        .config("spark.scheduler.mode", scheduler_mode)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # fixture `events` carries TIMESTAMP(NANOS); Spark has no nanos
        # type — read as long, converted in sources.catalog
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if master.startswith("local"):
        # LOCAL-MODE-ONLY (like operators/dedup.spread): fixture tables
        # are single parquet files of a few MB, which the default 128 MB
        # split size reads as ONE task — serializing every scan onto one
        # core. 1 MB splits give the local core count something to do
        # (q33 2× faster at sf0.1). On a cluster the default stands:
        # real inputs have more files/row-groups than cores, and a small
        # split size there would explode the task count (100 TB / 1 MB
        # = 10^8 tasks).
        builder = builder.config(
            "spark.sql.files.maxPartitionBytes", str(1024 * 1024)
        )
    if memory_pool_bytes is not None:
        # Greedy-pool parity: reference aborts the query when the pool is
        # exhausted; Spark spills instead. We budget the JVM heap.
        builder = builder.config(
            "spark.driver.memory", f"{max(1, memory_pool_bytes // 1024**3)}g"
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from csvb_spark.functions import register_all

    register_all(spark)
    return spark
