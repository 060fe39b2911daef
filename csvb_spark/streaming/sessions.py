"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

Same session semantics as the batch operator
(``csvb_spark.operators.sessions.sessionize``), maintained
incrementally: per-user state holds the open session (start, last
event ts, count, value sum); each micro-batch folds its events into
that state, emitting every session it touched — closed sessions are
final, the still-open session is emitted as its current snapshot and
superseded by a later emission with the same (user_id, session_start)
key (standard upsert-stream shape; a keyed sink keeps the latest row).

For a finite file source (the fixture) the last micro-batch's snapshot
IS the final state, so the drained output equals the batch operator
row-for-row — which is what the test asserts. In production you would
add a watermark and EventTimeTimeout to also flush sessions of users
that simply stop sending events.

State is Arrow-batched per group (pandas in, pandas out) — the row
path never touches Python objects one at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.window import Window

from csvb_spark.sources.catalog import normalize_event_ts_for_stream

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# open-session snapshot: micros for timestamps (stable across Arrow)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint, total double"


def run_stateful_sessionization(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = 30,
    query_name: str = "events_stream_sessions",
) -> DataFrame:
    """Drive the file-source stream to completion and return the
    drained session table (latest snapshot per session key)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    gap_us = gap_minutes * 60 * 1_000_000

    # Self-contained closure: captures only ints/stdlib so pickling
    # never drags csvb_spark onto the executors.
    def fold(key, pdfs, state):
        import pandas as _pd

        (user_id,) = key
        rows = _pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].astype("int64") // 1000
        vals = rows["value"].astype(float)

        if state.exists:
            start_us, last_us, n, total = state.get
        else:
            start_us = last_us = None
            n, total = 0, 0.0

        out = []
        for t, v in zip(ts_us, vals):
            t = int(t)
            if start_us is not None and t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n, round(total, 6)))
                start_us, n, total = None, 0, 0.0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
            total += v
        # snapshot of the still-open session (superseded on update)
        out.append((user_id, start_us, last_us, n, round(total, 6)))
        state.update((start_us, last_us, n, total))

        yield _pd.DataFrame(
            {
                "user_id": [r[0] for r in out],
                "session_start": _pd.to_datetime([r[1] for r in out], unit="us"),
                "session_end": _pd.to_datetime([r[2] for r in out], unit="us"),
                "n_events": [r[3] for r in out],
                "total_value": [r[4] for r in out],
            }
        )

    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .transform(normalize_event_ts_for_stream)
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
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
    # latest emission per session key wins (upsert-stream semantics)
    snap = spark.sql(f"SELECT * FROM {query_name}")
    w = Window.partitionBy("user_id", "session_start").orderBy(
        F.desc("session_end"), F.desc("n_events")
    )
    return (
        snap.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
