"""Sessionization: gap-based event sessions, batch and streaming.

Beyond-reference capability (the reference has no streaming or
session operators — SURVEY.md §2.B.10): group a user's events into
sessions that close after ``gap`` of inactivity.

- ``sessionize``: batch, via Spark's native ``session_window`` —
  one shuffle on the grouping key, sessions merged by Catalyst's
  session-window aggregation (codegen'd, mergeable at scale).
- ``csvb_spark.streaming.sessions``: the same semantics maintained
  incrementally with ``applyInPandasWithState``.

Session semantics (standard gap definition): an event extends the
current session if ``ts - previous_ts <= gap``, else it starts a new
one. Deterministic given (user_id, ts, event_id) ordering, so the
batch operator carries a DuckDB oracle (lag + cumulative-sum session
numbering — the textbook SQL formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per (user, session): bounds, event count, total value.

    ``session_window`` keeps the aggregation partial-mergeable: map-side
    partial sessions are merged after the shuffle on ``user_col``, so
    skewed users cost one reduce task, not a window sort of the whole
    partition.
    """
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
            ).alias("total_value"),
        )
        .select(
            user_col, "session_start", "session_end", "n_events", "total_value"
        )
    )


def sessionize_oracle_sql(gap_minutes: int = 30) -> str:
    """DuckDB-equivalent SQL: lag + cumulative sum session numbering."""
    return f"""
WITH numbered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   <= INTERVAL {gap_minutes} MINUTE
              THEN 0 ELSE 1 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM numbered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""
