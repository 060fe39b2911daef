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


def event_funnel(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered CONVERSION funnel: how many users reach each step, where
    step i+1 counts only events STRICTLY AFTER the user's earliest
    completion of step i (the standard product-analytics funnel — and
    the same shape a pipeline uses to audit multi-stage ingest
    telemetry). Output: one row per step, ``(step_idx, step, n_users,
    pct_of_first)``; ``pct_of_first`` is an exact-count division,
    shipped unrounded.

    Plan: one equi-join on the user per step beyond the first (steps
    are a short constant list), each preceded by a type filter that
    pushes into the scan; per-step state is one ``(user, min_ts)``
    aggregate — fixed-width rows, never the event table — and each
    step's state is eagerly ``localCheckpoint``-ed before its count so
    step i+1 starts from materialized step-i rows: without that, the
    count at step i re-executes steps 1..i from the raw scan and an
    S-step funnel costs ~S²/2 scans instead of S. No windows, no
    driver-side data beyond the S counts.
    """
    if len(steps) < 2:
        raise ValueError("event_funnel: need at least two steps")
    u, t, ts = user_col, type_col, ts_col
    reached = (
        events.filter(F.col(t) == steps[0])
        .groupBy(u)
        .agg(F.min(ts).alias("_t"))
        .localCheckpoint(eager=True)
    )
    counts = [reached.count()]
    for s in steps[1:]:
        reached = (
            events.filter(F.col(t) == s)
            .join(reached, u)
            .filter(F.col(ts) > F.col("_t"))
            .groupBy(u)
            .agg(F.min(ts).alias("_t"))
            .localCheckpoint(eager=True)
        )
        counts.append(reached.count())
    spark = events.sparkSession
    rows = [
        (i + 1, s, int(n)) for i, (s, n) in enumerate(zip(steps, counts))
    ]
    out = spark.createDataFrame(
        rows, "step_idx int, step string, n_users bigint"
    )
    return out.select(
        "step_idx",
        "step",
        "n_users",
        (
            F.col("n_users").cast("double") / F.lit(float(counts[0]))
            if counts[0]
            else F.lit(None).cast("double")
        ).alias("pct_of_first"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly COHORT retention matrix — users grouped by the ISO week
    of their FIRST event, counted once per subsequent week they
    remain active: the canonical growth-analytics table, and the
    freshness/engagement audit for a streaming ingest's source feeds.
    Output: ``(cohort_week, week_offset, n_users)`` — cohort_week a
    DATE (Monday), ``week_offset`` in whole weeks (0 = the cohort
    week itself).

    Plan: one ``(user, first_ts)`` aggregate, joined back (user
    equi-join) onto the per-user-week distinct activity — both sides
    fixed-width; offsets are integer day arithmetic (``datediff /
    7``, exact in any engine).
    """
    u, ts = user_col, ts_col
    first = events.groupBy(u).agg(F.min(ts).alias("_first"))
    weekly = (
        events.select(u, F.date_trunc("week", F.col(ts)).alias("_w"))
        .distinct()
        .join(first, u)
        .withColumn("_cw", F.date_trunc("week", F.col("_first")))
    )
    return (
        weekly.groupBy(
            F.col("_cw").cast("date").alias("cohort_week"),
            (
                F.datediff(F.col("_w").cast("date"), F.col("_cw").cast("date"))
                / F.lit(7)
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


def props_stats(
    events: DataFrame,
    json_col: str = "props",
    field: str = "k",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-type stats over a JSON PROPERTIES column — event streams
    carry their payload as a JSON string, and the first analytics
    question is always "what does field X look like per event type".
    Output: ``(event_type, n_events, n_with_field, min_f, max_f,
    avg_f)`` — the field parsed as an integer; ``avg_f`` is an
    exact-integer-sum division (unrounded, engine-identical).

    ``get_json_object`` is JVM-side (Jackson) — map-only extraction,
    one partial-aggregated groupBy on the type.
    """
    v = F.get_json_object(F.col(json_col), f"$.{field}").cast("bigint")
    return (
        events.select(F.col(type_col), v.alias("_v"))
        .groupBy(type_col)
        .agg(
            F.count("*").alias("n_events"),
            F.count("_v").alias("n_with_field"),
            F.min("_v").alias("min_f"),
            F.max("_v").alias("max_f"),
            (
                F.sum("_v").cast("double") / F.count("_v").cast("double")
            ).alias("avg_f"),
        )
    )


def funnel_latency(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion LATENCY companion to :func:`event_funnel`: for each
    consecutive step pair, how long converting users took — median and
    mean hours between the user's earliest step-i completion and the
    earliest step-i+1 event strictly after it. Output: one row per
    transition, ``(step_idx, from_step, to_step, n_users,
    median_hours, mean_hours)``.

    Determinism: everything derives from exact INTEGER microsecond
    differences — the median interpolates (a+b)/2 from exact ints, the
    mean divides an exact int64 sum — and the hour conversions are
    single IEEE divisions of those exact values, shipped UNROUNDED
    (rounding an exactly-agreed double is the half-boundary trap
    queries/common.py documents).

    Same plan shape as the funnel: fixed-width ``(user, min_ts)``
    state per step (localCheckpoint-ed — see event_funnel), one user
    equi-join per transition; the latency aggregate per transition is
    over at most one row per converting user.
    """
    if len(steps) < 2:
        raise ValueError("funnel_latency: need at least two steps")
    u, t, ts = user_col, type_col, ts_col
    reached = (
        events.filter(F.col(t) == steps[0])
        .groupBy(u)
        .agg(F.min(ts).alias("_t"))
        .localCheckpoint(eager=True)
    )
    out = None
    for i, s in enumerate(steps[1:], start=1):
        nxt = (
            events.filter(F.col(t) == s)
            .join(reached, u)
            .filter(F.col(ts) > F.col("_t"))
            .groupBy(F.col(u), F.col("_t").alias("_prev"))
            .agg(F.min(ts).alias("_t"))
            .localCheckpoint(eager=True)
        )
        micros = F.unix_micros(F.col("_t").cast("timestamp")) - F.unix_micros(
            F.col("_prev").cast("timestamp")
        )
        stats = (
            nxt.select(micros.alias("_us"))
            .agg(
                F.count("*").alias("n_users"),
                (F.percentile("_us", F.lit(0.5)) / F.lit(3600.0e6)).alias(
                    "median_hours"
                ),
                (
                    (F.sum("_us").cast("double") / F.count("*"))
                    / F.lit(3600.0e6)
                ).alias("mean_hours"),
            )
            .select(
                F.lit(i).alias("step_idx"),
                F.lit(steps[i - 1]).alias("from_step"),
                F.lit(s).alias("to_step"),
                "n_users",
                "median_hours",
                "mean_hours",
            )
        )
        out = stats if out is None else out.unionByName(stats)
        reached = nxt.select(u, "_t")
    return out


def activity_heatmap(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Weekday × hour activity grid — the "when is this feed alive"
    heatmap behind crawl scheduling and anomaly baselines. Output:
    ``(dow, hour, n_events)`` with ISO weekday (1 = Monday). One
    partial-aggregated groupBy over ≤ 168 cells."""
    return (
        events.groupBy(
            (F.weekday(F.col(ts_col)) + 1).cast("int").alias("dow"),
            F.hour(F.col(ts_col)).cast("int").alias("hour"),
        )
        .agg(F.count("*").alias("n_events"))
    )


def ewma_value(
    events: DataFrame,
    alpha: float = 0.3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user exponentially weighted moving average of ``val_col``
    over the event stream in time order: one row per user —
    ``user_col, n_events, ewma`` (rounded to 6 decimals at the end).

    y_1 = x_1 and y_t = (1-α)·y_{t-1} + α·x_t, folded LEFT-TO-RIGHT
    over the (ts, id) total order — the fold order IS the spec, which
    makes the result engine-portable: DuckDB replays it exactly with
    ``list_reduce(list(value ORDER BY ts, event_id), ...)`` (the
    first element is the init on both engines), so the x149 oracle
    hash-matches bit-for-bit. A closed-form window formulation
    (Σ α(1-α)^(t-i)·x_i) would be mathematically equal but
    numerically different — fold, don't expand.

    Scale shape: one shuffle on the user key, then per-user work is a
    JVM-side array_sort + HOF fold inside codegen (no Python, no
    window sort of the whole partition). Per-user event counts are
    assumed session-scale (the collected array is per GROUP, not per
    partition); events with NULL ts or value are ignored.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"ewma_value: alpha must be in (0, 1], got {alpha}")
    e = events.filter(
        F.col(val_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(id_col).alias("i"),
                F.col(val_col).alias("v"),
            )
        )
    )
    g = e.groupBy(user_col).agg(arr.alias("_a"))
    vs = F.transform(F.col("_a"), lambda s: s["v"])
    y = F.aggregate(
        F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0))),
        F.element_at(vs, 1),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )
    return g.select(
        user_col,
        F.size("_a").cast("bigint").alias("n_events"),
        F.round(y, 6).alias("ewma"),
    )
