"""Temporal operators Spark's SQL surface lacks as primitives: as-of
join, range (interval-containment) join, and hierarchical time rollup.

The reference has none of these (its surface is DataFusion 44 SQL —
SURVEY.md §2.B; as-of/range rows are ✗ there too); they are the
standard temporal shapes a 100 TB event pipeline needs, implemented
as compositions of DataFrame ops chosen for their SHUFFLE shape:

- ``asof_join``: the union-then-window trick — one shuffle on the
  join key, one partition-local sort, zero nested-loop work. The
  naive formulation (theta join on ``r.ts <= l.ts`` + argmax) is a
  BroadcastNestedLoopJoin: O(|L|·|R|) per key and a driver-killer at
  scale.
- ``range_join_binned``: intervals exploded onto fixed-width bins,
  points hashed to their bin, equi-join on the bin, exact containment
  as a post-filter. Turns the O(n·m) interval theta join into a
  shuffle join whose fan-out is bounded by interval_width/bin_width.
- ``time_rollup``: aggregate the FINEST granularity once, then merge
  those partials upward (counts and decimal sums are mergeable), so N
  granularities cost one scan + N-1 tiny re-aggregations — the
  continuous-aggregate / hypertable-rollup shape — instead of N scans
  of the raw table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the LATEST right
    row with ``right.ts <= left.ts`` in the same ``on`` group (NULLs
    when no such row) — ASOF LEFT JOIN, backward direction, equal
    timestamps match.

    ``value_cols`` must not collide with left's columns. If several
    right rows share (on, ts), the one with the greatest
    ``right_tiebreak`` wins (required for determinism when such ties
    are possible).

    Plan: right is deduped per (on, ts) [one window], both sides are
    unioned and windowed with ``last(value, ignorenulls=True)`` over
    (on ORDER BY ts, side) — left rows sort after right rows at equal
    ts, giving the >= semantics. One shuffle on ``on``; no join node
    at all.
    """
    value_cols = value_cols or []
    r = right.select(*on, ts_col, *value_cols)
    if right_tiebreak is not None:
        dw = Window.partitionBy(*on, ts_col).orderBy(F.col(right_tiebreak).desc())
        r = (
            right.select(*on, ts_col, *value_cols, right_tiebreak)
            .withColumn("_rn", F.row_number().over(dw))
            .filter(F.col("_rn") == 1)
            .select(*on, ts_col, *value_cols)
        )
    lu = left.withColumn("_side", F.lit(1))
    ru = r.withColumn("_side", F.lit(0))
    u = lu.unionByName(ru, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for vc in value_cols:
        u = u.withColumn(vc, F.last(vc, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Join each point row to every interval row containing it
    (``start <= point <= end``, numeric axis) WITHOUT a nested-loop
    join: both sides are keyed to fixed ``bin_width`` bins (intervals
    explode onto every bin they overlap), the join is an equi-join on
    the bin, and exact containment filters after. A point meets each
    containing interval in exactly one bin (its own), so no
    deduplication is needed.

    Pick ``bin_width`` near the typical interval length: fan-out per
    interval is ~len/bin_width + 1 and per-bin population bounds the
    join's skew. AQE skew-split stays available on the bin key.
    """
    pb = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("bigint")
    )
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bin_width)).cast("bigint"),
                F.floor(F.col(end_col) / F.lit(bin_width)).cast("bigint"),
            )
        ),
    )
    return (
        pb.join(ib, "_bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bin")
    )


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    granularities: tuple[str, ...] = ("15 minutes", "1 hour", "1 day"),
) -> DataFrame:
    """Hierarchical time-bucket rollup: (granularity, bucket_start,
    *group_cols, n_events, total_value) for every granularity, from
    ONE scan of the raw events.

    ``granularities`` must be coarsening multiples of the first
    (15m → 1h → 1d). The finest level aggregates the raw table;
    every coarser level re-buckets the FINEST PARTIALS and merges
    (SUM of counts, SUM of exact decimal sums) — the merge is exact,
    so each level equals the aggregation you'd get scanning raw data
    directly (the DuckDB oracle checks exactly that). The value sum
    stays DECIMAL through the merge and becomes DOUBLE only on
    output (csvb_spark.queries.common determinism rules).

    The finest partials are PERSISTED: union branches do not share
    plan fragments (verified — without it AQE leaves one raw scan per
    granularity), and materializing the finest rollup is precisely
    the continuous-aggregate design at scale (a real deployment
    writes it to a table and derives every coarser level from it).
    The cached set is one row per (finest bucket × group) — tiny
    relative to the raw table.
    """
    finest, *coarser = granularities
    base = (
        events.groupBy(
            F.window(ts_col, finest)["start"].alias("bucket_start"), *group_cols
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_dec_total"),
        )
        .persist()
    )
    levels = [
        base.select(
            F.lit(finest).alias("granularity"),
            "bucket_start",
            *group_cols,
            "n_events",
            F.col("_dec_total").cast("double").alias("total_value"),
        )
    ]
    for g in coarser:
        levels.append(
            base.groupBy(
                F.window("bucket_start", g)["start"].alias("bucket_start"),
                *group_cols,
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_dec_total").alias("_dec_total"),
            )
            .select(
                F.lit(g).alias("granularity"),
                "bucket_start",
                *group_cols,
                "n_events",
                F.col("_dec_total").cast("double").alias("total_value"),
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def decay_topk(
    events: DataFrame,
    k: int = 5,
    half_life_days: float = 30.0,
    ts_col: str = "ts",
    key_col: str = "event_type",
    weight_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Freshness-weighted top-k per key: ``decay_weight = value ·
    2^(-age/half_life)`` with age measured against the corpus MAX
    timestamp — the deterministic recency reference a replayable
    pipeline needs (wall-clock ``now()`` makes every run a different
    query). The shape behind "most relevant recent items per
    category" feeds (trending seeds, freshness-balanced sampling).

    Plan: the reference timestamp is ONE scalar aggregate broadcast
    onto the scan (no shuffle of the fact table for it); the top-k is
    a single hash exchange on the key + partition-local sort with
    rank<=k — Spark pushes the limit into the sort (WindowGroupLimit)
    so executors never buffer a full partition. The decay weight is
    rounded to 6 decimals BEFORE ranking: ``exp`` carries no
    cross-libm bit guarantee, and an unrounded sort key would make
    rank order engine-dependent near ties (``id_col`` breaks exact
    ties). Reference scope: beyond-reference (training-pipeline
    extension).
    """
    ref = events.agg(F.max(ts_col).alias("_ref"))
    # Parquet timestamps read as TIMESTAMP_NTZ; unix_micros needs TZ.
    # The age is a DIFFERENCE, so the session-tz interpretation cancels.
    age_days = (
        F.unix_micros(F.col("_ref").cast("timestamp"))
        - F.unix_micros(F.col(ts_col).cast("timestamp"))
    ) / F.lit(86400.0e6)
    rate = F.log(F.lit(2.0)) / F.lit(float(half_life_days))
    w = F.round(F.col(weight_col) * F.exp(-rate * age_days), 6)
    win = (
        Window.partitionBy(key_col)
        .orderBy(F.col("decay_weight").desc(), F.col(id_col))
    )
    return (
        events.crossJoin(F.broadcast(ref))
        .select(
            key_col,
            id_col,
            ts_col,
            weight_col,
            w.alias("decay_weight"),
        )
        .withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
    )
