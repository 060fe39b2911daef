"""One-pass table profiling: per-column stats in a single aggregation
(the DuckDB ``SUMMARIZE`` shape, Spark-first).

A pipeline's first question about any new table — row count, nulls
per column, cardinalities, numeric ranges — is usually answered with
one query per column, re-scanning the table N times. Here every
column's metrics compile into ONE aggregation over ONE scan (the same
fused-conditional-aggregate economics as
``operators/expectations.py``), and the wide 1-row result unpivots to
a long-form report.

Cardinality: ``exact=True`` uses ``count_distinct`` — Spark plans
multiple distinct aggregates via an Expand (data × #columns), which
is the honest cost of exact answers and fine at audit time; the
default ``exact=False`` uses ``approx_count_distinct`` (HyperLogLog,
one pass, no Expand) — the 100 TB default. Numeric min/max are
reported as DOUBLE in ``min_val``/``max_val``; string and
date/timestamp ranges are reported as TEXT in ``min_text``/
``max_text`` (raw strings; ISO-8601 at fixed microsecond width for
timestamps, so any engine renders the identical text). Other types
(binary, arrays, booleans) carry NULL ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_DATE_FMT = "yyyy-MM-dd"


def profile_table(df: DataFrame, exact: bool = False) -> DataFrame:
    """Profile every column of ``df`` in one aggregation pass.

    Output (one row per column, in schema order):
    ``(col_name, dtype, n_rows, n_nulls, n_distinct, min_val, max_val,
    min_text, max_text)`` — ``min_val``/``max_val`` DOUBLE for numeric
    columns, ``min_text``/``max_text`` STRING for string (raw) and
    date/timestamp (ISO-8601, fixed microsecond width) columns, NULL
    for the kinds that don't apply. ``n_distinct`` excludes NULLs (SQL
    count-distinct semantics) and is approximate unless
    ``exact=True``."""
    fields = df.schema.fields
    if not fields:
        raise ValueError("profile_table: no columns")
    distinct = F.count_distinct if exact else F.approx_count_distinct

    def _text(col, dtype):
        if isinstance(dtype, StringType):
            return col
        if isinstance(dtype, (TimestampType, TimestampNTZType)):
            return F.date_format(col, _TS_FMT)
        return F.date_format(col, _DATE_FMT)  # DateType

    aggs = [F.count("*").alias("_n")]
    for i, f in enumerate(fields):
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("bigint")).alias(f"_null{i}"))
        aggs.append(distinct(c).alias(f"_dist{i}"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).cast("double").alias(f"_min{i}"))
            aggs.append(F.max(c).cast("double").alias(f"_max{i}"))
        elif isinstance(
            f.dataType, (StringType, DateType, TimestampType, TimestampNTZType)
        ):
            # min/max over the native type (string collation / time
            # order), rendered to portable text AFTER aggregation
            aggs.append(_text(F.min(c), f.dataType).alias(f"_tmin{i}"))
            aggs.append(_text(F.max(c), f.dataType).alias(f"_tmax{i}"))
    one = df.agg(*aggs)
    rows = []
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    for i, f in enumerate(fields):
        numeric = isinstance(f.dataType, NumericType)
        texty = isinstance(
            f.dataType, (StringType, DateType, TimestampType, TimestampNTZType)
        )
        rows.append(
            F.named_struct(
                F.lit("ord"),
                F.lit(i),
                F.lit("col_name"),
                F.lit(f.name),
                F.lit("dtype"),
                F.lit(f.dataType.simpleString()),
                F.lit("n_rows"),
                F.col("_n"),
                F.lit("n_nulls"),
                F.col(f"_null{i}"),
                F.lit("n_distinct"),
                F.col(f"_dist{i}"),
                F.lit("min_val"),
                F.col(f"_min{i}") if numeric else null_d,
                F.lit("max_val"),
                F.col(f"_max{i}") if numeric else null_d,
                F.lit("min_text"),
                F.col(f"_tmin{i}") if texty else null_s,
                F.lit("max_text"),
                F.col(f"_tmax{i}") if texty else null_s,
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("r"))
        .select(
            "r.ord",
            "r.col_name",
            "r.dtype",
            "r.n_rows",
            "r.n_nulls",
            "r.n_distinct",
            "r.min_val",
            "r.max_val",
            "r.min_text",
            "r.max_text",
        )
        .orderBy("ord")
        .drop("ord")
    )
