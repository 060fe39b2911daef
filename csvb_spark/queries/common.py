"""Shared helpers for the declared-query corpus.

Cross-engine determinism rules (Spark vs DuckDB oracle):

- **Sums over many doubles are order-dependent** (parallel partial
  aggregation vs sequential scan), so any sum whose operand count
  scales with the table goes through ``DECIMAL(18,6)``: exact
  arithmetic, same result in both engines, cast back to DOUBLE for a
  stable schema. Spark keeps this JVM-side (decimal sum is codegen'd).
- **Per-row arithmetic is IEEE-deterministic** (same expression tree,
  same operand order), so row-level doubles only need matching
  ``round(x, n)`` on both sides.
- **Ratios of exact sums** (avg, variance, correlation) are computed
  from decimal sums then divided in double — identical operands →
  identical IEEE result in both engines.
- Every LIMIT query pins a total order (unique tiebreaker column).
- Aliases are identical on both sides; the driver sorts columns by
  name before hashing.
- **Don't ROUND a value that is already bit-identical.** ``round(x,
  n)`` itself diverges between engines when x's shortest decimal repr
  lands exactly on a half boundary: Spark rounds the REPR
  (BigDecimal.valueOf), DuckDB rounds the BINARY value — observed
  once in 5,000 docs at sf0.1 (x84 round 6). Rounding is only for
  values whose bits may differ (transcendentals, order-dependent
  float sums); exactly-agreed doubles ship unrounded.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    spark: SparkQuery
    oracle: str | None = None  # DuckDB SQL; None → driver rows-only check
    headline: bool = False  # included in bench.py
    doc: str = ""


def dsum(expr: str) -> str:
    """Order-independent sum of a double expression (see module doc)."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"


def davg(expr: str) -> str:
    """Order-independent mean: exact decimal sum / count, in double."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)"


def views(spark: SparkSession, sf_dir: str) -> None:
    from csvb_spark.sources.catalog import register_views

    register_views(spark, sf_dir)


def sql_query(sql: str) -> SparkQuery:
    """A corpus entry whose Spark side is the SQL text itself (the
    reference's own surface is SQL; Catalyst plans it identically to
    the DataFrame API)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        views(spark, sf_dir)
        return spark.sql(sql)

    return run


def dialect_query(sql: str) -> SparkQuery:
    """A corpus entry written in the REFERENCE's dialect (DataFusion /
    postgres-ish), routed through ``execute_sql`` so the
    translate-layer rewrites are part of what the oracle verifies."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from csvb_spark.functions import register_all
        from csvb_spark.sql import execute_sql

        register_all(spark)
        views(spark, sf_dir)
        return execute_sql(spark, sql)

    return run
