"""Skew-resilience operators: salted join and salted distinct-count.

AQE's skew-join splitting (enabled in session.py) is the first answer
to hot keys, but it only covers sort-merge/shuffled-hash join stages.
These operators cover the cases AQE can't re-plan:

- ``salted_join``: replicate the small side ``n_salts``×, scatter the
  big side uniformly over the salt space, join on (key, salt). A key
  with a billion fact rows becomes ``n_salts`` reduce tasks instead of
  one. Result is row-identical to the plain join (each fact row meets
  exactly one replica of its dim row), so the corpus entry carries a
  plain-join DuckDB oracle.
- ``salted_count_distinct``: exact COUNT(DISTINCT x) per group in two
  shuffles, both keyed on (group, hash(x) % n): distinct values
  partition cleanly by their own hash, so partial distinct counts sum
  to the exact global count. This is the standard fix when one group
  holds most of the table and a single reducer would own the whole
  distinct set.

Salts are derived from deterministic column hashes (never rand()/
partition id), so retried tasks and reruns produce identical output —
a hard requirement for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated over a salt space.

    ``facts`` is scattered by a hash of its full row (deterministic);
    ``dims`` is exploded ``n_salts``× (keep it broadcast-small or the
    replication cost dominates). Output columns = plain join output.
    """
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in facts.columns])), F.lit(n_salts))
    f = facts.withColumn("_salt", salt)
    d = dims.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, on=[*on, "_salt"], how=how).drop("_salt")


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT distinct_col), skew-safe.

    Stage 1 shuffles on (group, hash(x) % n_salts) and counts the
    distinct values of each sub-bucket; stage 2 sums the partial
    counts per group. No single reducer ever sees a whole hot group.
    """
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*group_cols, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_partial").alias(f"n_distinct_{distinct_col}")
    )
