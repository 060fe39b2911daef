"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship query (TPC-H Q1 shape) at sf0.001.
- ``queries()``      — full declared-query corpus (SURVEY.md §2 rows +
  LLM-pipeline extension operators), each ``(spark, sf_dir) -> DataFrame``.
- ``oracle_sql()``   — DuckDB-equivalent SQL per oracle-checkable query
  (identical aliases/rounding; see csvb_spark/queries/common.py for the
  cross-engine determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _corpus():
    from csvb_spark.functions import register_all
    from csvb_spark.queries import corpus

    return corpus, register_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    corpus, register_all = _corpus()
    register_all(spark)
    return corpus()["q01_pricing_summary"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    corpus, register_all = _corpus()

    def wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_all(spark)
            return q.spark(spark, sf_dir)

        return run

    return {name: wrap(q) for name, q in corpus().items()}


def oracle_sql() -> dict[str, str]:
    corpus, _ = _corpus()
    return {name: q.oracle for name, q in corpus().items() if q.oracle is not None}
