"""Fixture-table catalog: parquet scans registered as temp views.

The reference registers tables in a session catalog
(``context.register_table``, reference csvb_engine/src/lib.rs:82);
here a table is a parquet scan + temp view, so Catalyst gets full
predicate pushdown / column pruning / partition pruning against the
files. Nothing is materialized — at 100 TB each view stays a lazy
scan and only the columns/row-groups a query touches are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # TIMESTAMP(NANOS) columns arrive as nano-longs (see session.py);
    # truncate to micros exactly like DuckDB/Arrow do when narrowing.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str, tables=TABLES) -> dict[str, DataFrame]:
    return {t: _read(spark, sf_dir, t) for t in tables}


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
