"""Bucketed-table materialization: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem,
probe ⋈ corpus, batch ⋈ dedup-index) is the shuffle of both sides on
the join key. Bucketing pays that shuffle ONCE at write time: rows are
hash-clustered into ``n_buckets`` files per side with the SAME
bucketing function, so any later equi-join on the bucket keys lines up
bucket-for-bucket and the physical plan contains NO Exchange — proven
by plan assertion in tests/test_bucketed.py (``Bucketed: true`` scans
feeding a SortMergeJoin with zero Exchange nodes).

Spark keeps bucket metadata in the session catalog, which for this
engine (no Hive metastore in the environment, matching the
reference's in-process catalog — csvb_engine/src/lib.rs:82) is
in-memory and dies with the session. :func:`register_bucketed`
re-attaches the metadata to the existing files via ``CREATE TABLE …
CLUSTERED BY … LOCATION`` DDL, so a new job reuses a layout written by
an old one — the write-once / join-many contract that makes bucketing
pay for itself. (With a persistent metastore the register step simply
disappears; nothing else changes.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` hash-bucketed by ``keys`` into ``n_buckets``
    at ``path`` and register it as table ``name``.

    One shuffle (the bucketing exchange) — the last one any equi-join
    on ``keys`` against another table bucketed the same way ever pays.
    ``sort`` additionally orders rows by the keys inside each bucket
    (bucket-local sort, no global order), which lets the join skip its
    sort when each bucket lands in a single file."""
    keys = list(keys)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.option("path", path).format("parquet").saveAsTable(name)


def bucketed_ddl(
    name: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int,
    schema,
    sort: bool = True,
) -> str:
    """The ``CREATE TABLE`` statement that re-attaches bucket metadata
    to files previously written by :func:`write_bucketed`. The column
    list, key order, and bucket count MUST match the writer's — Spark
    trusts the DDL, so a mismatch silently yields wrong-bucket joins
    (the same contract a Hive metastore enforces for you)."""
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    key_list = ", ".join(keys)
    sorted_by = f" SORTED BY ({key_list})" if sort else ""
    return (
        f"CREATE TABLE {name} ({cols}) USING parquet "
        f"CLUSTERED BY ({key_list}){sorted_by} INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
) -> DataFrame:
    """Register an existing :func:`write_bucketed` layout under
    ``name`` in the current session (schema read from the parquet
    footers) and return the table. Idempotent per session."""
    keys = list(keys)
    schema = spark.read.parquet(path).schema
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(bucketed_ddl(name, path, keys, n_buckets, schema, sort))
    return spark.table(name)
