"""Bucketed materialization: the co-located join must be shuffle-free
and value-identical to the plain join, and the layout must survive
catalog loss (re-registration over bare files)."""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from csvb_spark.sources.bucketed import register_bucketed, write_bucketed


def _plan(df) -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(  # noqa: SLF001
        "formatted"
    )
    return df._jdf.queryExecution().explainString(jmode)  # noqa: SLF001


@contextmanager
def _no_broadcast(spark):
    """Force SMJ so the assertion targets the shuffle, not a broadcast
    that tiny test fixtures would otherwise trigger."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(o, "tb_orders", str(tmp_path / "o"), ["o_orderkey"], 8)
    write_bucketed(li, "tb_lineitem", str(tmp_path / "l"), ["l_orderkey"], 8)
    yield o, li
    spark.sql("DROP TABLE IF EXISTS tb_orders")
    spark.sql("DROP TABLE IF EXISTS tb_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    with _no_broadcast(spark):
        j = spark.table("tb_orders").join(
            spark.table("tb_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _plan(j)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        o, li = bucketed_pair
        want = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert j.count() == want


def test_one_sided_bucketing_shuffles_only_unbucketed_side(spark, bucketed_pair):
    _, li = bucketed_pair
    with _no_broadcast(spark):
        j = spark.table("tb_orders").join(
            li.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = _plan(j)
        # exactly ONE exchange node: the raw lineitem side repartitions
        # to match the bucketed layout; the bucketed side reads in
        # place (formatted plans print each node twice — tree line +
        # detail header — so count tree entries, not substrings)
        import re

        assert len(re.findall(r"\bExchange \(\d+\)", plan)) == 1
        assert "hashpartitioning(l_orderkey" in plan


def test_register_bucketed_survives_catalog_loss(spark, bucketed_pair, tmp_path):
    o, li = bucketed_pair
    # simulate a new job: metadata gone, files remain
    spark.sql("DROP TABLE tb_orders")
    spark.sql("DROP TABLE tb_lineitem")
    register_bucketed(spark, "tb_orders", str(tmp_path / "o"), ["o_orderkey"], 8)
    register_bucketed(spark, "tb_lineitem", str(tmp_path / "l"), ["l_orderkey"], 8)
    with _no_broadcast(spark):
        j = spark.table("tb_orders").join(
            spark.table("tb_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert "Exchange" not in _plan(j)
        want = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert j.count() == want


def test_bucketed_aggregation_on_bucket_key_is_shuffle_free(spark, bucketed_pair):
    # groupBy on the bucket key reuses the layout too — partial and
    # final aggregation collapse into the bucketed scan
    agg = (
        spark.table("tb_lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
    )
    assert "Exchange" not in _plan(agg)
    _, li = bucketed_pair
    assert agg.count() == li.select("l_orderkey").distinct().count()
