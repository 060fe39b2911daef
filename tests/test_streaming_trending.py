"""Streaming trending-terms: batch equivalence, late-data handling,
and ranking contract."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
from pyspark.sql import functions as F

from csvb_spark.operators.text import tokens
from csvb_spark.streaming.trending import rank_trending, run_trending_terms

T0 = dt.datetime(2025, 3, 1, 10, 0, 0)


def _write_batch(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # micros, not pandas' default nanos: the session reads TIMESTAMP(
    # NANOS) as BIGINT (nanosAsLong — see sources/catalog.py), which a
    # watermark rejects
    pd.DataFrame(rows).to_parquet(
        path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
    )


def _schema(spark, sample_path: str):
    return spark.read.parquet(sample_path).schema


def test_trending_matches_batch(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    rows1 = [
        {"doc_id": 1, "ts": T0, "text": "spark spark joins"},
        {"doc_id": 2, "ts": T0 + dt.timedelta(minutes=10), "text": "spark shuffle"},
    ]
    rows2 = [
        {"doc_id": 3, "ts": T0 + dt.timedelta(hours=1, minutes=5), "text": "dedup dedup dedup spark"},
    ]
    _write_batch(f"{src}/b1.parquet", rows1)
    _write_batch(f"{src}/b2.parquet", rows2)
    schema = _schema(spark, f"{src}/b1.parquet")

    got = {
        tuple(r)
        for r in run_trending_terms(
            spark, src, schema, k=2, query_name="t_trend_eq"
        ).collect()
    }

    batch = (
        spark.read.parquet(src)
        .select("ts", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(F.window("ts", "1 hour").alias("w"), "token")
        .agg(F.count("*").alias("n"))
    )
    want = {tuple(r) for r in rank_trending(batch, k=2).collect()}
    assert got == want
    # window 1: spark(3) ranks first; the n=1 tie (joins vs shuffle)
    # breaks by token asc, so rank 2 is joins
    w1 = {t[3]: t[1:3] for t in got if t[0] == T0}
    assert w1[1] == ("spark", 3)
    assert w1[2] == ("joins", 1)


def test_trending_counts_cross_microbatch(spark, tmp_path):
    # the same token in the same window across DIFFERENT micro-batches
    # must accumulate into one counter (incremental state, not
    # per-batch counts)
    src = str(tmp_path / "stream_src2")
    _write_batch(
        f"{src}/b1.parquet", [{"doc_id": 1, "ts": T0, "text": "alpha beta"}]
    )
    _write_batch(
        f"{src}/b2.parquet",
        [{"doc_id": 2, "ts": T0 + dt.timedelta(minutes=30), "text": "alpha"}],
    )
    schema = _schema(spark, f"{src}/b1.parquet")
    out = {
        (r["token"], r["n"])
        for r in run_trending_terms(
            spark, src, schema, k=5, query_name="t_trend_acc"
        ).collect()
    }
    assert ("alpha", 2) in out
    assert ("beta", 1) in out


def test_rank_trending_is_per_window_topk(spark):
    rows = []
    for w, toks in ((T0, ["a"] * 3 + ["b"] * 2 + ["c"]), (T0 + dt.timedelta(hours=1), ["d"] * 9)):
        for t in toks:
            rows.append((w, t))
    df = (
        spark.createDataFrame(rows, ["ts", "token"])
        .groupBy(F.window("ts", "1 hour").alias("w"), "token")
        .agg(F.count("*").alias("n"))
    )
    out = rank_trending(df, k=2).collect()
    by_window: dict = {}
    for r in out:
        by_window.setdefault(r["bucket_start"], []).append((r["token"], r["n"], r["rank"]))
    assert sorted(by_window[T0]) == [("a", 3, 1), ("b", 2, 2)]
    assert by_window[T0 + dt.timedelta(hours=1)] == [("d", 9, 1)]
