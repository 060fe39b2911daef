"""KMV sketch semantics (operators/sketch.py): exactness below k,
partition invariance of the distributed merge, the ~1/sqrt(k) error
bound on real cardinalities, and the overlap estimator's boundary
cases. The cross-engine replay (x146/x147) runs with every other
oracle in test_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvb_spark.operators.sketch import (
    kmv_distinct,
    kmv_hash,
    kmv_overlap,
    kmv_sketch,
)


def _vals(spark, n, prefix="v", partitions=4):
    return spark.range(n).repartition(partitions).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("v")
    )


def test_kmv_exact_below_k(spark):
    """Fewer than k distinct values: the sketch IS the distinct hash
    set and the estimate is exact (the n_sketch < k branch)."""
    df = _vals(spark, 100)
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert (row.k, row.n_sketch, row.est_distinct) == (256, 100, 100.0)
    got = {r.h for r in kmv_sketch(df, "v", k=256).collect()}
    want = {
        r.h for r in df.select(kmv_hash("v").alias("h")).distinct().collect()
    }
    assert got == want and len(got) == 100


def test_kmv_partition_invariance(spark):
    """The per-partition partial + tiny merge must yield the SAME
    sketch (rows and estimate) regardless of how the data is split —
    the property that makes the map-only design valid."""
    rows1 = kmv_sketch(_vals(spark, 5000, partitions=1), "v", k=64).collect()
    rows16 = kmv_sketch(_vals(spark, 5000, partitions=16), "v", k=64).collect()
    assert sorted(r.h for r in rows1) == sorted(r.h for r in rows16)
    e1 = kmv_distinct(_vals(spark, 5000, partitions=1), "v", k=64).collect()
    e16 = kmv_distinct(_vals(spark, 5000, partitions=16), "v", k=64).collect()
    assert e1 == e16


def test_kmv_duplicates_are_set_semantics(spark):
    """KMV estimates the DISTINCT count: replicating every value 7x
    changes nothing (same hash set, same k-min)."""
    base = _vals(spark, 3000)
    dup = base.crossJoin(spark.range(7).select(F.lit(1).alias("one"))).select(
        "v"
    )
    r1 = kmv_distinct(base, "v", k=128).collect()
    r2 = kmv_distinct(dup, "v", k=128).collect()
    assert r1 == r2


def test_kmv_error_bound(spark):
    """k=256 has relative standard error ~1/sqrt(254) ≈ 6.3%; with a
    fixed hash the estimate is deterministic, so assert a 4-sigma-ish
    envelope on a 20k-distinct corpus."""
    row = kmv_distinct(_vals(spark, 20000, partitions=8), "v", k=256).collect()[
        0
    ]
    assert row.n_sketch == 256
    assert abs(row.est_distinct / 20000.0 - 1.0) < 0.25, row.est_distinct


def test_kmv_overlap_identical_sides(spark):
    """A == B: every union-sketch value is in both side sketches —
    Jaccard exactly 1.0 and intersection == union estimate."""
    df = _vals(spark, 5000)
    row = kmv_overlap(df, df, "v", k=128).collect()[0]
    assert (row.n_u, row.n_both) == (128, 128)
    assert row.est_jaccard == 1.0
    assert row.est_intersection == row.est_union
    assert row.est_distinct_a == row.est_distinct_b == row.est_union


def test_kmv_overlap_disjoint_sides(spark):
    """Disjoint value sets: no shared hashes (52-bit space, thousands
    of values — a collision here means the hash is broken), so the
    Jaccard and intersection estimates are exactly 0."""
    a = _vals(spark, 4000, prefix="a")
    b = _vals(spark, 4000, prefix="b")
    row = kmv_overlap(a, b, "v", k=128).collect()[0]
    assert row.n_both == 0
    assert row.est_jaccard == 0.0 and row.est_intersection == 0.0
    # and the union estimate still sees ~8000 distinct values
    assert abs(row.est_union / 8000.0 - 1.0) < 0.35, row.est_union


def test_kmv_half_overlap_jaccard(spark):
    """A = [0, 6000), B = [3000, 9000): true Jaccard 1/3, true union
    9000 — both estimates must land inside a generous deterministic
    envelope (k=256 → SE ~6% on union, wider on the ratio)."""
    a = _vals(spark, 6000)
    b = spark.range(3000, 9000).repartition(4).select(
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("v")
    )
    row = kmv_overlap(a, b, "v", k=256).collect()[0]
    assert abs(row.est_union / 9000.0 - 1.0) < 0.25, row.est_union
    assert abs(row.est_jaccard - 1.0 / 3.0) < 0.15, row.est_jaccard
    assert abs(row.est_intersection / 3000.0 - 1.0) < 0.40, (
        row.est_intersection
    )


def test_kmv_validates_k(spark):
    import pytest

    from csvb_spark.operators.sketch import kmv_distinct_by

    with pytest.raises(ValueError, match="k must be >= 1"):
        kmv_sketch(_vals(spark, 10), "v", k=0)
    # the estimators require k >= 2: (k-1)·2^52/h_(k) is constant 0
    # at k=1 (a k=1 'sketch' is a min-hash, not a cardinality sketch)
    df = _vals(spark, 10)
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_distinct(df, "v", k=1)
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_overlap(df, df, "v", k=1)
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_distinct_by(
            df.select(F.lit("g").alias("grp"), "v"), "v", "grp", k=1
        )


def test_kmv_by_group_exact_below_k(spark):
    """Grouped sketches: each group with fewer than k distinct values
    gets an exact estimate; groups are independent."""
    from pyspark.sql import functions as F2

    df = (
        spark.range(300)
        .repartition(8)
        .select(
            (F2.col("id") % 3).cast("string").alias("grp"),
            F2.concat(F2.lit("v"), F2.col("id").cast("string")).alias("v"),
        )
    )
    from csvb_spark.operators.sketch import kmv_distinct_by

    rows = {r.grp: r for r in kmv_distinct_by(df, "v", "grp", k=256).collect()}
    assert set(rows) == {"0", "1", "2"}
    for g, r in rows.items():
        assert (r.n_sketch, r.est_distinct) == (100, 100.0), g


def test_kmv_by_group_partition_invariance(spark):
    """The per-group per-partition partial + window merge must equal
    the single-partition result group by group."""
    from csvb_spark.operators.sketch import kmv_sketch_by

    def build(parts):
        from pyspark.sql import functions as F2

        return (
            spark.range(6000)
            .repartition(parts)
            .select(
                (F2.col("id") % 4).cast("string").alias("grp"),
                F2.concat(F2.lit("v"), F2.col("id").cast("string")).alias("v"),
            )
        )

    r1 = sorted(
        (r.grp, r.h) for r in kmv_sketch_by(build(1), "v", "grp", k=32).collect()
    )
    r16 = sorted(
        (r.grp, r.h)
        for r in kmv_sketch_by(build(16), "v", "grp", k=32).collect()
    )
    assert r1 == r16 and len(r1) == 4 * 32


def test_kmv_by_group_null_group_is_a_group(spark):
    """A NULL group key behaves like any other group (SQL GROUP BY
    semantics — pandas groupby runs with dropna=False)."""
    from pyspark.sql import functions as F2

    from csvb_spark.operators.sketch import kmv_distinct_by

    df = spark.range(200).select(
        F2.when(F2.col("id") % 2 == 0, F2.lit("even")).alias("grp"),
        F2.concat(F2.lit("v"), F2.col("id").cast("string")).alias("v"),
    )
    rows = {r.grp: r for r in kmv_distinct_by(df, "v", "grp", k=256).collect()}
    assert set(rows) == {"even", None}
    assert rows[None].n_sketch == 100 and rows[None].est_distinct == 100.0
