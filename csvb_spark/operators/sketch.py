"""KMV (k-minimum-values) cardinality and overlap sketches.

Distinct-count and cross-corpus overlap estimation are the two
questions a 100-TB curation pipeline asks constantly ("how many unique
shingles does this snapshot hold", "how much does crawl A overlap
crawl B") and both are exact-answer-hostile at scale: exact DISTINCT
shuffles every distinct value, and exact Jaccard shuffles two corpora.
The KMV sketch (Bar-Yossef et al. 2002; the unbiased (k-1)/U_(k)
estimator and set-operation algebra from Beyer et al., SIGMOD 2007)
answers both from k values per corpus: hash every value uniformly,
keep the k smallest DISTINCT hashes; the k-th smallest, as an order
statistic of uniforms, pins the density. Relative standard error is
~1/sqrt(k-2) (k=256 → ~6%), independent of corpus size.

Design for Spark:

- **Map-only partial, trivial merge.** Each partition reduces to its
  own k smallest distinct hashes inside one Arrow-batched
  ``mapInPandas`` pass (running ``np.unique`` k-min across batches —
  no shuffle, no collect); the global sketch is the k smallest
  distinct of the ≤ partitions×k candidates, a TakeOrderedAndProject
  over a few thousand rows. The full corpus crosses no boundary — the
  exact property that makes the sketch worth having at 100 TB.
- **Engine-portable determinism.** The hash is the house md5 idiom
  ([[splits.md5_key]]): first 13 hex chars of ``md5(value || ':seed')``
  → a 52-bit integer, exactly representable in a double and exactly
  replayable in any engine (DuckDB:
  ``('0x' || substr(md5(v || ':seed'), 1, 13))::BIGINT``). Every
  estimate below is a fixed-order arithmetic expression over those
  integers, so the DuckDB oracles replay the WHOLE sketch —
  hash-match, not tolerance-match. (Engine-native HLL — see the x41
  family — is faster per byte but its estimate is
  implementation-defined; KMV trades a little space for auditability.)
- **Mergeable set algebra.** k-min(A ∪ B) = k-min(k-min(A) ∪
  k-min(B)), so union sketches compose from per-corpus sketches
  without touching the data again; the Beyer et al. intersection
  estimator is |U ∩ sk(A) ∩ sk(B)| / |U| × |A ∪ B|-estimate.

The reference has no sketch surface (its engine inherits DataFusion's
``approx_distinct``, reference csvb_engine/src/lib.rs:88 — a black-box
HLL); this module is a beyond-reference operator family.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csvb_spark.operators.splits import md5_key

#: size of the 52-bit hash space — 13 hex chars, chosen because every
#: value (and every product (k-1)·2^52 for any sane k) is exactly
#: representable in an IEEE double on both engines
KMV_SPACE = float(1 << 52)


def kmv_hash(col: str | Column, seed: int = 42) -> Column:
    """52-bit engine-portable uniform hash of ``col`` (bigint in
    [0, 2^52)): first 13 hex chars of [[splits.md5_key]]. NULL values
    hash to NULL (concat with a NULL is NULL in both engines) and are
    excluded by the sketch builders."""
    hex13 = F.substring(md5_key(col, seed), 1, 13)
    return F.conv(hex13, 16, 10).cast("bigint")


def kmv_sketch(
    df: DataFrame, value_col: str | Column, k: int = 256, seed: int = 42
) -> DataFrame:
    """The k smallest DISTINCT 52-bit hashes of ``value_col``, as a
    single-column DataFrame ``h`` (≤ k rows, unordered — consumers
    aggregate or re-sort).

    One map-only pass: each partition keeps a running k-min distinct
    set across its Arrow batches, then the ≤ partitions×k candidates
    meet in one tiny TakeOrderedAndProject. Never shuffles the corpus.
    """
    kk = int(k)
    if kk < 1:
        raise ValueError(f"kmv_sketch: k must be >= 1, got {k}")
    h = df.select(kmv_hash(value_col, seed).alias("h")).where(
        F.col("h").isNotNull()
    )

    # Arrow-native partial (round-15 optimization pass): the old
    # mapInPandas form ran np.unique (a full sort) over EVERY batch —
    # at sf10 that was ~15k sorted merges per partition set, and the
    # per-batch pandas wrapping was pure overhead for a single int64
    # column. This form (a) reads each Arrow batch as a zero-copy
    # numpy view, (b) drops everything above the current k-th-smallest
    # candidate with one vectorized compare BEFORE any sort — after
    # the first few batches almost nothing survives, so the append
    # buffer stays tiny — and (c) compacts (sort + dedup + cut to k)
    # only when the buffer has actually grown. Identical output: the
    # k smallest distinct values of a union are invariant to when the
    # dedup/cut happens, and values above a known k-th-smallest
    # candidate can never enter the k-min set.
    def _partial(batches):
        import numpy as _np
        import pyarrow as _pa

        buf: list = []
        n_buf = 0
        best = None  # sorted, deduped, ≤ kk values
        cutoff = None  # best[kk-1] once the sketch is full

        def _compact():
            nonlocal buf, n_buf, best, cutoff
            parts = ([best] if best is not None else []) + buf
            best = _np.unique(_np.concatenate(parts))[:kk]
            buf, n_buf = [], 0
            if len(best) >= kk:
                cutoff = best[kk - 1]

        for rb in batches:
            # by name, not position: the upstream select produces
            # exactly one column today, but a positional read would
            # silently grab the wrong column if that projection ever
            # gains one (round-15 ADVICE)
            v = rb.column(
                rb.schema.get_field_index("h")
            ).to_numpy(zero_copy_only=False)
            if cutoff is not None:
                v = v[v <= cutoff]
            if len(v):
                buf.append(v)
                n_buf += len(v)
                if n_buf >= max(4 * kk, 4096):
                    _compact()
        if buf:
            _compact()
        if best is not None and len(best):
            yield _pa.RecordBatch.from_arrays(
                [_pa.array(best, type=_pa.int64())], names=["h"]
            )

    cand = h.mapInArrow(_partial, "h bigint")
    # candidates from different partitions can repeat a hash — distinct
    # BEFORE the global k-min, both over ≤ partitions×k rows
    return cand.dropDuplicates(["h"]).orderBy("h").limit(kk)


def kmv_sketch_by(
    df: DataFrame,
    value_col: str | Column,
    group_col: str,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Per-group KMV sketches: for each value of ``group_col``, the k
    smallest distinct hashes of ``value_col`` — columns
    ``(group_col, h)``. The per-partition partial keeps a running
    k-min set PER GROUP (pandas groupby with ``dropna=False``, so a
    NULL group is a group like any other — SQL semantics); the merge
    is one small window rank over ≤ groups×partitions×k candidates.
    This is the "vocabulary size per domain" shape: group count is
    assumed bounded (domains/sources/languages), values are not."""
    kk = int(k)
    if kk < 1:
        raise ValueError(f"kmv_sketch_by: k must be >= 1, got {k}")
    gt = df.schema[group_col].dataType.simpleString()
    h = df.select(
        F.col(group_col).alias("g_"), kmv_hash(value_col, seed).alias("h")
    ).where(F.col("h").isNotNull())

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        best: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("g_", dropna=False, sort=False):
                v = sub["h"].to_numpy()
                cur = best.get(g)
                merged = v if cur is None else _np.concatenate([cur, v])
                best[g] = _np.unique(merged)[:kk]
        if best:
            yield _pd.DataFrame(
                {
                    "g_": _np.repeat(
                        _np.array(list(best), dtype=object),
                        [len(v) for v in best.values()],
                    ),
                    "h": _np.concatenate(list(best.values())),
                }
            )

    cand = h.mapInPandas(_partial, f"g_ {gt}, h bigint")
    from pyspark.sql.window import Window

    w = Window.partitionBy("g_").orderBy("h")
    return (
        cand.dropDuplicates(["g_", "h"])
        .withColumn("rn_", F.row_number().over(w))
        .filter(F.col("rn_") <= kk)
        .select(F.col("g_").alias(group_col), "h")
    )


def kmv_distinct_by(
    df: DataFrame,
    value_col: str | Column,
    group_col: str,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Per-group distinct-count estimates: one row per group —
    ``group_col, k, n_sketch, kth_min, est_distinct`` (same estimator,
    rounding, and k >= 2 rule as :func:`kmv_distinct`)."""
    if int(k) < 2:
        raise ValueError(f"kmv_distinct_by: k must be >= 2, got {k}")
    sk = kmv_sketch_by(df, value_col, group_col, k, seed)
    return (
        sk.groupBy(group_col)
        .agg(
            F.count("h").alias("n_sketch"),
            F.max("h").alias("kth_min"),
        )
        .select(
            group_col,
            F.lit(int(k)).alias("k"),
            F.col("n_sketch").cast("bigint").alias("n_sketch"),
            "kth_min",
            F.round(_est_expr("n_sketch", "kth_min", int(k)), 4).alias(
                "est_distinct"
            ),
        )
    )


def _est_expr(n_col: str, kth_col: str, k: int) -> Column:
    """The Beyer et al. unbiased estimator as a fixed-order double
    expression: (k-1)·2^52 / h_(k) when the sketch is full, else the
    sketch size itself (fewer than k distinct values ⇒ the sketch IS
    the distinct set — exact)."""
    scale = float((k - 1) << 52)  # exact in a double
    return (
        F.when(
            F.col(n_col) < F.lit(int(k)), F.col(n_col).cast("double")
        ).otherwise(F.lit(scale) / F.col(kth_col).cast("double"))
    )


def kmv_distinct(
    df: DataFrame, value_col: str | Column, k: int = 256, seed: int = 42
) -> DataFrame:
    """Distinct-count estimate of ``value_col``: one row —
    ``k, n_sketch, kth_min, est_distinct`` (estimate rounded to 4
    decimals at the very end; everything before it is integer-exact).

    Requires k >= 2: the (k-1)/U_(k) estimator degenerates to 0 at
    k=1 (and its ~1/sqrt(k-2) error law is undefined below 3) — a
    k=1 'sketch' is just a min-hash, build it with kmv_sketch."""
    if int(k) < 2:
        raise ValueError(f"kmv_distinct: k must be >= 2, got {k}")
    sk = kmv_sketch(df, value_col, k, seed)
    return (
        sk.agg(
            F.count("h").alias("n_sketch"),
            F.max("h").alias("kth_min"),
        )
        .select(
            F.lit(int(k)).alias("k"),
            F.col("n_sketch").cast("bigint").alias("n_sketch"),
            "kth_min",
            F.round(_est_expr("n_sketch", "kth_min", int(k)), 4).alias(
                "est_distinct"
            ),
        )
    )


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    value_col: str | Column,
    k: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Cross-corpus overlap estimate between ``a`` and ``b``'s value
    sets: one row — per-side distinct estimates, Jaccard, union and
    intersection estimates.

    k-min(A ∪ B) is computed from the two per-side sketches alone (the
    KMV merge property), so the corpora are each read exactly once —
    each side's sketch lineage appears exactly once in the plan, and
    union-sketch membership falls out of a rank over the combined
    ≤ 2k distinct hashes in ONE small groupBy (no third union branch,
    which would re-evaluate both corpus scans, and no cartesian join
    of single-row aggregates).
    Jaccard is the Beyer et al. ratio |U ∩ sk(A) ∩ sk(B)| / |U|;
    the intersection estimate is that ratio times the union estimate,
    multiplied UNROUNDED (each output rounds independently at the
    end, which the SQL replay mirrors)."""
    kk = int(k)
    if kk < 2:
        raise ValueError(f"kmv_overlap: k must be >= 2, got {k}")
    ska = kmv_sketch(a, value_col, kk, seed)
    skb = kmv_sketch(b, value_col, kk, seed)
    # each side's sketch lineage is referenced exactly ONCE: the union
    # sketch's membership (iu) is derived by ranking the combined
    # distinct hashes (≤ 2k rows) rather than unioning in a third
    # `u` branch — a separate branch re-evaluates each corpus scan
    # (no ReusedExchange across mapInPandas lineages), which would
    # double the read cost the sketch exists to avoid
    tagged = ska.select(F.lit("a").alias("side"), "h").unionByName(
        skb.select(F.lit("b").alias("side"), "h")
    )
    from pyspark.sql.window import Window

    per_h = (
        tagged.groupBy("h")
        .agg(
            F.max(F.when(F.col("side") == "a", 1).otherwise(0)).alias("ia"),
            F.max(F.when(F.col("side") == "b", 1).otherwise(0)).alias("ib"),
        )
        .withColumn(
            "iu",
            F.when(
                F.row_number().over(Window.orderBy("h")) <= kk, 1
            ).otherwise(0),
        )
    )
    stats = per_h.agg(
        F.sum("ia").cast("bigint").alias("n_a"),
        F.max(F.when(F.col("ia") == 1, F.col("h"))).alias("kth_a"),
        F.sum("ib").cast("bigint").alias("n_b"),
        F.max(F.when(F.col("ib") == 1, F.col("h"))).alias("kth_b"),
        F.sum("iu").cast("bigint").alias("n_u"),
        F.max(F.when(F.col("iu") == 1, F.col("h"))).alias("kth_u"),
        F.sum(F.col("ia") * F.col("ib") * F.col("iu"))
        .cast("bigint")
        .alias("n_both"),
    )
    est_a = _est_expr("n_a", "kth_a", kk)
    est_b = _est_expr("n_b", "kth_b", kk)
    est_u = _est_expr("n_u", "kth_u", kk)
    jac = F.when(F.col("n_u") > 0, F.col("n_both").cast("double") / F.col("n_u").cast("double")).otherwise(
        F.lit(0.0)
    )
    return stats.select(
        F.lit(kk).alias("k"),
        "n_a",
        "n_b",
        "n_u",
        "n_both",
        F.round(est_a, 4).alias("est_distinct_a"),
        F.round(est_b, 4).alias("est_distinct_b"),
        F.round(est_u, 4).alias("est_union"),
        F.round(jac, 6).alias("est_jaccard"),
        F.round(jac * est_u, 4).alias("est_intersection"),
    )
