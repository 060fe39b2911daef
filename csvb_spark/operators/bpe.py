"""Distributed BPE (byte-pair-encoding) vocabulary training + apply.

The trainer is the classic Sennrich et al. 2016 algorithm ("Neural
Machine Translation of Rare Words with Subword Units") re-expressed
for Spark's execution model:

- The corpus is first compressed to the WORD-FREQUENCY table (one
  explode + one keyed groupBy — the only corpus-sized work). Every
  merge iteration then runs over the vocabulary, which is orders of
  magnitude smaller than a 100 TB corpus and independent of corpus
  growth past saturation.
- Each iteration is: adjacent-pair explode → freq-weighted groupBy →
  global argmax (ONE tiny row to the driver, the same bounded-constant
  pattern as ``similarity.kmeans_train``) → a codegen-free but
  vocabulary-sized higher-order fold that merges the winning pair
  left-to-right in every word.
- Ties on pair count break lexicographically on (left, right) — a
  total order, so training is deterministic on any engine, partition
  count, or row order.

Greedy left-to-right non-overlapping merge via a fold: append each
symbol to the accumulator unless the accumulator's last element
equals ``left`` and the current symbol equals ``right`` — then
replace the last element with ``left || right``. A just-merged
element can never trigger a second merge because ``left || right ==
left`` would require an empty ``right``. This reproduces canonical
BPE exactly, including runs of a repeated symbol ([a,a,a] with pair
(a,a) → [aa,a]).

``bpe_segment`` applies a trained merge list to documents as an
Arrow-batched pandas UDF — the standard rank-greedy apply (repeatedly
merge the lowest-rank pair present). Python is the right tool here:
the per-word merge loop is data-dependent and word-cached, and the
UDF is map-only so it scales embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csvb_spark.operators.text import tokens


def _chars(word: Column) -> Column:
    return F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )


def _merge_pair(syms: Column, left: str, right: str) -> Column:
    """Replace adjacent (left, right) with left||right, greedy
    left-to-right non-overlapping (see module doc for why the fold is
    exact)."""
    lft, rgt = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == lft) & (x == rgt),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), x)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the
    merge table (step, left, right, pair_count) with step 1-based in
    merge order.

    Driver traffic is one (left, right, count) row per iteration —
    bounded constants, never data (the ``kmeans_train`` contract).
    The word table is cached across iterations; each iteration
    re-materializes it once through the pair aggregation. Stops early
    if no adjacent pair remains.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    syms = words.select("freq", _chars(F.col("w")).alias("s")).persist()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for step in range(1, n_merges + 1):
            pairs = (
                syms.select(
                    "freq",
                    F.explode(
                        F.when(
                            F.size("s") >= 2,
                            F.transform(
                                F.sequence(F.lit(1), F.size("s") - 1),
                                lambda i: F.struct(
                                    F.element_at("s", i).alias("l"),
                                    F.element_at("s", i + 1).alias("r"),
                                ),
                            ),
                        ).otherwise(
                            F.array().cast("array<struct<l:string,r:string>>")
                        )
                    ).alias("p"),
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("freq").alias("cnt"))
            )
            best = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
            if not best:
                break
            b = best[0]
            merges.append((step, b["l"], b["r"], int(b["cnt"])))
            nxt = syms.select(
                "freq", _merge_pair(F.col("s"), b["l"], b["r"]).alias("s")
            ).persist()
            # materialize nxt BEFORE dropping syms' cache — unpersisting
            # first would leave nxt lazy over an uncached lineage and
            # every later iteration would recompute from the raw corpus
            # (quadratic in n_merges)
            nxt.count()
            syms.unpersist()
            syms = nxt
    finally:
        syms.unpersist()
    return spark.createDataFrame(
        merges, schema="step int, left string, right string, pair_count bigint"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a trained merge list: whitespace words,
    then the standard rank-greedy BPE apply (repeatedly merge the
    lowest-rank pair present in the word; occurrences merge left to
    right). Output: (doc_id, pieces array<string>, n_pieces).

    Arrow-batched pandas UDF with a per-batch word cache — map-only,
    no shuffle; the merge list is captured by value so executors need
    no module state.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def seg(texts):  # type: ignore[no-untyped-def]
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def apply_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            s = list(w)
            while len(s) > 1:
                ranked = [
                    (ranks[p], j)
                    for j, p in enumerate(zip(s, s[1:]))
                    if p in ranks
                ]
                if not ranked:
                    break
                rank = min(ranked)[0]
                l, r = merges[rank][0], merges[rank][1]
                out: list[str] = []
                j = 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == l and s[j + 1] == r:
                        out.append(l + r)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                s = out
            cache[w] = s
            return s

        return pd.Series(
            [
                [p for w in t.split() for p in apply_word(w)] if t else []
                for t in texts
            ]
        )

    return docs.select("doc_id", seg(F.col(text_col)).alias("pieces")).withColumn(
        "n_pieces", F.size("pieces")
    )
