"""Distributed BPE (byte-pair-encoding) vocabulary training + apply.

The trainer is the classic Sennrich et al. 2016 algorithm ("Neural
Machine Translation of Rare Words with Subword Units") re-expressed
for Spark's execution model:

- The corpus is first compressed to the WORD-FREQUENCY table (one
  explode + one keyed groupBy — the only corpus-sized work). Every
  merge iteration then runs over the vocabulary, which is orders of
  magnitude smaller than a 100 TB corpus and independent of corpus
  growth past saturation.
- The word table is BOUNDED (distinct words, not corpus rows), so the
  default trainer collects it once and runs the merge loop
  driver-local with incrementally-maintained pair counts — the
  standard Sennrich reference implementation shape. This turns "one
  Spark job pair per merge" (~64k serial jobs at a 32k vocab) into
  exactly TWO Spark jobs total (vocab count + collect) regardless of
  ``n_merges``. Corpus-sized work is unchanged.
- ``distributed=True`` (or a vocabulary above ``driver_vocab_limit``)
  falls back to the all-Spark loop: adjacent-pair explode →
  freq-weighted groupBy → global argmax (ONE tiny row to the driver)
  → a vocabulary-sized higher-order fold that merges the winning pair
  left-to-right in every word. Same semantics, one job pair per
  merge — the escape hatch for vocabularies that genuinely don't fit
  on the driver.
- Ties on pair count break lexicographically on (left, right) — a
  total order, so training is deterministic on any engine, partition
  count, row order, or execution path (both paths produce
  bit-identical merge tables; a test proves it).

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


def _train_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-local merge loop over the collected word-frequency
    table, with incrementally-maintained pair counts (only words
    containing the winning pair are touched per step — the classic
    Sennrich et al. reference-implementation optimization).

    Semantics are bit-identical to the distributed loop: pair counts
    sum ALL adjacent positions (overlaps included), the winner is
    (max count, then lexicographically smallest (left, right)), and
    the merge is greedy left-to-right non-overlapping.
    """
    # deterministic iteration order regardless of collect() row order
    word_freqs = sorted(word_freqs)
    syms: list[list[str]] = [list(w) for w, _ in word_freqs]
    freqs = [f for _, f in word_freqs]

    def pairs_of(s: list[str]) -> dict[tuple[str, str], int]:
        c: dict[tuple[str, str], int] = {}
        for p in zip(s, s[1:]):
            c[p] = c.get(p, 0) + 1
        return c

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, s in enumerate(syms):
        f = freqs[i]
        for p, k in pairs_of(s).items():
            pair_counts[p] = pair_counts.get(p, 0) + k * f
            pair_words.setdefault(p, set()).add(i)

    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        if not pair_counts:
            break
        (left, right), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((step, left, right, cnt))
        for i in sorted(pair_words.get((left, right), ())):
            f = freqs[i]
            old = syms[i]
            old_pairs = pairs_of(old)
            new: list[str] = []
            j = 0
            while j < len(old):
                if j + 1 < len(old) and old[j] == left and old[j + 1] == right:
                    new.append(left + right)
                    j += 2
                else:
                    new.append(old[j])
                    j += 1
            syms[i] = new
            new_pairs = pairs_of(new)
            for p, k in old_pairs.items():
                rem = pair_counts.get(p, 0) - k * f
                if rem > 0:
                    pair_counts[p] = rem
                else:
                    pair_counts.pop(p, None)
                if p not in new_pairs:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(i)
                        if not s:
                            pair_words.pop(p, None)
            for p, k in new_pairs.items():
                pair_counts[p] = pair_counts.get(p, 0) + k * f
                pair_words.setdefault(p, set()).add(i)
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 3,
    text_col: str = "text",
    distributed: bool | None = None,
    driver_vocab_limit: int = 5_000_000,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the
    merge table (step, left, right, pair_count) with step 1-based in
    merge order. Stops early if no adjacent pair remains.

    ``distributed=None`` (default) picks the path by vocabulary size:
    at or under ``driver_vocab_limit`` distinct words the bounded
    word-frequency table is collected and the merge loop runs
    driver-local (two Spark jobs total, any ``n_merges``); above it —
    or with ``distributed=True`` — the all-Spark per-merge loop runs
    instead. ``distributed=False`` forces the driver path (raises if
    the vocabulary exceeds the limit rather than risk driver OOM).
    Both paths are deterministic and produce identical merge tables.
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    if distributed is not True:
        words = words.persist()
        try:
            n_vocab = words.count()
            if n_vocab <= driver_vocab_limit:
                rows = words.collect()
                return spark.createDataFrame(
                    _train_local(
                        [(r["w"], int(r["freq"])) for r in rows], n_merges
                    ),
                    schema="step int, left string, right string, pair_count bigint",
                )
            if distributed is False:
                raise ValueError(
                    f"bpe_train: vocabulary ({n_vocab} words) exceeds "
                    f"driver_vocab_limit={driver_vocab_limit}; pass "
                    "distributed=True or raise the limit"
                )
        finally:
            words.unpersist()
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
