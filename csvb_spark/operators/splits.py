"""Dataset-assembly operators: deterministic splits and eval-set
contamination checks.

Beyond-reference training-data-pipeline components (the reference has
no dataset semantics at all — SURVEY.md §2 notes the relational-only
surface); both operators are the shapes a 100 TB corpus build needs:

- ``assign_splits``: hash-based train/valid/test assignment. Map-only
  (zero shuffles), deterministic under retries and re-runs (keyed on a
  column hash, never ``rand()``), and stable as the corpus grows — a
  document keeps its split when new rows arrive, unlike
  ``randomSplit`` which reshuffles everything.
- ``contamination_check``: which training documents share ≥ N distinct
  character k-grams with any document of an evaluation set. The
  candidate join is an equi-join on the GRAM HASH (one bigint per
  exploded gram — never gram text, never document pairs), so the
  shuffle is bounded by corpus gram count, and the pair explosion is
  bounded by grams that actually collide between train and eval.
  Ubiquitous grams (boilerplate) are dropped by an eval-side document
  -frequency cap before the join — the classic guard against a hot
  gram creating |train| × |eval| pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csvb_spark.operators.text import char_shingles


def split_bucket(id_col: str | Column, seed: int = 42, buckets: int = 10000) -> Column:
    """Deterministic bucket in [0, buckets) from the id's hash."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(buckets))


def assign_splits(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Add a ``split`` column ('train'/'valid'/... per ``weights``).

    Buckets the id hash into 10k cells and maps cumulative weight
    ranges onto them: exactly reproducible across runs, retries, and
    engines that share the hash, and each row's assignment is
    independent of every other row (append-stable). Map-only.
    """
    weights = weights or {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = split_bucket(id_col, seed)
    expr: Column | None = None
    acc = 0.0
    for name, w in weights.items():
        acc += w / total
        bound = int(round(acc * 10000))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float rounding could leave bucket 9999 unmatched; close the range
    assigned = expr.otherwise(list(weights)[-1])
    return df.withColumn("split", assigned)


def contamination_check(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    min_shared: int = 2,
    max_gram_eval_df: int = 50,
) -> DataFrame:
    """(train_doc_id, eval_doc_id, n_shared_grams) for pairs sharing
    ≥ ``min_shared`` distinct character k-grams.

    Plan: explode each side's DISTINCT gram set → project the gram to
    its xxhash64 (fixed-width shuffle rows) → drop eval grams appearing
    in > ``max_gram_eval_df`` eval documents (boilerplate guard) →
    equi-join train grams to eval grams on the hash → count distinct
    shared grams per (train, eval) pair. Two shuffles (gram join, pair
    aggregation); no cross join at any size.
    """
    t_grams = train.select(
        F.col("doc_id").alias("train_doc_id"),
        F.explode(char_shingles(text_col, k)).alias("g"),
    ).select("train_doc_id", F.xxhash64("g").alias("gh"))
    e_grams = eval_docs.select(
        F.col("doc_id").alias("eval_doc_id"),
        F.explode(char_shingles(text_col, k)).alias("g"),
    ).select("eval_doc_id", F.xxhash64("g").alias("gh"))
    rare = (
        e_grams.groupBy("gh")
        .agg(F.count("*").alias("eval_df"))
        .filter(F.col("eval_df") <= max_gram_eval_df)
        .select("gh")
    )
    e_kept = e_grams.join(rare, "gh")
    return (
        t_grams.join(e_kept, "gh")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )
