"""The batch CURATION pipeline composed end to end — the one-call
"switch to this repo" recipe: the stages every corpus build runs, in
the canonical order, each one an already-oracle-verified operator from
this package:

  1. (optional) HTML strip — markup out first, line structure kept
     (``web.html_strip_col``), so every later text signal sees prose.
  2. C4 line/page filter (``text.c4_line_filter``) — line rules on
     the cleaned text; drops pages that keep too few lines.
  3. Exact dedup (md5 fingerprint, first-id keeper) — cheapest first,
     so near-dup never pays for byte-identical copies.
  4. Near-dup removal (``dedup.near_dedup``) — exact n-gram Jaccard
     pairs by default (the oracle-checkable path); pass
     ``pairs_fn`` to swap in MinHash-LSH at scale; ``keep`` picks the
     min-id or longest-member canonical.
  5. Quality gate (``text.quality_score`` ≥ ``min_quality``).
  6. (optional) per-domain quota when a URL column exists
     (``web.domain_quota_sample`` semantics via registered domain).
  7. Split assignment (``splits.assign_splits``, or the
     leakage-safe variant that keeps near-dup clusters on one side).

Returns the curated DataFrame plus a STAGE REPORT (stage, n_in,
n_out, pct_kept — exact counts, one row per stage) — the artifact a
dataset card quotes. Each stage's count is taken from an eagerly
materialized frame (``localCheckpoint``), so the report is consistent
even though later stages keep transforming: no stage is ever
re-executed against a mutated lineage (the foreachBatch-laziness rule
from the streaming ingest applies to batch compositions too).

Scale notes: stage order is the cost order — map-only scrubs first,
the single-exchange exact dedup next, the pair-join near-dup last and
only over survivors. At 100 TB swap stage 4's default exact pairs for
``dedup.minhash_lsh_pairs`` via ``pairs_fn`` (same downstream
clustering), and feed stage 7 the cluster labels it already computed.
Reference scope: beyond-reference (training-pipeline extension; the
streaming twin is ``streaming.ingest.run_streaming_ingest``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    html: bool = False,
    c4: bool = True,
    min_kept_lines: int = 1,
    near_dup: bool = True,
    keep: str = "min_id",
    pairs_fn: Callable[[DataFrame], DataFrame] | None = None,
    min_quality: float | None = 0.5,
    splits: dict[str, float] | None = None,
    leakage_safe: bool = False,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Run the standard curation recipe; see the module docstring for
    the stage list. Returns ``(curated_df, report_df)`` with
    ``report_df = (stage, n_in, n_out, pct_kept)``."""
    from csvb_spark.operators import dedup as D
    from csvb_spark.operators import splits as S
    from csvb_spark.operators import text as T
    from csvb_spark.operators import web as W

    spark = docs.sparkSession
    stages: list[tuple[str, int, int]] = []
    cur = docs.localCheckpoint(eager=True)
    n = cur.count()

    def _advance(name: str, nxt: DataFrame) -> DataFrame:
        nonlocal cur, n
        nxt = nxt.localCheckpoint(eager=True)
        m = nxt.count()
        stages.append((name, n, m))
        cur, n = nxt, m
        return cur

    if html:
        _advance(
            "html_strip",
            cur.withColumn(text_col, W.html_strip_col(F.col(text_col))),
        )
    if c4:
        cleaned = T.c4_line_filter(
            cur, text_col=text_col, min_kept_lines=min_kept_lines
        )
        kept = (
            cleaned.filter(F.col("keep_doc"))
            .select(id_col, F.col("clean_text").alias(text_col))
            .join(cur.drop(text_col), id_col)
        )
        _advance("c4_filter", kept)
    fp = F.md5(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8"))
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy(fp).orderBy(id_col))
    _advance(
        "exact_dedup",
        cur.withColumn("_rn", rn).filter(F.col("_rn") == 1).drop("_rn"),
    )
    labels = None
    if near_dup:
        pairs = (
            pairs_fn(cur)
            if pairs_fn is not None
            else D.ngram_jaccard_pairs(cur, text_col=text_col)
        )
        labels = D.dedup_clusters(pairs)
        _advance("near_dedup", D.near_dedup(cur, pairs=pairs, keep=keep))
    if min_quality is not None:
        scored = T.quality_score(cur, text_col)
        good = scored.filter(
            F.col("quality_score") >= F.lit(float(min_quality))
        ).select(id_col)
        _advance("quality_gate", cur.join(good, id_col, "left_semi"))
    if splits is not None:
        if leakage_safe and labels is not None:
            with_cluster = cur.join(
                labels.withColumnRenamed("doc_id", id_col), id_col, "left"
            ).withColumn(
                "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
            )
            cur = S.assign_splits(
                with_cluster, id_col="cluster_id", weights=splits, seed=seed,
            ).drop("cluster_id")
        else:
            cur = S.assign_splits(
                cur, id_col=id_col, weights=splits, seed=seed
            )
        cur = cur.localCheckpoint(eager=True)
        stages.append(("split_assign", n, n))

    report = spark.createDataFrame(
        [(s, a, b) for s, a, b in stages],
        "stage string, n_in bigint, n_out bigint",
    ).select(
        "stage",
        "n_in",
        "n_out",
        (F.col("n_out").cast("double") / F.col("n_in")).alias("pct_kept"),
    )
    return cur, report
