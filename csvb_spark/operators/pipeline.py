"""The batch CURATION pipeline composed end to end — the one-call
"switch to this repo" recipe: the stages every corpus build runs, in
the canonical order, each one an already-oracle-verified operator from
this package:

  1. (optional) HTML strip — markup out first, line structure kept
     (``web.html_strip_col``), so every later text signal sees prose.
  2. C4 line/page filter (``text.c4_line_filter``) — line rules on
     the cleaned text; drops pages that keep too few lines.
  3. Exact dedup (``dedup.exact_dedup`` — min-id keeper per content
     digest) — cheapest first, so near-dup never pays for
     byte-identical copies.
  4. Near-dup removal (``dedup.near_dedup``) — exact n-gram Jaccard
     pairs by default (the oracle-checkable path; blocking uses
     whichever of lang/source the table has and REFUSES to run
     unblocked); pass ``pairs_fn`` to swap in MinHash-LSH at scale;
     ``keep`` picks the min-id or longest-member canonical.
  5. Quality gate (``text.quality_score`` ≥ ``min_quality``).
  6. Split assignment (``splits.assign_splits``, or
     ``splits.leakage_safe_splits`` reusing stage 4's pairs so
     near-dup clusters never straddle the boundary).

(Per-domain quota is not a stage here — when the corpus carries URLs,
run ``web.domain_quota_sample`` on the curated output; it needs the
URL schema this recipe does not assume.)

The id contract is the repo-wide ``doc_id`` (non-NULL, like every
operator this composes — enforced eagerly at entry with
``assert_true``, because three of the stages join on it and a NULL id
would silently vanish at some stages and survive others).

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
clustering). Reference scope: beyond-reference (training-pipeline
extension; the streaming twin is
``streaming.ingest.run_streaming_ingest``).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(
    docs: DataFrame,
    text_col: str = "text",
    html: bool = False,
    c4: bool = True,
    min_kept_lines: int = 1,
    c4_kwargs: dict | None = None,
    near_dup: bool = True,
    keep: str = "min_id",
    pairs_fn: Callable[[DataFrame], DataFrame] | None = None,
    min_quality: float | None = 0.5,
    splits: dict[str, float] | None = None,
    leakage_safe: bool = False,
    seed: int = 42,
    stage_seconds: dict[str, float] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the standard curation recipe; see the module docstring for
    the stage list. Returns ``(curated_df, report_df)`` with
    ``report_df = (stage, n_in, n_out, pct_kept)``. Raises ValueError
    for unsatisfiable configurations (no blocking column for the
    default near-dup pairs, leakage-safe splits without near-dup).

    ``stage_seconds``: pass a dict to collect per-stage wall-clock
    (stage name → seconds). Each stage is eagerly materialized
    (localCheckpoint + count), so the numbers are true stage costs,
    not lazy-plan attribution — bench.py's ``curate`` section reads
    them (round 14)."""
    import time as _time
    from csvb_spark.operators import dedup as D
    from csvb_spark.operators import splits as S
    from csvb_spark.operators import text as T
    from csvb_spark.operators import web as W

    if leakage_safe and (splits is None or not near_dup):
        raise ValueError(
            "curate: leakage_safe needs both near_dup=True and splits"
        )
    block_cols = tuple(c for c in ("lang", "source") if c in docs.columns)
    if near_dup and pairs_fn is None and not block_cols:
        raise ValueError(
            "curate: the default near-dup pairs block on lang/source and "
            "this table has neither — pass pairs_fn (e.g. "
            "dedup.minhash_lsh_pairs) or add a blocking column"
        )

    spark = docs.sparkSession
    stages: list[tuple[str, int, int]] = []
    # doc_id is the repo-wide id contract; a NULL id would survive the
    # dedup stages but vanish at the joins — fail fast instead
    t0 = _time.perf_counter()
    cur = docs.withColumn(
        "doc_id",
        F.when(
            F.col("doc_id").isNull(),
            F.assert_true(
                F.col("doc_id").isNotNull(), F.lit("curate: NULL doc_id")
            ).cast("bigint"),
        ).otherwise(F.col("doc_id")),
    ).localCheckpoint(eager=True)
    n = cur.count()
    if stage_seconds is not None:
        stage_seconds["input_checkpoint"] = round(
            _time.perf_counter() - t0, 4
        )

    def _advance(name: str, nxt: DataFrame) -> DataFrame:
        nonlocal cur, n
        t0 = _time.perf_counter()
        nxt = nxt.localCheckpoint(eager=True)
        m = nxt.count()
        if stage_seconds is not None:
            stage_seconds[name] = round(_time.perf_counter() - t0, 4)
        stages.append((name, n, m))
        cur, n = nxt, m
        return cur

    if html:
        _advance(
            "html_strip",
            cur.withColumn(text_col, W.html_strip_col(F.col(text_col))),
        )
    if c4:
        # c4_kwargs passes operator options through (e.g.
        # require_terminal=False for corpora without sentence
        # punctuation, custom blocked terms) — the recipe stays one
        # call without re-exporting every C4 knob. Merged UNDER the
        # explicit args so c4_kwargs may also override them
        # (c4_kwargs={'min_kept_lines': 2} must not TypeError on a
        # duplicate keyword — round-14 self-review finding)
        c4_opts = {
            "text_col": text_col,
            "min_kept_lines": min_kept_lines,
            **(c4_kwargs or {}),
        }
        cleaned = T.c4_line_filter(cur, **c4_opts)
        kept = (
            cleaned.filter(F.col("keep_doc"))
            .select("doc_id", F.col("clean_text").alias(text_col))
            .join(cur.drop(text_col), "doc_id")
        )
        _advance("c4_filter", kept)
    _advance("exact_dedup", D.exact_dedup(cur, text_col=text_col))
    pairs = None
    if near_dup:
        pairs = (
            pairs_fn(cur)
            if pairs_fn is not None
            else D.ngram_jaccard_pairs(
                cur, text_col=text_col, block_cols=block_cols
            )
        )
        if leakage_safe:
            # pairs is consumed TWICE when leakage_safe: by near_dedup
            # here and by leakage_safe_splits at the split stage. Left
            # lazy, the split stage re-executes the entire pair lineage
            # (a full extra LSH banding pass at scale — 34% of the
            # sf0.1 capstone wall-clock in the round-14 bench).
            # Materialize once; both consumers read the checkpoint.
            t0 = _time.perf_counter()
            pairs = pairs.localCheckpoint(eager=True)
            if stage_seconds is not None:
                stage_seconds["pairs_checkpoint"] = round(
                    _time.perf_counter() - t0, 4
                )
        _advance(
            "near_dedup",
            D.near_dedup(cur, pairs=pairs, text_col=text_col, keep=keep),
        )
    if min_quality is not None:
        scored = T.quality_score(cur, text_col)
        good = scored.filter(
            F.col("quality_score") >= F.lit(float(min_quality))
        ).select("doc_id")
        _advance("quality_gate", cur.join(good, "doc_id", "left_semi"))
    if splits is not None:
        t0 = _time.perf_counter()
        if leakage_safe:
            # one invariant, one implementation: reuse stage 4's pairs
            cur = S.leakage_safe_splits(
                cur, pairs=pairs, weights=splits, seed=seed
            ).drop("cluster_id")
        else:
            cur = S.assign_splits(cur, weights=splits, seed=seed)
        cur = cur.localCheckpoint(eager=True)
        if stage_seconds is not None:
            stage_seconds["split_assign"] = round(
                _time.perf_counter() - t0, 4
            )
        stages.append(("split_assign", n, n))

    report = spark.createDataFrame(
        [(s, a, b) for s, a, b in stages],
        "stage string, n_in bigint, n_out bigint",
    ).select(
        "stage",
        "n_in",
        "n_out",
        # try_divide: a stage that RECEIVES zero docs (everything
        # rejected upstream) reports NULL pct_kept instead of an ANSI
        # divide-by-zero crash (found by the round-14 curate bench)
        F.try_divide(F.col("n_out").cast("double"), F.col("n_in")).alias(
            "pct_kept"
        ),
    )
    return cur, report
