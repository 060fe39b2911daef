"""Lexical search + rank fusion for training-data pipelines.

BM25 is the lexical complement to the embedding-space retrieval in
``similarity.py`` — at pipeline scale it drives targeted corpus
queries ("find docs about X to audit/decontaminate") without an
embedding pass, and fused with cosine ranks (reciprocal-rank fusion)
it is the standard hybrid-retrieval baseline.

Both operators are pure DataFrame: the only shuffles are keyed
aggregations (per-doc term rollup, per-list rank windows); corpus
statistics (N, avgdl, per-term df) reduce to broadcast single-rows or
a tiny per-term table. No Python in the row path.

Cross-engine determinism (see ``queries.common``): every
variable-cardinality sum runs in DECIMAL after a per-addend
``round(x, 6)``; scalar arithmetic keeps one fixed parenthesization
so Spark and the DuckDB oracle produce identical IEEE doubles.

Reference scope: beyond-reference (training-pipeline extension);
BM25 per Robertson & Zaragoza 2009 — default idf is the log-free
odds ratio (N - df + 0.5)/(df + 0.5) for engine-portable bit-exact
replay (multi-term rankings diverge from standard BM25; see the
``bm25_topk`` docstring), with ``idf="log"`` for Lucene-standard
parity; RRF per Cormack, Clarke & Buettcher 2009.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from csvb_spark.operators.text import tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    idf: str = "ratio",
) -> DataFrame:
    """Top-k documents by BM25 against a bag of query terms.

    **Ranking caveat — read before comparing against other BM25
    tooling.** The default ``idf="ratio"`` uses the LOG-FREE odds
    ratio (N − df + 0.5)/(df + 0.5). Single-term rankings match
    standard BM25 exactly (the idf is a positive monotone per-term
    constant), but MULTI-term rankings diverge materially: without
    the log, a rare term's contribution is exponentially amplified
    relative to Robertson/Lucene BM25. The ratio form exists for
    cross-engine bit-exactness (integer/ratio-only arithmetic — the
    DuckDB oracle reproduces it bit-for-bit). Pass ``idf="log"`` for
    the Lucene-standard ln(1 + (N − df + 0.5)/(df + 0.5)) when
    parity with standard BM25 tooling matters more than bit-exact
    replay.

    Output: (doc_id, n_terms, bm25) ordered by score desc with doc_id
    tiebreak; only documents matching ≥1 term appear (everything else
    scores 0). ``n_terms`` = distinct query terms present.

    Per-(doc, term): score_t = idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl)). Per-doc score = decimal sum of round(score_t, 6).

    Plan: the postings explode filters each doc's token array to the
    query terms BEFORE exploding (map-only; non-matching docs emit
    nothing), so the exploded cardinality is Σ tf over matching docs
    only — for a bounded query-term set this is a vanishing fraction
    of the corpus. df aggregates over the postings (tiny: ≤ |terms|
    rows, broadcast), corpus stats (N, avgdl) reduce to one broadcast
    row, and the final rollup is one keyed shuffle + global top-k
    (TakeOrderedAndProject — never a full sort).
    """
    if not query_terms:
        # F.array() of zero VOID elements fails deep in analysis;
        # surface the misuse at the API boundary instead
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = F.array(*[F.lit(t) for t in query_terms])
    t = tokens(text_col)
    base = docs.select("doc_id", F.size(t).alias("dl"), t.alias("toks"))
    stats = F.broadcast(
        base.agg(
            F.count("*").alias("n_docs"),
            (
                F.sum(F.col("dl").cast("decimal(18,6)")).cast("double")
                / F.count("*")
            ).alias("avgdl"),
        )
    )
    postings = (
        base.select(
            "doc_id",
            "dl",
            F.explode(F.filter("toks", lambda x: F.array_contains(terms, x))).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = F.broadcast(
        postings.groupBy("term").agg(F.count("*").alias("df"))
    )
    if idf not in ("ratio", "log"):
        raise ValueError(f"bm25_topk: idf must be 'ratio' or 'log', got {idf!r}")
    k1c, bc = F.lit(float(k1)), F.lit(float(b))
    ratio = (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    idf_expr = F.log(F.lit(1.0) + ratio) if idf == "log" else ratio
    denom = F.col("tf") + k1c * (
        F.lit(1.0) - bc + (bc * F.col("dl").cast("double")) / F.col("avgdl")
    )
    term_score = F.round(idf_expr * ((F.col("tf") * (k1c + 1.0)) / denom), 6)
    return (
        postings.join(df_tbl, "term")
        .crossJoin(stats)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum(term_score.cast("decimal(18,6)")).cast("double").alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
    max_list_rows: int = 100_000,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists: rrf(d) = Σ_lists
    1/(c + rank_list(d)), the standard hybrid-retrieval combiner
    (robust to incomparable score scales — only ranks matter).

    Each input must expose (id_col, score_col); ranks are assigned
    per list by score desc with id tiebreak (total order → identical
    ranks in any engine). Output: (id_col, n_lists, rrf) ordered by
    fused score desc with id tiebreak. Per-list contributions are
    round(1/(c+rank), 6) summed in DECIMAL — order-independent.

    Plan: each list is ranked with a single-partition window, which is
    safe ONLY because inputs are bounded — the intended use feeds
    already-top-k'd lists (e.g. ``bm25_topk``/``brute_force_topk``
    output), so the window input is k rows per list, the union is
    tiny, and the rollup + top-k is trivial. That contract is
    ENFORCED, not conventioned — inside the single execution: each
    list's ranking window also counts the list, and a runtime
    ``assert_true`` fails the job if any list exceeds
    ``max_list_rows``. (An earlier eager ``limit(n+1).count()`` guard
    re-executed every input's full upstream plan once for the check
    and again for the fusion — doubling BM25/top-k compute — so the
    check now rides the plan instead of preceding it.) At scale the
    expensive part is producing the input rankings, not the fusion.
    """
    if not rankings:
        raise ValueError("rrf_fuse: rankings must be non-empty")
    ranked = []
    for i, r in enumerate(rankings):
        w = (
            r.select(
                F.col(id_col).alias("_id"), F.col(score_col).alias("_score")
            )
            .withColumn(
                "rank",
                F.row_number().over(Window.orderBy(F.desc("_score"), F.asc("_id"))),
            )
            .withColumn(
                "_n",
                F.count("*").over(
                    Window.orderBy(F.lit(1)).rowsBetween(
                        Window.unboundedPreceding, Window.unboundedFollowing
                    )
                ),
            )
            .select(
                "_id",
                (
                    F.round(F.lit(1.0) / (F.lit(float(c)) + F.col("rank")), 6)
                    + F.when(
                        F.col("_n") > max_list_rows,
                        F.assert_true(
                            F.col("_n") <= max_list_rows,
                            F.lit(
                                f"rrf_fuse: rankings[{i}] exceeds "
                                f"max_list_rows={max_list_rows}; pass "
                                "pre-top-k'd lists or raise max_list_rows"
                            ),
                        ).cast("double")
                    ).otherwise(F.lit(0.0))
                ).alias("contrib"),
            )
        )
        ranked.append(w)
    allr = ranked[0]
    for w in ranked[1:]:
        allr = allr.unionAll(w)
    return (
        allr.groupBy("_id")
        .agg(
            F.count("*").alias("n_lists"),
            F.sum(F.col("contrib").cast("decimal(18,6)")).cast("double").alias("rrf"),
        )
        .select(F.col("_id").alias(id_col), "n_lists", "rrf")
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )
