"""One-pass table profiling: per-column stats in a single aggregation
(the DuckDB ``SUMMARIZE`` shape, Spark-first).

A pipeline's first question about any new table — row count, nulls
per column, cardinalities, numeric ranges — is usually answered with
one query per column, re-scanning the table N times. Here every
column's metrics compile into ONE aggregation over ONE scan (the same
fused-conditional-aggregate economics as
``operators/expectations.py``), and the wide 1-row result unpivots to
a long-form report.

Cardinality: ``exact=True`` uses ``count_distinct`` — Spark plans
multiple distinct aggregates via an Expand (data × #columns), which
is the honest cost of exact answers and fine at audit time; the
default ``exact=False`` uses ``approx_count_distinct`` (HyperLogLog,
one pass, no Expand) — the 100 TB default. Numeric min/max are
reported as DOUBLE in ``min_val``/``max_val``; string and
date/timestamp ranges are reported as TEXT in ``min_text``/
``max_text`` (raw strings; ISO-8601 at fixed microsecond width for
timestamps, so any engine renders the identical text). Other types
(binary, arrays, booleans) carry NULL ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_DATE_FMT = "yyyy-MM-dd"


def profile_table(df: DataFrame, exact: bool = False) -> DataFrame:
    """Profile every column of ``df`` in one aggregation pass.

    Output (one row per column, in schema order):
    ``(col_name, dtype, n_rows, n_nulls, n_distinct, min_val, max_val,
    min_text, max_text)`` — ``min_val``/``max_val`` DOUBLE for numeric
    columns, ``min_text``/``max_text`` STRING for string (raw) and
    date/timestamp (ISO-8601, fixed microsecond width) columns, NULL
    for the kinds that don't apply. ``n_distinct`` excludes NULLs (SQL
    count-distinct semantics) and is approximate unless
    ``exact=True``."""
    fields = df.schema.fields
    if not fields:
        raise ValueError("profile_table: no columns")
    distinct = F.count_distinct if exact else F.approx_count_distinct

    def _text(col, dtype):
        if isinstance(dtype, StringType):
            return col
        if isinstance(dtype, (TimestampType, TimestampNTZType)):
            return F.date_format(col, _TS_FMT)
        return F.date_format(col, _DATE_FMT)  # DateType

    aggs = [F.count("*").alias("_n")]
    for i, f in enumerate(fields):
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("bigint")).alias(f"_null{i}"))
        aggs.append(distinct(c).alias(f"_dist{i}"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).cast("double").alias(f"_min{i}"))
            aggs.append(F.max(c).cast("double").alias(f"_max{i}"))
        elif isinstance(
            f.dataType, (StringType, DateType, TimestampType, TimestampNTZType)
        ):
            # min/max over the native type (string collation / time
            # order), rendered to portable text AFTER aggregation
            aggs.append(_text(F.min(c), f.dataType).alias(f"_tmin{i}"))
            aggs.append(_text(F.max(c), f.dataType).alias(f"_tmax{i}"))
    one = df.agg(*aggs)
    rows = []
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    for i, f in enumerate(fields):
        numeric = isinstance(f.dataType, NumericType)
        texty = isinstance(
            f.dataType, (StringType, DateType, TimestampType, TimestampNTZType)
        )
        rows.append(
            F.named_struct(
                F.lit("ord"),
                F.lit(i),
                F.lit("col_name"),
                F.lit(f.name),
                F.lit("dtype"),
                F.lit(f.dataType.simpleString()),
                F.lit("n_rows"),
                F.col("_n"),
                F.lit("n_nulls"),
                F.col(f"_null{i}"),
                F.lit("n_distinct"),
                F.col(f"_dist{i}"),
                F.lit("min_val"),
                F.col(f"_min{i}") if numeric else null_d,
                F.lit("max_val"),
                F.col(f"_max{i}") if numeric else null_d,
                F.lit("min_text"),
                F.col(f"_tmin{i}") if texty else null_s,
                F.lit("max_text"),
                F.col(f"_tmax{i}") if texty else null_s,
            )
        )
    return (
        one.select(F.explode(F.array(*rows)).alias("r"))
        .select(
            "r.ord",
            "r.col_name",
            "r.dtype",
            "r.n_rows",
            "r.n_nulls",
            "r.n_distinct",
            "r.min_val",
            "r.max_val",
            "r.min_text",
            "r.max_text",
        )
        .orderBy("ord")
        .drop("ord")
    )


def skew_report(
    df: DataFrame, key_col: str, k: int = 20
) -> DataFrame:
    """Hot-key diagnostics for shuffle planning: the top-``k`` keys by
    exact count, each with its share of the table and the whole key
    distribution's entropy — the pre-flight check before deciding
    whether a 100 TB join/groupBy on this key needs salting, AQE skew
    splitting, or a broadcast instead (a normalized entropy near 1 ⇒
    uniform keys, shuffle freely; near 0 ⇒ a few keys own the table,
    plan for skew).

    Plan: one fixed-width groupBy on the key (the histogram), one
    bounded aggregate over the histogram for the totals/entropy, and
    a top-k (``TakeOrderedAndProject``) — the table itself is scanned
    once and only (key, count) rows ever shuffle.

    Determinism (engine-portable, x92): counts are exact int64;
    ``share`` is ONE IEEE division of exact integers and therefore
    ships UNROUNDED (bit-identical by construction — rounding an
    already-agreed double is the half-boundary trap queries/common.py
    documents); entropy uses
    ``H = ln(N) − Σ n·ln(n) / N`` with each key's ``n·ln(n)`` rounded
    to 6 and quantized to DECIMAL(18,6) (order-independent exact
    sum), the final ``H`` and its ``ln(n_keys)``-normalized form
    rounded to 6. ``norm_entropy`` is NULL for a single-key table.

    Output (top-k rows, count DESC / key ASC): ``(key, n, share,
    total_rows, n_keys, entropy, norm_entropy)`` — the last four are
    table-level constants repeated per row so the report is one flat
    result set.
    """
    if k <= 0:
        raise ValueError(f"skew_report: k must be positive, got {k}")
    hist = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    totals = hist.agg(
        F.sum("n").alias("_N"),
        F.count("*").alias("_K"),
        F.sum(
            F.round(F.col("n") * F.log(F.col("n")), 6).cast("decimal(18,6)")
        ).alias("_nlogn"),
    )
    ent = F.round(
        F.log(F.col("_N").cast("double"))
        - F.col("_nlogn").cast("double") / F.col("_N").cast("double"),
        6,
    )
    norm = F.when(
        F.col("_K") > 1,
        F.round(
            (
                F.log(F.col("_N").cast("double"))
                - F.col("_nlogn").cast("double") / F.col("_N").cast("double")
            )
            / F.log(F.col("_K").cast("double")),
            6,
        ),
    )
    return (
        hist.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("_N").cast("double")).alias(
                "share"
            ),
            F.col("_N").alias("total_rows"),
            F.col("_K").alias("n_keys"),
            ent.alias("entropy"),
            norm.alias("norm_entropy"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(k)
    )


def retention_funnel(
    docs: DataFrame,
    text_col: str = "text",
    min_chars: int = 100,
    max_chars: int = 5000,
    group_col: str = "source",
) -> DataFrame:
    """Per-source stage retention through the canonical curation
    funnel — the report every corpus build publishes next to its
    dataset card: how many documents each source contributed RAW, how
    many survive exact dedup (first-doc-id keeper per md5
    fingerprint), and how many of those survive the length band. A
    source whose retention collapses at a stage is where the crawler
    or the filter needs attention.

    Plan: ONE window over the md5 fingerprint (the same single hash
    exchange exact dedup itself costs — duplicates co-partition, rank
    1 marks the keeper) feeding ONE partial-aggregated groupBy on the
    group key; the table is scanned once. Percentages are single IEEE
    divisions of exact counts, rounded to 6 on both engines.

    Output per group: ``(<group_col>, n_raw, n_exact, n_final,
    pct_exact, pct_final)``. Reference scope: beyond-reference
    (training-pipeline extension; composes with p01/p02's dedup).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    fp = F.md5(F.encode(text, "UTF-8"))
    keeper_rank = F.row_number().over(
        Window.partitionBy(fp).orderBy("doc_id")
    )
    # the length stage measures the SAME column the fingerprint stage
    # hashed (a pre-existing n_chars column could describe different,
    # stale text — and nothing guarantees the frame has one)
    staged = docs.select(
        group_col,
        F.length(text).alias("_len"),
        keeper_rank.alias("_rn"),
    )
    is_exact = (F.col("_rn") == 1).cast("bigint")
    is_final = (
        (F.col("_rn") == 1)
        & F.col("_len").between(min_chars, max_chars)
    ).cast("bigint")
    return (
        staged.groupBy(group_col)
        .agg(
            F.count("*").alias("n_raw"),
            F.sum(is_exact).alias("n_exact"),
            F.sum(is_final).alias("n_final"),
        )
        .select(
            group_col,
            "n_raw",
            "n_exact",
            "n_final",
            F.round(F.col("n_exact").cast("double") / F.col("n_raw"), 6).alias(
                "pct_exact"
            ),
            F.round(F.col("n_final").cast("double") / F.col("n_raw"), 6).alias(
                "pct_final"
            ),
        )
    )


def filter_attribution(
    docs: DataFrame, filters: dict[str, "F.Column"]
) -> DataFrame:
    """Kill ATTRIBUTION for a filter stack — the audit a curation
    pipeline publishes before turning N filters on at once: per
    filter, how many documents it fails, and how many it UNIQUELY
    fails (no other filter catches them). A filter with near-zero
    unique kills is redundant; one with huge unique kills deserves a
    manual sample review before it silently deletes a data mode.

    ``filters`` maps name → BOOLEAN keep-Column (True = document
    passes). Output: one row per filter, ``(filter, n_docs, n_fail,
    n_unique_fail, pct_fail)``; ``pct_fail`` is one IEEE division of
    exact counts (shipped unrounded — engine-identical by
    construction).

    Plan: every flag is evaluated in ONE map pass over the table, the
    totals in ONE aggregation (no per-filter scans); the melt to long
    form happens on the single aggregated row via explode — constant
    cost. Reference scope: beyond-reference (training-pipeline
    extension).
    """
    if not filters:
        raise ValueError("filter_attribution: filters must be non-empty")
    names = list(filters)
    # internal columns are POSITIONAL (_f_0, _f_1, ...): a display name
    # containing '.' or '`' would otherwise be re-parsed by F.col as a
    # struct-field path and fail resolution; the caller's name appears
    # only as a literal in the melt
    flagged = docs.select(
        *[
            (~F.coalesce(c, F.lit(False))).cast("int").alias(f"_f_{i}")
            for i, c in enumerate(filters.values())
        ]
    )
    total_fails = sum(F.col(f"_f_{i}") for i in range(len(names)))
    flagged = flagged.withColumn("_nf", total_fails)
    aggs = [F.count("*").alias("_n")]
    for i in range(len(names)):
        aggs.append(F.sum(F.col(f"_f_{i}")).alias(f"_fail_{i}"))
        aggs.append(
            F.sum(
                ((F.col(f"_f_{i}") == 1) & (F.col("_nf") == 1)).cast("int")
            ).alias(f"_uniq_{i}")
        )
    row = flagged.agg(*aggs)
    melted = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("filter"),
                        F.col("_n").cast("bigint").alias("n_docs"),
                        F.col(f"_fail_{i}").cast("bigint").alias("n_fail"),
                        F.col(f"_uniq_{i}").cast("bigint").alias("n_unique_fail"),
                    )
                    for i, n in enumerate(names)
                ]
            )
        ).alias("s")
    )
    return melted.select(
        "s.filter",
        "s.n_docs",
        "s.n_fail",
        "s.n_unique_fail",
        (F.col("s.n_fail").cast("double") / F.col("s.n_docs")).alias(
            "pct_fail"
        ),
    )


def dataset_card(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    lang_col: str = "lang",
) -> DataFrame:
    """One-call DATASET CARD summary — the headline table a corpus
    release publishes: volume, provenance breadth, language breadth,
    duplication rate, and size distribution, as one long-format
    ``(metric, value)`` result. Every metric is exact (counts, exact
    interpolated median, one IEEE division for the dup rate), so the
    card is reproducible in any engine.

    Plan: ONE aggregation over one scan computes every metric
    (count-distincts expand map-side; the exact median is Spark's
    ``percentile``, the same (a+b)/2 interpolation DuckDB's ``median``
    uses); the melt to long form happens on the single aggregated
    row. Reference scope: beyond-reference (training-pipeline
    extension; the per-source drill-down is ``retention_funnel`` /
    ``source_overlap``).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    fp = F.md5(F.encode(text, "UTF-8"))
    n_tokens = F.size(F.split(F.trim(text), r"\s+"))
    row = docs.agg(
        F.count("*").alias("_n"),
        F.count_distinct(F.col(source_col)).alias("_srcs"),
        F.count_distinct(F.col(lang_col)).alias("_langs"),
        F.count_distinct(fp).alias("_uniq"),
        F.sum(n_tokens.cast("bigint")).alias("_toks"),
        F.expr(f"percentile(length(coalesce({text_col}, '')), 0.5)").alias(
            "_med"
        ),
    )
    metrics = [
        ("n_docs", F.col("_n").cast("double")),
        ("n_sources", F.col("_srcs").cast("double")),
        ("n_langs", F.col("_langs").cast("double")),
        ("total_tokens", F.col("_toks").cast("double")),
        ("median_chars", F.col("_med").cast("double")),
        (
            "exact_dup_rate",
            F.lit(1.0) - F.col("_uniq").cast("double") / F.col("_n"),
        ),
    ]
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("metric"), col.alias("value")
                    )
                    for name, col in metrics
                ]
            )
        ).alias("s")
    ).select("s.metric", "s.value")


def length_histogram(
    docs: DataFrame,
    size_col: str = "n_chars",
    bin_width: int = 100,
    n_bins: int = 20,
) -> DataFrame:
    """Equi-width SIZE histogram (last bin open-ended) — the length
    distribution a dataset card plots next to :func:`dataset_card`'s
    scalars. Output: ``(bin, bin_start, n_docs)`` with ``bin =
    min(size // bin_width, n_bins - 1)``.

    One partial-aggregated groupBy over at most ``n_bins`` groups —
    integer arithmetic only."""
    if bin_width < 1 or n_bins < 2:
        raise ValueError("length_histogram: bin_width >= 1, n_bins >= 2")
    b = F.least(
        F.floor(F.col(size_col) / F.lit(bin_width)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        docs.groupBy(b.alias("bin"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            "bin",
            (F.col("bin") * bin_width).cast("bigint").alias("bin_start"),
            "n_docs",
        )
    )
