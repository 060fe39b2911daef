"""Data-expectation checks: declarative table-quality contracts
verified in ONE aggregation pass (the Deequ / Great-Expectations shape
re-expressed Spark-first — public designs: Schelter et al. 2018,
"Automating Large-Scale Data Quality Verification", VLDB).

A 100 TB pipeline gates every materialization on contracts like "id is
unique", "lang ∈ {…}", "n_chars ≥ 0", "≤1% null source". The naive
implementation runs one job per check; at scale that re-scans the
corpus N times. Here every check compiles to a conditional aggregate
over the SAME single scan — Catalyst fuses them into one partial→final
hash aggregation with NO extra shuffle beyond the one 1-row reduce,
and uniqueness (the only check needing a distinct) rides the same pass
as ``count_distinct``.

Output: one row per expectation ``(check_name, metric, threshold, passed)``
— metrics are exact int64 counts or count-ratios (single IEEE
division), so any engine reproduces them bit-for-bit (oracle x72).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named check: ``agg`` reduces to a DOUBLE metric for the
    whole table; the check passes when ``metric <= threshold`` (or
    ``>=`` with ``at_least=True``)."""

    name: str
    agg: Column
    threshold: float
    at_least: bool = False


def expect_max_null_fraction(col: str, fraction: float) -> Expectation:
    return Expectation(
        f"null_fraction({col})<={fraction}",
        F.sum(F.col(col).isNull().cast("bigint")).cast("double")
        / F.count("*").cast("double"),
        fraction,
    )


def expect_unique(col: str) -> Expectation:
    """Duplicate count must be 0: rows − distinct values (NULLs are
    not counted by count_distinct, so they ride the null check)."""
    return Expectation(
        f"unique({col})",
        (
            F.sum(F.col(col).isNotNull().cast("bigint"))
            - F.count_distinct(F.col(col))
        ).cast("double"),
        0.0,
    )


def expect_in_set(col: str, allowed: list[str]) -> Expectation:
    return Expectation(
        f"in_set({col})",
        F.sum(
            (F.col(col).isNotNull() & ~F.col(col).isin(allowed)).cast("bigint")
        ).cast("double"),
        0.0,
    )


def expect_min(col: str, lo: float) -> Expectation:
    return Expectation(
        f"min({col})>={lo}",
        F.min(F.col(col)).cast("double"),
        float(lo),
        at_least=True,
    )


def expect_max(col: str, hi: float) -> Expectation:
    return Expectation(
        f"max({col})<={hi}", F.max(F.col(col)).cast("double"), float(hi)
    )


def expect_row_count_at_least(n: int) -> Expectation:
    return Expectation(
        f"row_count>={n}", F.count("*").cast("double"), float(n), at_least=True
    )


def check_expectations(df: DataFrame, checks: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation over one scan.
    Output rows: ``(check_name, metric, threshold, passed)``, one per
    expectation, in the declared order (an ``ord`` sort key rides
    along so the order is deterministic, then is dropped)."""
    if not checks:
        raise ValueError("check_expectations: no expectations given")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError("check_expectations: duplicate expectation names")
    one = df.agg(*[c.agg.alias(f"_m{i}") for i, c in enumerate(checks)])
    rows = F.array(
        *[
            F.named_struct(
                F.lit("ord"),
                F.lit(i),
                F.lit("check_name"),
                F.lit(c.name),
                F.lit("metric"),
                F.round(F.col(f"_m{i}"), 6),
                F.lit("threshold"),
                F.lit(float(c.threshold)),
                F.lit("passed"),
                (
                    F.col(f"_m{i}") >= F.lit(float(c.threshold))
                    if c.at_least
                    else F.col(f"_m{i}") <= F.lit(float(c.threshold))
                ),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.ord", "r.check_name", "r.metric", "r.threshold", "r.passed")
        .orderBy("ord")
        .drop("ord")
    )


def assert_expectations(df: DataFrame, checks: list[Expectation]) -> None:
    """Gate form: raise ``ValueError`` listing every failed check —
    the call a pipeline puts between materializations."""
    failed = [
        f"{r['check_name']} (metric={r['metric']}, threshold={r['threshold']})"
        for r in check_expectations(df, checks).collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError("expectations failed: " + "; ".join(failed))
