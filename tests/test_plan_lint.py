"""Corpus-wide plan lint: every declared query's physical plan must
be free of structural scale catastrophes (cartesian products,
unbounded nested-loop joins, row-at-a-time Python UDFs, per-pair
regex join conditions) — see csvb_spark/plans/lint.py for the rules
and the ≤1-row build-side auto-clearance.

test_plans.py pins flagship plan shapes one by one; this test is the
blanket: a refactor that degrades ANY of the corpus entries'
plans fails here with the query name in the failure id. Exemptions
are per-query, and each carries the size bound that makes the
flagged shape safe — an exemption without a bound is a bug report.
"""

from __future__ import annotations

import pytest

from csvb_spark.plans.lint import lint_plan
from csvb_spark.queries import corpus

# query name -> {rule: justification}. The justification must state
# the BOUND that makes the shape safe at 100 TB.
_PROBE = (
    "BNLJ build side is the PROBE set (a handful of query vectors / "
    "top-k rows), bounded by the request, not by corpus size; the "
    "corpus side streams map-side"
)
_THETA = (
    "deliberate theta/band join: the broadcast side is a bounded "
    "band/dimension table (grows with band count, not fact volume)"
)
_SHIM = (
    "dialect gauntlet deliberately exercises the 3 documented "
    "cold-path compat Python UDF shims (functions/shims.py); they are "
    "banned from every other corpus plan by this very test"
)
EXEMPT: dict[str, dict[str, str]] = {
    "p07_sim_bruteforce_topk": {"nested-loop": _PROBE},
    "x12_sim_lsh_topk": {"nested-loop": _PROBE},
    "x49_knn_join": {"nested-loop": _PROBE + " (probes capped, vec_id < 20)"},
    "x56_rrf_hybrid": {"nested-loop": _PROBE + " (1 probe vector + BM25 top-50)"},
    "x67_hard_negatives": {"nested-loop": _PROBE + " (probes capped, vec_id < 20)"},
    "p36_matryoshka": {"nested-loop": _PROBE},
    "x96_matryoshka_topk": {"nested-loop": _PROBE},
    "p79_rel_theta_join": {"nested-loop": _THETA},
    "q29_theta_join_bands": {"nested-loop": _THETA},
    "q10_cross_join": {
        "nested-loop": "the query IS a cross join (reference-parity "
        "surface); both sides are dimension-sized in every sane use"
    },
    "q50_dialect_gauntlet": {"row-python-udf": _SHIM},
    "p84_rel_dialect": {"row-python-udf": _SHIM},
}

_CORPUS = corpus()


@pytest.mark.parametrize("name", sorted(_CORPUS))
def test_corpus_plan_is_lint_clean(spark, sf_dir, name):
    df = _CORPUS[name].spark(spark, sf_dir)
    findings = [f for f in lint_plan(df) if f.rule not in EXEMPT.get(name, {})]
    assert not findings, f"{name}: " + "; ".join(map(str, findings))


def test_build_side_bounded_follows_reused_exchange():
    """A BNLJ whose build side is a ReusedExchange of a Keys: []
    aggregate must auto-clear: the walk follows the 'Reuses operator
    id' reference instead of flagging a provably 1-row side (static
    plans with exchange reuse — e.g. AQE off — hit this shape when
    the same scalar broadcast feeds two joins)."""
    from csvb_spark.plans.lint import _build_side_bounded, _parse_tree, _walk

    plan = """== Physical Plan ==
Project (9)
+- BroadcastNestedLoopJoin Cross BuildRight (8)
   :- Project (2)
   :  +- Scan parquet  (1)
   +- ReusedExchange (7)

(1) Scan parquet 
Output: [a#1L]

(7) ReusedExchange [Reuses operator id: 5]
Output [1]: [cnt#9L]

(5) BroadcastExchange
Input [1]: [cnt#9L]

(4) HashAggregate
Input [1]: [sum#12L]
Keys: []
Functions [1]: [count(1)]
"""
    # graft the referenced exchange subtree as a second root, the way
    # a real formatted plan carries subquery/auxiliary trees
    plan += """
BroadcastExchange (5)
+- HashAggregate (4)
   +- Scan parquet  (3)
"""
    roots, details = _parse_tree(plan)
    by_id = {n.nid: n for r in roots for n in _walk(r)}
    bnlj = by_id[8]
    assert bnlj.name == "BroadcastNestedLoopJoin"
    assert _build_side_bounded(bnlj, details, by_id)


def test_lint_flags_regex_join_condition(spark):
    """A join whose CONDITION evaluates a regex per candidate pair is
    flagged — precomputed equality columns are the scalable form."""
    from pyspark.sql import functions as F

    from csvb_spark.plans.lint import lint_plan

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id bigint, text string"
    )
    pats = spark.createDataFrame([(10, "al.*a"), (11, "g.m")], "pid bigint, pat string")
    joined = docs.join(pats, F.expr("text RLIKE pat"))
    rules = {f.rule for f in lint_plan(joined)}
    assert "interpreted-regex-join" in rules


def test_physical_plan_rejects_connect_shaped_df(spark, sf_dir):
    """A DataFrame without the classic JVM hooks (the Spark Connect
    shape) gets a clear RuntimeError from physical_plan, not an
    opaque AttributeError (round-12 ADVICE: planlint is product code
    behind the CLI)."""
    import pytest

    from csvb_spark.plans.lint import physical_plan

    class _ConnectishDF:
        # Connect DataFrames expose sparkSession but neither _jdf nor
        # a _jvm on the session
        class _Sess:
            _jvm = None

        sparkSession = _Sess()

    with pytest.raises(RuntimeError, match="classic .*non-Connect"):
        physical_plan(_ConnectishDF())
